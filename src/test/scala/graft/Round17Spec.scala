package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.datapipe.Dedup
import graft.streaming.StreamingOps

/** Round-17 pins, closing the r16 verdict/advice items:
  *  - the state-table staging swaps (re-bucketing, rollback) publish
  *    in two non-atomic steps — write staging, drop live, rename —
  *    and a crash between the drop and the rename used to leave NO
  *    live bands table with resume unable to recover (r16 verdict #2
  *    / advice). Resume is now swap-aware: a surviving staging table
  *    whose live twin is missing is renamed into place before any
  *    state derive. Pinned by killing a run INSIDE the swap window
  *    (live dropped, staging not yet renamed) and resuming.
  *  - the compaction delta-window is derived AFTER the partial-batch
  *    rollback (r16 advice): an orphan delta batch must not count
  *    toward the window.
  *  - the quantization grain fails LOUDLY on non-finite values
  *    (r16 advice): scale·cnt overflowing to Inf used to make every
  *    quantum round(x/Inf) = 0 — a silently-zeroed signal.
  */
class Round17Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** 10 single-file micro-batches of 3 unique docs each (the
    * Round16Spec rebucket fixture shape): every arrival appends 4
    * band rows, so the 4-bucket/10-rows-per-bucket growth config
    * re-buckets at the 2-batch compaction cadence.
    */
  private def stagedBatches(prefix: String): java.nio.file.Path = {
    val texts = (0 until 30).map { i =>
      (100L + i, s"unique document number $i with entirely disjoint words " +
        s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g")
    }
    val dir = Files.createTempDirectory(prefix)
    val t0 = 1700000000000L
    texts.grouped(3).zipWithIndex.foreach { case (docs, i) =>
      val stage = dir.resolve(s"stage_$i")
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = {
        val st = Files.list(stage)
        try st.filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally st.close()
      }
      val dest = dir.resolve(f"f_$i%02d.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(t0 + i * 10000L)
      org.apache.commons.io.FileUtils.deleteDirectory(stage.toFile)
    }
    dir
  }

  private def batchStream(dir: java.nio.file.Path): DataFrame = {
    import org.apache.spark.sql.types._
    spark.readStream.schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .option("pathGlobFilter", "f_*.parquet").parquet(dir.toString)
  }

  private def initState(tagPrefix: String): (String, String) = {
    val corpus = Seq((1L, "corpus resident swap text matching nothing arriving"))
      .toDF("doc_id", "text")
    val bands = Dedup.lshBands(Dedup.minhashSignaturesFromHashes(
      Dedup.shingleHashes(Dedup.shingles(corpus, distinct = false)), k = 16))
    val (bt, ct) = (s"${tagPrefix}_init_bands", s"${tagPrefix}_init_comps")
    StreamingOps.dropTableAndDir(spark, bt)
    StreamingOps.dropTableAndDir(spark, ct)
    bands.write.mode("overwrite").saveAsTable(bt)
    corpus.select(col("doc_id"), col("doc_id").as("cluster"))
      .write.mode("overwrite").saveAsTable(ct)
    (bt, ct)
  }

  private def decisions(df: DataFrame): Map[Long, (Long, Boolean)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("resume recovers a crash INSIDE the re-bucketing swap window") {
    val dir = stagedBatches("r17_midswap_")
    val (bt, ct) = initState("r17m")

    def numBuckets(table: String): Int =
      spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .filter(col("col_name") === "Num Buckets")
        .select("data_type").head().getString(0).toInt

    spark.conf.set("spark.graft.admit.stateBuckets", "4")
    spark.conf.set("spark.graft.admit.rowsPerBucket", "10")
    try {
      // uninterrupted reference at the growth config
      val ref = decisions(StreamingOps.runIncrementalAdmitPersisted(
        batchStream(dir), bt, ct, tag = "r17_swap_ref", compactEvery = 2))

      // crashed run: 12 band rows/batch cross the 4x10 threshold at
      // the batch-3 compaction check, so the first re-bucket fires
      // there — die AFTER the live bands drop, BEFORE the rename
      val ckpt = Files.createTempDirectory("r17_midswap_ckpt_").toString
      val crashed = intercept[Exception] {
        StreamingOps.runIncrementalAdmitPersisted(
          batchStream(dir), bt, ct, tag = "r17_swap",
          compactEvery = 2, checkpointDir = Some(ckpt), failMidSwap = 3L)
      }
      assert(Iterator.iterate(crashed: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(e => e.getMessage != null &&
          e.getMessage.contains("graft-injected-crash mid-swap")),
        s"expected the injected mid-swap crash, got: $crashed")
      // the window is REAL: no live bands table, staging holds the
      // only copy
      assert(!spark.catalog.tableExists("graft_admit_bands_r17_swap"),
        "live bands table should be gone mid-swap")
      assert(spark.catalog.tableExists("graft_admit_bands_r17_swap_rebucket"),
        "staging table should survive the crash")

      // resume: the swap completes first, then the stream replays —
      // decisions must match the uninterrupted run
      val got = decisions(StreamingOps.runIncrementalAdmitPersisted(
        batchStream(dir), bt, ct, tag = "r17_swap",
        compactEvery = 2, checkpointDir = Some(ckpt), resume = true))
      assert(got == ref, "post-mid-swap-resume decisions diverge")
      // the staging table was consumed by the recovery rename
      assert(!spark.catalog.tableExists("graft_admit_bands_r17_swap_rebucket"))
      // growth still lands at the reference's final bucket count
      assert(numBuckets("graft_admit_bands_r17_swap") ==
        numBuckets("graft_admit_bands_r17_swap_ref"))
      // append-only accounting exactly-once: 30 arrivals x 4 band
      // rows, one batch_id per micro-batch
      val bandCounts = spark.table("graft_admit_bands_r17_swap")
        .groupBy("batch_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bandCounts.values.sum == 120L && bandCounts.size == 10,
        s"band accounting off after mid-swap resume: $bandCounts")
      val resCounts = spark.table("graft_admit_results_r17_swap")
        .groupBy("doc_id").count().filter(col("count") > 1).count()
      assert(resCounts == 0, "duplicate result rows after mid-swap resume")
    } finally {
      spark.conf.unset("spark.graft.admit.stateBuckets")
      spark.conf.unset("spark.graft.admit.rowsPerBucket")
    }
  }

  test("resume discards a STALE staging table when the live table survived") {
    val dir = stagedBatches("r17_stale_")
    val (bt, ct) = initState("r17s")
    // crash AFTER bands-append (the r16 injection): live tables all
    // present; plant a bogus leftover staging alongside them — the
    // pre-drop crash shape — and resume must discard it, not rename
    val ckpt = Files.createTempDirectory("r17_stale_ckpt_").toString
    intercept[Exception] {
      StreamingOps.runIncrementalAdmitPersisted(
        batchStream(dir), bt, ct, tag = "r17_stale",
        compactEvery = 4, checkpointDir = Some(ckpt), failAfterBands = 2L)
    }
    StreamingOps.dropTableAndDir(spark, "graft_admit_bands_r17_stale_rebucket")
    spark.table("graft_admit_bands_r17_stale").limit(1)
      .write.mode("overwrite").saveAsTable("graft_admit_bands_r17_stale_rebucket")
    val got = decisions(StreamingOps.runIncrementalAdmitPersisted(
      batchStream(dir), bt, ct, tag = "r17_stale",
      compactEvery = 4, checkpointDir = Some(ckpt), resume = true))
    assert(!spark.catalog.tableExists("graft_admit_bands_r17_stale_rebucket"),
      "stale staging must be discarded on resume")
    val ref = decisions(StreamingOps.runIncrementalAdmitPersisted(
      batchStream(dir), bt, ct, tag = "r17_stale_ref", compactEvery = 4))
    assert(got == ref, "stale-staging resume decisions diverge")
  }

  test("documents substrate: raw scan on production-shaped tables, cached reshape on single-file") {
    // a 2x GenScale clone of the sf0.001 testdata gives a 32-file
    // production-shaped documents table; the testdata itself is the
    // single-file shape. The substrate must pass the multi-file table
    // through UNTOUCHED (per-consumer pushdown, no shuffle, no cache)
    // and reshape+cache only the single-file one (r16 verdict #5).
    val dir = Files.createTempDirectory("r17_shape_").toString
    GenScale.generate(spark, "/root/testdata/sf0.001", dir, 2)
    SparkEntry.release(spark) // drop any memoized substrate for other dirs

    val multi = SparkEntry.docs(spark, dir)
    val multiPlan = multi.queryExecution.executedPlan.toString
    assert(!multiPlan.contains("Exchange") && !multiPlan.contains("InMemoryRelation"),
      s"multi-file docs substrate must be the raw scan, got:\n$multiPlan")
    // pruning/pushdown reach parquet through the substrate
    val pushed = multi.filter(col("lang") === "en").select("doc_id")
      .queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters: [IsNotNull(lang)") ||
           pushed.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"filter must push to the scan on the raw substrate, got:\n$pushed")

    val single = SparkEntry.docs(spark, "/root/testdata/sf0.001")
    val singlePlan = single.queryExecution.optimizedPlan.toString
    assert(singlePlan.contains("InMemoryRelation"),
      s"single-file docs substrate must be session-cached, got:\n$singlePlan")
    // r18: the reshape is data-sized (>=256 rows / >=512 KB per
    // partition), never more than the session's parallelism — a tiny
    // table must not pay 32-task stages for 60-row partitions
    assert(single.rdd.getNumPartitions >= 2 &&
        single.rdd.getNumPartitions <= spark.sparkContext.defaultParallelism,
      s"single-file substrate must be reshaped to a data-sized partition " +
        s"count, got ${single.rdd.getNumPartitions}")
    // identical content either way (same source rows)
    assert(SparkEntry.docs(spark, "/root/testdata/sf0.001").count() * 2 ==
      multi.count(), "2x clone must hold exactly twice the docs")
    SparkEntry.release(spark)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("grain fails loudly on non-finite values instead of zeroing the signal") {
    // scalar form
    val e = intercept[IllegalArgumentException] {
      graft.signal.Signal.grainOf(1e300, 1L << 30)
    }
    assert(e.getMessage.contains("non-finite quantization grain"))
    // Column form — evaluated inside a plan
    val err = intercept[Exception] {
      Seq((1e300, 1L << 30)).toDF("scale", "cnt")
        .select(graft.signal.Signal.grain(col("scale"), col("cnt")).as("g"))
        .collect()
    }
    assert(Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => t.getMessage != null &&
        t.getMessage.contains("non-finite quantization grain")),
      s"expected the grain raise_error, got: $err")
    // finite values still pass through bit-identically
    val ok = Seq((2.5e-5, 1L << 28)).toDF("scale", "cnt")
      .select(graft.signal.Signal.grain(col("scale"), col("cnt")).as("g"))
      .as[Double].head()
    assert(java.lang.Double.doubleToLongBits(ok) ==
      java.lang.Double.doubleToLongBits(
        graft.signal.Signal.grainOf(2.5e-5, 1L << 28)))
  }
}
