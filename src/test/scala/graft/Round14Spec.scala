package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.datapipe.{Bucketing, Sketches, Skew}

/** Round-14 pins, closing the r13 verdict/advice items:
  *  - HLL max-rank parameterization (the hardcoded 45 was only right
  *    for m=256 — at m=64 rho was off by −2 and the raw-regime
  *    estimate deflated ~4×): raw regime accuracy AND rank-range
  *    bounds pinned at m=64 and m=1024.
  *  - saltedJoin spreads a hot key made of byte-identical DUPLICATE
  *    rows (the old row-hash salt sent all duplicates to one salt).
  *  - plan asserts under the PRODUCTION config (AQE **on**): the
  *    bucketed co-located join's adaptive final plan has zero
  *    shuffles, and the salted join's adaptive shuffle really
  *    partitions by (key, _salt).
  *  - streaming sketch state stays ≤ m·|sources| across micro-batches
  *    as NEW sources arrive mid-stream (growth is per-source sketch
  *    width, never per-key).
  */
class Round14Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** The adaptive FINAL plan if AQE wrapped the query, else the plan
    * itself — materialize the df first so the final plan exists.
    */
  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
      case p => p
    }

  /** Every shuffle in an adaptive final plan: materialized stages
    * show up as ShuffleQueryStageExec (whose shuffle we surface),
    * unmaterialized ones as bare ShuffleExchangeLike.
    */
  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = {
    val staged = p.collect { case s: ShuffleQueryStageExec => s.shuffle }
    val bare = p.collect { case e: ShuffleExchangeLike => e }
    staged ++ bare
  }

  test("HLL raw regime is accurate at m=64 (the r13 rank-bug fixture)") {
    // 5000 distinct keys >> 2.5·64 = 160 -> raw harmonic estimator.
    // Under the r13 bug (rank hardcoded for m=256) this deflated ~4×
    // (est ~458 for 1500 true on the sf0.1 events fixture); fixed,
    // the published bound is 1.04/sqrt(64) = 13% standard error.
    val df = (1 to 5000).map(i => ("g", s"key$i")).toDF("g", "k")
    val est = Sketches.hllDistinct(df, col("k"), Seq("g"), m = 64)
      .collect()(0).getDouble(1)
    assert(math.abs(est - 5000) / 5000 < 3 * 1.04 / math.sqrt(64),
      s"m=64 raw-regime estimate $est too far from 5000")
  }

  test("HLL rho rank stays within [1, R] for m=64 and m=1024") {
    val df = (1 to 20000).map(i => ("g", s"key$i")).toDF("g", "k")
    for (m <- Seq(64, 256, 1024)) {
      val r = Sketches.hllMaxRank(m)
      assert(r === 53 - (31 - Integer.numberOfLeadingZeros(m)))
      val mm = Sketches.hllRegisters(df, col("k"), Seq("g"), m)
        .agg(min("M"), max("M")).collect()(0)
      assert(mm.getInt(0) >= 1, s"m=$m: rank ${mm.getInt(0)} below 1 (negative-rho bug)")
      assert(mm.getInt(1) <= r, s"m=$m: rank ${mm.getInt(1)} above max $r")
    }
  }

  test("HLL estimate at m=64 agrees with the m=64 oracle alpha") {
    // the published small-m constant is special-cased; both sides of
    // the verify matrix must carry the same literal
    assert(Sketches.alpha(64) === 0.709)
    assert(Sketches.alpha(256) === 0.7213 / (1.0 + 1.079 / 256))
  }

  test("saltedJoin spreads a hot key made of byte-identical duplicate rows") {
    // all 20k hot rows are IDENTICAL (same key, same value): a plain
    // row-hash salt would put them all on one salt -> one task. The
    // default's within-duplicate-group row index round-robins them
    // (deterministically, r14 advice — no mid()/rand() involved).
    val fact = (Seq.fill(20000)(("hot", 1.0)) ++
      (1 to 1000).map(i => (s"k${i % 10}", i.toDouble))).toDF("key", "v")
    val dim = fact.groupBy("key").agg(avg("v").as("key_avg"))
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 16)
    val plain = fact.join(dim, Seq("key"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join result differs from plain join on duplicate-heavy fact")
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    val spWas = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      val maxPart = salted.withColumn("pid", spark_partition_id())
        .groupBy("pid").count().agg(max("count")).collect()(0).getLong(0)
      assert(maxPart <= 8000,
        s"duplicate hot key still parked on one task: max partition $maxPart rows")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", spWas)
    }
  }

  test("bucketed co-located join has zero shuffles in the ADAPTIVE final plan") {
    // r13 asserted this with AQE off; Verify/Bench run AQE on, so pin
    // the claim against the plan production actually executes
    val docs = (1 to 2000).map(i => (i.toLong, s"text body $i", i % 7))
      .toDF("doc_id", "text", "grp")
    Bucketing.writeBucketed(docs, "r14_docs_bucketed", "doc_id", 8,
      sortCols = Seq("doc_id"))
    Bucketing.writeBucketed(
      docs.select(col("doc_id"), (col("grp") > 3).as("keep")),
      "r14_verdicts_bucketed", "doc_id", 8, sortCols = Seq("doc_id"))
    val bcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val joined = Bucketing.coLocatedJoin(spark,
        "r14_docs_bucketed", "r14_verdicts_bucketed", "doc_id")
      assert(joined.count() === 2000)
      val ex = shuffles(finalPlan(joined))
      assert(ex.isEmpty,
        s"bucketed join shuffled under AQE: ${ex.size} exchanges in the final plan")
      // and the unbucketed control DOES shuffle under the same config
      val plain = docs.join(docs.select(col("doc_id"), col("grp")), Seq("doc_id"))
      plain.count()
      assert(shuffles(finalPlan(plain)).size >= 2,
        "expected shuffles in the unbucketed adaptive join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcastWas)
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      graft.streaming.StreamingOps.dropTableAndDir(spark, "r14_docs_bucketed")
      graft.streaming.StreamingOps.dropTableAndDir(spark, "r14_verdicts_bucketed")
    }
  }

  test("salted join's ADAPTIVE shuffle partitions by (key, _salt)") {
    // under AQE the fixture's tiny reducers get coalesced (that is
    // size-based and correct), so the production claim is about the
    // MAP side: the exchange must hash on (key, _salt) — the hot
    // key's rows spread across reducers at real scale no matter what
    // AQE later coalesces
    val fact = (Seq.fill(20000)(("hot", 1.0)) ++
      (1 to 1000).map(i => (s"k${i % 10}", i.toDouble))).toDF("key", "v")
    val dim = fact.groupBy("key").agg(avg("v").as("key_avg"))
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val salted = Skew.saltedJoin(fact, dim, "key", salts = 16)
      salted.count()
      val parts = shuffles(finalPlan(salted)).map(_.outputPartitioning)
      val saltKeyed = parts.collect {
        case h: HashPartitioning
          if h.expressions.exists(_.references.exists(_.name == "_salt")) => h
      }
      assert(saltKeyed.size >= 2,
        s"expected both join inputs hashed on (key, _salt); partitionings: $parts")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("sf1 salted join spreads the 200k-row hot keys (partition histogram)") {
    // r13 verdict #6: the design argues from a 10x hot key — at sf1
    // each of the 5 event types is ~200k rows, which an unsalted
    // hash exchange parks on ONE task each. Gated on the GenScale
    // fixture (close_round builds it; skip in a fresh checkout).
    assume(new java.io.File("fixtures/sf1/events.parquet").exists,
      "fixtures/sf1 not generated")
    val e = spark.read.parquet("fixtures/sf1/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = e.groupBy("event_type").agg(avg("value").as("type_avg"))
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    val spWas = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      def maxPart(df: org.apache.spark.sql.DataFrame): Long =
        df.withColumn("pid", spark_partition_id())
          .groupBy("pid").count().agg(max("count")).collect()(0).getLong(0)
      val plainMax = maxPart(e.join(dim.hint("shuffle_hash"), Seq("event_type")))
      val saltedMax = maxPart(Skew.saltedJoin(e, dim, "event_type", salts = 8))
      assert(plainMax >= 190000,
        s"expected a ~200k-row parked hot key unsalted, got $plainMax")
      // 5 types x 8 salts = 40 sub-keys of ~25k rows each; Spark's
      // hashpartitioning is deterministic, and on this fixture the
      // most-loaded of the 32 partitions draws 4 sub-keys (measured
      // 100216 rows). Pin a bound just above that layout AND the
      // relative claim (max task halves even with collision luck) —
      // what salting controls is the ~25k sub-key grain, not which
      // partition the hash lands sub-keys on.
      assert(saltedMax <= 110000,
        s"salted join still skewed at sf1: max partition $saltedMax rows")
      assert(saltedMax * 19 <= plainMax * 10,
        s"salting should at least halve the max task: $saltedMax vs $plainMax")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", spWas)
    }
  }

  test("streaming HLL state stays <= m per source as new sources arrive") {
    // VERDICT r13 item 8: q_stream_profile's bound was shown on a
    // fixed source set; prove state grows with |sources| (sketch
    // width), never with key count, when sources arrive mid-stream.
    // Output-mode note: complete mode re-emits every group per
    // trigger, fine while |sources| is register-table-sized; at large
    // |sources| switch to update mode and merge downstream (registers
    // are max-mergeable, so partial emissions compose).
    val m = 64
    val input = MemoryStream[(String, String)](spark)
    val regs = Sketches.hllRegisters(
      input.toDF().toDF("source", "fp"), col("fp"), Seq("source"), m)
    val q = regs.writeStream.outputMode("complete")
      .format("memory").queryName("r14_stream_state").start()
    try {
      def feed(sources: Seq[String], keysPerSource: Int, tag: String): Long = {
        input.addData(for {
          s <- sources; i <- 1 to keysPerSource
        } yield (s, s"$tag-$s-$i"))
        q.processAllAvailable()
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      }
      val s1 = feed(Seq("a", "b"), 3000, "b1")
      assert(s1 <= 2L * m, s"batch 1 state $s1 > ${2 * m}")
      val s2 = feed(Seq("a", "b", "c", "d"), 3000, "b2")   // 2 NEW sources
      assert(s2 <= 4L * m, s"batch 2 state $s2 > ${4 * m}")
      val s3 = feed(Seq("a", "e", "f", "g", "h"), 3000, "b3") // 4 more
      assert(s3 <= 8L * m, s"batch 3 state $s3 > ${8 * m}")
      // 33k keys seen; a dropDuplicates-style operator would hold 33k
      // state rows — the sketch holds <= 8 sources x 64 registers
      assert(s3 > s2 && s2 > s1, "state should grow only with new sources")
      // and the estimates are still per-source accurate ("a" fed in
      // all 3 batches -> 9000 distinct, "h" only in batch 3 -> 3000;
      // both raw regime, 3*13% bound at m=64)
      val est = Sketches.hllEstimate(
        spark.createDataFrame(spark.table("r14_stream_state").rdd,
          spark.table("r14_stream_state").schema), Seq("source"), m)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(math.abs(est("a") - 9000) / 9000 < 3 * 1.04 / math.sqrt(m))
      assert(math.abs(est("h") - 3000) / 3000 < 3 * 1.04 / math.sqrt(m))
    } finally q.stop()
  }
}
