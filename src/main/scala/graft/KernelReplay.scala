package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** At-scale hash gate for the five SEQUENTIAL kernels whose DuckDB
  * oracles are recursive CTEs of depth = series length and therefore
  * infeasible past ~sf0.3 (the replay technique, not the engine, is
  * the super-linear side — r14 triage, r15 closure).
  *
  * The oracle here is an independent in-JVM replay: each channel's
  * samples are collected to the driver, sorted, and driven through
  * the SCALAR kernels (`IIR.lfilterWithState`, `CubicSpline
  * .interpolate`, `Rainflow.countCycles`) in ONE sequential pass —
  * no Spark, no chunking, no state handoff. The engine side runs the
  * full distributed path (streaming state composition for the IIR,
  * chunked cogroup for the spline, flatMapGroups for rainflow), so
  * what this gate proves is exactly what the r14 campaign showed
  * sf0.01 cannot: that the DISTRIBUTED composition (micro-batch state
  * handoff, chunk boundaries, partition order) reproduces the
  * sequential ground truth at full series length. Comparison is the
  * same strictness the DuckDB gate uses per query: bit-exact for the
  * IIR and rainflow rows, the query's own %.4e projection for the
  * chunked spline.
  *
  * Usage: runMain graft.KernelReplay <sfDir> <outJson>
  * Writes {"query": {"rows": n, "match": bool, "mismatches": k}} per
  * kernel; exits nonzero on any mismatch (the driver-gate contract).
  */
object KernelReplay {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outJson) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // 16 MB byte-range splits — fixture-shape, not engine tuning.
      // The v5 fixtures are 32-file tables, but Spark PACKS small
      // files into shared scan partitions by (size + 4 MB open cost),
      // so at the default 128 MB a well-compressed 32-file table
      // still lands in 1-2 partitions, single-threading every
      // scan-side filter; 16 MB keeps those scans ~16-way. The r16
      // 4 MB setting over-split EVERY scan (32x scheduling overhead
      // on the tiny sf0.1 tables) and was part of the r16 bench
      // regression. Production tables are many 128 MB+ files and
      // split naturally at defaults.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = run(spark, sfDir)
    val json = results.map { case (q, (rows, mism)) =>
      s""""$q": {"rows": $rows, "match": ${mism == 0}, "mismatches": $mism}"""
    }.mkString("{", ", ", "}")
    Files.writeString(Paths.get(outJson), json)
    println(json)
    spark.stop()
    if (results.values.exists(_._2 != 0)) sys.exit(1)
  }

  /** Runs all five kernels; returns query -> (engineRows, mismatches). */
  def run(spark: SparkSession, sfDir: String): Map[String, (Long, Long)] = {
    val names = Seq("k_stream_iir", "k_resample_cubic",
      "k_rainflow", "k_rainflow_binned", "k_rainflow_binsize")
    names.map { q =>
      val t0 = System.nanoTime()
      val engine = SparkEntry.queries(q)(spark, sfDir).collect()
        .map(_.toString).groupBy(identity).view.mapValues(_.length.toLong).toMap
      val oracle = replay(spark, sfDir, q)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val missing = oracle.map { case (k, c) => math.max(0L, c - engine.getOrElse(k, 0L)) }.sum
      val extra = engine.map { case (k, c) => math.max(0L, c - oracle.getOrElse(k, 0L)) }.sum
      val rows = engine.values.sum
      println(f"[replay] $q: $rows rows, ${missing + extra} mismatches, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (missing + extra > 0) {
        val bad = oracle.keys.filterNot(k => engine.getOrElse(k, 0L) == oracle(k)).take(3)
        val badE = engine.keys.filterNot(k => oracle.getOrElse(k, 0L) == engine(k)).take(3)
        println(s"  oracle-side sample: ${bad.mkString(" | ")}")
        println(s"  engine-side sample: ${badE.mkString(" | ")}")
      }
      q -> ((rows, missing + extra))
    }.toMap
  }

  /** One sequential in-JVM pass per kernel, emitted in the engine
    * query's row format (Row.toString shape for multiset compare).
    */
  private def replay(spark: SparkSession, sfDir: String, q: String): Seq[String] = q match {
    case "k_stream_iir" =>
      // (channel, us, v) through one unbroken DFIIt recurrence per
      // channel in (us, v) order — the statefulIir contract
      val (b, a) = graft.dsp.FilterDesign.butter(2, 0.2, "lowpass")
      val rows = graft.signal.Channels.rawEvents(spark, sfDir)
        .select(col("event_type").as("channel"), col("us"), col("value").as("v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      rows.groupBy(_._1).toSeq.flatMap { case (ch, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        val (y, _) = graft.dsp.IIR.lfilterWithState(b, a, sorted.map(_._3).toArray, null)
        sorted.indices.map(i => s"[$ch,${sorted(i)._2},${y(i)}]")
      }
    case "k_resample_cubic" =>
      // knots -> np.arange grid -> not-a-knot spline, one interpolate
      // call per channel (no chunking); %.4e like the engine query
      val knots = graft.signal.Channels.events(spark, sfDir)
        .select(col("channel"), col("t"), col("v")).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      val step = 1000.0
      knots.groupBy(_._1).toSeq.flatMap { case (ch, rs) =>
        val sorted = rs.sortBy(_._2)
        val x = sorted.map(_._2).toArray
        val v = sorted.map(_._3).toArray
        val n = math.ceil((x.last - x.head) / step).toLong
        val grid = Array.tabulate(n.toInt)(k => x.head + k * step)
        val y = graft.dsp.CubicSpline.interpolate(x, v, grid)
        grid.indices.map(i => s"[$ch,${grid(i)},${"%.4e".format(y(i))}]")
      }
    case "k_rainflow" => rainflowReplay(spark, sfDir, ndigits = Some(1))
    case "k_rainflow_binned" => rainflowReplay(spark, sfDir, nbins = Some(10))
    case "k_rainflow_binsize" => rainflowReplay(spark, sfDir, binsize = Some(25.0))
  }

  private def rainflowReplay(spark: SparkSession, sfDir: String,
                             ndigits: Option[Int] = None, nbins: Option[Int] = None,
                             binsize: Option[Double] = None): Seq[String] = {
    val rows = graft.signal.Channels.events(spark, sfDir)
      .select(col("channel"), col("t"), col("v")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.groupBy(_._1).toSeq.flatMap { case (ch, rs) =>
      val vs = rs.sortBy(_._2).map(_._3).toArray
      graft.dsp.Rainflow.countCycles(vs, ndigits, nbins, binsize)
        .map { case (rng, c) => s"[$ch,$rng,$c]" }
    }
  }
}
