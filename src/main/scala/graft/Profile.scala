package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing: `runMain graft.Profile <sfDir> q1 q2 ...`
  * (repeats each query twice to split plan/caching cost from steady
  * state; Bench measures the cold mix).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name%-30s run$i $dt%8.2f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
