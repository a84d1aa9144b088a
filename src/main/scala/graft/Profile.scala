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
      // 4 MB byte-range splits: the single-FILE fixtures compress so
      // well (permuted floats 10x, salted text ~5x) that the default
      // 128 MB maxPartitionBytes puts a whole table in ONE scan
      // partition regardless of row-group count, single-threading
      // every scan-side filter (incl. heavy predicates Catalyst
      // pushes below repartitions). Production tables are many files
      // at default splits; this is fixture-shape, not engine tuning.
      .config("spark.sql.files.maxPartitionBytes", "4m")
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
