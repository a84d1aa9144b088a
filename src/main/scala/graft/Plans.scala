package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical plans for representative queries so the
  * shuffle/pushdown/codegen structure can be reviewed
  * (`sbt "runMain graft.Plans <sfDir> <query...>"`).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
    else Seq("q01_pricing", "q03_region_revenue", "q_between", "q_movrms16",
      "q_resample_linear", "q_cosine_topk", "q_minhash_sig")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "4")
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
