package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting — the reproducibility
  * primitives of a training-data pipeline. Every assignment is a pure
  * function of (salt, key) via the md5-derived 52-bit hash
  * (TextAnalysis.hash52), so splits are stable across runs, engines,
  * partitionings and cluster sizes — unlike rand()-based sampling,
  * which changes under retries and task re-execution.
  *
  * Scale shapes: hashSplit and stratifiedSample are pure map-side
  * projections/filters (no shuffle at all — the hash is computed from
  * row values in place); perGroupSample is one shuffle on the group
  * key with an integer-keyed row_number.
  */
object Sampling {

  /** The 52-bit hash of "salt:key" — the one salting convention every
    * sampler here (and its DuckDB oracle) shares.
    */
  def saltedHash(key: Column, salt: String): Column =
    TextAnalysis.hash52(concat(lit(salt + ":"), key.cast("string")))

  /** Uniform bucket in [0, buckets) from a salted key — the basis of
    * all assignments here. md5-derived: identical in any engine.
    */
  def hashBucket(key: Column, salt: String, buckets: Int): Column =
    pmod(saltedHash(key, salt), lit(buckets.toLong))

  /** Assign each row to a named split by cumulative percentage, e.g.
    * Seq("train" -> 80, "val" -> 10, "test" -> 10). Percentages must
    * sum to 100. Deterministic in (salt, key).
    */
  def hashSplit(df: DataFrame, key: Column, salt: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = hashBucket(key, salt, 100)
    val assigned = splits.tail.scanLeft((splits.head._1, splits.head._2)) {
      case ((_, cum), (name, pct)) => (name, cum + pct)
    }.foldRight(lit(splits.last._1): Column) {
      case ((name, cum), els) => when(b < cum, name).otherwise(els)
    }
    df.withColumn("split", assigned)
  }

  /** Keep each row of stratum s with probability fractions(s) —
    * per-stratum Bernoulli sampling with a deterministic hash in place
    * of rand(). Strata missing from the map are dropped. Resolution:
    * 1e-4 (hash buckets of 10000).
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       salt: String, fractions: Map[String, Double]): DataFrame = {
    val b = hashBucket(key, salt, 10000)
    val thresh = fractions.foldLeft(lit(-1.0): Column) {
      case (els, (s, f)) => when(stratum === s, lit(f * 10000.0)).otherwise(els)
    }
    df.filter(b < thresh)
  }

  /** Exactly k rows per group, chosen by hash order — a deterministic
    * stand-in for per-group reservoir sampling. Integer/string sort
    * keys only (hash asc, then key asc for tie-break), so the chosen
    * set is engine-exact.
    */
  def perGroupSample(df: DataFrame, group: Column, key: Column,
                     salt: String, k: Int): DataFrame = {
    val w = Window.partitionBy(group)
      .orderBy(saltedHash(key, salt).asc, key.cast("string").asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }
}
