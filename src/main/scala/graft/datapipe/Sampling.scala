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

  /** Deterministic mixture RE-WEIGHTING — the consumer of a
    * source-mix report: given target integer weights per group (parts
    * of the desired mixture, e.g. web -> 40, books -> 10), emit a
    * per-row admission decision such that the admitted corpus hits
    * the target mix in expectation while keeping every row of the
    * scarcest group (downsample-only — no row is ever duplicated).
    *
    * The admission rate for group g is r_g = (n_m * w_g) / (w_m *
    * n_g), where m is the group with the smallest n_g / w_g (the
    * binding constraint: it is kept whole, r_m = 1). Rates are
    * materialized as exact integer thresholds th_g = floor(2^52 *
    * n_m * w_g / (w_m * n_g)) computed driver-side in BigInt, and a
    * row is admitted iff its salted 52-bit hash < th_g — a pure
    * map-side Long comparison per row, deterministic in (salt, key),
    * retry-invariant, and bit-identical in any engine that replays
    * the same floor-division (no float ever enters the decision).
    *
    * The group counts are one tiny aggregate collected to the driver
    * (|groups| rows — the k-means-centroid pattern); everything after
    * is a map-side projection. Groups absent from `weights` are
    * dropped (same contract as stratifiedSample).
    */
  def mixResample(df: DataFrame, group: Column, key: Column, salt: String,
                  weights: Map[String, Long]): DataFrame = {
    val thresholds = mixThresholds(df, group, weights)
    df.filter(group.isInCollection(thresholds.map(_._1)))
      .withColumn("admitted", mixAdmitExpr(group, key, salt, thresholds))
  }

  /** The trained half of `mixResample`: exact integer admission
    * thresholds per group from the input's group counts (one tiny
    * collected aggregate). Exposed so a STREAMING admission path can
    * train on the static corpus and apply the identical map-side
    * decision per arriving row.
    */
  def mixThresholds(df: DataFrame, group: Column,
                    weights: Map[String, Long]): Seq[(String, Long)] = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val counts = df.select(group.cast("string").as("g")).groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.keys.filter(g => counts.getOrElse(g, 0L) > 0L).toSeq.sorted
    require(present.nonEmpty, "no weighted group present in the data")
    // argmin of n_g / w_g by exact cross-multiplication (never a
    // float ratio), ties broken by group name
    val m = present.reduceLeft { (a, b) =>
      val cmp = BigInt(counts(a)) * weights(b) - BigInt(counts(b)) * weights(a)
      if (cmp < 0 || (cmp == 0 && a < b)) a else b
    }
    val two52 = BigInt(1) << 52
    present.map { g =>
      g -> (two52 * counts(m) * weights(g) / (BigInt(weights(m)) * counts(g))).toLong
    }
  }

  /** The apply half: a pure map-side Long comparison of the salted
    * 52-bit hash against the group's plan-literal threshold. Composes
    * unchanged under readStream.
    */
  def mixAdmitExpr(group: Column, key: Column, salt: String,
                   thresholds: Seq[(String, Long)]): Column = {
    val thresholdExpr = thresholds.foldLeft(lit(-1L): Column) {
      case (els, (g, th)) => when(group === g, lit(th)).otherwise(els)
    }
    saltedHash(key, salt) < thresholdExpr
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
