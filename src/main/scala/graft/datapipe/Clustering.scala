package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering: distributed k-means (Lloyd's algorithm) over
  * an `Array[Float]` embedding column — the training-data-pipeline
  * primitive behind topic bucketing, dedup prefiltering, and IVF list
  * training.
  *
  * Spark-first shape per iteration:
  *   - assignment is a pure MAP-SIDE expression: the k centroids are
  *     folded into the plan as array literals, each row computes its
  *     argmin squared distance with no shuffle and no UDF;
  *   - the update step is ONE map-side-combinable aggregation:
  *     posexplode(embedding) -> groupBy(cluster, dim).avg — the
  *     classic n*dims-row shuffle with partial aggregation, the shape
  *     that survives 1000 executors;
  *   - only k*dims doubles cross the driver between iterations (the
  *     new centroids — inherent to Lloyd's, same as MLlib).
  *
  * DETERMINISM CONTRACT: centroids are rounded to 6 decimals after
  * every update. Identical rounded centroids + identical input
  * vectors make every distance bit-identical in any IEEE engine, so
  * assignments (ties broken toward the smaller cluster id) — and
  * therefore the whole fit — reproduce exactly in the DuckDB oracle.
  * Initial centroids are md5-derived (`Similarity.centroidComponent`
  * semantics with a "kmeans:" prefix), so the fit needs no RNG.
  */
object Clustering {

  def initComponent(j: Int, d: Int): Double = Similarity.hashComponent("kmeans", j, d)

  /** Squared L2 distance of the embedding column to a centroid
    * literal, left-to-right accumulation (engine-portable).
    */
  private def sqDist(c: Array[Double]): Column =
    aggregate(zip_with(col("embedding"), typedLit(c), (x, p) => (x - p) * (x - p)),
      lit(0.0), (acc, x) => acc + x)

  /** Argmin-cluster assignment against the given centroids: array of
    * (dist, cluster) structs reduced with array_min — ties go to the
    * smaller cluster id (struct order), map-side only.
    */
  private def assignExpr(centroids: Array[Array[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, j) =>
      struct(sqDist(c).as("dist"), lit(j).as("cluster"))
    }: _*)).getField("cluster")

  /** The trained centroids after `iters` Lloyd iterations from the
    * deterministic seed — the k*dims doubles that cross the driver
    * (inherent to Lloyd's, same as MLlib). Exposed so downstream
    * operators (IVF list training in `Similarity.ivfTopKWith`) can
    * fold the SAME centroids into their plans as literals; the
    * per-iteration round-6 contract makes the composition replay
    * exactly in the DuckDB oracle.
    */
  def kmeansCentroids(vectors: DataFrame, k: Int, iters: Int,
                      dims: Int): Array[Array[Double]] = {
    var centroids = Array.tabulate(k)(j => Array.tabulate(dims)(d => initComponent(j, d)))
    // the iterations scan the input once per Lloyd step — cache the
    // projection so steps 2..iters hit memory, not the source
    val proj = vectors.select(col("vec_id"), col("embedding")).cache()
    try {
      for (_ <- 0 until iters) {
        val assigned = proj.select(col("vec_id"), col("embedding"),
          guard(dims, assignExpr(centroids)).as("cluster"))
        // per-(cluster, dim) means; n*dims rows but fully partial-agg'd.
        // +1e-7 before round: means of discrete-valued embeddings can
        // land exactly on round-6 midpoints where engines tie-break
        // differently (see the parity notes in SparkEntry)
        val means = assigned
          .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("cluster", "dim")
          .agg(round(avg(col("x").cast("double")) + 1e-7, 6).as("m"))
          .collect()
        val next = centroids.map(_.clone())
        means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        centroids = next
      }
    } finally proj.unpersist(blocking = false)
    centroids
  }

  /** Run `iters` Lloyd iterations from the deterministic seed
    * centroids; returns (vec_id, cluster, dist) under the final
    * centroids. Empty clusters keep their previous centroid.
    */
  def kmeans(vectors: DataFrame, k: Int = 8, iters: Int = 3, dims: Int = -1): DataFrame = {
    val d0 =
      if (dims >= 0) dims
      else {
        val firstRow = vectors.select(size(col("embedding"))).head(1)
        if (firstRow.isEmpty)
          return vectors.limit(0).select(col("vec_id"), lit(0).as("cluster"),
            lit(0.0).as("dist"))
        firstRow(0).getInt(0)
      }
    val centroids = kmeansCentroids(vectors, k, iters, d0)
    val best = array_min(array(centroids.zipWithIndex.map { case (c, j) =>
      struct(sqDist(c).as("dist"), lit(j).as("cluster"))
    }: _*))
    vectors.select(col("vec_id"), guard(d0, best.getField("cluster")).as("cluster"),
      round(sqrt(best.getField("dist")), 6).as("dist"))
  }

  /** Ragged inputs would null-pad the zip_with and silently corrupt
    * every distance — fail loudly instead (same contract as
    * `Similarity.lshBuckets`).
    */
  private def guard(dims: Int, c: Column): Column =
    when(size(col("embedding")) === dims, c)
      .otherwise(raise_error(concat(
        lit(s"kmeans: embedding dims != $dims for vec_id="), col("vec_id"))).cast("int"))
}
