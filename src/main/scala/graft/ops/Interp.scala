package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 1-D interpolation as an as-of join (SURVEY §2.4/§2.11):
  * union the source samples and the query points, sort per channel,
  * and carry the bracketing source samples to each query row with
  * IGNORE NULLS window functions. One shuffle per channel axis; no
  * per-row lookups, no driver loops — this is the classic Spark
  * formulation of the reference's `scipy.interpolate.interp1d`
  * (`extension.py:986-996`).
  */
object Interp {

  /** Interpolate per-channel series `src(channel, t, v)` at query
    * points `query(channel, t)`.
    *
    * Kinds: linear | slinear | nearest | nearest-up | previous | zero
    * | next (scipy interp1d's non-spline kinds) plus quadratic |
    * cubic (spline kernels). Out-of-range queries yield NULL v by
    * default; `boundsError = true` raises instead — scipy's
    * bounds_error contract (the reference path, `extension.py:992`).
    */
  def interp1d(src: DataFrame, query: DataFrame, kind: String = "linear",
               boundsError: Boolean = false): DataFrame = {
    if (kind == "cubic" || kind == "quadratic")
      return interp1dSpline(src, query, kind, boundsError)
    val s = src.select(col("channel"), col("t").cast("double").as("t"),
      col("v").cast("double").as("v"), lit(0).as("isq"))
    val q = query.select(col("channel"), col("t").cast("double").as("t"),
      lit(null).cast("double").as("v"), lit(1).as("isq"))
    val u = s.unionByName(q)

    // Both brackets are RUNNING (unbounded-preceding) frames, which
    // Spark evaluates incrementally in O(n); an unbounded-FOLLOWING
    // frame would be recomputed per row = O(n^2) per channel.
    // prev: ascending time, source rows sort BEFORE a query row at the
    // same t, so an exact hit is its own "previous" sample.
    val wPrev = Window.partitionBy("channel").orderBy(col("t").asc, col("isq").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // next: DESCENDING time with the same tie order, so the running
    // "last source seen" is the nearest following sample (equal t
    // included).
    val wNext = Window.partitionBy("channel").orderBy(col("t").desc, col("isq").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val srcT = when(col("isq") === 0, col("t"))
    val srcV = when(col("isq") === 0, col("v"))

    val withBrackets = u
      .withColumn("pt", last(srcT, ignoreNulls = true).over(wPrev))
      .withColumn("pv", last(srcV, ignoreNulls = true).over(wPrev))
      .withColumn("nt", last(srcT, ignoreNulls = true).over(wNext))
      .withColumn("nv", last(srcV, ignoreNulls = true).over(wNext))
      .filter(col("isq") === 1)

    val interp = kind match {
      case "linear" | "slinear" =>
        when(col("pt") === col("nt"), col("pv"))
          .otherwise(col("pv") +
            (col("nv") - col("pv")) * (col("t") - col("pt")) / (col("nt") - col("pt")))
      case "nearest" =>
        when(col("t") - col("pt") <= col("nt") - col("t"), col("pv")).otherwise(col("nv"))
      case "nearest-up" =>
        when(col("t") - col("pt") < col("nt") - col("t"), col("pv")).otherwise(col("nv"))
      case "previous" | "zero" => col("pv")
      case "next" => col("nv")
      case other => throw new IllegalArgumentException(s"unsupported interp kind: $other")
    }

    val outOfRange =
      if (boundsError)
        raise_error(concat(lit("A value in x_new is out of the interpolation range: t="),
          col("t"), lit(" channel="), col("channel"))).cast("double")
      else lit(null).cast("double")
    withBrackets
      .withColumn("v", when(col("pt").isNull || col("nt").isNull, outOfRange)
        .otherwise(interp))
      .select("channel", "t", "v")
  }

  /** Cubic (not-a-knot) spline interpolation: unlike the linear
    * family, the spline needs every source sample of a channel at
    * once, so this is a typed cogroup — source and query partitions
    * meet per channel, one O(n) tridiagonal solve per channel task
    * (SURVEY §2.11: the documented kernel path for spline kinds).
    */
  private def interp1dSpline(src: DataFrame, query: DataFrame,
                             kind: String = "cubic",
                             boundsError: Boolean = false): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    val s = src.selectExpr("channel", "cast(t as double) t", "cast(v as double) v")
      .as[PerChannel.Sample]
    val q = query.selectExpr("channel", "cast(t as double) t")
      .map(r => PerChannel.Sample(r.getString(0), r.getDouble(1), 0.0))
    s.groupByKey(_.channel).cogroup(q.groupByKey(_.channel)) { (ch, srcIt, qIt) =>
      val srcArr = srcIt.toArray.sortBy(_.t)
      val qArr = qIt.toArray.sortBy(_.t)
      if (qArr.isEmpty) Iterator.empty
      else if (srcArr.isEmpty) {
        // window-path parity: query channels with no source samples
        // yield NULL rows (or raise under boundsError), never vanish
        if (boundsError) throw new IllegalArgumentException(
          s"A value in x_new is out of the interpolation range (channel=$ch)")
        qArr.iterator.map(s => (ch, s.t, None: Option[Double]))
      } else {
        val xs = srcArr.map(_.t)
        val ys = srcArr.map(_.v)
        // NaN sorts last but compares false, so the bounds check must
        // scan, not test head/last
        if (boundsError && qArr.exists(s =>
            s.t.isNaN || s.t < xs.head || s.t > xs.last))
          throw new IllegalArgumentException(
            s"A value in x_new is out of the interpolation range (channel=$ch)")
        // default contract (same as the window path): out-of-range
        // query points yield NULL, only in-range ones hit the spline
        val inRange = qArr.filter(s => s.t >= xs.head && s.t <= xs.last)
        val vals =
          if (kind == "quadratic")
            graft.dsp.CubicSpline.interpolateQuadratic(xs, ys, inRange.map(_.t))
          else graft.dsp.CubicSpline.interpolate(xs, ys, inRange.map(_.t))
        val known = inRange.map(_.t).zip(vals).toMap
        qArr.iterator.map(s => (ch, s.t, known.get(s.t): Option[Double]))
      }
    }.toDF("channel", "t", "v")
  }

  /** Uniform-rate resample (`extension.py:853-894`): per channel,
    * np.arange(t0, tEnd, 1/sampleRate) — half-open, excluding tEnd —
    * generated distributively with sequence+explode, then as-of
    * interpolation. The grid is in-range by construction, matching the
    * reference's bounds_error-free path.
    */
  def resample(src: DataFrame, sampleRate: Double, kind: String = "linear"): DataFrame = {
    val step = 1.0 / sampleRate
    val grid = resampleGrid(src, step)
    interp1d(src, grid, kind)
  }

  /** The np.arange grid as a DataFrame (channel, t), generated in TWO
    * levels: an outer block sequence, a repartition spreading blocks
    * across tasks, then an inner per-block sequence. A single-level
    * explode materializes one n-element array per channel in one task
    * — multi-GB for a long channel at scale, and `sequence` caps near
    * 2^31 elements. Two levels bound any one array at `blockSize` and
    * parallelize grid creation across (channel, block). t is computed
    * from the GLOBAL index k, so values are bit-identical to the
    * single-level form (np.arange semantics, `extension.py:880-887`).
    */
  def resampleGrid(src: DataFrame, step: Double, blockSize: Long = 1L << 16): DataFrame =
    src.groupBy("channel")
      .agg(min("t").as("t0"), max("t").as("t1"))
      .withColumn("n", ceil((col("t1") - col("t0")) / lit(step)).cast("long"))
      .filter(col("n") > 0)
      .select(col("channel"), col("t0"), col("n"),
        explode(sequence(lit(0L), floor((col("n") - 1) / lit(blockSize)))).as("blk"))
      .repartition(col("channel"), col("blk"))
      .select(col("channel"), col("t0"),
        explode(sequence(col("blk") * lit(blockSize),
          least(col("blk") * lit(blockSize) + lit(blockSize - 1), col("n") - 1))).as("k"))
      .select(col("channel"), (col("t0") + col("k") * lit(step)).as("t"))
}
