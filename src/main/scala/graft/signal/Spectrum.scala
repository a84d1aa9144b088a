package graft.signal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A distributed frequency-domain result (PSD or SRS): one row per
  * `(channel, freq)` with power/response `p`. Spark analog of the
  * reference's `FreqDomain` accessor (`extension.py:19-238`).
  */
final case class Spectrum(df: DataFrame, name: String = "psd", unit: String = "none") {

  private def w = Window.partitionBy("channel").orderBy("freq")

  /** Inclusive frequency band filter (`extension.py:100-124`). */
  def between(start: Double, end: Double): Spectrum =
    copy(df = df.filter(col("freq").between(start, end)))

  /** RMS of the PSD by trapezoidal integration in linear space
    * (`extension.py:126-143`, np.trapz at `tools.py:143`): the ordered
    * pairwise segment sum is a lag-window aggregate — no sequential
    * kernel needed.
    */
  def rmsLin(): DataFrame = {
    val seg = (col("p") + lag("p", 1).over(w)) / 2.0 * (col("freq") - lag("freq", 1).over(w))
    df.withColumn("seg", seg)
      .groupBy("channel")
      .agg(sqrt(sum("seg")).as("rms"))
  }

  /** RMS of the PSD integrating each segment as a log-log power law
    * with the reference's n≈-1 special case and machine-precision
    * fallback to the linear trapezoid (`tools.py:146-201`). All
    * branches are `when(...)` expressions — fully codegen'd.
    */
  def rmsLog(): DataFrame = {
    val f1 = lag("freq", 1).over(w)
    val p1 = lag("p", 1).over(w)
    val d = df
      .withColumn("f1", f1).withColumn("p1", p1)
      .filter(col("f1").isNotNull)
      .withColumn("n", log10(col("p") / col("p1")) / log10(col("freq") / col("f1")))
      .withColumn("area_log",
        when(abs(col("n") + 1.0) < 1e-10,
          col("p1") * col("f1") * log(col("freq") / col("f1")))
          // p1 * f1^-n (not p1 / f1^n): division hits ANSI/NULL-on-zero
          // when the power under/overflows, while the multiply form
          // yields the same inf/NaN that numpy produces and the
          // fallback branch catches (tools.py:191-196)
          .otherwise((col("p1") * pow(col("f1"), -col("n"))) * (lit(1.0) / (col("n") + 1.0)) *
            (pow(col("freq"), col("n") + 1.0) - pow(col("f1"), col("n") + 1.0))))
      .withColumn("area",
        when(isnan(col("area_log")) || col("area_log") === 0.0 ||
          abs(col("area_log")) === lit(Double.PositiveInfinity),
          (col("p1") + col("p")) / 2.0 * (col("freq") - col("f1")))
          .otherwise(col("area_log")))
    d.groupBy("channel").agg(sqrt(sum("area")).as("rms"))
  }

  /** Linear interpolation in log10-log10 space onto a new frequency
    * grid (`extension.py:201-230`): as-of join on log10(freq) with
    * log10(p) values, then 10^y back.
    */
  def interp1dLog(grid: DataFrame, boundsError: Boolean = true): Spectrum = {
    val src = df.select(col("channel"), log10(col("freq")).as("t"), log10(col("p")).as("v"))
    // keep the caller's grid values as the output freq axis: a
    // pow(10, log10(f)) round-trip would perturb the key by an ulp
    val q = grid.select(col("channel"), col("freq"), log10(col("freq")).as("t"))
    val res = graft.ops.Interp.interp1d(src, q.select("channel", "t"), "linear", boundsError)
    val out = res.join(q, Seq("channel", "t"))
      .select(col("channel"), col("freq"), pow(lit(10.0), col("v")).as("p"))
    copy(df = out, name = s"interp($name)")
  }

  /** Interpolate onto a new per-channel frequency grid
    * (`extension.py:167-199`), linear family kinds. Default
    * `boundsError = true` is scipy parity (`extension.py:992` leaves
    * scipy's bounds_error=True default): out-of-range grid points
    * raise; pass false for the engine-level NULL-fill contract.
    */
  def interp1d(grid: DataFrame, kind: String = "linear",
               boundsError: Boolean = true): Spectrum = {
    val src = df.select(col("channel"), col("freq").as("t"), col("p").as("v"))
    val q = grid.select(col("channel"), col("freq").as("t"))
    val res = graft.ops.Interp.interp1d(src, q, kind, boundsError)
      .select(col("channel"), col("t").as("freq"), col("v").as("p"))
    copy(df = res, name = s"interp($name)")
  }
}
