package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dsp.Spectral

/** Distributed spectral estimation (reference `extension.py:569-625`,
  * `tools.py:13-100`).
  *
  * Welch's method is "mean of modified periodograms" — literally a
  * partial/final aggregation, so the Spark-first shape is:
  *
  *   1. per-channel params (sample rate, window/overlap sizes) — one
  *      small aggregate, broadcast back;
  *   2. assign each sample to its overlapping segment ids with
  *      explode(sequence(...)) — the batch analog of sliding windows,
  *      duplicating data only by the overlap factor (2x at 0.5);
  *   3. one FFT task per (channel, segment) — parallelism scales with
  *      segments, not channels;
  *   4. summarize = groupBy(channel, freq) aggregates (mean/median/
  *      max/min) or a two-level aggregate for the 'max rms'/'damage'
  *      rescale modes.
  */
object Psd {

  // NOT private: Catalyst's generated encoder projections need public
  // access to these row classes
  case class SegRow(channel: String, w: Long, idx: Long, v: Double,
                    sr: Double, nWindow: Int)
  case class PsdRmsRow(channel: String, w: Long, freq: Double, p: Double, segRms: Double)

  private def chw = Window.partitionBy("channel").orderBy("t")

  /** Per-channel constant-rate params; throws if any channel is
    * variable-rate (mirrors the reference, whose samplerate-dependent
    * ops cannot run there either).
    */
  private def withParams(df: DataFrame, windowLength: Double, overlap: Double): DataFrame = {
    val sig = graft.signal.Signal(df)
    val params = sig.samplerate()
      .select(col("channel"), col("samplerate"))
      // NULL samplerate (variable-rate channel) must FAIL here, not
      // null-propagate into the segment filter and silently drop the
      // channel from the PSD
      .withColumn("nWindow", when(col("samplerate").isNull,
          raise_error(concat(lit("channel '"), col("channel"),
            lit("' has a variable sample rate; resample() it before PSD"))).cast("int"))
        .otherwise((col("samplerate") * lit(windowLength)).cast("int")))
      .withColumn("nOverlap", bround(col("nWindow") * lit(overlap)).cast("int"))
      .withColumn("step", col("nWindow") - col("nOverlap"))
    df.join(broadcast(params), Seq("channel"))
  }

  /** Overlapping-segment assignment (the batch analog of sliding
    * windows): each sample lands in segments wLo..wHi via
    * explode(sequence), duplicating data only by the overlap factor.
    */
  private def segmented(df: DataFrame, windowLength: Double,
                        overlap: Double): Dataset[SegRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    withParams(df, windowLength, overlap)
      .withColumn("rn", row_number().over(chw).cast("long") - 1)
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("channel")))
      .withColumn("nSegs", floor((col("cnt") - col("nOverlap")) / col("step")))
      .withColumn("wLo", greatest(lit(0L),
        ceil((col("rn") - col("nWindow") + 1) / col("step")).cast("long")))
      .withColumn("wHi", least(col("nSegs") - 1, floor(col("rn") / col("step")).cast("long")))
      .filter(col("wLo") <= col("wHi"))
      .select(col("channel"), explode(sequence(col("wLo"), col("wHi"))).as("w"),
        col("rn"), col("v"), col("samplerate").as("sr"), col("nWindow"), col("step"))
      .select(col("channel"), col("w"), (col("rn") - col("w") * col("step")).as("idx"),
        col("v"), col("sr"), col("nWindow"))
      .as[SegRow]
  }

  /** Whole-series periodogram per channel — the window_length=None path
    * of `get_psd` (`extension.py:610-611`): one FFT task per channel.
    * Returns (channel, freq, p) including the DC bin.
    */
  def periodogram(df: DataFrame, detrend: String = "constant"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    PerChannel.transform[(String, Double, Double)](df) { (ch, ts, vs) =>
      val sr = graft.dsp.SigMath.samplerate(ts).getOrElse(
        throw new IllegalStateException(s"channel '$ch' has a variable sample rate"))
      val (f, p) = Spectral.periodogram(vs, sr, "boxcar", detrend)
      Iterator.tabulate(f.length)(i => (ch, f(i), p(i)))
    }.toDF("channel", "freq", "p")
  }

  /** Welch sub-PSDs, distributed over (channel, segment). Returns
    * (channel, w, freq, p) — the summarize='all' shape
    * (`tools.py:83-84`).
    */
  def welchAll(df: DataFrame, windowLength: Double, overlap: Double = 0.5,
               windowType: String = "hann", detrend: String = "constant"): DataFrame =
    // one FFT kernel, one source of truth: the plain view is the
    // seg_rms table minus a column (the per-segment trapezoid is
    // O(freqs) next to the FFT)
    welchAllWithSegRms(df, windowLength, overlap, windowType, detrend).drop("seg_rms")

  /** Like welchAll but each row also carries its segment's whole-PSD
    * trapezoid RMS (`tools.py:85-90`'s per-window rms list), computed
    * inside the FFT task — so the rescale summarize modes need ONE
    * pass over the data instead of re-running the segment pipeline
    * for the sub-RMS branch.
    */
  def welchAllWithSegRms(df: DataFrame, windowLength: Double, overlap: Double = 0.5,
                         windowType: String = "hann", detrend: String = "constant"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = segmented(df, windowLength, overlap)
    prepared.groupByKey(r => (r.channel, r.w)).flatMapGroups { (key: (String, Long), rows: Iterator[SegRow]) =>
      val (ch, w) = key
      val buf = rows.toArray.sortBy(_.idx)
      val sr = buf(0).sr
      val n = buf(0).nWindow
      val vs = new Array[Double](n)
      var i = 0
      while (i < buf.length) { vs(buf(i).idx.toInt) = buf(i).v; i += 1 }
      val (f, p) = Spectral.periodogram(vs, sr, windowType, detrend)
      var trapz = 0.0
      var j = 1
      while (j < f.length) { trapz += (p(j) + p(j - 1)) / 2.0 * (f(j) - f(j - 1)); j += 1 }
      val segRms = math.sqrt(trapz)
      Iterator.tabulate(f.length)(i => PsdRmsRow(ch, w, f(i), p(i), segRms))
    }.toDF("channel", "w", "freq", "p", "seg_rms")
  }

  /** Full Welch estimate with all seven summarize modes
    * (`tools.py:75-98`). Returns (channel, freq, p), or
    * (channel, w, freq, p) for 'all'.
    */
  def welch(df: DataFrame, windowLength: Double, overlap: Double = 0.5,
            windowType: String = "hann", summarize: String = "mean",
            fatigueExponent: Double = 4.0, detrend: String = "constant"): DataFrame =
    summarize match {
      case "max rms" | "damage" =>
        rescale(welchAllWithSegRms(df, windowLength, overlap, windowType, detrend),
          summarize, fatigueExponent)
      case other =>
        summarizeAll(welchAll(df, windowLength, overlap, windowType, detrend), other)
    }

  /** The plain summarize stage over a (precomputed) sub-PSD table
    * (channel, w, freq, p) — callers that run several summarize modes
    * over the same Welch parameters can cache the sub-PSD table and
    * fan these aggregates out from it.
    */
  def summarizeAll(all: DataFrame, summarize: String): DataFrame = summarize match {
    case "all" => all
    case "mean" => all.groupBy("channel", "freq").agg(avg("p").as("p"))
    case "median" =>
      all.groupBy("channel", "freq").agg(percentile(col("p"), lit(0.5)).as("p"))
    case "max" => all.groupBy("channel", "freq").agg(max("p").as("p"))
    case "min" => all.groupBy("channel", "freq").agg(min("p").as("p"))
    case other =>
      throw new IllegalArgumentException(s"$other is not a valid summary type")
  }

  /** The 'max rms' / 'damage' rescale stage over a (precomputed)
    * sub-PSD-with-segment-RMS table (`welchAllWithSegRms` output).
    *
    * ONE pass over the segment pipeline: each FFT task emits its own
    * whole-PSD trapezoid RMS alongside the PSD rows, so the
    * per-window rms list reduces inside the same (channel, freq)
    * aggregate that builds the mean PSD — no second welchAll, no
    * (channel, w) window shuffle. Every w appears once per freq, so
    * max/avg over rows equal max/avg over windows.
    */
  def rescale(all2: DataFrame, summarize: String, fatigueExponent: Double): DataFrame = {
    val perFreq = all2.groupBy("channel", "freq").agg(
      avg("p").as("p"),
      max("seg_rms").as("max_sub_rms"),
      avg(pow(col("seg_rms"), lit(fatigueExponent))).as("mean_rms_pow"))
    val wch = Window.partitionBy("channel").orderBy("freq")
    val wall = Window.partitionBy("channel")
    val seg = (col("p") + lag("p", 1).over(wch)) / 2.0 *
      (col("freq") - lag("freq", 1).over(wch))
    val factor =
      if (summarize == "max rms")
        max("max_sub_rms").over(wall) / col("mean_rms")
      else
        pow(max("mean_rms_pow").over(wall), lit(1.0 / fatigueExponent)) / col("mean_rms")
    perFreq
      .withColumn("seg", seg)
      .withColumn("mean_rms", sqrt(sum("seg").over(wall)))
      .withColumn("factor", factor)
      .select(col("channel"), col("freq"),
        (col("p") * col("factor") * col("factor")).as("p"))
  }

  /** get_psd dispatch (`extension.py:569-625`): periodogram when no
    * window length, else Welch; positive frequencies only.
    */
  def getPsd(df: DataFrame, windowLength: Option[Double] = None, overlap: Double = 0.5,
             windowType: String = "hann", summarize: String = "mean",
             fatigueExponent: Double = 4.0, detrend: String = "constant"): DataFrame = {
    val full = windowLength match {
      case None => periodogram(df, detrend)
      case Some(wl) => welch(df, wl, overlap, windowType, summarize, fatigueExponent, detrend)
    }
    full.filter(col("freq") > 0)
  }
}
