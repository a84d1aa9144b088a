package graft.ops

import org.apache.spark.sql.DataFrame
import graft.dsp._

/** DataFrame-level wrappers for the sequential per-channel operators:
  * zero-phase IIR filtering (`extension.py:452-567`), shock response
  * spectra (`tools.py:304-376`), and rainflow counting
  * (`extension.py:936-961`). All run through the PerChannel
  * secondary-sort harness — parallel across channels, sequential (as
  * the math demands) within one.
  */
object Kernels {

  private def srOrThrow(ch: String, ts: Array[Double]): Double =
    SigMath.samplerate(ts).getOrElse(
      throw new IllegalStateException(
        s"channel '$ch' has a variable sample rate; resample() it before filtering"))

  /** Butterworth zero-phase filter (`extension.py:452-497`): order is
    * halved (ceil'd) because filtfilt doubles it; cutoff(s) in Hz,
    * normalized by the per-channel Nyquist.
    */
  def filtButter(df: DataFrame, cutoff: Seq[Double], order: Int, btype: String): DataFrame =
    PerChannel.transformSamples(df) { (ch, ts, vs) =>
      val sr = srOrThrow(ch, ts)
      val nyq = 0.5 * sr
      val orderUsed = math.ceil(order / 2.0).toInt
      val wn = cutoff.map(_ / nyq).toArray
      val (b, a) = FilterDesign.butter(orderUsed, wn, btype)
      (ts, IIR.filtfilt(b, a, vs))
    }

  /** SAE J211 CFC zero-phase filter (`extension.py:499-539`). */
  def filtCfc(df: DataFrame, cfc: Double): DataFrame =
    PerChannel.transformSamples(df) { (ch, ts, vs) =>
      val sr = srOrThrow(ch, ts)
      val (b, a) = FilterDesign.cfcCoefficients(cfc, 1.0 / sr)
      (ts, IIR.filtfilt(b, a, vs))
    }

  /** IEC 1672 A-weighting, single forward pass (`extension.py:541-567`
    * uses lfilter, not filtfilt).
    */
  def filtA(df: DataFrame): DataFrame =
    PerChannel.transformSamples(df) { (ch, ts, vs) =>
      val sr = srOrThrow(ch, ts)
      val (b, a) = FilterDesign.aWeighting(sr)
      (ts, IIR.lfilter(b, a, vs))
    }

  /** Shock response spectrum per channel (`extension.py:627-662`,
    * `tools.py:304-376`): rows (channel, freq, p) where p =
    * max(pos, |neg|) response. Each channel's frequency sweep runs in
    * its own task; for few-channel/many-frequency workloads the scale
    * axis is frequency chunking (documented v2).
    */
  def srs(df: DataFrame, freq: Array[Double] = null, qualityFactor: Double = 50.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val grid = if (freq == null) Srs.buildFreqArray() else freq
    PerChannel.transform[(String, Double, Double)](df) { (ch, ts, vs) =>
      val (pos, neg) = Srs.srs(ts, vs, grid, qualityFactor)
      Iterator.tabulate(grid.length)(i => (ch, grid(i), math.max(pos(i), neg(i))))
    }.toDF("channel", "freq", "p")
  }

  /** Frequency-parallel SRS: each natural frequency's SDOF filter is
    * an independent sequential pass (reference loop `tools.py:371-374`)
    * — so frequency is the natural distribution axis when channels are
    * few and grids are large. The signal is replicated per frequency
    * chunk via explode (duplication factor = nChunks), then each
    * (channel, chunk) task sweeps only its slice of the grid.
    */
  def srsParallel(df: DataFrame, freq: Array[Double], qualityFactor: Double = 50.0,
                  freqChunk: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val nChunks = math.max(1, (freq.length + freqChunk - 1) / freqChunk)
    val chunks = spark.sparkContext.broadcast(freq.grouped(freqChunk).toArray)
    val replicated = df.select(col("channel"),
      explode(sequence(lit(0), lit(nChunks - 1))).as("chunk"), col("t"), col("v"))
    PerChannel.transformChunked[(String, Double, Double)](replicated) { (ch, chunk, ts, vs) =>
      val grid = chunks.value(chunk)
      val (pos, neg) = Srs.srs(ts, vs, grid, qualityFactor)
      Iterator.tabulate(grid.length)(i => (ch, grid(i), math.max(pos(i), neg(i))))
    }.toDF("channel", "freq", "p")
  }

  /** Rainflow cycle counting per channel (`extension.py:936-961`):
    * rows (channel, rng, cycles), the Generator/UDTF shape.
    */
  def rainflow(df: DataFrame, ndigits: Option[Int] = None, nbins: Option[Int] = None,
               binsize: Option[Double] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    PerChannel.transform[(String, Double, Double)](df) { (ch, _, vs) =>
      Rainflow.countCycles(vs, ndigits, nbins, binsize).iterator.map { case (r, c) => (ch, r, c) }
    }.toDF("channel", "rng", "cycles")
  }

  /** The SRS summarize stage as a pure aggregation: p = max(pos, |neg|)
    * = max over samples of max(resp, -resp), per (channel, freq)
    * (`tools.py:373-374`) — factored out of the array kernel so a
    * per-sample response table computed distributedly (one row per
    * (channel, freq, sample)) reduces with a map-side-combinable
    * groupBy instead of a sequential sweep.
    */
  def srsReduce(responses: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    responses.groupBy("channel", "freq")
      .agg(greatest(max(col("resp")), max(-col("resp"))).as("p"))
  }

  /** The rainflow binning/keying stage over an already-counted cycles
    * table (channel, rng, cycles): `nbins` equal-width bins of each
    * channel's max range, or a fixed `binsize`, keyed by the bin's
    * upper edge with empty-range cycles forced into bin 1 — the
    * distributed form of `Rainflow.countCycles`'s binning kwargs
    * (`extension.py:944-959`, PyPI rainflow contract).
    */
  def rainflowBin(cycles: DataFrame, nbins: Option[Int] = None,
                  binsize: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val size = (nbins, binsize) match {
      case (Some(nb), _) => max(col("rng")).over(Window.partitionBy("channel")) / lit(nb)
      case (_, Some(s)) => lit(s)
      case _ => throw new IllegalArgumentException("rainflowBin needs nbins or binsize")
    }
    cycles.withColumn("size", size)
      .withColumn("bin", greatest(ceil(col("rng") / col("size")), lit(1L)))
      .groupBy(col("channel"), (col("bin") * col("size")).as("rng"))
      .agg(sum("cycles").as("cycles"))
  }
}
