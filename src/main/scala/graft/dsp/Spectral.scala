package graft.dsp

/** Spectral estimation kernels operating on plain arrays: periodogram
  * and Welch segmentation with scipy-parity scaling (reference
  * `extension.py:569-625`, `tools.py:13-100`). These run inside
  * per-channel executor tasks; the DataFrame-level orchestration lives
  * in `graft.ops.Psd`.
  */
object Spectral {

  /** Window coefficient generators, periodic ("fftbins") variants as
    * produced by scipy.signal.get_window (reference `tools.py:72`
    * passes the window name through; default 'hann', `tools.py:13`).
    */
  def window(name: String, n: Int): Array[Double] = name match {
    case "boxcar" => Array.fill(n)(1.0)
    case "hann" | "hanning" =>
      Array.tabulate(n)(k => 0.5 - 0.5 * math.cos(2 * math.Pi * k / n))
    case "hamming" =>
      Array.tabulate(n)(k => 0.54 - 0.46 * math.cos(2 * math.Pi * k / n))
    case "blackman" =>
      Array.tabulate(n)(k =>
        0.42 - 0.5 * math.cos(2 * math.Pi * k / n) + 0.08 * math.cos(4 * math.Pi * k / n))
    case other => throw new IllegalArgumentException(s"unsupported window: $other")
  }

  /** Remove constant (mean) or linear least-squares trend in place —
    * scipy.signal.detrend semantics over one segment
    * (reference `extension.py:777`, `tools.py:72` `detrend=` arg).
    */
  def detrend(y: Array[Double], mode: String): Array[Double] = mode match {
    case "none" | "false" => y
    case "constant" =>
      val m = y.sum / y.length
      y.map(_ - m)
    case "linear" =>
      val n = y.length
      // OLS on x = 0..n-1
      val xm = (n - 1) / 2.0
      var sxy = 0.0
      var sxx = 0.0
      var sy = 0.0
      var i = 0
      while (i < n) {
        sxy += (i - xm) * y(i)
        sxx += (i - xm) * (i - xm)
        sy += y(i)
        i += 1
      }
      val slope = if (sxx == 0) 0.0 else sxy / sxx
      val icept = sy / n - slope * xm
      Array.tabulate(n)(i => y(i) - (icept + slope * i))
    case other => throw new IllegalArgumentException(s"unsupported detrend: $other")
  }

  /** One-sided periodogram of y at sample rate fs with the given window
    * applied after detrending — scipy.signal.periodogram parity:
    * scale = 1/(fs*sum(w^2)); double all bins except DC and (for even
    * n) Nyquist. Returns (freqs, pxx) of length n/2+1.
    */
  def periodogram(yIn: Array[Double], fs: Double, windowName: String = "boxcar",
                  detrendMode: String = "constant"): (Array[Double], Array[Double]) = {
    val n = yIn.length
    val w = window(windowName, n)
    val y = detrend(yIn, detrendMode)
    var i = 0
    val yw = new Array[Double](n)
    var wss = 0.0
    while (i < n) {
      yw(i) = y(i) * w(i)
      wss += w(i) * w(i)
      i += 1
    }
    val (re, im) = FFT.rfft(yw)
    val scale = 1.0 / (fs * wss)
    val half = re.length
    val pxx = new Array[Double](half)
    i = 0
    while (i < half) {
      pxx(i) = (re(i) * re(i) + im(i) * im(i)) * scale
      i += 1
    }
    // one-sided doubling: all bins except DC; except Nyquist when n even
    i = 1
    val last = if (n % 2 == 0) half - 1 else half
    while (i < last) { pxx(i) *= 2; i += 1 }
    (FFT.rfftfreq(n, fs), pxx)
  }

  /** Welch segmentation indices exactly as the reference's stride trick
    * (`tools.py:54-69`): nWindow = floor(fs*windowLength),
    * nOverlap = round(nWindow*overlap), step = nWindow - nOverlap,
    * count = (n - nOverlap) / step (integer division).
    * Returns the start index of each segment.
    */
  def welchStarts(n: Int, nWindow: Int, nOverlap: Int): Array[Int] = {
    val step = nWindow - nOverlap
    require(step > 0, "overlap must leave a positive step")
    val count = (n - nOverlap) / step
    Array.tabulate(math.max(count, 0))(_ * step)
  }

  /** sqrt of the trapezoidal integral of a PSD — np.trapz parity
    * (reference `tools.py:123-143`). Used by the 'max rms' / 'damage'
    * summarize modes.
    */
  def rmsPsdLinear(power: Array[Double], freq: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < freq.length - 1) {
      s += (power(i) + power(i + 1)) / 2.0 * (freq(i + 1) - freq(i))
      i += 1
    }
    math.sqrt(s)
  }

  /** Log-log power-law segment integration with linear fallback —
    * reference `tools.py:146-201`.
    */
  def rmsPsdLoglog(power: Array[Double], freq: Array[Double]): Double = {
    var ms = 0.0
    var i = 0
    while (i < freq.length - 1) {
      val n = math.log10(power(i + 1) / power(i)) / math.log10(freq(i + 1) / freq(i))
      var area =
        if (math.abs(n + 1.0) < 1e-10)
          power(i) * freq(i) * math.log(freq(i + 1) / freq(i))
        else
          (power(i) / math.pow(freq(i), n)) * (1.0 / (n + 1)) *
            (math.pow(freq(i + 1), n + 1) - math.pow(freq(i), n + 1))
      if (area.isNaN || area == 0.0 || area.isInfinite)
        area = (power(i) + power(i + 1)) / 2.0 * (freq(i + 1) - freq(i))
      ms += area
      i += 1
    }
    math.sqrt(ms)
  }
}
