package graft.dsp

/** IIR filter design from public textbook formulas: Butterworth
  * analog prototype + frequency transform + bilinear transform
  * (behavioral parity with `scipy.signal.butter`, used by the reference
  * at `extension.py:486`), IEC 1672 A-weighting analog spec + bilinear
  * (reference `tools.py:257-301`), and the SAE J211 channel-frequency-
  * class 2-pole coefficients (reference `extension.py:516-528`).
  */
object FilterDesign {

  /** Real-coefficient polynomial multiply (numpy.polymul contract,
    * highest degree first).
    */
  def polymul(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length + b.length - 1)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        out(i + j) += a(i) * b(j)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Bilinear transform of an analog transfer function b(s)/a(s) to the
    * digital domain at sample rate fs, substituting
    * s = 2*fs*(z-1)/(z+1) (scipy.signal.bilinear contract: returns
    * (bz, az) normalized so az(0)=1).
    */
  def bilinear(b: Array[Double], a: Array[Double], fs: Double): (Array[Double], Array[Double]) = {
    val degN = b.length - 1
    val degD = a.length - 1
    val m = math.max(degN, degD)
    def transform(coeffs: Array[Double], deg: Int): Array[Double] = {
      // sum_k c_k * s^(deg-k) with s^p -> (2fs)^p (z-1)^p (z+1)^(m-p)
      val acc = new Array[Double](m + 1)
      var k = 0
      while (k < coeffs.length) {
        val p = deg - k
        var term = Array(math.pow(2.0 * fs, p) * coeffs(k))
        var i = 0
        while (i < p) { term = polymul(term, Array(1.0, -1.0)); i += 1 }
        i = 0
        while (i < m - p) { term = polymul(term, Array(1.0, 1.0)); i += 1 }
        var j = 0
        while (j < acc.length) { acc(j) += term(j); j += 1 }
        k += 1
      }
      acc
    }
    val bz = transform(b, degN)
    val az = transform(a, degD)
    val norm = az(0)
    (bz.map(_ / norm), az.map(_ / norm))
  }

  /** Digital Butterworth design, scipy.signal.butter parity.
    *
    * @param order filter order
    * @param wn    critical frequency/ies normalized to Nyquist (0..1);
    *              one element for low/highpass, two for band types
    * @param btype "lowpass" | "highpass" | "bandpass" | "bandstop"
    * @return (b, a) transfer-function coefficients, a(0)=1
    */
  def butter(order: Int, wn: Array[Double], btype: String): (Array[Double], Array[Double]) = {
    require(order >= 1, "order must be >= 1")
    require(wn.forall(w => w > 0 && w < 1), s"normalized cutoff must be in (0,1), got ${wn.mkString(",")}")
    // analog lowpass prototype: poles on the unit circle, no zeros, k=1
    val protoPoles: Seq[Complex] =
      (1 to order).map(k => -Complex.expi(math.Pi * (2 * k - 1) / (2.0 * order) - math.Pi / 2))
    // scipy uses fs=2 internally: warped = 2*fs*tan(pi*wn/fs)
    val fs = 2.0
    val warped = wn.map(w => 2.0 * fs * math.tan(math.Pi * w / fs))

    var zeros: Seq[Complex] = Nil
    var poles: Seq[Complex] = protoPoles
    var gain: Double = 1.0

    btype match {
      case "lowpass" | "low" =>
        val wo = warped(0)
        poles = poles.map(_ * wo)
        gain *= math.pow(wo, poles.length - zeros.length)
      case "highpass" | "high" =>
        val wo = warped(0)
        val degree = poles.length - zeros.length
        val newPoles = poles.map(p => Complex.real(wo) / p)
        // prod(-p)/prod(-z) is real for a real filter
        gain *= Complex.prod(poles.map(p => -p)).re
        zeros = Seq.fill(degree)(Complex.zero)
        poles = newPoles
      case "bandpass" | "band" =>
        require(warped.length == 2, "bandpass needs [low, high] cutoffs")
        val bw = warped(1) - warped(0)
        val wo = math.sqrt(warped(0) * warped(1))
        val degree = poles.length - zeros.length
        val scaled = poles.map(_ * (bw / 2))
        poles = scaled.flatMap { p =>
          val d = (p * p - Complex.real(wo * wo)).sqrt
          Seq(p + d, p - d)
        }
        zeros = Seq.fill(degree)(Complex.zero)
        gain *= math.pow(bw, degree)
      case "bandstop" | "stop" =>
        require(warped.length == 2, "bandstop needs [low, high] cutoffs")
        val bw = warped(1) - warped(0)
        val wo = math.sqrt(warped(0) * warped(1))
        val inv = poles.map(p => Complex.real(bw / 2) / p)
        val newPoles = inv.flatMap { p =>
          val d = (p * p - Complex.real(wo * wo)).sqrt
          Seq(p + d, p - d)
        }
        gain *= (Complex.prod(poles.map(p => -p)) / Complex.prod(zeros.map(z => -z))).re
        zeros = (1 to poles.length).flatMap(_ => Seq(Complex(0, wo), Complex(0, -wo)))
        poles = newPoles
      case other => throw new IllegalArgumentException(s"unknown btype: $other")
    }

    // bilinear transform of the zpk system (scipy.signal.bilinear_zpk)
    val fs2 = 2.0 * fs
    val zd = zeros.map(z => (Complex.real(fs2) + z) / (Complex.real(fs2) - z))
    val pd = poles.map(p => (Complex.real(fs2) + p) / (Complex.real(fs2) - p))
    val kd = gain * (Complex.prod(zeros.map(z => Complex.real(fs2) - z)) /
      Complex.prod(poles.map(p => Complex.real(fs2) - p))).re
    val zdFull = zd ++ Seq.fill(poles.length - zeros.length)(Complex.real(-1.0))

    val bPoly = Complex.polyFromRoots(zdFull).map(_.re * kd)
    val aPoly = Complex.polyFromRoots(pd).map(_.re)
    (bPoly, aPoly)
  }

  def butter(order: Int, wn: Double, btype: String): (Array[Double], Array[Double]) =
    butter(order, Array(wn), btype)

  /** IEC 1672 A-weighting digital filter for sample rate fs
    * (reference `tools.py:257-301`; analog pole/zero constants are the
    * public IEC spec).
    */
  def aWeighting(fs: Double): (Array[Double], Array[Double]) = {
    val f1 = 20.598997
    val f2 = 107.65265
    val f3 = 737.86223
    val f4 = 12194.217
    val a1000 = 1.9997
    val pi = math.Pi
    val nums = Array(math.pow(2 * pi * f4, 2) * math.pow(10, a1000 / 20), 0.0, 0.0, 0.0, 0.0)
    var dens = polymul(
      Array(1.0, 4 * pi * f4, math.pow(2 * pi * f4, 2)),
      Array(1.0, 4 * pi * f1, math.pow(2 * pi * f1, 2)))
    dens = polymul(polymul(dens, Array(1.0, 2 * pi * f3)), Array(1.0, 2 * pi * f2))
    bilinear(nums, dens, fs)
  }

  /** SAE J211 channel-frequency-class 2-pole filter coefficients for
    * class `cfc` at time step `dt` (reference `extension.py:516-528`).
    * Returns (b, a) in scipy convention, a(0)=1.
    */
  def cfcCoefficients(cfc: Double, dt: Double): (Array[Double], Array[Double]) = {
    val wd = 2 * math.Pi * cfc * 2.0775
    val wa = math.sin(wd * dt / 2) / math.cos(wd * dt / 2)
    val sq2 = math.sqrt(2.0)
    val a0 = (wa * wa) / (1 + sq2 * wa + wa * wa)
    val a1 = 2 * a0
    val a2 = a0
    val b0 = 1.0
    val b1 = -2 * (wa * wa - 1) / (1 + sq2 * wa + wa * wa)
    val b2 = (-1 + sq2 * wa - wa * wa) / (1 + sq2 * wa + wa * wa)
    (Array(a0, a1, a2), Array(b0, -b1, -b2))
  }

  /** Magnitude of the digital transfer function b/a at normalized
    * frequency w (radians/sample) — test/diagnostic helper.
    */
  def freqzMag(b: Array[Double], a: Array[Double], w: Double): Double = {
    def evalPoly(c: Array[Double]): Complex = {
      // c(0)*z^0 + c(1)*z^-1 + ... evaluated at z = e^{iw}
      var acc = Complex.zero
      var k = 0
      while (k < c.length) {
        acc += Complex.expi(-w * k) * c(k)
        k += 1
      }
      acc
    }
    (evalPoly(b) / evalPoly(a)).abs
  }
}
