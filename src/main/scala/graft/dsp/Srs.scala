package graft.dsp

/** Shock response spectrum via the Smallwood ramp-invariant recursive
  * filter (public method: D. Smallwood, "An Improved Recursive Formula
  * for Calculating Shock Response Spectra"). Behavioral parity with the
  * reference's `tools.py:304-376`.
  */
object Srs {

  /** Smallwood SDOF filter coefficients for natural frequency fn at
    * sample interval t and damping ratio damp. Returns (b, a).
    */
  def coefficients(fn: Double, t: Double, damp: Double): (Array[Double], Array[Double]) = {
    val omegaN = 2.0 * math.Pi * fn
    val omegaD = omegaN * math.sqrt(1 - damp * damp)
    val e = math.exp(-damp * omegaN * t)
    val k = t * omegaD
    val c = e * math.cos(k)
    val s = e * math.sin(k)
    val sPrime = s / k
    val b = Array(1.0 - sPrime, 2.0 * (sPrime - c), e * e - sPrime)
    val a = Array(1.0, -2.0 * c, e * e)
    (b, a)
  }

  /** Max positive / |max negative| SDOF response at each natural
    * frequency. Sample interval = mean(diff(time)) exactly as the
    * reference (`tools.py:351`).
    */
  def srs(time: Array[Double], accel: Array[Double], fnArray: Array[Double],
          qualityFactor: Double = 50.0): (Array[Double], Array[Double]) = {
    val damp = 1.0 / (2.0 * qualityFactor)
    var dtSum = 0.0
    var i = 1
    while (i < time.length) { dtSum += time(i) - time(i - 1); i += 1 }
    val t = dtSum / (time.length - 1)
    val pos = new Array[Double](fnArray.length)
    val neg = new Array[Double](fnArray.length)
    i = 0
    while (i < fnArray.length) {
      val (b, a) = coefficients(fnArray(i), t, damp)
      val y = IIR.lfilter(b, a, accel)
      var mx = Double.NegativeInfinity
      var mn = Double.PositiveInfinity
      var j = 0
      while (j < y.length) {
        if (y(j) > mx) mx = y(j)
        if (y(j) < mn) mn = y(j)
        j += 1
      }
      pos(i) = mx
      neg(i) = math.abs(mn)
      i += 1
    }
    (pos, neg)
  }

  /** Octave-stepped natural-frequency grid — exact port of the
    * reference's loop semantics including the "last point may exceed
    * fn_end" quirk (`tools.py:379-413`).
    */
  def buildFreqArray(fnStart: Double = 10.0, fnEnd: Double = 1000.0,
                     octStepSize: Double = 1.0 / 12.0): Array[Double] = {
    val buf = scala.collection.mutable.ArrayBuffer(fnStart)
    var fn = fnStart
    val iterations = (fnEnd - fnStart).toInt
    var i = 0
    var done = false
    while (i < iterations && !done) {
      val next = fn * math.pow(2.0, octStepSize)
      buf += next
      fn = next
      if (fn > fnEnd) done = true
      i += 1
    }
    buf.toArray
  }
}
