package graft.dsp

/** FFT from scratch (zero external deps): iterative radix-2
  * Cooley–Tukey for power-of-2 sizes, Bluestein's chirp-z algorithm for
  * arbitrary sizes. Parity target: `numpy.fft.rfft` as used by
  * `scipy.signal.periodogram` (reference `tools.py:72`,
  * `extension.py:611`).
  */
object FFT {

  /** In-place complex FFT for power-of-2 n (radix-2 Cooley–Tukey). */
  def fftPow2(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"fftPow2 needs power-of-2 length, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      val half = len >> 1
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < half) {
          val ur = re(blk + k); val ui = im(blk + k)
          val xr = re(blk + k + half); val xi = im(blk + k + half)
          val vr = xr * cr - xi * ci
          val vi = xr * ci + xi * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + half) = ur - vr; im(blk + k + half) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
    if (inverse) {
      var k = 0
      while (k < n) { re(k) /= n; im(k) /= n; k += 1 }
    }
  }

  /** Complex DFT of arbitrary length (Bluestein when n is not 2^k).
    * Returns new arrays; inputs untouched.
    */
  def fft(reIn: Array[Double], imIn: Array[Double]): (Array[Double], Array[Double]) = {
    val n = reIn.length
    if (n == 0) return (Array.empty, Array.empty)
    if ((n & (n - 1)) == 0) {
      val r = reIn.clone(); val i = imIn.clone()
      fftPow2(r, i, inverse = false)
      (r, i)
    } else bluestein(reIn, imIn)
  }

  private def bluestein(x: Array[Double], y: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    var m = 1
    while (m < 2 * n - 1) m <<= 1
    // chirp w_k = exp(-i*pi*k^2/n); use k^2 mod 2n to keep the angle small
    val cr = new Array[Double](n)
    val ci = new Array[Double](n)
    var k = 0
    while (k < n) {
      val ang = math.Pi * ((k.toLong * k) % (2L * n)).toDouble / n
      cr(k) = math.cos(ang)
      ci(k) = -math.sin(ang)
      k += 1
    }
    val ar = new Array[Double](m)
    val ai = new Array[Double](m)
    k = 0
    while (k < n) {
      ar(k) = x(k) * cr(k) - y(k) * ci(k)
      ai(k) = x(k) * ci(k) + y(k) * cr(k)
      k += 1
    }
    val br = new Array[Double](m)
    val bi = new Array[Double](m)
    br(0) = cr(0); bi(0) = -ci(0)
    k = 1
    while (k < n) {
      br(k) = cr(k); bi(k) = -ci(k)
      br(m - k) = cr(k); bi(m - k) = -ci(k)
      k += 1
    }
    fftPow2(ar, ai, inverse = false)
    fftPow2(br, bi, inverse = false)
    k = 0
    while (k < m) {
      val rr = ar(k) * br(k) - ai(k) * bi(k)
      ai(k) = ar(k) * bi(k) + ai(k) * br(k)
      ar(k) = rr
      k += 1
    }
    fftPow2(ar, ai, inverse = true)
    val outR = new Array[Double](n)
    val outI = new Array[Double](n)
    k = 0
    while (k < n) {
      outR(k) = ar(k) * cr(k) - ai(k) * ci(k)
      outI(k) = ar(k) * ci(k) + ai(k) * cr(k)
      k += 1
    }
    (outR, outI)
  }

  /** Real-input FFT returning the n/2+1 non-negative-frequency bins
    * (numpy.fft.rfft contract).
    */
  def rfft(xs: Array[Double]): (Array[Double], Array[Double]) = {
    val n = xs.length
    val (re, im) = fft(xs, new Array[Double](n))
    val half = n / 2 + 1
    (re.take(half), im.take(half))
  }

  /** numpy.fft.rfftfreq(n, d=1/fs). */
  def rfftfreq(n: Int, fs: Double): Array[Double] =
    Array.tabulate(n / 2 + 1)(k => k * fs / n)
}
