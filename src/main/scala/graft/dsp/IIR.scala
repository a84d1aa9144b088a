package graft.dsp

/** IIR filter application: direct-form-II-transposed `lfilter`,
  * steady-state initial conditions (`lfilter_zi`), and zero-phase
  * forward-backward filtering (`filtfilt` with odd extension padding) —
  * behavioral parity with the scipy functions the reference calls at
  * `extension.py:493,535,563` and `tools.py:372`.
  */
object IIR {

  /** Solve the dense linear system M x = rhs (Gaussian elimination with
    * partial pivoting). Small systems only (filter order).
    */
  def solve(mIn: Array[Array[Double]], rhsIn: Array[Double]): Array[Double] = {
    val n = rhsIn.length
    val m = mIn.map(_.clone())
    val rhs = rhsIn.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var row = col + 1
      while (row < n) {
        if (math.abs(m(row)(col)) > math.abs(m(piv)(col))) piv = row
        row += 1
      }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val tr = rhs(col); rhs(col) = rhs(piv); rhs(piv) = tr
      require(m(col)(col) != 0.0, "singular system in lfilter_zi")
      row = col + 1
      while (row < n) {
        val f = m(row)(col) / m(col)(col)
        var j = col
        while (j < n) { m(row)(j) -= f * m(col)(j); j += 1 }
        rhs(row) -= f * rhs(col)
        row += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = rhs(i)
      var j = i + 1
      while (j < n) { s -= m(i)(j) * x(j); j += 1 }
      x(i) = s / m(i)(i)
      i -= 1
    }
    x
  }

  // package-visible: OracleDsp replays the recurrence bit-for-bit and
  // must use the SAME normalization doubles
  private[graft] def normalized(b: Array[Double], a: Array[Double]): (Array[Double], Array[Double]) = {
    val n = math.max(b.length, a.length)
    val bp = Array.tabulate(n)(i => if (i < b.length) b(i) / a(0) else 0.0)
    val ap = Array.tabulate(n)(i => if (i < a.length) a(i) / a(0) else 0.0)
    (bp, ap)
  }

  /** One-directional IIR filter, direct form II transposed, zero initial
    * state (scipy.signal.lfilter).
    */
  def lfilter(b: Array[Double], a: Array[Double], x: Array[Double]): Array[Double] =
    lfilterWithState(b, a, x, null)._1

  /** lfilter with explicit initial state zi (length max(len(a),len(b))-1
    * or null for zeros). Returns (y, final state).
    */
  def lfilterWithState(b0: Array[Double], a0: Array[Double], x: Array[Double],
                       zi: Array[Double]): (Array[Double], Array[Double]) = {
    val (b, a) = normalized(b0, a0)
    val n = b.length
    val z = if (zi == null) new Array[Double](math.max(n - 1, 0)) else zi.clone()
    val y = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      val xi = x(i)
      val yi = if (n > 1) b(0) * xi + z(0) else b(0) * xi
      var j = 0
      while (j < n - 2) {
        z(j) = b(j + 1) * xi + z(j + 1) - a(j + 1) * yi
        j += 1
      }
      if (n > 1) z(n - 2) = b(n - 1) * xi - a(n - 1) * yi
      y(i) = yi
      i += 1
    }
    (y, z)
  }

  /** Steady-state initial conditions for a step input
    * (scipy.signal.lfilter_zi): solves (I - A^T) zi = B with the
    * direct-form-II-transposed state matrix.
    */
  def lfilterZi(b0: Array[Double], a0: Array[Double]): Array[Double] = {
    val (b, a) = normalized(b0, a0)
    val n = b.length - 1
    if (n == 0) return Array.empty
    // companion(a).T : first column = -a[1..], superdiagonal identity
    val iMinusA = Array.tabulate(n, n) { (i, j) =>
      val comp =
        if (j == 0) -a(i + 1)
        else if (i + 1 == j) 1.0
        else 0.0
      (if (i == j) 1.0 else 0.0) - comp
    }
    val bSum = Array.tabulate(n)(i => b(i + 1) - a(i + 1) * b(0))
    solve(iMinusA, bSum)
  }

  /** Zero-phase forward-backward filter, scipy.signal.filtfilt defaults
    * (padtype='odd', padlen = 3*max(len(a), len(b))).
    */
  def filtfilt(b: Array[Double], a: Array[Double], x: Array[Double]): Array[Double] = {
    val ntaps = math.max(a.length, b.length)
    val padlen = 3 * ntaps
    require(x.length > padlen,
      s"The length of the input vector x must be greater than padlen, which is $padlen.")
    val n = x.length
    // odd extension at both ends
    val ext = new Array[Double](n + 2 * padlen)
    var i = 0
    while (i < padlen) {
      ext(i) = 2 * x(0) - x(padlen - i)
      ext(padlen + n + i) = 2 * x(n - 1) - x(n - 2 - i)
      i += 1
    }
    System.arraycopy(x, 0, ext, padlen, n)
    val zi = lfilterZi(b, a)
    val ziFwd = zi.map(_ * ext(0))
    val (fwd, _) = lfilterWithState(b, a, ext, ziFwd)
    val rev = fwd.reverse
    val ziBwd = zi.map(_ * rev(0))
    val (bwd, _) = lfilterWithState(b, a, rev, ziBwd)
    val out = bwd.reverse
    out.slice(padlen, padlen + n)
  }
}
