package graft.dsp

/** Minimal complex arithmetic for filter design (pole/zero math).
  * Public-textbook formulas only.
  */
final case class Complex(re: Double, im: Double) {
  def +(o: Complex): Complex = Complex(re + o.re, im + o.im)
  def -(o: Complex): Complex = Complex(re - o.re, im - o.im)
  def *(o: Complex): Complex = Complex(re * o.re - im * o.im, re * o.im + im * o.re)
  def /(o: Complex): Complex = {
    val d = o.re * o.re + o.im * o.im
    Complex((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
  }
  def *(s: Double): Complex = Complex(re * s, im * s)
  def unary_- : Complex = Complex(-re, -im)
  def abs: Double = math.hypot(re, im)
  def sqrt: Complex = {
    val m = math.sqrt(this.abs)
    val a = math.atan2(im, re) / 2.0
    Complex(m * math.cos(a), m * math.sin(a))
  }
}

object Complex {
  val zero: Complex = Complex(0.0, 0.0)
  val one: Complex = Complex(1.0, 0.0)
  def real(x: Double): Complex = Complex(x, 0.0)
  def expi(theta: Double): Complex = Complex(math.cos(theta), math.sin(theta))

  /** Polynomial coefficients (highest degree first) from roots:
    * prod (x - r_k). Same contract as numpy.poly.
    */
  def polyFromRoots(roots: Seq[Complex]): Array[Complex] = {
    var coeffs = Array(Complex.one)
    for (r <- roots) {
      val next = Array.fill(coeffs.length + 1)(Complex.zero)
      var i = 0
      while (i < coeffs.length) {
        next(i) += coeffs(i)
        next(i + 1) -= coeffs(i) * r
        i += 1
      }
      coeffs = next
    }
    coeffs
  }

  def prod(xs: Seq[Complex]): Complex = xs.foldLeft(Complex.one)(_ * _)
}
