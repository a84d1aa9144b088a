package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dsp._

/** Analytic unit tests for the pure-math DSP kernels (SURVEY §5
  * layer 1): closed-form truths, textbook coefficient values, and the
  * ASTM E1049-85 worked rainflow example.
  */
class DspSpec extends AnyFunSuite {

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; j <- 0 until n) {
      val a = -2 * math.Pi * k * j / n
      re(k) += x(j) * math.cos(a)
      im(k) += x(j) * math.sin(a)
    }
    (re, im)
  }

  test("FFT matches naive DFT for power-of-2 and Bluestein sizes") {
    for (n <- Seq(16, 12, 37, 100)) {
      val x = Array.tabulate(n)(i => math.sin(0.7 * i) + 0.3 * math.cos(2.1 * i + 1))
      val (er, ei) = naiveDft(x)
      val (fr, fi) = FFT.fft(x, new Array[Double](n))
      for (k <- 0 until n) {
        assert(math.abs(fr(k) - er(k)) < 1e-8, s"n=$n k=$k re")
        assert(math.abs(fi(k) - ei(k)) < 1e-8, s"n=$n k=$k im")
      }
    }
  }

  test("rfft of impulse is flat") {
    val x = new Array[Double](8)
    x(0) = 1.0
    val (re, im) = FFT.rfft(x)
    assert(re.length == 5)
    re.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
    im.foreach(v => assert(math.abs(v) < 1e-12))
  }

  test("butter(2, 0.5, lowpass) matches the textbook coefficients") {
    val (b, a) = FilterDesign.butter(2, 0.5, "lowpass")
    val eb = Array(0.2928932188134524, 0.5857864376269048, 0.2928932188134524)
    val ea = Array(1.0, 0.0, 0.1715728752538099)
    b.zip(eb).foreach { case (x, e) => assert(math.abs(x - e) < 1e-12) }
    a.zip(ea).foreach { case (x, e) => assert(math.abs(x - e) < 1e-12) }
  }

  test("butterworth frequency response: -3 dB at cutoff, unity in band") {
    for (order <- Seq(2, 4, 6); wn <- Seq(0.2, 0.5, 0.8)) {
      val (b, a) = FilterDesign.butter(order, wn, "lowpass")
      val dc = FilterDesign.freqzMag(b, a, 0.0)
      val atCut = FilterDesign.freqzMag(b, a, math.Pi * wn)
      assert(math.abs(dc - 1.0) < 1e-9, s"order=$order wn=$wn dc=$dc")
      assert(math.abs(atCut - 1.0 / math.sqrt(2)) < 1e-9, s"order=$order wn=$wn cut=$atCut")
    }
    val (bh, ah) = FilterDesign.butter(3, 0.4, "highpass")
    assert(math.abs(FilterDesign.freqzMag(bh, ah, math.Pi) - 1.0) < 1e-9)
    assert(FilterDesign.freqzMag(bh, ah, 0.0) < 1e-9)
    val (bb, ab) = FilterDesign.butter(2, Array(0.3, 0.6), "bandpass")
    val center = math.Pi * math.sqrt(0.3 * 0.6) // geometric center pre-warp approx
    assert(FilterDesign.freqzMag(bb, ab, 0.0) < 1e-9)
    assert(FilterDesign.freqzMag(bb, ab, math.Pi) < 1e-9)
    assert(FilterDesign.freqzMag(bb, ab, center) > 0.8)
    val (bs, as_) = FilterDesign.butter(2, Array(0.3, 0.6), "bandstop")
    assert(math.abs(FilterDesign.freqzMag(bs, as_, 0.0) - 1.0) < 1e-9)
    assert(math.abs(FilterDesign.freqzMag(bs, as_, math.Pi) - 1.0) < 1e-9)
  }

  test("A-weighting gain is ~0 dB at 1 kHz and ~-19.1 dB at 100 Hz (fs=48k)") {
    val fs = 48000.0
    val (b, a) = FilterDesign.aWeighting(fs)
    def dbAt(f: Double) = 20 * math.log10(FilterDesign.freqzMag(b, a, 2 * math.Pi * f / fs))
    assert(math.abs(dbAt(1000.0)) < 0.2)
    assert(math.abs(dbAt(100.0) - -19.1) < 0.5)
    assert(dbAt(20.0) < -40)
  }

  test("CFC filter has unity DC gain") {
    val (b, a) = FilterDesign.cfcCoefficients(1000.0, 1.0 / 20000.0)
    assert(math.abs(FilterDesign.freqzMag(b, a, 0.0) - 1.0) < 1e-9)
  }

  test("lfilter: first-order recursion impulse response is geometric") {
    val y = IIR.lfilter(Array(1.0), Array(1.0, -0.5),
      Array(1.0, 0.0, 0.0, 0.0, 0.0))
    val expect = Array(1.0, 0.5, 0.25, 0.125, 0.0625)
    y.zip(expect).foreach { case (x, e) => assert(math.abs(x - e) < 1e-12) }
  }

  test("lfilter_zi gives steady state: step input has no transient") {
    val (b, a) = FilterDesign.butter(2, 0.3, "lowpass")
    val zi = IIR.lfilterZi(b, a)
    val x = Array.fill(50)(1.0)
    val (y, _) = IIR.lfilterWithState(b, a, x, zi)
    y.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
  }

  test("filtfilt preserves constants and is zero-phase on slow sines") {
    val (b, a) = FilterDesign.butter(2, 0.4, "lowpass")
    val const = Array.fill(100)(3.7)
    IIR.filtfilt(b, a, const).foreach(v => assert(math.abs(v - 3.7) < 1e-8))
    // slow sine passes nearly unchanged and in phase
    val n = 400
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * 0.01 * i))
    val y = IIR.filtfilt(b, a, x)
    var maxErr = 0.0
    for (i <- 50 until n - 50) maxErr = math.max(maxErr, math.abs(y(i) - x(i)))
    assert(maxErr < 1e-3, s"maxErr=$maxErr")
  }

  test("rainflow reproduces the ASTM E1049-85 worked example") {
    val series = Array(-2.0, 1.0, -3.0, 5.0, -1.0, 3.0, -4.0, 4.0, -2.0)
    val counts = Rainflow.countCycles(series).toMap
    val expected = Map(3.0 -> 0.5, 4.0 -> 1.5, 6.0 -> 0.5, 8.0 -> 1.0, 9.0 -> 0.5)
    assert(counts == expected)
  }

  test("srs of a half-sine shock: high-frequency asymptote equals peak accel") {
    val fs = 10000.0
    val dur = 0.011
    val n = 3000
    val t = Array.tabulate(n)(i => i / fs)
    val accel = t.map(ti => if (ti < dur) math.sin(math.Pi * ti / dur) else 0.0)
    val (pos, neg) = Srs.srs(t, accel, Array(2000.0), qualityFactor = 50.0)
    // SDOF much stiffer than the pulse tracks the input peak (1.0)
    assert(math.abs(pos(0) - 1.0) < 0.1, s"pos=${pos(0)} neg=${neg(0)}")
  }

  test("build_freq_array reproduces the reference grid incl. overshoot quirk") {
    val grid = Srs.buildFreqArray()
    assert(grid.length == 81)
    assert(math.abs(grid(0) - 10.0) < 1e-12)
    assert(math.abs(grid(12) - 20.0) < 1e-9) // 12 steps of 2^(1/12) = one octave
    assert(grid.last > 1000.0) // the documented overshoot
    assert(math.abs(grid.last - 10.0 * math.pow(2.0, 80.0 / 12.0)) < 1e-9)
  }

  test("samplerate: uniform, jittered, and integer-snap behavior") {
    val uniform = Array.tabulate(1000)(i => i / 48000.0)
    assert(SigMath.samplerate(uniform).contains(48000.0))
    val slow = Array.tabulate(100)(i => i * 2.0) // 0.5 Hz, below snap floor
    assert(SigMath.samplerate(slow).contains(0.5))
    // Reference quirk (extension.py:282-291): max_sr = 1/max(diff) is
    // SMALLER than min_sr = 1/min(diff), so sr_error is always <= 0 and
    // the variable-rate None path never fires; a jittered ~1 Hz signal
    // still snaps to the integer mean rate. We port this literally.
    val rng = new scala.util.Random(7)
    val jit = Array.tabulate(100)(i => i * 1.0 + rng.nextDouble() * 0.3)
    assert(SigMath.samplerate(jit.sorted).contains(1.0))
  }

  test("periodogram: Parseval and peak bin for a pure sine") {
    val fs = 48000.0
    val f0 = 1000.0
    val n = 4800
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * f0 * i / fs))
    val (f, p) = Spectral.periodogram(x, fs, "boxcar", "constant")
    val df = fs / n
    val ms = p.sum * df // integral of one-sided PSD ~ mean square
    assert(math.abs(ms - 0.5) < 1e-6, s"ms=$ms")
    val peak = f(p.indexOf(p.max))
    assert(math.abs(peak - f0) < df)
  }

  test("rms of flat PSD: linear and log-log integration agree") {
    val freq = Array(10.0, 12.0, 15.0, 20.0)
    val power = Array(2.0, 2.0, 2.0, 2.0)
    val rmsLin = Spectral.rmsPsdLinear(power, freq)
    val rmsLog = Spectral.rmsPsdLoglog(power, freq)
    assert(math.abs(rmsLin - math.sqrt(20.0)) < 1e-12)
    assert(math.abs(rmsLog - math.sqrt(20.0)) < 1e-9)
  }

  test("interp1d kinds on a known grid") {
    val x = Array(0.0, 1.0, 2.0, 4.0)
    val y = Array(0.0, 10.0, 20.0, 40.0)
    val q = Array(0.5, 1.0, 3.0)
    assert(SigMath.interp1d(x, y, q, "linear").sameElements(Array(5.0, 10.0, 30.0)))
    assert(SigMath.interp1d(x, y, q, "previous").sameElements(Array(0.0, 10.0, 20.0)))
    assert(SigMath.interp1d(x, y, q, "next").sameElements(Array(10.0, 10.0, 40.0)))
    assert(SigMath.interp1d(x, y, Array(0.5), "nearest").sameElements(Array(0.0)))
    assert(SigMath.interp1d(x, y, Array(0.5), "nearest-up").sameElements(Array(10.0)))
    intercept[IllegalArgumentException](SigMath.interp1d(x, y, Array(5.0), "linear"))
  }

  test("arange matches numpy's half-open contract") {
    assert(SigMath.arange(0.0, 1.0, 0.25).sameElements(Array(0.0, 0.25, 0.5, 0.75)))
    assert(SigMath.arange(0.0, 1.01, 0.25).length == 5)
  }
}
