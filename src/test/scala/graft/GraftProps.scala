package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.dsp._

/** Property-based tests (SURVEY §5 layer 3) over the pure array-level
  * kernels — the same code the Spark operators execute per channel.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val signalGen: Gen[Array[Double]] =
    Gen.choose(30, 200).flatMap { n =>
      Gen.listOfN(n, Gen.choose(-100.0, 100.0)).map(_.toArray)
    }

  property("filtfilt is linear: filt(a*x) == a*filt(x)") =
    forAll(signalGen, Gen.choose(0.1, 5.0)) { (x, a) =>
      val (b, aa) = FilterDesign.butter(2, 0.4, "lowpass")
      val fx = IIR.filtfilt(b, aa, x)
      val fax = IIR.filtfilt(b, aa, x.map(_ * a))
      fx.zip(fax).forall { case (y1, y2) => math.abs(y1 * a - y2) < 1e-6 * (1 + math.abs(y2)) }
    }

  property("lfilter of sum == sum of lfilters (superposition)") =
    forAll(signalGen, signalGen) { (x0, y0) =>
      val n = math.min(x0.length, y0.length)
      val x = x0.take(n)
      val y = y0.take(n)
      val (b, a) = FilterDesign.butter(3, 0.3, "highpass")
      val fxy = IIR.lfilter(b, a, x.zip(y).map { case (p, q) => p + q })
      val fx = IIR.lfilter(b, a, x)
      val fy = IIR.lfilter(b, a, y)
      fxy.indices.forall(i => math.abs(fxy(i) - (fx(i) + fy(i))) < 1e-8 * (1 + math.abs(fxy(i))))
    }

  property("interp1d is exact at the source points for every kind") =
    forAll(signalGen) { v =>
      val x = v.indices.map(_.toDouble * 0.5).toArray
      Seq("linear", "nearest", "nearest-up", "previous", "next", "zero").forall { kind =>
        SigMath.interp1d(x, v, x, kind).sameElements(v)
      }
    }

  property("linear interp stays within the local bracket range") =
    forAll(signalGen, Gen.choose(0.0, 1.0)) { (v, frac) =>
      v.length >= 2 ==> {
        val x = v.indices.map(_.toDouble).toArray
        val q = Array(frac * (v.length - 1))
        val y = SigMath.interp1d(x, v, q, "linear")(0)
        val lo = q(0).toInt
        val hi = math.min(lo + 1, v.length - 1)
        y >= math.min(v(lo), v(hi)) - 1e-9 && y <= math.max(v(lo), v(hi)) + 1e-9
      }
    }

  property("rainflow counts: total count equals (reversal segments)/2") =
    forAll(signalGen) { v =>
      val revs = Rainflow.reversals(v)
      val total = Rainflow.countCycles(v).map(_._2).sum
      // each adjacent reversal pair contributes exactly one half cycle
      math.abs(total - (revs.length - 1) * 0.5) < 1e-9
    }

  property("rainflow ranges never exceed the signal's total range") =
    forAll(signalGen) { v =>
      v.length >= 2 ==> {
        val span = v.max - v.min
        Rainflow.countCycles(v).forall(_._1 <= span + 1e-9)
      }
    }

  property("periodogram integral equals the mean square (Parseval, boxcar)") =
    forAll(signalGen) { v =>
      val fs = 100.0
      val (_, p) = Spectral.periodogram(v, fs, "boxcar", "none")
      val df = fs / v.length
      val ms = v.map(x => x * x).sum / v.length
      math.abs(p.sum * df - ms) <= 1e-6 * (1 + ms)
    }

  property("arange length matches numpy ceil contract") =
    forAll(Gen.choose(0.1, 10.0), Gen.choose(0.01, 1.0)) { (stop, step) =>
      val a = SigMath.arange(0.0, stop, step)
      a.length == math.ceil(stop / step).toInt &&
        (a.isEmpty || a.last < stop)
    }

  property("build_freq_array is geometric with ratio 2^step") =
    forAll(Gen.choose(1.0, 50.0), Gen.choose(100.0, 2000.0), Gen.choose(0.05, 0.5)) {
      (start, end, step) =>
        val g = Srs.buildFreqArray(start, end, step)
        val ratio = math.pow(2.0, step)
        g.sliding(2).forall {
          case Array(a, b) => math.abs(b / a - ratio) < 1e-9
          case _ => true
        }
    }

  import graft.functions.Bloom

  property("bloom: inserted keys are always found (no false negatives)") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.choose(1, 12)) { (keys, k) =>
      val buf = Bloom.emptyWords(Bloom.sizeFor(keys.size))
      keys.foreach(Bloom.add(buf, _, k))
      val ser = Bloom.serialize(buf, k)
      keys.forall(Bloom.mightContain(ser, _))
    }

  property("bloom: merge order never changes the bits (OR associativity)") =
    forAll(Gen.listOfN(64, Gen.long)) { keys =>
      val k = 7
      val m = 4096
      val all = Bloom.emptyWords(m)
      keys.foreach(Bloom.add(all, _, k))
      // two halves built separately, OR-merged — same bits
      val (l, r) = keys.splitAt(keys.size / 2)
      val bl = Bloom.emptyWords(m)
      val br = Bloom.emptyWords(m)
      l.foreach(Bloom.add(bl, _, k))
      r.foreach(Bloom.add(br, _, k))
      val merged = bl.zip(br).map { case (x, y) => x | y }
      java.util.Arrays.equals(all, merged)
    }
}
