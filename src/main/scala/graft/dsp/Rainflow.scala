package graft.dsp

import scala.collection.mutable.ArrayBuffer

/** ASTM E1049-85 rainflow cycle counting, implemented from the public
  * standard's three-point algorithm (reversal extraction + stack
  * pairing). Behavioral parity target: the MIT `rainflow` PyPI package
  * the reference delegates to (`extension.py:936-961` calls
  * `rf.count_cycles`).
  */
object Rainflow {

  /** Turning points of the series, keeping first and last samples.
    * Plateau samples (equal neighbours) are skipped.
    */
  def reversals(series: Array[Double]): Array[Double] = {
    if (series.length < 2) return series.clone()
    val out = ArrayBuffer[Double]()
    var xLast = series(0)
    var x = series(1)
    var dLast = x - xLast
    out += xLast
    var i = 2
    while (i < series.length) {
      val xNext = series(i)
      if (xNext != x) {
        val dNext = xNext - x
        if (dLast * dNext < 0) out += x
        xLast = x
        x = xNext
        dLast = dNext
      }
      i += 1
    }
    // the final sample is always a reversal endpoint; a 2-sample
    // series therefore yields one residual half cycle of its full
    // range (the physically correct E1049 reading — some package
    // implementations return nothing for the degenerate case)
    out += x
    out.toArray
  }

  /** Extract (range, count) cycles; count is 1.0 for closed cycles,
    * 0.5 for residual half cycles.
    */
  def extractCycles(series: Array[Double]): Seq[(Double, Double)] = {
    val out = ArrayBuffer[(Double, Double)]()
    val points = ArrayBuffer[Double]()
    for (r <- reversals(series)) {
      points += r
      var continue = true
      while (continue && points.length >= 3) {
        val x1 = points(points.length - 3)
        val x2 = points(points.length - 2)
        val x3 = points(points.length - 1)
        val xr = math.abs(x3 - x2)
        val yr = math.abs(x2 - x1)
        if (xr < yr) {
          continue = false
        } else if (points.length == 3) {
          out += ((yr, 0.5))
          points.remove(0)
        } else {
          out += ((yr, 1.0))
          points.remove(points.length - 3, 2)
        }
      }
    }
    var i = 0
    while (i < points.length - 1) {
      out += ((math.abs(points(i + 1) - points(i)), 0.5))
      i += 1
    }
    out.toSeq
  }

  /** Aggregate cycle counts per range, sorted ascending by range.
    * ndigits rounds ranges before counting; nbins/binsize bucket ranges
    * into equal-width bins keyed by the bin's upper edge (the PyPI
    * package's contract).
    */
  def countCycles(series: Array[Double], ndigits: Option[Int] = None,
                  nbins: Option[Int] = None, binsize: Option[Double] = None): Seq[(Double, Double)] = {
    val cycles = extractCycles(series)
    if (cycles.isEmpty) return Seq.empty
    val keyed: Seq[(Double, Double)] =
      (ndigits, nbins, binsize) match {
        case (Some(d), _, _) =>
          val f = math.pow(10, d)
          cycles.map { case (rng, c) => (math.rint(rng * f) / f, c) }
        case (_, Some(nb), _) =>
          val maxRange = cycles.map(_._1).max
          val size = maxRange / nb
          cycles.map { case (rng, c) =>
            var bin = math.ceil(rng / size)
            if (bin == 0) bin = 1
            (bin * size, c)
          }
        case (_, _, Some(size)) =>
          cycles.map { case (rng, c) =>
            var bin = math.ceil(rng / size)
            if (bin == 0) bin = 1
            (bin * size, c)
          }
        case _ => cycles
      }
    keyed.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
  }
}
