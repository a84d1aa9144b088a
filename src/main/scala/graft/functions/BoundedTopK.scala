package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-per-group selection as a partial aggregate.
  *
  * `topKIds(k)(score, id)` keeps, per group, the k ids with the
  * highest `(score DESC, id ASC)` order — exactly what
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC)
  * <= k` computes, but as an AGGREGATE with a k-bounded buffer:
  *  - map-side partial combine means a group with a billion input
  *    rows ships k-entry buffers to the shuffle, not a billion rows
  *    into one window task — per-anchor candidate selection over an
  *    LSH star (whose representative meets every clone of a
  *    boilerplate family) cannot create a straggler task or an
  *    unbounded sort, at any family size;
  *  - the buffer is two k-length primitive arrays (no boxing, no
  *    priority-queue nodes), insertion-sorted best-first so reduce is
  *    an arraycopy and merge is k bounded inserts.
  * The (score, id) pair is a TOTAL order per group (ids are unique
  * within a group), so the result is deterministic and bit-identical
  * to the window form — the SQL oracle keeps using row_number.
  */
object BoundedTopK {

  /** k-bounded buffer, kept sorted best-first ((score DESC, id ASC)). */
  case class Buf(scores: Array[Long], ids: Array[Long])

  case class TopKIds(k: Int) extends Aggregator[(Long, Long), Buf, Array[Long]] {
    require(k > 0, s"BoundedTopK k must be positive, got $k")

    @inline private def beats(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    private def insert(b: Buf, s: Long, id: Long): Buf = {
      val n = b.scores.length
      if (n == k && !beats(s, id, b.scores(n - 1), b.ids(n - 1))) return b
      var i = 0
      while (i < n && beats(b.scores(i), b.ids(i), s, id)) i += 1
      val m = math.min(n + 1, k)
      val ns = new Array[Long](m); val ni = new Array[Long](m)
      System.arraycopy(b.scores, 0, ns, 0, i)
      System.arraycopy(b.ids, 0, ni, 0, i)
      ns(i) = s; ni(i) = id
      val tail = m - i - 1
      if (tail > 0) {
        System.arraycopy(b.scores, i, ns, i + 1, tail)
        System.arraycopy(b.ids, i, ni, i + 1, tail)
      }
      Buf(ns, ni)
    }

    override def zero: Buf = Buf(Array.emptyLongArray, Array.emptyLongArray)
    override def reduce(b: Buf, v: (Long, Long)): Buf = insert(b, v._1, v._2)
    override def merge(a: Buf, b: Buf): Buf = {
      var r = a; var j = 0
      while (j < b.scores.length) { r = insert(r, b.scores(j), b.ids(j)); j += 1 }
      r
    }
    /** Ids in rank order (best first). */
    override def finish(b: Buf): Array[Long] = b.ids
    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** `topKIds(k)(score, id)` — ranked id array, best first. */
  def topKIds(k: Int)(score: Column, id: Column): Column =
    org.apache.spark.sql.functions.udaf(
      TopKIds(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(score, id)
}
