package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `perceptual_hash64(bytes)`: the aHash construction as ONE fused
  * per-row pass over the payload — bit j set iff segment j's byte sum
  * cross-multiplied against the whole-payload sum exceeds it
  * (seg_sum·n_total > total_sum·n_seg, exact integers; identical math
  * to `Multimodal.perceptualHashExploded`, equality test-asserted).
  *
  * Why an expression and not the explode/aggregate form: a real media
  * payload is MBs — exploding it is 10^6-10^7 rows PER RECORD through
  * a (media_id, seg) exchange, while this is a single in-memory loop
  * inside whole-stage codegen with zero shuffle. It also composes
  * under readStream unchanged (pure projection), which is what makes
  * a streaming media-admission probe possible at all.
  */
object PerceptualHash {

  val Bits = 52

  /** Exact unsigned 128-bit compare `a·b > c·d` for nonnegative
    * operands (each < 2^63, so multiplyHigh's signed high word equals
    * the unsigned one) — the overflow-proof cross-multiplication BOTH
    * aHash implementations (byte-level here, pixel-level
    * `Multimodal.pixelAHash52`) share, so neither can reintroduce the
    * plain-long-multiply overflow above ~2^63 total luma·count.
    */
  def productGreater(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = java.lang.Math.multiplyHigh(a, b)
    val hi2 = java.lang.Math.multiplyHigh(c, d)
    hi1 > hi2 || (hi1 == hi2 &&
      java.lang.Long.compareUnsigned(a * b, c * d) > 0)
  }

  /** Two-pass exact computation — called from interpreted eval and
    * from the generated code (object methods surface as statics).
    * The cross-multiplied comparison (seg_sum·n vs total·n_seg) can
    * exceed a signed long for payloads above ~1.3 GB, so the bit test
    * compares the full 128-bit products via Math.multiplyHigh — exact
    * for every representable byte array, no size precondition.
    */
  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    var total = 0L
    var i = 0
    while (i < n) { total += (bytes(i) & 0xff); i += 1 }
    val segSum = new Array[Long](Bits)
    val segCnt = new Array[Long](Bits)
    i = 0
    while (i < n) {
      // seg = ((pos0) * Bits) / n with pos0 = i — matches the exploded
      // form's ((pos - 1) * bits) div n on 1-based pos
      val seg = (i.toLong * Bits / n).toInt
      segSum(seg) += (bytes(i) & 0xff)
      segCnt(seg) += 1L
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < Bits) {
      if (segCnt(j) > 0 && productGreater(segSum(j), n.toLong, total, segCnt(j)))
        h |= (1L << j)
      j += 1
    }
    h
  }

  def perceptualHash64(bytes: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(PerceptualHash64(GraftSqlBridge.expression(bytes)))
  }
}

case class PerceptualHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "perceptual_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"perceptual_hash64 requires a binary input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def nullSafeEval(bytes: Any): Any =
    PerceptualHash.compute(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.PerceptualHash.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): PerceptualHash64 =
    copy(child = newChild)
}
