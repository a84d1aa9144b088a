package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Self-contained Bloom filter over 64-bit keys: a distributed
  * OR-merge build aggregate plus a codegen'd membership expression.
  *
  * Why not a broadcast join: a benchmark/blocklist of a billion
  * n-grams is a ~30-60 GB hash-join build side (infeasible to
  * broadcast), but its 1%-FPR Bloom filter is ~1.2 GB — and the
  * filter's false positives are removed by an exact semi-join over
  * only the SURVIVORS, so the composed result is exact while the
  * shuffle carries ~(true hits + 1% of corpus) rows instead of the
  * whole corpus. This is the standard big-build-side pattern (what
  * Spark's own InjectRuntimeFilter does for shuffle joins, here made
  * explicit and available to library operators).
  *
  * Serialized layout: 4 bytes big-endian k (number of probe
  * functions), then the bitset; mBits = 8*(len-4). Bit positions come
  * from Kirsch-Mitzelstein double hashing over two splitmix64-mixed
  * views of the key, so build and probe agree by construction and the
  * layout is engine- and partitioning-independent (OR is commutative).
  */
object Bloom {

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def headerBytes: Int = 4

  /** Largest representable filter: the serialized form is one JVM byte
    * array (4-byte header + bitset), so mBits is bounded by
    * 8*(maxArray - 4). We cap at the largest power of two below that —
    * 2^33 bits = 1 GiB serialized — which covers ~860M keys at 1% FPR
    * and degrades gracefully (higher FPR, still exact after the
    * semi-join) beyond. Bit positions use Long math throughout; the
    * Int-typed word COUNT (2^27 max) always fits.
    */
  def maxBits: Long = 1L << 33

  def words(mBits: Long): Int = {
    require(mBits > 0 && mBits <= maxBits,
      s"Bloom mBits must be in (0, $maxBits], got $mBits (serialized form is one byte array)")
    ((mBits + 63) >>> 6).toInt
  }

  def emptyWords(mBits: Long): Array[Long] = new Array[Long](words(mBits))

  def add(buf: Array[Long], v: Long, k: Int): Unit = {
    val mBits = buf.length.toLong << 6
    val h1 = mix(v)
    val h2 = mix(v + 0x632be59bd9b4e019L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, mBits)
      buf((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  def serialize(buf: Array[Long], k: Int): Array[Byte] = {
    val out = new Array[Byte](headerBytes + buf.length * 8)
    out(0) = (k >>> 24).toByte; out(1) = (k >>> 16).toByte
    out(2) = (k >>> 8).toByte; out(3) = k.toByte
    var w = 0
    while (w < buf.length) {
      val x = buf(w)
      val base = headerBytes + w * 8
      var b = 0
      while (b < 8) { out(base + b) = (x >>> (8 * b)).toByte; b += 1 }
      w += 1
    }
    out
  }

  /** Membership probe — called both from `nullSafeEval` and from the
    * generated code (Scala object methods surface as Java statics).
    */
  def mightContain(bloom: Array[Byte], v: Long): Boolean = {
    val k = ((bloom(0) & 0xff) << 24) | ((bloom(1) & 0xff) << 16) |
      ((bloom(2) & 0xff) << 8) | (bloom(3) & 0xff)
    val mBits = (bloom.length - headerBytes).toLong << 3
    val h1 = mix(v)
    val h2 = mix(v + 0x632be59bd9b4e019L) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, mBits)
      val byteIdx = headerBytes + (pos >>> 3).toInt
      if ((bloom(byteIdx) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Smallest power-of-two bit count giving ~1% FPR for `n` keys with
    * k=7 probes (m ≈ 10n bits), floored so degenerate inputs stay sane
    * and capped at [[maxBits]] (the one-byte-array serialization bound)
    * rather than silently truncating — the pre-r9 Int-typed version
    * corrupted mBits for n >= ~215M keys.
    */
  def sizeFor(n: Long): Long = {
    val target = math.max(1024L, 10L * math.max(1L, n))
    var m = 1024L
    while (m < target && m < maxBits) m <<= 1
    math.min(m, maxBits)
  }

  def bloomMightContain(bloom: Column, value: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(value)))
  }

  /** Probe against a BROADCAST filter — the shape for blooms too big
    * to fold as a plan literal (a literal rides in every task binary
    * and in every plan string; a Broadcast ships once per executor
    * via torrent and the expression carries only the handle). Above
    * ~a few MB this is the right call; `Dedup.benchmarkOverlapBloom`
    * switches automatically.
    */
  def bloomMightContainBc(bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                          value: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(BloomMightContainBc(bloom,
      GraftSqlBridge.expression(value)))
  }

  /** Distributed build: partial buffers OR-merge associatively, so the
    * result is identical under any partitioning — each executor sets
    * bits for its rows, the driver never sees the raw keys. This is a
    * deliberate sketch-build aggregate (the documented non-codegen
    * exception class): the alternative — collecting distinct keys to
    * the driver — is exactly the scale failure the filter exists to
    * avoid.
    */
  def buildAgg(mBits: Long, k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(BloomBuild(mBits, k), Encoders.scalaLong)
}

case class BloomBuild(mBits: Long, k: Int)
    extends Aggregator[Long, Array[Long], Array[Byte]] {
  override def zero: Array[Long] = Bloom.emptyWords(mBits)
  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    Bloom.add(buf, v, k); buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(buf: Array[Long]): Array[Byte] = Bloom.serialize(buf, k)
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `bloom_might_contain(bloom, key)`: bit probe against a serialized
  * Bloom filter, inside whole-stage codegen. The filter is typically a
  * folded binary literal (built once per job), so the generated code
  * reads the byte array straight out of the references array — no
  * per-row deserialization, no broadcast machinery.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (binary, bigint), got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(bloom: Any, v: Any): Any =
    Bloom.mightContain(bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"${ev.value} = graft.functions.Bloom.mightContain($b, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** `bloom_might_contain` over a torrent-broadcast filter: the
  * expression serializes only the Broadcast HANDLE; executors fetch
  * the bytes once and the generated code probes them via a plan
  * reference object — zero per-row deserialization, task binaries
  * stay small however big the filter is.
  */
case class BloomMightContainBc(
    bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "bloom_might_contain_bc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_bc requires a bigint key, got ${child.dataType}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    Bloom.mightContain(bloom.value, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", bloom,
      classOf[org.apache.spark.broadcast.Broadcast[Array[Byte]]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Bloom.mightContain((byte[]) $bc.value(), $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBc =
    copy(child = newChild)
}
