package graft.sources

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal EBML (RFC 8794) layer shared by the `.ide` source and
  * sink: variable-length element IDs/sizes, big-endian scalar
  * payloads, and a seek-driven element walker that never reads a
  * payload it doesn't need.
  *
  * EBML is the container format of enDAQ `.ide` recordings (the
  * reference's only concrete file format, opened via
  * `endaq.ide.get_doc` at `io.py:186-198`). This layer is schema
  * agnostic; the MIDE-style element table lives in [[MideSchema]].
  */
object Ebml {

  /** Read a VINT-coded element ID at the buffer position. IDs keep
    * their length-marker bits (RFC 8794 §5): a 1-byte ID is
    * 0x80..0xFF, a 4-byte ID 0x10xxxxxx...
    */
  def readId(b: ByteBuffer): Long = {
    val first = b.get() & 0xff
    val len = vintLength(first)
    var v: Long = first
    var i = 1
    while (i < len) { v = (v << 8) | (b.get() & 0xff); i += 1 }
    v
  }

  /** Read a VINT-coded size; the marker bit is stripped (RFC 8794
    * §6). All-ones ("unknown size") is rejected — `.ide` writers emit
    * sized elements, and an unsized master would force a full scan.
    */
  def readSize(b: ByteBuffer): Long = {
    val first = b.get() & 0xff
    val len = vintLength(first)
    var v: Long = first & (0xff >>> len)
    var i = 1
    while (i < len) { v = (v << 8) | (b.get() & 0xff); i += 1 }
    val allOnes = (1L << (7 * len)) - 1
    require(v != allOnes, "unknown-size EBML element unsupported")
    v
  }

  /** Number of bytes in a VINT whose first byte is `first` (1..8). */
  def vintLength(first: Int): Int = {
    require(first != 0, "invalid EBML VINT (first byte 0)")
    java.lang.Integer.numberOfLeadingZeros(first) - 23
  }

  /** Big-endian unsigned integer payload (EBML uint). */
  def uint(payload: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < payload.length) { v = (v << 8) | (payload(i) & 0xff); i += 1 }
    v
  }

  /** Big-endian IEEE float payload (EBML float: 4 or 8 bytes). */
  def float(payload: Array[Byte]): Double = payload.length match {
    case 8 => ByteBuffer.wrap(payload).getDouble
    case 4 => ByteBuffer.wrap(payload).getFloat.toDouble
    case 0 => 0.0
    case n => throw new IllegalArgumentException(s"EBML float of $n bytes")
  }

  def utf8(payload: Array[Byte]): String = new String(payload, StandardCharsets.UTF_8)

  // ---- writer side: elements as byte arrays, assembled bottom-up ----

  /** Encode an element ID verbatim (marker bits included). */
  def idBytes(id: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = ((id >>> (8 * (n - 1 - i))) & 0xff).toByte; i += 1 }
    out
  }

  /** Encode a size as the shortest VINT that holds it. */
  def sizeBytes(size: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && size >= (1L << (7 * len)) - 1) len += 1
    val out = new Array[Byte](len)
    val marked = size | (1L << (7 * len))
    var i = 0
    while (i < len) { out(i) = ((marked >>> (8 * (len - 1 - i))) & 0xff).toByte; i += 1 }
    out
  }

  def element(id: Long, payload: Array[Byte]): Array[Byte] = {
    val idb = idBytes(id)
    val szb = sizeBytes(payload.length.toLong)
    val out = new Array[Byte](idb.length + szb.length + payload.length)
    System.arraycopy(idb, 0, out, 0, idb.length)
    System.arraycopy(szb, 0, out, idb.length, szb.length)
    System.arraycopy(payload, 0, out, idb.length + szb.length, payload.length)
    out
  }

  def master(id: Long, children: Array[Byte]*): Array[Byte] =
    element(id, children.foldLeft(Array.emptyByteArray)(_ ++ _))

  def uintElement(id: Long, v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) { b(i) = ((v >>> (8 * (n - 1 - i))) & 0xff).toByte; i += 1 }
    element(id, b)
  }

  def floatElement(id: Long, v: Double): Array[Byte] =
    element(id, ByteBuffer.allocate(8).putDouble(v).array())

  def utf8Element(id: Long, s: String): Array[Byte] =
    element(id, s.getBytes(StandardCharsets.UTF_8))

  /** One element header as seen by the walker: id, payload offset and
    * length in the file. The walker seeks past payloads it doesn't
    * descend into, so indexing a file costs O(#elements) reads of a
    * few bytes each — never a payload read (the parquet-footer
    * pattern: plan from metadata, let tasks read data).
    */
  final case class Header(id: Long, payloadOffset: Long, payloadLen: Long)

  /** Walk the children of the byte range [from, until) in `raf`,
    * calling `f` per element header with the file positioned at the
    * payload start. `f` may read the payload or not; the walker
    * re-seeks to the next sibling either way. Unknown element IDs are
    * simply skipped by their declared size — EBML's forward-compat
    * contract.
    */
  def walk(raf: RandomAccessFile, from: Long, until: Long)(f: Header => Unit): Unit = {
    var pos = from
    val hdr = new Array[Byte](12) // max 4-byte ID + 8-byte size
    while (pos < until) {
      raf.seek(pos)
      val n = math.min(hdr.length.toLong, until - pos).toInt
      raf.readFully(hdr, 0, n)
      val b = ByteBuffer.wrap(hdr, 0, n)
      val id = readId(b)
      val size = readSize(b)
      val payloadOffset = pos + b.position()
      require(payloadOffset + size <= until,
        s"EBML element 0x${id.toHexString} overruns its parent (at $pos)")
      raf.seek(payloadOffset)
      f(Header(id, payloadOffset, size))
      pos = payloadOffset + size
    }
  }

  /** Read the payload of the element the walker just delivered. */
  def payload(raf: RandomAccessFile, h: Header): Array[Byte] = {
    val b = new Array[Byte](h.payloadLen.toInt)
    raf.seek(h.payloadOffset)
    raf.readFully(b)
    b
  }
}

/** Element-ID table for the MIDE-style `.ide` subset this library
  * reads and writes. The EBML header IDs are the RFC 8794 standard
  * ones; the recording-schema IDs follow the shape of the public MIDE
  * schema (Mide-Technology/idelib, `schemata/mide_ide.xml`):
  * recording properties + channel/subchannel definitions at the top,
  * then a sequence of per-channel data blocks carrying
  * [start, end) timecodes and a packed little-endian payload. This
  * table is the single point of adjustment for byte-level interop
  * with files from other writers — the parser is entirely ID-driven.
  *
  * Semantics mirrored from the reference (`io.py:160-301`):
  * channels hold named subchannels with engineering units; sample
  * values are calibrated by a univariate linear polynomial; sample
  * times interpolate the block's [start, end) timecode range; the
  * recording origin (`TimeBaseUTC`) anchors `datetime` time mode.
  */
object MideSchema {
  val EbmlHeader = 0x1A45DFA3L // RFC 8794
  val DocType = 0x4282L // RFC 8794; payload "mide"
  val DocTypeVersion = 0x4287L

  val RecordingProperties = 0x18526570L
  val TimeBaseUTC = 0x5522L // epoch microseconds of recording start
  val ChannelList = 0x6334L
  val ChannelDef = 0x6335L
  val ChannelID = 0x4330L
  val ChannelName = 0x4331L
  val SampleRate = 0x4332L // float64 Hz, nominal
  val ValueFormat = 0x4333L // uint: 0=int16, 1=float32, 2=float64 (LE frames)
  val SubChannelDef = 0x6336L
  val SubChannelID = 0x4340L
  val SubChannelName = 0x4341L
  val SubChannelUnits = 0x4342L
  val CalCoefA = 0x4343L // v = a*raw + b
  val CalCoefB = 0x4344L

  val ChannelDataBlock = 0xA1L
  val ChannelIDRef = 0xB0L
  val StartTimeCodeAbs = 0xB1L // microseconds since TimeBaseUTC
  val EndTimeCodeAbs = 0xB2L // exclusive
  val ChannelDataPayload = 0xB3L

  val FmtInt16 = 0
  val FmtFloat32 = 1
  val FmtFloat64 = 2

  def bytesPerValue(fmt: Int): Int = fmt match {
    case FmtInt16 => 2
    case FmtFloat32 => 4
    case FmtFloat64 => 8
    case f => throw new IllegalArgumentException(s"unknown ValueFormat $f")
  }
}
