package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WAV reader — the "file format as a distributed
  * table" analog of the reference's DAQ ingestion layer (`io.py`:
  * open file → channels → arrays). Usage:
  *
  *   spark.read.format("graft.sources.WavSource")
  *     .option("partitionFrames", "1000000")   // split granularity
  *     .load("/path/audio.wav")
  *
  * Schema: (ch INT, t DOUBLE, v DOUBLE) — one row per (audio channel,
  * frame); t = frameIdx / sampleRate seconds.
  *
  * Scale design: a WAV's data chunk is fixed-stride, so the file
  * splits into frame-range InputPartitions computed from the header
  * alone — each task seeks to its byte range; no single-machine
  * decode step, unlike the reference (which materializes whole
  * channels in RAM, `io.py:251-269`). Supports PCM16 (format 1) and
  * IEEE float32/float64 (format 3, what WavSink emits).
  */
class WavSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WavSource.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new WavTable(properties.get("path"))
}

object WavSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("ch", IntegerType, nullable = false),
    StructField("t", DoubleType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  val NAME = "graft.sources.WavSource"

  case class WavHeader(format: Int, nChannels: Int, sampleRate: Int,
                       bitsPerSample: Int, dataOffset: Long, nFrames: Long) {
    def bytesPerFrame: Int = nChannels * (bitsPerSample / 8)
  }

  /** Parse the RIFF chunk list (fmt + data); tolerates extra chunks. */
  def readHeader(path: String): WavHeader = {
    val raf = new RandomAccessFile(path, "r")
    try {
      def readChunk(n: Int): ByteBuffer = {
        val b = new Array[Byte](n)
        raf.readFully(b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      }
      val riff = readChunk(12)
      val magic = new Array[Byte](4); riff.get(magic)
      require(new String(magic, "ASCII") == "RIFF", s"$path: not a RIFF file")
      riff.getInt()
      riff.get(magic)
      require(new String(magic, "ASCII") == "WAVE", s"$path: not a WAVE file")

      var fmt: Option[(Int, Int, Int, Int)] = None
      var dataOffset = -1L
      var dataLen = -1L
      while (dataOffset < 0 && raf.getFilePointer <= raf.length - 8) {
        val hdr = readChunk(8)
        val id = new Array[Byte](4); hdr.get(id)
        val len = hdr.getInt().toLong & 0xffffffffL
        new String(id, "ASCII") match {
          case "fmt " =>
            val b = readChunk(len.toInt)
            val format = b.getShort() & 0xffff
            val nCh = b.getShort() & 0xffff
            val sr = b.getInt()
            b.getInt(); b.getShort()
            val bits = b.getShort() & 0xffff
            fmt = Some((format, nCh, sr, bits))
          case "data" =>
            dataOffset = raf.getFilePointer
            dataLen = len
          case _ =>
            raf.seek(raf.getFilePointer + len + (len & 1)) // chunks are word-aligned
        }
      }
      val (format, nCh, sr, bits) = fmt.getOrElse(
        throw new IllegalArgumentException(s"$path: no fmt chunk"))
      require(dataOffset >= 0, s"$path: no data chunk")
      // validate the exact decodable combinations up front: a stray
      // combination must fail here, not as a per-task storm mid-scan
      require((format == 1 && bits == 16) || (format == 3 && (bits == 32 || bits == 64)),
        s"$path: unsupported WAV layout (format=$format, bits=$bits); " +
          "supported: PCM16, float32, float64")
      // clamp to the bytes actually present: a truncated file (header
      // overstating the data length) reads the frames that exist
      // instead of EOF-failing mid-scan
      val usable = math.min(dataLen, raf.length - dataOffset)
      WavHeader(format, nCh, sr, bits, dataOffset, usable / (nCh * (bits / 8)))
    } finally raf.close()
  }
}

class WavTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"wav:$path"
  override def schema(): StructType = WavSource.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WavScanBuilder(path, options.getLong("partitionFrames", 1L << 20))
}

class WavScanBuilder(path: String, partitionFrames: Long) extends ScanBuilder {
  override def build(): Scan = new WavScan(path, partitionFrames)
}

case class WavInputPartition(path: String, startFrame: Long, endFrame: Long,
                             header: WavSource.WavHeader) extends InputPartition

class WavScan(path: String, partitionFrames: Long) extends Scan with Batch {
  private lazy val header = WavSource.readHeader(path)

  override def readSchema(): StructType = WavSource.SCHEMA
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = header.nFrames
    // clamp to [1, frames-that-fit-an-Int-byte-buffer]: 0/negative
    // would divide by zero, oversized would wrap the reader's buffer
    val pf = math.max(1L,
      math.min(partitionFrames, (Int.MaxValue.toLong - 8) / header.bytesPerFrame))
    val splits = math.max(1L, (n + pf - 1) / pf)
    (0L until splits).map { i =>
      val lo = i * pf
      val hi = math.min(n, lo + pf)
      WavInputPartition(path, lo, hi, header): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new WavReaderFactory
}

class WavReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WavPartitionReader(partition.asInstanceOf[WavInputPartition])
}

class WavPartitionReader(p: WavInputPartition) extends PartitionReader[InternalRow] {
  private val h = p.header
  private val raf = new RandomAccessFile(p.path, "r")
  private val buf = {
    val bytes = new Array[Byte](((p.endFrame - p.startFrame) * h.bytesPerFrame).toInt)
    raf.seek(h.dataOffset + p.startFrame * h.bytesPerFrame)
    raf.readFully(bytes)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
  }
  private var frame = p.startFrame
  private var ch = -1
  private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)

  override def next(): Boolean = {
    ch += 1
    if (ch == h.nChannels) { ch = 0; frame += 1 }
    if (frame >= p.endFrame) return false
    val v = (h.format, h.bitsPerSample) match {
      case (1, 16) => buf.getShort().toDouble / 32768.0
      case (3, 32) => buf.getFloat().toDouble
      case (3, 64) => buf.getDouble()
      case (f, b) => throw new IllegalStateException(s"unsupported wav layout ($f, $b)")
    }
    row.update(0, ch)
    row.update(1, frame.toDouble / h.sampleRate)
    row.update(2, v)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = raf.close()
}
