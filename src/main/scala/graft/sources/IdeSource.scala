package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import MideSchema._

/** DataSource V2 reader for MIDE-style `.ide` recordings — the
  * native-format analog of the reference's enDAQ ingestion
  * (`Endaq.__init__` via `endaq.ide.get_doc`, `io.py:186-198`).
  * Usage:
  *
  *   spark.read.format("graft.sources.IdeSource")
  *     .option("partitionBytes", 128L << 20)   // block-group granularity
  *     .load("/path/rec.ide")                  // mode=data (default)
  *
  *   spark.read.format(...).option("mode", "channels").load(path)
  *
  * Data schema: (ch INT, sub INT, t DOUBLE, v DOUBLE) — one row per
  * (channel, subchannel, sample); t = seconds since the recording
  * origin (`TimeBaseUTC`), v calibrated (a·raw + b, the reference's
  * univariate polynomial). Channels schema: per-subchannel metadata
  * (names, units, rate, format, origin).
  *
  * Scale design (the parquet-footer pattern): planning walks element
  * HEADERS only — the driver index costs a few bytes per element and
  * never touches a sample payload. Each `ChannelDataBlock` is an
  * independent unit: tasks seek straight to their block ranges, so a
  * 100 GB recording splits into `partitionBytes`-sized groups of
  * blocks with zero driver decode (unlike the reference, which
  * materializes whole channels in driver RAM, `io.py:251-269`).
  * Channel-equality filters are pushed into planning and prune whole
  * blocks — `get_channel` reads only its channel's bytes.
  */
class IdeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getOrDefault("mode", "data") == "channels") IdeSource.CHANNELS_SCHEMA
    else IdeSource.DATA_SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    // option keys arrive case-preserved here; re-wrap case-insensitively
    new IdeTable(properties.get("path"),
      new CaseInsensitiveStringMap(properties).getOrDefault("mode", "data"))
}

object IdeSource {
  val NAME = "graft.sources.IdeSource"

  val DATA_SCHEMA: StructType = StructType(Seq(
    StructField("ch", IntegerType, nullable = false),
    StructField("sub", IntegerType, nullable = false),
    StructField("t", DoubleType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  val CHANNELS_SCHEMA: StructType = StructType(Seq(
    StructField("ch", IntegerType, nullable = false),
    StructField("sub", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("sub_name", StringType, nullable = false),
    StructField("unit", StringType, nullable = false),
    StructField("sr", DoubleType, nullable = false),
    StructField("t0_us", LongType, nullable = false)))

  final case class SubMeta(name: String, unit: String, calA: Double, calB: Double)
  final case class ChMeta(id: Int, name: String, sr: Double, fmt: Int, subs: Seq[SubMeta])
  final case class BlockMeta(ch: Int, startUs: Long, endUs: Long,
                             payloadOffset: Long, payloadLen: Long, fileIdx: Int = 0)
  final case class IdeMeta(timeBaseUs: Long, channels: Seq[ChMeta], blocks: Seq[BlockMeta]) {
    def channel(id: Int): ChMeta = channels.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"data block references undefined channel $id"))
  }

  /** Resolve a load path to the recording's file list: a directory
    * means every `*.ide` inside, name-sorted — the rollover layout an
    * enDAQ-style logger produces (one recording split across files).
    */
  def resolveFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory) {
      val files = Option(f.listFiles()).getOrElse(Array.empty)
        .filter(x => x.isFile && x.getName.endsWith(".ide"))
        .map(_.getAbsolutePath).sorted.toSeq
      require(files.nonEmpty, s"$path: no .ide files in directory")
      files
    } else Seq(path)
  }

  /** Merge per-file metadata into one logical recording: the origin
    * is the EARLIEST file's TimeBaseUTC and every block timecode is
    * shifted onto that shared clock, so `t` is continuous across a
    * rollover. Channel definitions must agree wherever the same id
    * appears (one device configuration per recording — differing
    * defs under one id would silently mis-decode payloads, so that is
    * an error, not a merge).
    */
  def readMultiMeta(files: Seq[String]): IdeMeta = {
    val metas = files.map(readMeta)
    val origin = metas.map(_.timeBaseUs).min
    val chans = scala.collection.mutable.LinkedHashMap.empty[Int, ChMeta]
    for ((m, f) <- metas.zip(files); c <- m.channels) chans.get(c.id) match {
      case None => chans(c.id) = c
      case Some(prev) => require(prev == c,
        s"$f: channel ${c.id} definition conflicts with an earlier file")
    }
    val blocks = metas.zipWithIndex.flatMap { case (m, i) =>
      val shift = m.timeBaseUs - origin
      m.blocks.map(b => b.copy(startUs = b.startUs + shift, endUs = b.endUs + shift,
        fileIdx = i))
    }
    IdeMeta(origin, chans.values.toSeq, blocks)
  }

  /** Driver-side metadata walk: EBML header, recording properties,
    * and the (offset, length, timecode) index of every data block —
    * payloads are seeked over, never read.
    */
  def readMeta(path: String): IdeMeta = {
    val raf = new RandomAccessFile(path, "r")
    try {
      var timeBase = 0L
      val chans = ArrayBuffer.empty[ChMeta]
      val blocks = ArrayBuffer.empty[BlockMeta]
      var sawHeader = false

      def parseSub(h: Ebml.Header): SubMeta = {
        var name = ""; var unit = ""; var a = 1.0; var b = 0.0
        Ebml.walk(raf, h.payloadOffset, h.payloadOffset + h.payloadLen) { e =>
          e.id match {
            case SubChannelName => name = Ebml.utf8(Ebml.payload(raf, e))
            case SubChannelUnits => unit = Ebml.utf8(Ebml.payload(raf, e))
            case CalCoefA => a = Ebml.float(Ebml.payload(raf, e))
            case CalCoefB => b = Ebml.float(Ebml.payload(raf, e))
            case _ => () // SubChannelID is positional; unknowns skipped
          }
        }
        SubMeta(name, unit, a, b)
      }

      def parseChannel(h: Ebml.Header): ChMeta = {
        var id = -1; var name = ""; var sr = 0.0; var fmt = FmtFloat64
        val subs = ArrayBuffer.empty[SubMeta]
        Ebml.walk(raf, h.payloadOffset, h.payloadOffset + h.payloadLen) { e =>
          e.id match {
            case ChannelID => id = Ebml.uint(Ebml.payload(raf, e)).toInt
            case ChannelName => name = Ebml.utf8(Ebml.payload(raf, e))
            case SampleRate => sr = Ebml.float(Ebml.payload(raf, e))
            case ValueFormat => fmt = Ebml.uint(Ebml.payload(raf, e)).toInt
            case SubChannelDef => subs += parseSub(e)
            case _ => ()
          }
        }
        require(id >= 0, s"$path: ChannelDef without ChannelID")
        require(subs.nonEmpty, s"$path: channel $name has no subchannels")
        ChMeta(id, name, sr, fmt, subs.toSeq)
      }

      Ebml.walk(raf, 0L, raf.length) { h =>
        h.id match {
          case EbmlHeader =>
            Ebml.walk(raf, h.payloadOffset, h.payloadOffset + h.payloadLen) { e =>
              if (e.id == DocType) {
                val dt = Ebml.utf8(Ebml.payload(raf, e))
                require(dt == "mide", s"$path: DocType '$dt' is not an ide recording")
                sawHeader = true
              }
            }
          case RecordingProperties =>
            Ebml.walk(raf, h.payloadOffset, h.payloadOffset + h.payloadLen) { e =>
              e.id match {
                case TimeBaseUTC => timeBase = Ebml.uint(Ebml.payload(raf, e))
                case ChannelList =>
                  Ebml.walk(raf, e.payloadOffset, e.payloadOffset + e.payloadLen) { c =>
                    if (c.id == ChannelDef) chans += parseChannel(c)
                  }
                case _ => ()
              }
            }
          case ChannelDataBlock =>
            var ch = -1; var s = 0L; var e0 = 0L; var off = -1L; var len = 0L
            Ebml.walk(raf, h.payloadOffset, h.payloadOffset + h.payloadLen) { e =>
              e.id match {
                case ChannelIDRef => ch = Ebml.uint(Ebml.payload(raf, e)).toInt
                case StartTimeCodeAbs => s = Ebml.uint(Ebml.payload(raf, e))
                case EndTimeCodeAbs => e0 = Ebml.uint(Ebml.payload(raf, e))
                // the one header the walker does NOT read: record where
                // the samples live, let the task that owns the block
                // read them
                case ChannelDataPayload => off = e.payloadOffset; len = e.payloadLen
                case _ => ()
              }
            }
            require(ch >= 0 && off >= 0, s"$path: malformed ChannelDataBlock")
            blocks += BlockMeta(ch, s, e0, off, len)
          case _ => () // forward compat: skip unknown top-level elements
        }
      }
      require(sawHeader, s"$path: missing EBML header")
      IdeMeta(timeBase, chans.toSeq, blocks.toSeq)
    } finally raf.close()
  }
}

class IdeTable(path: String, mode: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"ide:$path"
  override def schema(): StructType =
    if (mode == "channels") IdeSource.CHANNELS_SCHEMA else IdeSource.DATA_SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    (if (mode == "channels") Set(TableCapability.BATCH_READ)
     else Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
       TableCapability.BATCH_WRITE)).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IdeScanBuilder(path, mode, options.getLong("partitionBytes", 128L << 20))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(mode != "channels", "the channels metadata view is read-only")
    new IdeWriteBuilder(path, info)
  }
}

/** Channel-equality predicates prune whole data blocks at planning —
  * a block belongs to exactly one channel, so `ch = k` / `ch IN (…)`
  * are handled EXACTLY at block grain and removed from the residual.
  */
class IdeScanBuilder(path: String, mode: String, partitionBytes: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var chFilter: Option[Set[Int]] = None
  private var tRange: (Double, Double) = (Double.NegativeInfinity, Double.PositiveInfinity)
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = IdeSource.DATA_SCHEMA

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (mode != "channels") required = requiredSchema

  private def asSec(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (mode == "channels") return filters
    val (accepted, residual) = filters.partition {
      case EqualTo("ch", _: Integer) => true
      case In("ch", vs) => vs.forall(_.isInstanceOf[Integer])
      case _ => false
    }
    val sets = accepted.map {
      case EqualTo("ch", v: Integer) => Set(v.intValue)
      case In("ch", vs) => vs.map(_.asInstanceOf[Integer].intValue).toSet
      case f => throw new IllegalStateException(s"unreachable: $f")
    }
    if (sets.nonEmpty) chFilter = Some(sets.reduce(_ intersect _))
    // time-range bounds prune whole blocks via their [startUs, endUs]
    // header interval — the parquet row-group-statistics pattern. The
    // pruning is COARSE (a kept block still holds out-of-range rows),
    // so these filters stay in the residual for Spark to re-apply;
    // they are still reported pushed for plan auditability.
    val tPushed = filters.filter {
      case GreaterThan("t", v) => asSec(v).exists { lo => tRange = (math.max(tRange._1, lo), tRange._2); true }
      case GreaterThanOrEqual("t", v) => asSec(v).exists { lo => tRange = (math.max(tRange._1, lo), tRange._2); true }
      case LessThan("t", v) => asSec(v).exists { hi => tRange = (tRange._1, math.min(tRange._2, hi)); true }
      case LessThanOrEqual("t", v) => asSec(v).exists { hi => tRange = (tRange._1, math.min(tRange._2, hi)); true }
      case _ => false
    }
    pushed = accepted ++ tPushed
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new IdeScan(path, mode, partitionBytes, chFilter, required, tRange)
}

/** Per-partition work unit: a run of data blocks plus the per-block
  * decode parameters (format, subchannel calibrations) resolved at
  * planning so tasks never re-read the recording header. `files` is
  * the resolved multi-file list; blocks index into it. `cols` maps
  * the pruned output schema back to DATA_SCHEMA ordinals
  * (0=ch, 1=sub, 2=t, 3=v).
  */
final case class IdeBlockPart(files: Seq[String], blocks: Seq[IdeSource.BlockMeta],
                              fmt: Map[Int, Int], calA: Map[Int, Array[Double]],
                              calB: Map[Int, Array[Double]],
                              cols: Seq[Int]) extends InputPartition

final case class IdeChannelsPart(path: String) extends InputPartition

/** Shared planning logic: prune blocks on the pushed channel set,
  * then group consecutive blocks into `partitionBytes`-sized work
  * units. Used by both the batch scan (all blocks) and the
  * micro-batch stream (each new file's blocks).
  */
object IdePlanner {
  /** Keep a block iff its [startUs, endUs] header interval intersects
    * the pushed t-range (seconds) — endUs bounds the last sample from
    * above, so dropping non-intersecting blocks loses no rows.
    */
  def inRange(b: IdeSource.BlockMeta, tRange: (Double, Double)): Boolean =
    b.endUs / 1e6 >= tRange._1 && b.startUs / 1e6 <= tRange._2

  def plan(files: Seq[String], meta: IdeSource.IdeMeta, chFilter: Option[Set[Int]],
           partitionBytes: Long, required: StructType,
           tRange: (Double, Double) = (Double.NegativeInfinity, Double.PositiveInfinity))
      : Array[InputPartition] = {
    val fmt = meta.channels.map(c => c.id -> c.fmt).toMap
    val calA = meta.channels.map(c => c.id -> c.subs.map(_.calA).toArray).toMap
    val calB = meta.channels.map(c => c.id -> c.subs.map(_.calB).toArray).toMap
    val cols = required.fieldNames.map(IdeSource.DATA_SCHEMA.fieldIndex).toSeq
    val pruned = (chFilter match {
      case Some(keep) => meta.blocks.filter(b => keep(b.ch))
      case None => meta.blocks
    }).filter(inRange(_, tRange))
    val parts = ArrayBuffer.empty[InputPartition]
    val cur = ArrayBuffer.empty[IdeSource.BlockMeta]
    var bytes = 0L
    for (b <- pruned) {
      if (cur.nonEmpty && bytes + b.payloadLen > partitionBytes) {
        parts += IdeBlockPart(files, cur.toSeq, fmt, calA, calB, cols)
        cur.clear(); bytes = 0L
      }
      cur += b; bytes += b.payloadLen
    }
    if (cur.nonEmpty) parts += IdeBlockPart(files, cur.toSeq, fmt, calA, calB, cols)
    if (parts.isEmpty) parts += IdeBlockPart(files, Seq.empty, fmt, calA, calB, cols)
    parts.toArray
  }
}

class IdeScan(path: String, mode: String, partitionBytes: Long,
              chFilter: Option[Set[Int]], required: StructType,
              tRange: (Double, Double) = (Double.NegativeInfinity, Double.PositiveInfinity))
    extends Scan with Batch {
  private lazy val files = IdeSource.resolveFiles(path)
  private lazy val meta = IdeSource.readMultiMeta(files)

  override def readSchema(): StructType =
    if (mode == "channels") IdeSource.CHANNELS_SCHEMA else required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new IdeMicroBatchStream(path, partitionBytes, chFilter, required, tRange,
      checkpointLocation)

  // surfaced in .explain so pruning is auditable in the plan
  override def description(): String = {
    if (mode == "channels") s"ide:$path channels"
    else {
      val kept = meta.blocks.count(b =>
        chFilter.forall(_(b.ch)) && IdePlanner.inRange(b, tRange))
      s"ide:$path blocks=$kept/${meta.blocks.length}" +
        chFilter.map(s => s" ch=${s.toSeq.sorted.mkString(",")}").getOrElse("") +
        (if (tRange._1 != Double.NegativeInfinity || tRange._2 != Double.PositiveInfinity)
          s" t=[${tRange._1},${tRange._2}]" else "")
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (mode == "channels") return Array(IdeChannelsPart(path))
    IdePlanner.plan(files, meta, chFilter, partitionBytes, required, tRange)
  }

  override def createReaderFactory(): PartitionReaderFactory = new IdeReaderFactory
}

/** Compacted sidecar log of the processed-file set, kept under the
  * stream's checkpoint — the same pattern as Spark's own
  * FileStreamSourceLog (HDFSMetadataLog + periodic compaction), so
  * restart recovery is EXACT even when files arrived while the stream
  * was down. Entry `seq` is either a full snapshot (`<seq>.compact`)
  * or the new files of that offset mint (`<seq>.delta`); the set at
  * `seq` = the latest snapshot ≤ seq plus every delta since. Entries
  * are written tmp-then-rename (atomic on local and HDFS) BEFORE the
  * engine persists the offset that points at them, so a pointer in
  * the offset log always has its sidecar entry. On each snapshot,
  * entries older than the PREVIOUS snapshot are deleted — committed
  * offsets the engine may restart from are never more than one
  * compaction generation behind the latest mint.
  */
private[sources] class IdeFileLog(dir: org.apache.hadoop.fs.Path,
                                  conf: org.apache.hadoop.conf.Configuration,
                                  compactInterval: Int = 10) {
  private val fs = dir.getFileSystem(conf)
  private def entry(seq: Long, suffix: String) =
    new org.apache.hadoop.fs.Path(dir, f"$seq%020d.$suffix")

  def shouldCompact(seq: Long): Boolean = seq % compactInterval == 0

  /** List (seq, suffix, path) of all entries, ascending by seq. */
  private def entries(): Seq[(Long, String, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath).toSeq
      .filterNot(_.getName.startsWith("."))
      .flatMap { p =>
        p.getName.split("\\.", 2) match {
          case Array(n, sfx) if (sfx == "compact" || sfx == "delta") && n.forall(_.isDigit) =>
            Some((n.toLong, sfx, p))
          case _ => None
        }
      }.sortBy(_._1)

  def write(seq: Long, files: Seq[String], isCompact: Boolean): Unit = {
    fs.mkdirs(dir)
    val suffix = if (isCompact) "compact" else "delta"
    val tmp = new org.apache.hadoop.fs.Path(dir, f".$seq%020d.$suffix.tmp")
    val out = fs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = entry(seq, suffix)
    if (fs.exists(dest)) fs.delete(dest, false) // crashed re-mint of the same seq
    fs.rename(tmp, dest)
    if (isCompact) {
      // retain one full generation behind the new snapshot: a restart
      // resumes from a committed offset, which is at most the previous
      // snapshot's generation old
      val snaps = entries().filter(e => e._2 == "compact" && e._1 < seq).map(_._1)
      if (snaps.nonEmpty)
        entries().filter(_._1 < snaps.max).foreach(e => fs.delete(e._3, false))
    }
  }

  private def readEntry(p: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
      val s = new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      if (s.isEmpty) Seq.empty else s.split("\n").toSeq
    } finally in.close()
  }

  /** Highest entry seq on disk (0 if none) — a fresh process seeds
    * its mint counter from this so it can never RE-mint a seq a prior
    * incarnation already persisted (the engine may call latestOffset
    * before deserializeOffset on restart, so the counter cannot rely
    * on having seen the checkpointed offset first).
    */
  def maxSeq: Long = entries().lastOption.map(_._1).getOrElse(0L)

  /** Exact processed set as of `seq`, or None if the log cannot prove
    * it (entry missing — e.g. a checkpoint written before the sidecar
    * existed, or a hand-deleted directory).
    */
  def restore(seq: Long): Option[Seq[String]] = {
    val es = entries().filter(_._1 <= seq)
    if (!es.exists(_._1 == seq)) return None // can't prove the tip is covered
    es.filter(_._2 == "compact").lastOption.map { case (cs, _, cp) =>
      val set = scala.collection.mutable.Set.empty[String]
      set ++= readEntry(cp)
      es.filter(e => e._1 > cs && e._2 == "delta").foreach(e => set ++= readEntry(e._3))
      set.toSeq.sorted
    }
  }
}

/** Structured Streaming over a growing directory of `.ide` files —
  * the continuous-admission shape of recorder fleets: each device
  * uploads finished rollover files; every micro-batch ingests the
  * newly arrived ones. The offset contract is the SET of processed
  * file names (same as Spark's own FileStreamSource), so a file whose
  * name sorts before already-processed files — a late fleet upload, a
  * clock-named rollover landing out of order — is ingested exactly
  * once rather than re-slicing the listing (which a count offset
  * would: re-ingest old files, skip the new one). The set is held in
  * memory and PERSISTED compactly as a (watermark, count, seq)
  * pointer — constant bytes per offset-log entry — where `seq` keys
  * an exact, compacted sidecar log of the set under the checkpoint
  * (see [[IdeFileLog]]), so restart recovery is exactly-once even
  * when a pre-watermark file landed while the stream was down.
  * `t` stays on ONE clock across batches and restarts: the anchor —
  * the name-min file of the first nonempty batch — rides in the
  * offset, so a later-arriving earlier-named file cannot shift the
  * time origin either.
  */
class IdeMicroBatchStream(path: String, partitionBytes: Long,
                          chFilter: Option[Set[Int]], required: StructType,
                          tRange: (Double, Double) = (Double.NegativeInfinity, Double.PositiveInfinity),
                          checkpointLoc: String = "")
    extends streaming.MicroBatchStream with org.apache.spark.internal.Logging {
  import org.apache.spark.sql.connector.read.streaming.Offset

  /** The processed SET rides in memory; the PERSISTED offset is the
    * compact (anchor, watermark, count, seq) quadruple — O(1) per log
    * entry, where serializing the cumulative list made the offset log
    * grow O(n²) over the stream's life (Spark's own FileStreamSource
    * compacts its log for the same reason). Restoration order on
    * restart: (1) `mintedSets` for offsets minted in this process —
    * exact; (2) the [[IdeFileLog]] sidecar entry `seq` points at —
    * exact, including a pre-watermark file that arrived while the
    * stream was DOWN (it is absent from the restored set, so the next
    * batch ingests it exactly once); (3) for pre-sidecar checkpoints
    * only, reconstruction as {files ≤ watermark} — inexact across a
    * while-down late arrival, detected by the count mismatch and
    * reported loudly (see compactRestore).
    */
  private case class FileSetOffset(anchor: String, files: Seq[String],
                                   seq: Long = 0L) extends Offset {
    override def json(): String = {
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      val w = if (files.isEmpty) "" else files.max
      val j = s"""{"anchor":${q(anchor)},"w":${q(w)},"n":${files.size},"seq":$seq}"""
      rememberMinted(j, files)
      j
    }
  }

  // json → exact file set for offsets minted in this process — a
  // fast path only: an evicted entry re-resolves exactly through the
  // sidecar log (compactRestore), so the small LRU bounds memory at
  // O(listing) instead of O(listing × batches) without a correctness
  // hole.
  private val mintedSets =
    new java.util.LinkedHashMap[String, Seq[String]](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[String]]): Boolean = size > 16
    }
  private def rememberMinted(j: String, files: Seq[String]): Unit =
    mintedSets.synchronized { mintedSets.put(j, files); () }
  private def lookupMinted(j: String): Option[Seq[String]] =
    mintedSets.synchronized { Option(mintedSets.get(j)) }

  // the time-origin file, learned from the first nonempty batch (or a
  // restart's checkpointed offset via deserializeOffset) — lets
  // latestOffset stamp candidate offsets with the right anchor
  @volatile private var knownAnchor: String = ""

  // exact sidecar log of the processed set (absent only when the scan
  // was built without a checkpoint location — batch mode)
  private val fileLog: Option[IdeFileLog] =
    if (checkpointLoc.isEmpty) None
    else {
      val conf = scala.util.Try(
          org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      Some(new IdeFileLog(
        new org.apache.hadoop.fs.Path(checkpointLoc, "graft_file_log"), conf))
    }
  // highest seq minted or observed, and the set it covers; None until
  // this process has minted or exactly restored a set — the first mint
  // after that writes a full snapshot so the sidecar is self-contained
  private var lastSeq: Long = 0L
  private var lastMintedSet: Option[Set[String]] = None

  /** Sync the in-memory mint state from a restored offset. `exact`
    * marks sets recovered losslessly (minted here, sidecar, or r9
    * full-list offsets) — only those may seed delta-chaining; an
    * inexact watermark reconstruction forces the next mint to write a
    * fresh snapshot instead.
    */
  private def syncMintState(seq: Long, files: Seq[String], exact: Boolean): Unit =
    synchronized {
      if (seq >= lastSeq) {
        lastSeq = seq
        lastMintedSet = if (exact) Some(files.toSet) else None
      }
    }

  private def listFiles(): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(x => x.isFile && x.getName.endsWith(".ide"))
        .map(_.getAbsolutePath).sorted.toSeq
    else if (f.isFile) Seq(path)
    else Seq.empty // not created yet — a stream may start before data
  }

  // first sidecar write of a process is always a full snapshot, so
  // the log is self-contained across restarts regardless of what the
  // previous incarnation (or a pre-sidecar checkpoint) left behind
  private var wroteThisProcess = false

  override def initialOffset(): Offset = FileSetOffset("", Seq.empty)
  override def latestOffset(): Offset = synchronized {
    val all = listFiles()
    val anchor = if (knownAnchor.nonEmpty) knownAnchor else all.headOption.getOrElse("")
    val set = all.toSet
    if (lastMintedSet.contains(set)) FileSetOffset(anchor, all, lastSeq)
    else {
      // first mint of this process: resume the seq counter PAST every
      // persisted entry — deserializeOffset may not have run yet, and
      // re-minting a live seq would overwrite history
      if (!wroteThisProcess)
        fileLog.foreach(lg => lastSeq = math.max(lastSeq, lg.maxSeq))
      val s = lastSeq + 1
      fileLog.foreach { lg =>
        val snapshot = !wroteThisProcess || lg.shouldCompact(s)
        val payload =
          if (snapshot) all
          else all.filterNot(lastMintedSet.getOrElse(Set.empty))
        lg.write(s, payload, snapshot)
        wroteThisProcess = true
      }
      lastSeq = s
      lastMintedSet = Some(set)
      FileSetOffset(anchor, all, s)
    }
  }
  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (!t.startsWith("{")) {
      // legacy count offset (pre-r9 checkpoint): first n files of the
      // name-sorted listing, origin on the head file — the old
      // contract. The recovered set is POSITIONAL: it is exact only
      // if no file sorting before position n arrived since the
      // checkpoint was written; a late earlier-named arrival would be
      // marked processed (skipped) and displace a genuinely processed
      // file into reprocessing. The legacy format records no
      // watermark, so this cannot be detected — warn loudly and
      // recommend a fresh checkpoint.
      val all = listFiles()
      val n = t.toInt
      require(all.length >= n, s"$path: legacy offset $n exceeds listing (${all.length})")
      logWarning(s"$path: migrating legacy count offset ($n): the recovered " +
        "processed set is positional (first n of the current listing) and is only " +
        "exact if no earlier-named file arrived since the checkpoint — restart from " +
        "a fresh checkpoint if late uploads are possible")
      val anchor = all.headOption.getOrElse("")
      if (knownAnchor.isEmpty && anchor.nonEmpty) knownAnchor = anchor
      syncMintState(0L, all.take(n), exact = false)
      FileSetOffset(anchor, all.take(n))
    } else {
      // json4s ships with Spark — no new dependency
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      val v = JsonMethods.parse(t)
      val anchor = (v \ "anchor").extract[String]
      if (knownAnchor.isEmpty && anchor.nonEmpty) knownAnchor = anchor
      // NOTE: json4s extracts a Seq from a MISSING field as empty, so
      // the format dispatch must test field presence explicitly
      (v \ "files") match {
        case JNothing =>
          compactRestore(v, anchor, t)
        case files =>
          // r9 full-list offset (pre-compaction checkpoint) — exact
          val fs = files.extract[Seq[String]]
          syncMintState(0L, fs, exact = true)
          FileSetOffset(anchor, fs)
      }
    }
  }

  private def compactRestore(v: org.json4s.JValue, anchor: String,
                             compactJson: String): Offset = {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    val seq = (v \ "seq").extractOpt[Long].getOrElse(0L)
    val w = (v \ "w").extract[String]
    val n = (v \ "n").extract[Int]
    lookupMinted(compactJson) match {
      case Some(files) => // minted in this process — exact, no I/O
        syncMintState(seq, files, exact = true)
        FileSetOffset(anchor, files, seq)
      case None => fileLog.flatMap(lg => if (seq > 0) lg.restore(seq) else None) match {
        // restart path: the sidecar entry the offset points at is
        // EXACT — a pre-watermark file that arrived while the stream
        // was down is absent from it, so the next batch ingests it
        // exactly once instead of skipping it. The (n, w) cross-check
        // proves the entry really is the one this offset minted: a
        // mismatch means the log was truncated/recreated by another
        // incarnation, and the loud reconstruction below is safer
        // than trusting a collided entry.
        case Some(files)
            if files.length == n &&
               (if (files.isEmpty) w.isEmpty else files.max == w) =>
          syncMintState(seq, files, exact = true)
          FileSetOffset(anchor, files, seq)
        case other =>
          if (other.isDefined)
            logWarning(s"$path: sidecar entry $seq disagrees with the offset " +
              s"(${other.get.length} files vs n=$n) — falling back to watermark " +
              "reconstruction")
          // pre-sidecar checkpoint (or a hand-deleted sidecar):
          // reconstruct {files <= watermark} from the current
          // listing. Exact unless a pre-watermark file arrived while
          // the stream was down — then the count disagrees and the
          // late files are unidentifiable; they are treated as
          // processed (skipped, at-most-once) and reported loudly
          // rather than silently re-slicing.
          val files = if (w.isEmpty) Seq.empty[String]
                      else listFiles().filter(_ <= w)
          if (files.length != n)
            logWarning(s"$path: compact offset recorded $n processed files up to " +
              s"watermark '$w' but the listing now has ${files.length} — " +
              s"${files.length - n} pre-watermark file(s) arrived while the stream " +
              "was down and will be treated as processed (SKIPPED). Reprocess them " +
              "via a fresh checkpoint if needed.")
          syncMintState(seq, files, exact = false)
          FileSetOffset(anchor, files, seq)
      }
    }
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[FileSetOffset]
    val eo = end.asInstanceOf[FileSetOffset]
    val done = so.files.toSet
    val batch = eo.files.filterNot(done).sorted
    if (batch.isEmpty)
      return IdePlanner.plan(batch, IdeSource.IdeMeta(0L, Seq.empty, Seq.empty),
        chFilter, partitionBytes, required, tRange).filter {
        case p: IdeBlockPart => p.blocks.nonEmpty
        case _ => true
      }
    // anchor on one stable clock: the checkpointed anchor if the
    // stream has history, else this first batch's name-min file
    val anchorFile =
      if (so.anchor.nonEmpty) so.anchor
      else if (eo.anchor.nonEmpty && (done.nonEmpty || eo.anchor == batch.head)) eo.anchor
      else batch.head
    if (knownAnchor.isEmpty) knownAnchor = anchorFile
    val origin = IdeSource.readMeta(anchorFile).timeBaseUs
    val metas = batch.map(IdeSource.readMeta)
    val chans = scala.collection.mutable.LinkedHashMap.empty[Int, IdeSource.ChMeta]
    for ((m, f) <- metas.zip(batch); c <- m.channels) chans.get(c.id) match {
      case None => chans(c.id) = c
      case Some(prev) => require(prev == c,
        s"$f: channel ${c.id} definition conflicts with an earlier file")
    }
    val blocks = metas.zipWithIndex.flatMap { case (m, i) =>
      val shift = m.timeBaseUs - origin
      m.blocks.map(b => b.copy(startUs = b.startUs + shift, endUs = b.endUs + shift,
        fileIdx = i))
    }
    IdePlanner.plan(batch, IdeSource.IdeMeta(origin, chans.values.toSeq, blocks),
      chFilter, partitionBytes, required, tRange)
  }

  override def createReaderFactory(): PartitionReaderFactory = new IdeReaderFactory
}

class IdeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: IdeBlockPart => new IdeBlockReader(p)
      case p: IdeChannelsPart => new IdeChannelsReader(p)
    }
}

/** Streams (ch, sub, t, v) rows block by block. Sample i of an
  * n-frame block lands at startUs + i·(endUs−startUs)/n — exact
  * integer microseconds when the block span divides evenly (a
  * constant-rate writer), double interpolation otherwise.
  */
class IdeBlockReader(p: IdeBlockPart) extends PartitionReader[InternalRow] {
  private var rafIdx = -1
  private var raf: RandomAccessFile = _
  private def fileFor(idx: Int): RandomAccessFile = {
    if (idx != rafIdx) {
      if (raf != null) raf.close()
      raf = new RandomAccessFile(p.files(idx), "r")
      rafIdx = idx
    }
    raf
  }
  // pruned projection: full holds (ch, sub, t, v); row carries only
  // the requested ordinals in the requested order
  private val full = new Array[Any](4)
  private val cols = p.cols.toArray
  private val row = new GenericInternalRow(cols.length)
  private var blockIdx = -1
  private var buf: ByteBuffer = _
  private var nFrames = 0
  private var nSubs = 0
  private var frame = 0
  private var sub = -1
  private var fmt = FmtFloat64
  private var calA: Array[Double] = _
  private var calB: Array[Double] = _
  private var startUs = 0L
  private var spanUs = 0L
  private var stepUs = 0L // >0 when the span divides evenly

  private def nextBlock(): Boolean = {
    blockIdx += 1
    if (blockIdx >= p.blocks.length) return false
    val b = p.blocks(blockIdx)
    fmt = p.fmt(b.ch)
    calA = p.calA(b.ch)
    calB = p.calB(b.ch)
    nSubs = calA.length
    val bpv = bytesPerValue(fmt)
    val bytes = new Array[Byte](b.payloadLen.toInt)
    val f = fileFor(b.fileIdx)
    f.seek(b.payloadOffset)
    f.readFully(bytes)
    buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    nFrames = bytes.length / (nSubs * bpv)
    startUs = b.startUs
    spanUs = b.endUs - b.startUs
    stepUs = if (nFrames > 0 && spanUs % nFrames == 0) spanUs / nFrames else 0L
    frame = 0
    sub = -1
    full(0) = b.ch
    nFrames > 0 || nextBlock()
  }

  override def next(): Boolean = {
    if (blockIdx < 0 && !nextBlock()) return false
    sub += 1
    if (sub == nSubs) { sub = 0; frame += 1 }
    if (frame >= nFrames) {
      if (!nextBlock()) return false
      sub = 0
      if (nFrames == 0) return false
    }
    val raw = fmt match {
      case FmtInt16 => buf.getShort().toDouble
      case FmtFloat32 => buf.getFloat().toDouble
      case FmtFloat64 => buf.getDouble()
    }
    val tUs: Double =
      if (stepUs > 0) (startUs + frame.toLong * stepUs).toDouble
      else startUs + frame.toDouble * spanUs / nFrames
    full(1) = sub
    full(2) = tUs / 1e6
    full(3) = calA(sub) * raw + calB(sub)
    var i = 0
    while (i < cols.length) { row.update(i, full(cols(i))); i += 1 }
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (raf != null) raf.close()
}

/** Metadata mode: the recording header as a tiny table — one row per
  * (channel, subchannel). Single partition; the walk reads no sample
  * payloads.
  */
class IdeChannelsReader(p: IdeChannelsPart) extends PartitionReader[InternalRow] {
  private val meta = IdeSource.readMultiMeta(IdeSource.resolveFiles(p.path))
  private val rows: Iterator[InternalRow] = meta.channels.iterator.flatMap { c =>
    c.subs.zipWithIndex.map { case (s, i) =>
      new GenericInternalRow(Array[Any](
        c.id, i, UTF8String.fromString(c.name), UTF8String.fromString(s.name),
        UTF8String.fromString(s.unit), c.sr, meta.timeBaseUs)): InternalRow
    }
  }
  private var cur: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { cur = rows.next(); true } else false }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}
