package graft.sources

import java.io.File

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** Distributed `.ide` writer: `df.write.format("graft.sources.IdeSource")
  * .mode("append").save(dir)` writes one rollover file per input
  * partition into `dir` — the recorder-fleet layout the multi-file
  * reader and the micro-batch stream already consume. The inverse of
  * the reference's driver-side single-file export.
  *
  * Spark plans the physical layout FOR the writer via
  * `RequiresDistributionAndOrdering`: rows are clustered by channel
  * and sorted (ch, t, sub), so each task receives whole channels in
  * frame order and the exchange/sort is inserted by the engine — the
  * DSv2 analog of parquet's dynamic-partition sort, not hand-rolled
  * in user code.
  *
  * Channel metadata is inferred from the data: the sample period from
  * the first→last frame span (exact for the uniform-rate series the
  * layout represents — non-uniform time is not expressible in a
  * timecoded block format, true of the real format too), subchannel
  * count from the first frame's width, float64 payloads so the write
  * → read round trip is bit-exact. Each task buffers its partition's
  * channels (the per-task analog of the reference's per-channel
  * arrays); task commit is write-temp + atomic rename, so retries and
  * speculation never publish partial files.
  */
class IdeWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write =
    new IdeWrite(path, info.schema(), info.options())
}

class IdeWrite(path: String, schema: StructType,
               options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
    extends Write with RequiresDistributionAndOrdering {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("ch")))

  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.column("ch"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.column("t"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.column("sub"), SortDirection.ASCENDING))

  override def toBatch: BatchWrite = {
    val fmt = options.getOrDefault("fmt", "float64") match {
      case "float64" => MideSchema.FmtFloat64
      case "float32" => MideSchema.FmtFloat32
      case "int16" => MideSchema.FmtInt16
      case other => throw new IllegalArgumentException(
        s"ide write fmt must be float64|float32|int16, got $other")
    }
    new IdeBatchWrite(path, schema,
      options.getLong("timeBaseUs", 0L),
      options.getInt("blockFrames", 256), fmt)
  }
}

class IdeBatchWrite(path: String, schema: StructType, timeBaseUs: Long,
                    blockFrames: Int, fmt: Int = MideSchema.FmtFloat64)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    require(dir.isDirectory || dir.mkdirs(), s"cannot create directory $path")
    val idx = Array("ch", "sub", "t", "v").map { n =>
      val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(n))
      require(i >= 0, s"ide write requires column '$n'; got ${schema.fieldNames.mkString(", ")}")
      i
    }
    new IdeWriterFactory(path, idx, timeBaseUs, blockFrames, fmt)
  }
  /** Job commit publishes every task's temp file by rename, driver
    * side — the standard two-phase DSv2 protocol. Tasks only ever
    * write hidden `.tmp` files (which the reader's directory listing
    * ignores), so a job that dies after some tasks committed leaves
    * NO partial output visible, and speculative duplicate attempts
    * can't race on the destination name: the losing attempt's abort
    * deletes its own uniquely-named temp. Assumes the destination
    * directory is a shared filesystem (same assumption the writer
    * already makes by writing temps into it).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case IdeCommit(tmp, part) if tmp.nonEmpty =>
        val src = new File(tmp)
        val dst = new File(path, f"part-$part%05d.ide")
        if (dst.exists()) dst.delete()
        require(src.renameTo(dst), s"publish ${src.getName} -> ${dst.getName} failed")
      case _ => ()
    }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case IdeCommit(tmp, _) if tmp.nonEmpty =>
        val f = new File(tmp)
        if (f.exists()) f.delete()
      case _ => ()
    }
}

class IdeWriterFactory(path: String, idx: Array[Int], timeBaseUs: Long,
                       blockFrames: Int, fmt: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new IdeDataWriter(path, partitionId, taskId, idx, timeBaseUs, blockFrames, fmt)
}

private final case class IdeCommit(tmpFile: String, partitionId: Int)
    extends WriterCommitMessage

class IdeDataWriter(path: String, partitionId: Int, taskId: Long,
                    idx: Array[Int], timeBaseUs: Long, blockFrames: Int,
                    fmt: Int = MideSchema.FmtFloat64)
    extends DataWriter[InternalRow] {

  private val channels = ArrayBuffer.empty[IdeSink.Ch]
  private var curCh = Int.MinValue
  private var curT = Double.NaN
  private var t0 = 0.0
  private var lastT = 0.0
  private val frames = ArrayBuffer.empty[ArrayBuffer[Double]]

  private def flushChannel(): Unit = {
    if (frames.isEmpty) return
    val n = frames.length
    val startUs = math.round(t0 * 1e6)
    // period from the full span — exact for uniform series, the only
    // kind a timecoded block layout can represent
    val periodUs =
      if (n >= 2) math.max(1L, math.round((lastT - t0) * 1e6 / (n - 1)))
      else 1000000L
    val nSubs = frames.head.length
    require(frames.forall(_.length == nSubs),
      s"channel $curCh: ragged frames (expected $nSubs subchannel rows per timestamp)")
    // int16 derives a per-subchannel linear calibration from the
    // task's data (full scale over the observed range — the quantized
    // export real recorders store; max error calA/2); float formats
    // keep the identity calibration
    val subs = (0 until nSubs).map { i =>
      if (fmt != MideSchema.FmtInt16) IdeSink.Sub(s"ch${curCh}_$i", "u")
      else {
        var lo = Double.MaxValue
        var hi = Double.MinValue
        frames.foreach { f => val v = f(i); if (v < lo) lo = v; if (v > hi) hi = v }
        val a = if (hi > lo) (hi - lo) / 65534.0 else 1.0
        IdeSink.Sub(s"ch${curCh}_$i", "u", calA = a, calB = (hi + lo) / 2.0)
      }
    }
    channels += IdeSink.Ch(curCh, s"ch$curCh", 1e6 / periodUs, fmt, subs,
      frames.map(_.toArray).toArray, blockFrames, startUs)
    frames.clear()
  }

  override def write(row: InternalRow): Unit = {
    val ch = row.getInt(idx(0))
    val t = row.getDouble(idx(2))
    val v = row.getDouble(idx(3))
    if (ch != curCh) {
      flushChannel()
      curCh = ch
      curT = Double.NaN
      t0 = t
    }
    if (frames.isEmpty || t != curT) {
      frames += ArrayBuffer.empty[Double]
      curT = t
      lastT = t
    }
    frames.last += v
  }

  /** Task commit stops at the temp file: the rename-to-final happens
    * in `IdeBatchWrite.commit` on the driver once EVERY task has
    * succeeded, so partial jobs publish nothing.
    */
  override def commit(): WriterCommitMessage = {
    flushChannel()
    if (channels.isEmpty) return IdeCommit("", partitionId)
    val tmp = new File(path, s".part-$partitionId-$taskId.ide.tmp")
    IdeSink.write(tmp.getAbsolutePath, timeBaseUs, channels.toSeq)
    IdeCommit(tmp.getAbsolutePath, partitionId)
  }

  override def abort(): Unit = {
    val tmp = new File(path, s".part-$partitionId-$taskId.ide.tmp")
    if (tmp.exists()) tmp.delete()
  }

  override def close(): Unit = ()
}
