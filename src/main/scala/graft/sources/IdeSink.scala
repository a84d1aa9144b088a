package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import MideSchema._

/** MIDE-style `.ide` writer — the fixture/interop counterpart of
  * [[IdeSource]], mirroring the reference's recording layout
  * (`io.py:186-301`): one `RecordingProperties` header (channel and
  * subchannel definitions, recording origin), then per-channel
  * `ChannelDataBlock`s with [start, end) timecodes and a packed
  * little-endian payload.
  *
  * Like [[WavSink]], this is a driver-side single-file action — a
  * recording is inherently a single artifact; the distributed half of
  * the story is the READ path, which splits on blocks.
  *
  * Values are stored raw: raw = (v - calB) / calA, so the reader's
  * calibration v = a*raw + b round-trips. Float64 with a=1, b=0 is
  * bit-exact; int16 is the quantized path real sensors use.
  */
object IdeSink {

  /** One subchannel definition: display name, engineering units, and
    * the linear calibration applied on read.
    */
  final case class Sub(name: String, unit: String, calA: Double = 1.0, calB: Double = 0.0)

  /** One channel: `frames(i)(s)` is frame i of subchannel s — frames
    * are interleaved subchannel-major within a frame, the MIDE shape
    * for e.g. a 3-axis accelerometer block. `startUs` offsets the
    * channel's first sample from the recording origin.
    */
  final case class Ch(id: Int, name: String, sampleRate: Double, fmt: Int,
                      subs: Seq[Sub], frames: Array[Array[Double]],
                      blockFrames: Int, startUs: Long = 0L) {
    require(subs.nonEmpty, s"channel $name: no subchannels")
    require(frames.forall(_.length == subs.length),
      s"channel $name: frame width != ${subs.length} subchannels")
    require(blockFrames > 0, s"channel $name: blockFrames must be positive")
    def periodUs: Long = math.round(1e6 / sampleRate)
  }

  def write(filename: String, timeBaseUtcUs: Long, channels: Seq[Ch]): Unit = {
    import Ebml._
    val out = new BufferedOutputStream(new FileOutputStream(filename), 1 << 16)
    try {
      out.write(master(EbmlHeader,
        utf8Element(DocType, "mide"),
        uintElement(DocTypeVersion, 2L)))

      val chDefs = channels.map { c =>
        master(ChannelDef,
          (Seq(
            uintElement(ChannelID, c.id.toLong),
            utf8Element(ChannelName, c.name),
            floatElement(SampleRate, c.sampleRate),
            uintElement(ValueFormat, c.fmt.toLong)) ++
            c.subs.zipWithIndex.map { case (s, i) =>
              master(SubChannelDef,
                uintElement(SubChannelID, i.toLong),
                utf8Element(SubChannelName, s.name),
                utf8Element(SubChannelUnits, s.unit),
                floatElement(CalCoefA, s.calA),
                floatElement(CalCoefB, s.calB))
            }): _*)
      }
      out.write(master(RecordingProperties,
        (uintElement(TimeBaseUTC, timeBaseUtcUs) +:
          master(ChannelList, chDefs: _*) +: Nil): _*))

      for (c <- channels) {
        val step = c.periodUs
        var first = 0
        while (first < c.frames.length) {
          val n = math.min(c.blockFrames, c.frames.length - first)
          val startUs = c.startUs + first.toLong * step
          val endUs = startUs + n.toLong * step
          val bpv = bytesPerValue(c.fmt)
          val buf = ByteBuffer.allocate(n * c.subs.length * bpv)
            .order(ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < n) {
            var s = 0
            while (s < c.subs.length) {
              val sub = c.subs(s)
              val raw = (c.frames(first + i)(s) - sub.calB) / sub.calA
              c.fmt match {
                case FmtInt16 => buf.putShort(math.round(raw).toShort)
                case FmtFloat32 => buf.putFloat(raw.toFloat)
                case FmtFloat64 => buf.putDouble(raw)
              }
              s += 1
            }
            i += 1
          }
          out.write(master(ChannelDataBlock,
            uintElement(ChannelIDRef, c.id.toLong),
            uintElement(StartTimeCodeAbs, startUs),
            uintElement(EndTimeCodeAbs, endUs),
            element(ChannelDataPayload, buf.array())))
          first += n
        }
      }
    } finally out.close()
  }
}
