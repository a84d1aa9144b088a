package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WAV sink (reference `tools.py:227-254`): audio is inherently a
  * single-machine artifact, so this is a collect-to-driver action —
  * the one operator class where that is the right design. Mono input
  * duplicates the left channel exactly as the reference does
  * (`tools.py:246-247`).
  *
  * Format parity: scipy.io.wavfile.write stores float64 input as an
  * IEEE-float (format 3) WAV, so we do the same: interleaved stereo
  * float64 little-endian.
  */
object WavSink {

  /** Write one or two (channel,t,v) signals as a stereo WAV. Each
    * side is collected time-ordered; lengths must match when both
    * sides are given.
    */
  def writeWav(filename: String, sampleRate: Int, left: DataFrame,
               right: Option[DataFrame] = None): Unit = {
    def samples(df: DataFrame): Array[Double] =
      df.orderBy("t").select(col("v").cast("double")).collect().map(_.getDouble(0))
    val l = samples(left)
    val r = right.map(samples).getOrElse(l)
    require(l.length == r.length, s"left/right length mismatch: ${l.length} vs ${r.length}")
    writeArrays(filename, sampleRate, l, r)
  }

  def writeArrays(filename: String, sampleRate: Int, l: Array[Double], r: Array[Double]): Unit = {
    val nFrames = l.length
    val blockAlign = 2 * 8 // stereo * sizeof(double)
    val dataBytes = nFrames * blockAlign
    val buf = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("ASCII"))
      .put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(3) // WAVE_FORMAT_IEEE_FLOAT
      .putShort(2) // channels
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(64) // bits per sample
      .put("data".getBytes("ASCII")).putInt(dataBytes)
    var i = 0
    while (i < nFrames) {
      buf.putDouble(l(i))
      buf.putDouble(r(i))
      i += 1
    }
    val out = new DataOutputStream(new FileOutputStream(filename))
    try out.write(buf.array()) finally out.close()
  }
}
