package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) as opaque
  * `binary` columns plus typed metadata, processed in batched
  * per-partition kernels — the Scala analog of `mapInPandas`: one
  * executor task streams many records through a vectorizable decode
  * function without per-row UDF overhead.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake
  * width/height/frames from the byte content. The Spark-side contract
  * — schema, binary transport, partition-batched execution, feature
  * array output — is real and tested.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte])
  // feature histogram in DOUBLE: counts/n divides identically in any
  // engine, so the whole decode output is oracle-checkable value-exact
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, n_frames: Int,
                           features: Array[Double])

  /** Build a synthetic media table from the documents fixture: text
    * bytes stand in for encoded media payloads (deterministic, so
    * tests are reproducible).
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      to_binary(col("text"), lit("utf-8")).as("bytes"))

  /** Decode step. Audio is REAL: if the payload is a RIFF/WAVE byte
    * stream, the fmt/data chunks are parsed and n_frames/width(=sample
    * rate)/height(=channels) come from the actual header. Image/video
    * remain STUBBED (no codec libraries in this environment):
    * deterministic fake dimensions derived from content bytes, so the
    * pipeline shape stays testable. Emits per-record metadata + an
    * 8-dim byte-histogram feature vector either way.
    */
  def decodeStub(rec: MediaRecord): MediaFeatures = {
    val n = rec.bytes.length
    // Only records DECLARED audio attempt the real RIFF/WAVE header
    // parse: an image/document payload that merely looks RIFF-shaped
    // must take the deterministic stub path below (which the DuckDB
    // oracle always replays — the kind gate keeps engine and oracle on
    // the same branch for every non-audio payload).
    if (rec.kind == "audio") wavInfo(rec.bytes) match {
      case Some((sr, nCh, frames)) =>
        return MediaFeatures(rec.media_id, rec.kind, n, sr, nCh, frames,
          histogram(rec.bytes))
      case None => ()
    }
    // fake "header parse": dimensions derived from content bytes
    val b0 = if (n > 0) rec.bytes(0) & 0xff else 0
    val b1 = if (n > 1) rec.bytes(1) & 0xff else 0
    val width = 64 + (b0 % 64)
    val height = 64 + (b1 % 64)
    val nFrames = rec.kind match {
      case "video" => 1 + n % 30
      case "audio" => 1 + n % 1000
      case _ => 1
    }
    MediaFeatures(rec.media_id, rec.kind, n, width, height, nFrames,
      histogram(rec.bytes))
  }

  private def histogram(bytes: Array[Byte]): Array[Double] = {
    val n = bytes.length
    val hist = new Array[Double](8)
    var i = 0
    while (i < n) {
      hist((bytes(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    if (n > 0) { var j = 0; while (j < 8) { hist(j) /= n; j += 1 } }
    hist
  }

  /** aHash-style perceptual hash over the decoded byte stream: the
    * payload is cut into `bits` equal segments and bit j is set iff
    * segment j's mean byte value exceeds the whole-payload mean —
    * the average-hash construction every image near-dup pipeline
    * uses, with the stub decode being the identity on bytes (swap in
    * a real decode → grayscale-resize and the same expression tree
    * applies to the pixel stream). All comparisons are exact cross-
    * multiplied integers (seg_sum·n_total > total_sum·n_seg) — no
    * float boundary, engine-portable.
    *
    * Scale shape: ONE fused per-row loop inside whole-stage codegen
    * ([[graft.functions.PerceptualHash64]]) — no per-byte explode, no
    * shuffle, composes under readStream unchanged. Pairs then go
    * through the SAME banded-hamming path as SimHash
    * (`Dedup.hammingNearDups`) — the near-dup machinery is
    * signature-agnostic.
    */
  def perceptualHash(media: DataFrame): DataFrame =
    media.filter(length(col("bytes")) > 0)
      .select(col("media_id"),
        graft.functions.PerceptualHash.perceptualHash64(col("bytes")).as("phash"))

  /** The distributed-aggregate formulation of the same hash —
    * identical bits (equality test-asserted). Kept as the reference
    * implementation and for payloads that arrive pre-exploded; the
    * expression form above is the production path (no ×n_bytes row
    * blowup, no shuffle, streams unchanged).
    */
  def perceptualHashExploded(media: DataFrame, bits: Int = 52): DataFrame = {
    val seg = media
      .select(col("media_id"), hex(col("bytes")).as("hx"),
        length(col("bytes")).as("n"))
      .filter(col("n") > 0)
      .select(col("media_id"), col("hx"), col("n"),
        explode(expr("sequence(1, n)")).as("pos"))
      .select(col("media_id"),
        expr(s"((pos - 1) * $bits) div n").as("seg"),
        conv(expr("substring(hx, pos * 2 - 1, 2)"), 16, 10).cast("long").as("v"))
      .groupBy("media_id", "seg")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
    val tot = seg.groupBy("media_id")
      .agg(sum("s").as("ts"), sum("c").as("tc"))
    seg.join(tot, Seq("media_id"))
      .groupBy("media_id")
      .agg(sum(when(col("s") * col("tc") > col("ts") * col("c"),
          pow(lit(2.0), col("seg"))).otherwise(lit(0.0)))
        .cast("long").as("phash"))
  }

  /** Parse a RIFF/WAVE byte payload: Some((sampleRate, nChannels,
    * nFrames)) when the bytes really are a WAV stream.
    */
  private def wavInfo(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    // malformed RIFF-lookalike payloads fall back to the stub path
    // instead of failing the whole partition task
    try wavInfoUnsafe(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def wavInfoUnsafe(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 44) return None
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val a = new Array[Byte](4); b.get(a); new String(a, "ASCII") }
    if (tag() != "RIFF") return None
    b.getInt()
    if (tag() != "WAVE") return None
    var fmt: Option[(Int, Int)] = None // (sampleRate, nChannels)
    var bytesPerFrame = 0
    while (b.remaining() >= 8) {
      val id = tag()
      val len = b.getInt()
      if (len < 0 || len > b.remaining()) return fmt.map { case (sr, nc) => (sr, nc, 0) }
      id match {
        case "fmt " =>
          val p = b.position()
          b.getShort()
          val nCh = b.getShort() & 0xffff
          val sr = b.getInt()
          b.getInt()
          bytesPerFrame = b.getShort() & 0xffff
          fmt = Some((sr, nCh))
          b.position(p + len + (len & 1))
        case "data" =>
          return fmt.map { case (sr, nc) =>
            (sr, nc, if (bytesPerFrame > 0) len / bytesPerFrame else 0) }
        case _ => b.position(b.position() + len + (len & 1))
      }
    }
    fmt.map { case (sr, nc) => (sr, nc, 0) }
  }

  /** Partition-batched feature extraction over a media table
    * (media_id, kind, bytes). The batch shape (one iterator per
    * partition) is what a vectorized decoder needs; swap `decodeStub`
    * for a real codec to productionize.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("bytes"))
      .as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

  /** Resize plan for image/video records: target dimensions capped at
    * `maxDim` preserving aspect ratio, computed with integer
    * arithmetic (floor(dim * maxDim / longest side)) — engine-exact,
    * no floats. The actual pixel resample would happen in the decode
    * kernel; this is the planning step a pipeline shuffles on.
    */
  def resizePlan(features: DataFrame, maxDim: Int = 128): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    features.filter(col("kind") =!= "audio")
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        when(longest <= maxDim, col("width"))
          .otherwise(floor(col("width") * maxDim / longest))
          .cast("int").as("out_w"),
        when(longest <= maxDim, col("height"))
          .otherwise(floor(col("height") * maxDim / longest))
          .cast("int").as("out_h"))
  }

  /** Deterministic frame sampling plan for video records: every k-th
    * frame index up to n_frames — pure expressions, no decode needed.
    */
  def sampleFrames(features: DataFrame, everyK: Int = 5): DataFrame =
    features.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))
}
