package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analogs of the batch operators (SURVEY §2.13 —
  * the reference is strictly batch; these are the engine's streaming
  * extension): tumbling/sliding windowed RMS with watermarked late
  * data, and a stateful trailing moving-RMS via
  * flatMapGroupsWithState (filter state = ring buffer per channel,
  * the same shape an IIR filter's state would take).
  */
object StreamingOps {

  /** Per-root-session streaming clone: same SparkContext, isolated
    * SQL conf. Stateful operators create one state store per shuffle
    * partition per batch; at smoke scale the per-store commit overhead
    * dwarfs the data, so streaming queries plan with few partitions —
    * set on the CLONE, so concurrent batch queries on the caller's
    * session keep their own partition count (mutating the shared conf
    * around each start() silently re-planned concurrent queries and
    * could restore a stale value on interleaved calls).
    */
  private val streamSessions =
    scala.collection.concurrent.TrieMap.empty[SparkSession, SparkSession]

  private def streamSession(root: SparkSession): SparkSession =
    streamSessions.getOrElseUpdate(root, {
      val s = root.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "8")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // evict on context shutdown so a long-lived process that cycles
      // many root sessions doesn't retain stopped clones (each pinning
      // SQL conf/state) indefinitely
      root.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          streamSessions.remove(root)
      })
      s
    })

  /** The events fixture as a file-source stream: (channel, ts, v).
    * Schema is taken from a static read (required by file sources);
    * TIMESTAMP(NANOS) arrives as int64 nanos (see Channels.rawEvents)
    * and is reduced to a microsecond timestamp. The stream is built on
    * the streaming clone session (see `streamSession`).
    */
  private def rawStream(root: SparkSession, sfDir: String): (DataFrame, org.apache.spark.sql.Column) = {
    val spark = streamSession(root)
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val ts =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts").cast("timestamp")
    (raw, ts)
  }

  def eventsStream(root: SparkSession, sfDir: String): DataFrame = {
    val (raw, ts) = rawStream(root, sfDir)
    raw.select(col("event_type").as("channel"), ts.as("ts"), col("value").as("v"))
  }

  /** The events fixture as a per-user stream (user_id, ts, value) —
    * the input shape of streaming sessionization.
    */
  def userEventsStream(root: SparkSession, sfDir: String): DataFrame = {
    val (raw, ts) = rawStream(root, sfDir)
    raw.select(col("user_id"), ts.as("ts"), col("value"))
  }

  /** The documents fixture as a bounded file stream (doc_id, text,
    * lang, source) — the input shape of streaming corpus dedup and
    * the streaming PII scrub.
    */
  def documentsStream(root: SparkSession, sfDir: String): DataFrame = {
    val spark = streamSession(root)
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
  }

  /** The embeddings fixture as a bounded file stream (vec_id,
    * embedding, label) — the input shape of streaming ANN admission.
    */
  def embeddingsStream(root: SparkSession, sfDir: String): DataFrame = {
    val spark = streamSession(root)
    val schema = spark.read.parquet(s"$sfDir/embeddings.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
  }

  /** Streaming exact-dedup on the normalized-text fingerprint — the
    * streaming twin of `Dedup.exact`: `dropDuplicates` keeps one row
    * per (source, fingerprint) across micro-batches (state = one
    * entry per distinct key in the state store), then counts unique
    * documents per source. Which arrival survives is up to batch
    * scheduling, so the OUTPUT aggregates only key-determined values
    * (the count of distinct fingerprints) — deterministic and equal
    * to batch SQL over the bounded source. On an unbounded stream
    * with event time, `dropDuplicatesWithinWatermark` is the
    * state-bounded swap (the doc fixture is timeless, so state here
    * is fingerprint-cardinality-sized — exactly the batch dedup's
    * shuffle width).
    */
  def streamFingerprintDedup(stream: DataFrame): DataFrame =
    stream
      .withColumn("fp", graft.datapipe.TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("source", "fp")
      .groupBy("source").agg(count(lit(1)).as("n_unique"))

  /** Streaming sessionization via the native session_window operator:
    * per-user sessions close when no event arrives within `gap`. This
    * is the streaming analog of datapipe.Sessions.sessionize — state
    * (the open session per user) lives in the state store and merges
    * across micro-batches; the watermark bounds how late an event may
    * extend a session. Note the boundary convention differs from the
    * batch lag-based form: session_window merges strictly-closer-than-
    * gap events (gap >= threshold starts a new session).
    */
  def sessionWindows(stream: DataFrame, gap: String = "8 hours",
                     watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), col("sum_value"))

  /** Sliding-window RMS per channel with a watermark for late data —
    * the streaming analog of mov_rms over wall-clock windows.
    */
  def windowedRms(stream: DataFrame, windowDur: String = "1 day",
                  slideDur: String = "12 hours", watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("channel"))
      .agg(sqrt(avg(col("v") * col("v"))).as("rms"), count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("channel"), col("rms"), col("n"))

  case class Sample(channel: String, us: Long, v: Double)
  case class RmsOut(channel: String, us: Long, rms: Double)
  case class RingState(values: List[Double])

  /** Trailing n-sample moving RMS as explicit keyed state: each
    * channel keeps the last n-1 squared samples between micro-batches.
    * Within a batch, samples are processed in time order.
    */
  def statefulMovRms(stream: DataFrame, n: Int = 16): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val typed = stream
      .select(col("channel"), unix_micros(col("ts")).as("us"), col("v"))
      .as[Sample]
    typed.groupByKey(_.channel)
      .flatMapGroupsWithState[RingState, RmsOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (channel: String, rows: Iterator[Sample], state: GroupState[RingState]) =>
          var buf = state.getOption.map(_.values).getOrElse(Nil)
          // (us, v) order: v as tie-break makes duplicate-timestamp
          // processing deterministic (and oracle-reproducible)
          val out = rows.toSeq.sortBy(s => (s.us, s.v)).map { s =>
            buf = (buf :+ (s.v * s.v)).takeRight(n)
            RmsOut(channel, s.us, math.sqrt(buf.sum / buf.length))
          }
          state.update(RingState(buf))
          out.iterator
      }.toDF()
  }

  case class IirState(z: Array[Double])
  case class FiltOut(channel: String, us: Long, v: Double)

  /** Continuous IIR filtering over a stream: per channel, the filter's
    * direct-form-II-transposed delay line is the keyed state, so the
    * recurrence continues seamlessly across micro-batches (SURVEY
    * §2.13: "filter state = last inputs/outputs per channel"). Within
    * a batch, samples are processed in time order.
    */
  def statefulIir(stream: DataFrame, b: Array[Double], a: Array[Double]): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val typed = stream
      .select(col("channel"), unix_micros(col("ts")).as("us"), col("v"))
      .as[Sample]
    typed.groupByKey(_.channel)
      .flatMapGroupsWithState[IirState, FiltOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (channel: String, rows: Iterator[Sample], state: GroupState[IirState]) =>
          // (us, v) tie-break: duplicate timestamps process in a
          // deterministic order (same as statefulMovRms)
          val sorted = rows.toArray.sortBy(s => (s.us, s.v))
          val zi = state.getOption.map(_.z).orNull
          val (y, zf) = graft.dsp.IIR.lfilterWithState(b, a, sorted.map(_.v), zi)
          state.update(IirState(zf))
          Iterator.tabulate(sorted.length)(i => FiltOut(channel, sorted(i).us, y(i)))
      }.toDF()
  }

  /** STREAM-STREAM dedup admission via foreachBatch incremental
    * components maintenance: each micro-batch merges its arrivals'
    * band-collision edges (vs the persisted corpus, vs prior
    * arrivals, AND vs each other — the case stream-static joins
    * cannot see) into the maintained cluster state through
    * [[graft.datapipe.Dedup.admitIncrementalBatch]], so N arriving
    * clones of each other are admitted exactly once even when
    * nothing similar is persisted.
    *
    * `init` builds the initial state — (bands (doc_id, band, sig),
    * clusters (doc_id, cluster)) of the persisted corpus — on the
    * MICRO-BATCH's session (catalog tables and parquet paths are the
    * safe cross-session carriers; live DataFrames are not). State and
    * per-batch results are eagerly localCheckpoint'ed: bounded
    * lineage across arbitrarily many batches, and the result frames
    * stay valid after their batch ends. At production scale the state
    * update would be written back to the bucketed warehouse tables
    * each batch instead of re-checkpointed.
    */
  def runIncrementalAdmit(stream: DataFrame,
                          init: SparkSession => (DataFrame, DataFrame)): DataFrame = {
    def ckpt(df: DataFrame): DataFrame = {
      val snap = df.localCheckpoint(true)
      // shed carried stats (see Dedup.connectedComponents.ckpt)
      df.sparkSession.createDataFrame(snap.rdd, snap.schema)
    }
    var state: Option[(DataFrame, DataFrame)] = None
    val results = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val (bands0, comp0) = state.getOrElse {
            val (b, c) = init(batch.sparkSession)
            (ckpt(b), ckpt(c))
          }
          val (res, nb, nc) = graft.datapipe.Dedup.admitIncrementalBatch(
            batch.select(col("doc_id"), col("text")), bands0, comp0)
          results += ckpt(res)
          state = Some((ckpt(nb), ckpt(nc)))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    results.reduceOption(_ unionAll _).getOrElse {
      val s = stream.sparkSession
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cluster",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("admitted",
            org.apache.spark.sql.types.BooleanType))))
    }
  }

  /** Drive a streaming DataFrame to completion over the (bounded) file
    * source and return the materialized result — the batch-driven
    * smoke harness for streaming queries.
    */
  def runToMemorySink(df: DataFrame, name: String, mode: String = "append"): DataFrame = {
    // partition count is a property of df's own session (the streaming
    // clone for eventsStream-derived plans) — nothing global to toggle
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }
}
