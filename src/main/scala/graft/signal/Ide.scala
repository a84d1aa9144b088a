package graft.signal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IdeSource

/** The reference's enDAQ file surface over the native `.ide` DSv2
  * source — `Endaq` / `EndaqChannel` (`io.py:160-301`) re-expressed
  * as DataFrames:
  *
  *  - `channelList` ≡ `Endaq.channel_list` (`io.py:175-184`): every
  *    subchannel display name, channel-definition order.
  *  - `getChannel` ≡ `Endaq.get_channel` (`io.py:208-239`): resolve a
  *    subchannel BY NAME, raising if absent, and return its
  *    (name, unit, t, v) series — the 5-tuple a `Channel` carries.
  *    The name→id resolution happens on the driver against the
  *    header; the data scan then pushes `ch = id` into the source,
  *    where it prunes whole blocks (visible as `blocks=k/n` in the
  *    plan).
  *  - `startTimes` ≡ `EndaqChannel.start_time` (`io.py:249-254`):
  *    per-subchannel absolute first-sample time, epoch microseconds
  *    (UTC, the reference's tz="utc" + naive index).
  */
object Ide {

  /** All samples: (ch, sub, t, v), t in seconds since the recording
    * origin — `to_pandas(time_mode="seconds")` (`io.py:256-261`).
    * `path` may be a directory of rollover files: t is continuous
    * across files on the earliest file's clock.
    */
  def read(spark: SparkSession, path: String, partitionBytes: Long = 128L << 20): DataFrame =
    spark.read.format(IdeSource.NAME)
      .option("partitionBytes", partitionBytes).load(path)

  /** Continuous ingestion of a recorder fleet's upload directory:
    * each micro-batch reads the `.ide` files that arrived since the
    * last one (name-sorted, count-offset — the standard immutable-
    * file stream contract). Same (ch, sub, t, v) schema as `read`,
    * with t anchored on the first file's clock so it is comparable
    * across batches and restarts.
    */
  def readStream(spark: SparkSession, path: String,
                 partitionBytes: Long = 128L << 20): DataFrame =
    spark.readStream.format(IdeSource.NAME)
      .option("partitionBytes", partitionBytes).load(path)

  /** Distributed write: one rollover `.ide` file per partition into
    * `path` — the fleet-upload layout `read`/`readStream` consume.
    * Spark inserts the cluster-by-channel exchange and (ch, t, sub)
    * sort the writer declares via `RequiresDistributionAndOrdering`;
    * the input needs columns (ch, sub, t, v).
    */
  def write(df: DataFrame, path: String, timeBaseUs: Long = 0L,
            blockFrames: Int = 256): Unit =
    df.write.format(IdeSource.NAME)
      .option("timeBaseUs", timeBaseUs)
      .option("blockFrames", blockFrames)
      .mode("append")
      .save(path)

  /** Header as a table: one row per (channel, subchannel). */
  def channels(spark: SparkSession, path: String): DataFrame =
    spark.read.format(IdeSource.NAME).option("mode", "channels").load(path)

  def channelList(spark: SparkSession, path: String): DataFrame =
    channels(spark, path).select(col("sub_name").as("name"), col("unit"))

  /** One subchannel by display name; error-if-absent per the
    * reference contract. Block pruning makes this read only the
    * resolved channel's bytes.
    */
  def getChannel(spark: SparkSession, path: String, name: String): DataFrame = {
    val meta = IdeSource.readMultiMeta(IdeSource.resolveFiles(path))
    val hit = (for {
      c <- meta.channels
      (s, i) <- c.subs.zipWithIndex
      if s.name == name
    } yield (c.id, i, s.unit)).headOption
    val (chId, subId, unit) = hit.getOrElse(
      throw new IllegalArgumentException(s"Channel does not exist: $name"))
    read(spark, path)
      .filter(col("ch") === chId && col("sub") === subId)
      .select(lit(name).as("name"), lit(unit).as("unit"), col("t"), col("v"))
  }

  /** Per-subchannel absolute start time in epoch microseconds:
    * TimeBaseUTC + the subchannel's first block timecode — taken
    * straight from the block headers' integer `startUs` (a metadata
    * scan, no data read). The pre-r9 form recovered it from the
    * double-typed `t` column as `(t*1e6).cast(long)`, whose
    * multiply-then-truncate round trip could land 1 µs low for
    * non-representable values; integer block timecodes can't.
    */
  def startTimes(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val meta = IdeSource.readMultiMeta(IdeSource.resolveFiles(path))
    val firstByCh: Map[Int, Long] =
      meta.blocks.groupBy(_.ch).map { case (ch, bs) => ch -> bs.map(_.startUs).min }
    val rows = for {
      c <- meta.channels
      first <- firstByCh.get(c.id).toSeq
      s <- c.subs
    } yield (s.name, meta.timeBaseUs + first)
    rows.toDF("name", "start_us")
  }
}
