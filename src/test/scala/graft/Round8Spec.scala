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

  test("duplicateSpanStats survives a universal boilerplate span and matches the literal form") {
    import graft.datapipe.Dedup
    // 10 real docs + 50 clones of doc 0: every clone shares every
    // window with 50 siblings — the degenerate hot-h fixture (one
    // span hash carried by 51 documents)
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val fixture = d.filter(col("doc_id") < 10).select(col("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") === 0)
        .select(explode(sequence(lit(1000L), lit(1049L))).as("doc_id"), col("text")))
    val stats = Dedup.duplicateSpanStats(fixture, w = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // clones duplicate every window (their text is identical to doc 0)
    assert(stats(1000L)._1 === stats(1000L)._2)
    assert(stats(0L)._1 === stats(0L)._2)
    assert(stats.keys.count(_ >= 1000L) === 50)
    // grain-reduced join-back must agree with the literal
    // window-per-row formulation it replaced
    val spans = Dedup.spanTable(fixture, 10)
    val dup = spans.select(col("doc_id"), col("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2)
      .select(col("h"), lit(1).as("dup"))
    val literal = spans.join(dup, Seq("h"), "left").groupBy("doc_id")
      .agg(count(lit(1)).as("nw"), count(col("dup")).as("ndup"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats === literal)
  }

  test("duplicateSpanStats join-back ships no span strings") {
    import graft.datapipe.Dedup
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val plan = Dedup.duplicateSpanStats(d, w = 10)
      .queryExecution.executedPlan.toString
    // the join operator's output must be hash-grain integers only —
    // the span string column never reaches a join
    val joinLines = plan.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")).toSeq
    assert(joinLines.nonEmpty)
    assert(!joinLines.exists(_.contains("span")), joinLines.mkString("\n"))
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
