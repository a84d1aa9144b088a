package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event log — the canonical
  * behavioral-analytics operator a training-data pipeline needs when
  * events (user actions, crawl fetches, log lines) must be grouped
  * into bounded interaction episodes.
  *
  * Scale shape: ONE shuffle on the user key; session boundaries are a
  * lag + running-sum over the per-user ordered window, so every user's
  * events land in one partition once and both the boundary detection
  * and the per-session aggregation reuse that single exchange+sort
  * (the aggregation keys (user, session_seq) are a prefix-extension of
  * the window partitioning). No driver-side state, no self-join.
  */
object Sessions {

  /** Assign a per-user session sequence number: a new session starts
    * when the gap to the previous event exceeds `gapSec`. `usCol` is
    * an exact integer-microsecond column (Channels.rawEvents provides
    * one); ordering is (us, idCol) so ties are deterministic across
    * engines.
    */
  def sessionize(events: DataFrame, gapSec: Long,
                 userCol: String = "user_id", usCol: String = "us",
                 idCol: String = "event_id"): DataFrame =
    sessionizeMicros(events, gapSec * 1000000L, userCol, usCol, idCol)

  /** Microsecond-grain variant: a new session starts when the gap is
    * STRICTLY greater than `gapUs`. To express a `gap >= G` boundary
    * (session_window's convention) pass `gapUs = G - 1`.
    */
  def sessionizeMicros(events: DataFrame, gapUs: Long,
                       userCol: String = "user_id", usCol: String = "us",
                       idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(usCol), col(idCol))
    val prevUs = lag(col(usCol), 1).over(w)
    val isStart = when(
      prevUs.isNull || col(usCol) - prevUs > gapUs,
      1L).otherwise(0L)
    events.withColumn("session_seq",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregates: event count, duration in seconds (exact
    * integer microsecond arithmetic), value sum. Groups on
    * (user, session_seq) — co-partitioned with the sessionize window,
    * so this adds no second shuffle.
    */
  def sessionStats(events: DataFrame, gapSec: Long,
                   userCol: String = "user_id", usCol: String = "us",
                   idCol: String = "event_id",
                   valueCol: String = "value"): DataFrame =
    sessionize(events, gapSec, userCol, usCol, idCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        ((max(col(usCol)) - min(col(usCol))) / 1000000.0).as("dur_sec"),
        sum(col(valueCol)).as("sum_value"))
}
