package graft.datapipe

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing for co-located joins — the storage-level
  * answer to repeated shuffles on the same key. A corpus written
  * `bucketBy(key)` is hash-partitioned ON DISK: every later join or
  * aggregation on that key reads the matching layout and the planner
  * elides the Exchange on each bucketed side entirely (asserted in
  * Round13Spec). At 100 TB this is the difference between re-shuffling
  * the corpus for every join-back (dedup verdicts, quality gates,
  * span rewrites all join on doc_id) and shuffling it ONCE at write
  * time; `sortBy` additionally pre-sorts within buckets so sort-merge
  * joins skip their per-task sorts.
  *
  * Spark-specific caveats encoded here rather than re-discovered:
  * bucketed output must go through `saveAsTable` (plain parquet
  * `save` silently drops the bucket spec), and both join sides must
  * agree on the bucket count (or be integer multiples, with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally in-bucket-sorted)
    * managed table, replacing any previous incarnation — including
    * the leftover warehouse DIRECTORY a dropped table leaves behind
    * (the r11 idempotency lesson: DROP TABLE alone makes the next
    * saveAsTable die with LOCATION_ALREADY_EXISTS on a re-run).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    graft.streaming.StreamingOps.dropTableAndDir(df.sparkSession, table)
    val w = df.write.bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket key. The
    * planner sees both sides' bucket specs and inserts no Exchange —
    * the join is task-local by construction.
    */
  def coLocatedJoin(s: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    s.table(left).join(s.table(right), key)
}
