package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: documents are
  * concatenated in a deterministic order within each shard and cut
  * into fixed token-budget chunks (the concat-and-chunk convention —
  * a document whose span crosses a boundary straddles two bins).
  *
  * Scale shape: one shuffle on the shard key; the running token
  * offset is an UNBOUNDED PRECEDING window sum (incremental O(n) per
  * partition, no driver state, no sequential bin-packing loop). Shard
  * = the unit a trainer reads independently, so bin ids only need to
  * be unique within a shard.
  */
object Packing {

  /** Assign each document its token span and chunk range.
    * `tokens` must be an integer token-count column; ordering within
    * a shard is (orderCol asc) and must be unique per shard for
    * determinism. Emits start_off (tokens before this doc in its
    * shard), bin_first/bin_last (chunk ids the doc lands in). A
    * zero-token doc yields bin_last < bin_first (occupies no chunk).
    */
  def packChunks(docs: DataFrame, tokens: Column, budget: Long,
                 shard: Column, orderCol: Column): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val start = coalesce(sum(tokens).over(w), lit(0L))
    docs
      .withColumn("tokens", tokens.cast("long"))
      .withColumn("start_off", start)
      .withColumn("bin_first", floor(col("start_off") / budget))
      // tokens = 0 must yield bin_last = bin_first - 1 for ANY offset
      // (floor((start-1)/budget) only does so at budget boundaries)
      .withColumn("bin_last",
        when(col("tokens") > 0,
          floor((col("start_off") + col("tokens") - 1) / budget))
          .otherwise(col("bin_first") - 1))
  }

  /** Two-level form of `packChunks`: identical output, but the
    * running offset is computed as (within-block prefix sum) +
    * (block-level offset), so one shard no longer serializes through
    * a single task — the same block-stitching trick as
    * `Interp.interp1dQuadraticWindowed` / `ParallelIIR`.
    *
    * `block` must be MONOTONE NON-DECREASING in `orderCol` within
    * each shard (e.g. floor(doc_id / 4096) when ordering by doc_id),
    * so that ordering by (block, orderCol) equals ordering by
    * orderCol alone. Stage 1 windows over (shard, block) — parallel
    * across blocks; stage 2 prefix-sums the per-block totals — one
    * row per block, thousands of times smaller; the offsets then
    * BROADCAST-join back (map-side, no second shuffle of the data).
    * All sums are exact longs, so the output is bit-identical to the
    * single-window form.
    */
  def packChunksBlocked(docs: DataFrame, tokens: Column, budget: Long,
                        shard: Column, orderCol: Column, block: Column): DataFrame = {
    val base = docs
      .withColumn("tokens", tokens.cast("long"))
      .withColumn("__shard", shard)
      .withColumn("__block", block.cast("long"))
    val wLoc = Window.partitionBy(col("__shard"), col("__block")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLoc = base.withColumn("__loc", coalesce(sum(col("tokens")).over(wLoc), lit(0L)))
    val wBlk = Window.partitionBy(col("__shard")).orderBy(col("__block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__shard"), col("__block"))
      .agg(sum(col("tokens")).as("__btot"))
      .withColumn("__boff", coalesce(sum(col("__btot")).over(wBlk), lit(0L)))
      .select(col("__shard"), col("__block"), col("__boff"))
    withLoc.join(broadcast(offsets), Seq("__shard", "__block"))
      .withColumn("start_off", col("__boff") + col("__loc"))
      .withColumn("bin_first", floor(col("start_off") / budget))
      .withColumn("bin_last",
        when(col("tokens") > 0,
          floor((col("start_off") + col("tokens") - 1) / budget))
          .otherwise(col("bin_first") - 1))
      .drop("__shard", "__block", "__loc", "__boff")
  }

  /** Overlapping passage windows per document (retrieval/pretraining
    * chunking): passage p covers tokens [p*stride, p*stride+chunk);
    * the last passage starts at ceil(max(n-chunk,0)/stride)*stride so
    * every token is covered and trailing windows shorter than `chunk`
    * are emitted as-is. Pure map-side (tokenize, per-row sequence
    * explode, array slice) — NO shuffle at all; passage count per doc
    * is 1 + ceil(max(n-chunk,0)/stride).
    */
  def passages(docs: DataFrame, chunk: Int, stride: Int,
               id: Column = col("doc_id"),
               text: Column = col("text")): DataFrame = {
    require(chunk > 0 && stride > 0, "chunk and stride must be positive")
    val extra = greatest(size(col("toks")) - chunk, lit(0))
    val lastPid = floor((extra + (stride - 1)).cast("double") / stride).cast("int")
    docs
      .select(id.as("doc_id"), TextAnalysis.tokensOf(text).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), lastPid)).as("pid"))
      .select(col("doc_id"), col("pid").cast("long").as("pid"),
        slice(col("toks"), col("pid") * stride + 1, lit(chunk)).as("ptoks"))
      .select(col("doc_id"), col("pid"),
        size(col("ptoks")).cast("long").as("n_tokens"),
        array_join(col("ptoks"), " ").as("passage"))
  }
}
