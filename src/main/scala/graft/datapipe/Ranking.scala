package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical relevance scoring over a document corpus: term frequencies,
  * document frequencies, TF-IDF term ranking, and BM25 query scoring.
  * These are the retrieval/quality primitives a training-data pipeline
  * uses for corpus search, near-topic filtering, and per-document
  * salient-term extraction.
  *
  * Scale shapes:
  *  - termCounts: explode + partial-aggregated groupBy(doc, term) —
  *    the map-side combine collapses repeated terms before shuffle, so
  *    shuffle volume is bounded by per-doc DISTINCT terms, not tokens.
  *  - docFreq / corpus stats: a second aggregation whose output is
  *    vocabulary-sized — tiny next to the corpus, always broadcast.
  *  - tfidf/bm25: fact-side termCounts stream-joined against the
  *    BROADCAST vocabulary table; no fact-to-fact shuffle anywhere.
  *
  * Ranking determinism: top-k uses integer sort keys (tf desc, df asc,
  * term asc) — never the floating score — so the selected rows are
  * bit-identical across engines even though ln() differs by ulps.
  */
object Ranking {

  /** Whitespace tokenization into lowercase terms — the single
    * tokenizer shared with the repetition/quality operators (the
    * DuckDB oracles replicate its exact semantics, so there must be
    * only one).
    */
  def termsOf(text: Column): Column = TextAnalysis.tokensOf(text)

  /** (doc_id, term, tf) — one row per distinct term per document. */
  def termCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(termsOf(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** (term, df) document frequencies — vocabulary-sized. */
  def docFreq(tc: DataFrame): DataFrame =
    tc.groupBy("term").agg(count(lit(1)).as("df"))

  /** Top-k terms per document by TF-IDF. The rank orders on
    * (tf desc, df asc, term asc) — all integers/strings — and the
    * smoothed score ln(1 + N/df) * tf is emitted for inspection.
    *
    * Pass a materialized (cached) `termCounts` table via `tc` when
    * running several ranking queries: Spark does not share the
    * explode/aggregate lineage across the tc and docFreq branches, so
    * without it the corpus is tokenized once per branch.
    */
  def tfidfTopK(docs: DataFrame, k: Int, tc: Option[DataFrame] = None): DataFrame = {
    val tcDf = tc.getOrElse(termCounts(docs))
    val df = docFreq(tcDf)
    val n = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tcDf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        (col("tf") * log(lit(1.0) + col("n_docs").cast("double") / col("df")))
          .as("tfidf"))
  }

  /** Okapi BM25 score of a fixed query-term set against every
    * document. idf is the standard smoothed form
    * ln(1 + (N - df + 0.5)/(df + 0.5)); document length is the
    * whitespace token count — derived as sum(tf) from the term-count
    * table, so the corpus text is never re-scanned; avgdl/N come from
    * one corpus-stats aggregate (broadcast). The only touch of the
    * raw docs table is a metadata-only count(*).
    *
    * Scale shape: ONE exchange of the term-count table (the per-doc
    * aggregate). That aggregate computes doc length AND collects the
    * query-term hits in the same pass; the explode, the broadcast
    * joins (vocab-sized df, 1-row stats) and the re-aggregation all
    * preserve the doc_id partitioning, so no further shuffle of
    * doc-grain data. Non-matching docs drop before the explode.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           tc: Option[DataFrame] = None): DataFrame = {
    val tcDf = tc.getOrElse(termCounts(docs))
    val df = docFreq(tcDf)
    val perDoc = tcDf.groupBy("doc_id").agg(
      sum("tf").cast("double").as("dl"),
      // collect_list skips the otherwise-branch nulls, so qtf holds
      // exactly this doc's query-term (term, tf) hits
      collect_list(when(col("term").isInCollection(queryTerms),
        struct(col("term"), col("tf")))).as("qtf"))
    val stats = docs.select(count(lit(1)).cast("double").as("n_docs"))
      .crossJoin(broadcast(perDoc.select(avg("dl").as("avgdl"))))
    perDoc.filter(size(col("qtf")) > 0)
      .select(col("doc_id"), col("dl"), explode(col("qtf")).as("hit"))
      .select(col("doc_id"), col("dl"),
        col("hit.term").as("term"), col("hit.tf").as("tf"))
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + col("dl") / col("avgdl") * b)))
      .groupBy("doc_id")
      .agg(sum("contrib").as("bm25"), count(lit(1)).as("n_matched"))
  }
}
