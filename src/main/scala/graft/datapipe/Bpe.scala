package graft.datapipe

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StringType, StructField, StructType}

/** Byte-pair-encoding MERGE TRAINING over the corpus vocabulary — the
  * natural next step from top-K terms (`q_vocab`) toward tokenizer
  * seeding: each round counts adjacent symbol pairs across the
  * (word, freq) vocabulary, merges the globally most frequent pair,
  * and repeats (Sennrich et al. 2016's algorithm, restated over a
  * distributed vocabulary table).
  *
  * Scale shape: the only corpus-scale work is the ONE term-frequency
  * aggregate the caller already has (`Ranking.termCounts` /
  * the shared docTermCounts cache); every merge round runs over the
  * vocabulary-sized (word, freq, seg) table — an explode of adjacent
  * pairs + one partial-aggregated groupBy + a driver-side top-1
  * (|1 row| per round, the k-means-centroid pattern) + a map-side
  * literal string replace. Rounds are sequential by nature (each
  * merge depends on the last), so the round count, not the corpus,
  * bounds the critical path.
  *
  * Determinism / engine parity: pair counts are exact long sums; the
  * winning pair breaks ties on (count desc, left asc, right asc);
  * merge application is literal non-overlapping left-to-right
  * `replace` — identical semantics in Spark and DuckDB, so the whole
  * training run is oracle-replayable round by round.
  *
  * Symbol encoding: the segmentation is a single string of
  * angle-wrapped symbols, e.g. "lo" -> "<l><o><$>" ("$" is the
  * end-of-word marker). The vocabulary is restricted to purely
  * [a-z0-9] terms, so '<', '>' and '$' can never collide with symbol
  * content and `replace("<x><y>" -> "<xy>")` is exactly the BPE merge
  * (greedy leftmost, consecutive occurrences both merge because each
  * symbol carries its own delimiters).
  */
object Bpe {

  /** (word, freq, seg) initial vocabulary from a (doc_id, term, tf)
    * term-count table: freq = corpus frequency, seg = the char-level
    * segmentation with the end-of-word marker.
    */
  def initialVocab(termCounts: DataFrame): DataFrame =
    termCounts
      .filter(col("term").rlike("^[a-z0-9]+$"))
      .groupBy(col("term").as("word"))
      .agg(sum("tf").cast("long").as("freq"))
      // "$1" back-reference wraps every char; the end-of-word marker
      // is appended as a plain literal
      .withColumn("seg",
        concat(regexp_replace(col("word"), "(.)", "<$1>"), lit("<$>")))

  /** Adjacent symbol pairs of the current segmentation, weighted by
    * word frequency: one (x, y, cnt) row per distinct adjacent pair.
    */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"), split(trim(col("seg"), "<>"), "><").as("syms"))
      // fully-merged words (one symbol left) have no pairs — and
      // sequence(0, -1) would DESCEND, fabricating null pairs
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS x, syms[i + 1] AS y))"))
        .as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum("freq").as("cnt"))

  /** Run `rounds` BPE merge rounds and return the merge table
    * (round, x, y, cnt): at round r the pair (x, y) was the most
    * frequent adjacent pair (cnt occurrences, weighted by word freq)
    * and was merged into the new symbol x+y for every later round.
    */
  def merges(termCounts: DataFrame, rounds: Int): DataFrame = {
    val spark = termCounts.sparkSession
    // CONSTANT-SHAPE rounds (r19): the pre-r19 loop chained r literal
    // `replace` projections over one cached base, so round r's top-1
    // plan was r nodes deeper than round r−1's — every round
    // re-analyzed, re-optimized and re-CODEGENED a fresh plan (string
    // literals land in the codegen references array, but the growing
    // projection chain changes the generated source itself), and
    // round r re-executed all r replaces. Now each round's merge is
    // applied as ONE replace over the PREVIOUS round's materialized
    // segmentation (lazy localCheckpoint: the blocks persist as a
    // side effect of the round's own top-1 job — no extra job), so
    // every round runs the structurally identical plan
    //   scan(RDD) → replace → split/explode → agg → top-1
    // and the codegen cache hits from round 2 on. Values are
    // unchanged: applying merge r then counting pairs ≡ counting
    // pairs over the base with r pending replaces.
    var vocab = initialVocab(termCounts).localCheckpoint(eager = true)
    val base = vocab
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      r += 1
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (x, y, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Row(r, x, y, cnt)
        // literal left-to-right replace: every remaining adjacent
        // (x, y) fuses — consecutive occurrences too, because each
        // symbol carries its own delimiters
        if (r < rounds && !done)
          vocab = vocab.withColumn("seg",
            replace(col("seg"), lit(s"<$x><$y>"), lit(s"<$x$y>")))
            .localCheckpoint(eager = false)
      }
    }
    // intermediate checkpoint blocks are reclaimed by the context
    // cleaner once unreferenced
    base.unpersist(blocking = false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField("round", IntegerType, nullable = false),
        StructField("x", StringType, nullable = false),
        StructField("y", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))
  }

  /** ENCODE with a trained merge list — the other half of the
    * tokenizer loop (train → encode → count → pack). Applies the
    * merges IN TRAINING ORDER to each word of `words` (a one-column
    * `word` table) and returns (word, seg, n_tokens).
    *
    * Scale shape: this runs over DISTINCT WORDS — vocabulary-sized
    * work (millions of rows), never corpus-sized (trillions of token
    * positions); the corpus picks up its encodings through a join on
    * `word` (see `tokenCounts`). Each merge is the same map-side
    * literal `replace` training used, so encode(train-vocab) is
    * bit-identical to the final training segmentation. The plan
    * chains one projection per merge; the segmentation re-snapshots
    * every [[REMAT]] merges so plan depth stays bounded when the
    * merge list grows toward real tokenizer sizes.
    *
    * Ordering matters and is the standard BPE contract (Sennrich et
    * al. 2016): earlier merges create the symbols later merges
    * consume.
    */
  def encode(words: DataFrame, mergeList: Seq[(String, String)]): DataFrame = {
    var df = words
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .withColumn("seg",
        concat(regexp_replace(col("word"), "(.)", "<$1>"), lit("<$>")))
    mergeList.zipWithIndex.foreach { case ((x, y), i) =>
      if (i > 0 && i % REMAT == 0) df = df.localCheckpoint(eager = false)
      df = df.withColumn("seg",
        replace(col("seg"), lit(s"<$x><$y>"), lit(s"<$x$y>")))
    }
    df.select(col("word"), col("seg"),
      size(split(trim(col("seg"), "<>"), "><")).as("n_tokens"))
  }

  /** Per-document BPE token counts from a (doc_id, term, tf)
    * term-count table and a trained merge list: Σ tf·n_tokens(term)
    * for BPE-eligible terms plus one token per occurrence of
    * ineligible terms (the byte-fallback convention). The encode runs
    * once over the distinct-term table and joins back — corpus rows
    * never re-segment.
    */
  def tokenCounts(termCounts: DataFrame, mergeList: Seq[(String, String)]): DataFrame = {
    val enc = encode(termCounts.select(col("term").as("word")).distinct(), mergeList)
      .select(col("word").as("term"), col("n_tokens"))
    termCounts
      .join(enc, Seq("term"), "left")
      .groupBy("doc_id")
      .agg(sum(col("tf") * coalesce(col("n_tokens"), lit(1))).cast("long")
        .as("n_bpe_tokens"))
  }

  private val REMAT = 32
}
