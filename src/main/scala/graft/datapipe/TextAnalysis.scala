package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  * All pure Column expressions (whole-stage codegen, no UDFs) and
  * deliberately restricted to engine-portable primitives (md5,
  * regexp_replace with ASCII classes, replace) so every operator has
  * an exact DuckDB oracle.
  */
object TextAnalysis {

  /** Lowercased, punctuation-collapsed text — the canonical form used
    * by fingerprinting and shingling.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, single punctuation
    * marks (ASCII-only pattern so Java and RE2 regex agree).
    */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpePattern), lit(0)))

  /** Occurrences of a literal substring — the replace-count trick,
    * portable across engines with identical semantics. Literal
    * `replace`, not a quoted regex: the regex engine costs ~5x on
    * long documents.
    */
  def occurrences(padded: Column, needle: String): Column =
    (length(padded) - length(call_function("replace", padded, lit(needle), lit("")))) / needle.length

  /** n-gram-free language-ID heuristic: CJK detection via the
    * bytes-vs-chars excess ratio, then stopword voting for
    * en/de/fr/es. Deterministic tie-break order (en > de > fr > es).
    *
    * Each language's vote is one CountOccurrencesSum — a fused
    * zero-allocation indexOf scan with replace-identical counting
    * semantics (see the expression's scaladoc), so the replace-trick
    * DuckDB oracle stays value-exact while the hot path stops copying
    * every document once per stopword.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    def score(words: Seq[String]): Column =
      graft.functions.CountOccurrencesSum.countOccurrencesSum(
        padded, words.map(w => s" $w "))
    val en = score(Seq("the", "and", "is", "of", "to"))
    val de = score(Seq("der", "und", "die", "ist", "das", "nicht"))
    val fr = score(Seq("le", "et", "les", "est", "une", "pas"))
    val es = score(Seq("el", "que", "los", "es", "una", "por"))
    val nonAsciiRatio = (octet_length(text) - length(text)).cast("double") / length(text)
    when(nonAsciiRatio > 0.3, lit("zh"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  private def countMatches(text: Column, pattern: String): Column =
    (length(text) - length(regexp_replace(text, pattern, ""))).cast("double")

  /** Heuristic quality score in [0,1]: penalize extreme digit /
    * punctuation / uppercase density and too-short documents.
    * Components exposed for inspection; deterministic arithmetic only.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val n = length(text).cast("double")
    val digits = countMatches(text, "[0-9]")
    val punct = countMatches(text, "[^a-zA-Z0-9 ]")
    val upper = countMatches(text, "[A-Z]")
    val tokens = wsTokenCount(text).cast("double")
    val avgTokenLen = n / tokens
    Seq(
      "digit_ratio" -> digits / n,
      "punct_ratio" -> punct / n,
      "upper_ratio" -> upper / n,
      "n_tokens" -> tokens,
      "avg_token_len" -> avgTokenLen)
  }

  def qualityScore(text: Column): Column = {
    val cols = qualityColumns(text).toMap
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val digitPenalty = least(cols("digit_ratio") * 4.0, lit(1.0))
    val punctPenalty = least(cols("punct_ratio") * 3.0, lit(1.0))
    val upperPenalty = least(cols("upper_ratio") * 2.0, lit(1.0))
    greatest(lit(0.0),
      lenScore * (lit(1.0) - digitPenalty * 0.4 - punctPenalty * 0.3 - upperPenalty * 0.3))
  }

  /** The Gopher quality-rule battery (Rae et al. 2021 §A1.1) as
    * per-rule booleans + the conjunction — the published doc-level
    * filter set, kept separate from the heuristic [[qualityScore]]
    * because pipelines cite and tune THESE rules by name. Every
    * threshold compare is integer cross-multiplied (3n ≤ Σlen ≤ 10n
    * instead of a float mean), so the verdict replays bit-exactly in
    * SQL; the one emitted float (mean word length) is display-only.
    * The repetition rules of the same appendix live in
    * [[repetition]]/[[dupNgramCoverage]] — compose with this battery
    * via a join on doc_id. Pure map-side projection: streams as-is.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    // The stopword rule is word-level (Gopher A1.1 counts stop WORDS,
    // not substrings): match against the punctuation-stripped token
    // array so "the," / "with." still count (r13 advice — the old
    // space-padded `contains` missed stopwords adjacent to
    // punctuation). `stripped` is projected as its own column in a
    // separate select so the 8 array_contains probes share ONE
    // transform evaluation (CollapseProject won't inline a non-cheap
    // expression referenced 8×; HOF lambdas get no CSE — PLANS.md).
    val base = docs.filter(col("text").isNotNull).select(
      col("doc_id"), col("text"), tokensOf(col("text")).as("toks"))
      .withColumn("stripped",
        transform(col("toks"), w => regexp_replace(w, "[^a-z]", "")))
    val toks = col("toks")
    val n = size(toks)
    val totLen = aggregate(transform(toks, w => length(w)),
      lit(0L), (acc, l) => acc + l)
    val alphaWords = size(filter(toks, w => w.rlike("[a-z]")))
    val symbols = regexp_count(col("text"), lit("#|\\.\\.\\.|…")).cast("long")
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => when(array_contains(col("stripped"), w), 1).otherwise(0))
      .reduce(_ + _)
    base.select(
      col("doc_id"),
      n.cast("long").as("n_words"),
      round(totLen.cast("double") / n + 1e-7, 4).as("mean_word_len"),
      (n >= 50 && n <= 100000).as("ok_word_count"),
      (totLen >= n * 3 && totLen <= n * 10).as("ok_mean_word_len"),
      (symbols * 10 <= n).as("ok_symbol_ratio"),
      (alphaWords * 5 >= n * 4).as("ok_alpha_words"),
      (stopHits >= 2).as("ok_stopwords"))
      .withColumn("pass",
        col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_symbol_ratio") && col("ok_alpha_words") && col("ok_stopwords"))
  }

  /** Document fingerprint: md5 of the normalized text (exact-dedup
    * key). 32 hex chars.
    */
  def fingerprint(text: Column): Column = md5(to_binary(normalized(text), lit("utf-8")))

  /** A 52-bit integer hash of any string expression, derived from md5
    * so it is identical in Spark and DuckDB. 52 bits keep it exact in
    * a double and positive in a signed 64-bit int.
    */
  def hash52(c: Column): Column =
    conv(substring(md5(to_binary(c, lit("utf-8"))), 1, 13), 16, 10).cast("long")

  /** Lowercased whitespace tokens as an array column. */
  def tokensOf(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Adjacent-token bigrams, built map-side from the token array
    * (zip_with over two slices — no shuffle, no window needed to pair
    * neighbors).
    */
  def bigramsOf(tokens: Column): Column =
    zip_with(
      slice(tokens, lit(1), size(tokens) - 1),
      slice(tokens, lit(2), size(tokens) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** Gopher-style repetition signals per document: token counts,
    * distinct-token ratio, and the fraction of tokens claimed by the
    * most frequent unigram / bigram. High top-n-gram fractions flag
    * degenerate machine-generated or boilerplate text.
    *
    * Scale shape: explode + two-level aggregation keyed (doc, gram) —
    * map-side partial aggregation collapses repeats before the
    * shuffle, so shuffle volume is per-doc distinct grams. All ratios
    * are exact integer divisions (bit-identical across engines, no
    * rounding needed).
    *
    * Pass a materialized per-(doc, term) frequency table via `tc`
    * (Ranking.termCounts shape) to derive the unigram statistics from
    * it instead of re-tokenizing the corpus — only the bigram branch
    * then touches the text.
    */
  def repetition(docs: DataFrame, tc: Option[DataFrame] = None): DataFrame = {
    val toks = docs.select(col("doc_id"), tokensOf(col("text")).as("toks"))
    val uniBase = tc.getOrElse(
      toks.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val uni = uniBase
      .groupBy("doc_id").agg(
        sum("tf").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("tf").as("top_tok_n"))
    val bi = toks.select(col("doc_id"), explode(bigramsOf(col("toks"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_bigrams"),
        max("c").as("top_bigram_n"))
    uni.join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"),
        (col("top_tok_n").cast("double") / col("n_tokens")).as("top_tok_frac"),
        (col("top_bigram_n").cast("double") / col("n_bigrams")).as("top_bigram_frac"))
  }

  /** Gopher-style duplicate n-gram COVERAGE per document (Rae et al.
    * 2021 §A1.1: "fraction of characters in duplicate n-grams", here
    * at token grain): the fraction of a document's token positions
    * covered by at least one n-gram that occurs ≥ 2 times WITHIN the
    * document. Complements [[repetition]]'s top-1-gram fractions: a
    * doc can have a flat gram histogram and still be 90% covered by
    * a rotating set of repeated phrases — this is the signal that
    * catches lyrics/boilerplate/template spam. Distinct from the
    * cross-corpus `Dedup.substrDedup` family: duplication is judged
    * per document, and overlapping duplicate occurrences are counted
    * once via the covered-position union (the same coverage algebra
    * as the exact-substring rewrite).
    *
    * Scale shape: ZERO exchanges — duplication is a per-document
    * property and the document's tokens live in one row, so the whole
    * signal is a map-side expression: build (gram, pos) structs,
    * `array_sort` (struct ordering = by gram then pos), mark
    * positions whose gram equals a sorted neighbor's (an occurrence
    * is duplicated iff it touches an equal neighbor in sorted order —
    * O(L log L), no per-gram counting), union the covered windows via
    * flatten + `array_distinct`. Also makes the operator a pure
    * PROJECTION, so the streaming twin runs append-mode with no state
    * store. Ratios are exact IEEE divisions of integers
    * (bit-identical in DuckDB).
    */
  def dupNgramCoverage(docs: DataFrame, n: Int = 6): DataFrame =
    docs.select(col("doc_id"), tokensOf(col("text")).as("t"))
      // long to match the oracle's BIGINT len() — the driver's value
      // hash is dtype-sensitive
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        dupNgramCov(col("t"), n).as("dup_cov"))
      .select(col("doc_id"), col("n_tokens"), col("dup_cov"),
        (col("dup_cov").cast("double") / col("n_tokens")).as("dup_frac"))

  /** The covered-position count behind [[dupNgramCoverage]], as a
    * single Column over the token array (usable on streams and inside
    * other projections). ANSI-safe: every `element_at` at a sorted
    * boundary and the empty-gram case are guarded by lazily-evaluated
    * `when` branches (CaseWhen only evaluates the taken branch).
    *
    * Evaluation shape: the sorted gram array is LET-BOUND once per
    * row via a single-element `transform` (the lambda variable is
    * computed once; every `element_at(sorted, i)` inside the body is
    * then an O(1) read). The naive inline form re-evaluated the
    * `array_sort(grams)` subtree for every index access — higher-order
    * lambdas get no common-subexpression elimination, so that was
    * O(L² log L) per document and made the streaming twin (which
    * really materializes the column; batch `.count()` prunes the
    * projection) ~1000× slower than this O(L log L) form.
    */
  def dupNgramCov(t: Column, n: Int): Column = {
    val lastStart = size(t) - (n - 1)
    val grams = filter(
      transform(sequence(lit(1), size(t)), p =>
        struct(concat_ws(" ", slice(t, p, lit(n))).as("g"), p.as("pos"))),
      s => s("pos") <= lastStart)
    // let-bind the sort result: transform over a 1-element wrapper
    // evaluates `array_sort(grams)` exactly once per row and exposes
    // it to the body as a cheap lambda-variable reference
    element_at(
      transform(array(array_sort(grams)), sorted => {
        val m = size(sorted)
        val dupPos = filter(
          transform(sequence(lit(1), m), i =>
            when(
              when(i === 1, lit(false))
                .otherwise(element_at(sorted, i - 1)("g") === element_at(sorted, i)("g"))
                || when(i === m, lit(false))
                  .otherwise(element_at(sorted, i + 1)("g") === element_at(sorted, i)("g")),
              element_at(sorted, i)("pos"))),
          p => p.isNotNull)
        val cov = array_distinct(
          flatten(transform(dupPos, p => sequence(p, p + (n - 1)))))
        when(m > 0, size(cov).cast("long")).otherwise(lit(0L))
      }),
      1)
  }

  /** Word-bigram language-model score per document — the CCNet-style
    * "LM filter" quality signal (CCNet uses KenLM perplexity; the
    * distributed analog is a corpus-trained bigram model, which needs
    * no external artifacts and trains in the same job). Score =
    * mean over the doc's adjacent-token bigrams of
    * ln((c(w1,w2)+1) / (c(w1,·)+V)) — add-one-smoothed conditional
    * log-probability; V = corpus vocabulary size. Boilerplate-heavy
    * or formulaic text scores high, lexically incoherent text low;
    * threshold either tail for curation.
    *
    * Scale shape: the model IS an aggregate of the corpus — bigram
    * counts (one (doc,gram)-partial-agg'd exchange, the `repetition`
    * discipline) and predecessor totals derived from the bigram table
    * (no second text scan). Scoring joins the per-(doc, bigram)
    * multiplicity table against the model on the bigram key; Catalyst
    * broadcasts the model when it fits (vocab², KBs on fixtures, and
    * even web-scale bigram vocabularies are ~GBs next to the corpus),
    * else it's a narrow-key shuffle join. V is the one collected
    * scalar (a count), folded as a literal.
    */
  def lmScore(docs: DataFrame, tc: Option[DataFrame] = None,
              vocabSizeHint: Option[Long] = None): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), tokensOf(col("text")).as("toks"))
    // NOTE (r19, measured and reverted): materializing docBig/cb with
    // within-call localCheckpoints made this query ~1.5x SLOWER — AQE
    // already reuses the canonically-identical shuffle stages across
    // the three branches at runtime, and the checkpoints replaced that
    // free reuse with persist jobs.
    val docBig = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(bigramsOf(col("toks"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
    val cb = docBig.groupBy("g").agg(sum("n").as("cb"))
    val cw = cb.select(substring_index(col("g"), " ", 1).as("w1"), col("cb"))
      .groupBy("w1").agg(sum("cb").as("cw"))
    // V from the shared (doc, term) table when the caller has one
    // materialized — saves a corpus-wide tokenize + distinct exchange
    // the vocabulary size is ONE number per corpus — callers scoring
    // repeatedly against the same corpus pass the memoized count
    // instead of paying a distinct-count job at every plan build (r18)
    val v = vocabSizeHint.getOrElse(tc match {
      case Some(t) => t.select(col("term")).distinct().count()
      case None => toks.select(explode(col("toks")).as("w")).distinct().count()
    })
    docBig.join(cb, Seq("g"))
      .join(cw, substring_index(col("g"), " ", 1) === col("w1"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"),
        sum(col("n") * (log(col("cb") + 1) - log(col("cw") + v))).as("ll"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("ll") / col("n_bigrams"), 6).as("lm_score"))
  }

  /** `lmScore` against an EXTERNALLY supplied model corpus — the
    * composition form: the model trains on the raw corpus (a batch
    * artifact, like trained centroids or BPE merges) and scores any
    * downstream representation of the text (rewritten, scrubbed).
    * Bigrams or predecessors absent from the model fall back to the
    * smoothed floor (count 0 via left join + coalesce) — exactly what
    * add-one smoothing is for; with `modelDocs eq docs` this reduces
    * to `lmScore` (every bigram is then in the model).
    */
  def lmScoreAgainst(docs: DataFrame, modelDocs: DataFrame,
                     modelTc: Option[DataFrame] = None): DataFrame = {
    val mToks = modelDocs.filter(col("text").isNotNull)
      .select(tokensOf(col("text")).as("toks"))
    val cb = mToks.filter(size(col("toks")) >= 2)
      .select(explode(bigramsOf(col("toks"))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cb"))
    val cw = cb.select(substring_index(col("g"), " ", 1).as("w1"), col("cb"))
      .groupBy("w1").agg(sum("cb").as("cw"))
    val v = modelTc match {
      case Some(t) => t.select(col("term")).distinct().count()
      case None => mToks.select(explode(col("toks")).as("w")).distinct().count()
    }
    val docBig = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), tokensOf(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(bigramsOf(col("toks"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
    docBig
      .join(cb, Seq("g"), "left")
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(cw, Seq("w1"), "left")
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"),
        sum(col("n") * (log(coalesce(col("cb"), lit(0L)) + 1) -
          log(coalesce(col("cw"), lit(0L)) + v))).as("ll"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("ll") / col("n_bigrams"), 6).as("lm_score"))
  }

  /** DSIR-style importance score (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): hashed-n-gram
    * bag-of-words importance weights for selecting raw data that
    * looks like a TARGET corpus. Features are unigrams + adjacent
    * bigrams hashed into `buckets` slots; the raw and target bucket
    * distributions are add-one-smoothed multinomials fit on the full
    * corpus and on the `isTarget` subset; a document's log importance
    * weight is Σ_b c_b·(ln p̂_tgt[b] − ln p̂_raw[b]). The paper
    * resamples with Gumbel noise; the deterministic engine surface is
    * the per-feature-mean log weight (rank/threshold it for
    * selection), `lmScore`'s exact discipline: every ln takes an
    * INTEGER argument (identical in both engines), the one
    * order-sensitive per-doc sum is absorbed by round(·, 6).
    *
    * Scale shape: one corpus tokenize → hashed features at (doc,
    * bucket) grain (map-side partial agg; ≤ `buckets` rows per doc);
    * both model distributions come from ONE aggregate of that table
    * (a conditional target sum — no second text scan, the `lmScore`
    * discipline) at ≤ `buckets` rows, COLLECTED into two plan-literal
    * arrays (the k-means-centroid pattern: the model is bounded by
    * `buckets`, never by the corpus), so the scoring pass is a pure
    * map-side `element_at` over the feature table — no model join at
    * all, and the corpus-scale lineage runs exactly twice (model fit
    * + scoring) instead of once per model branch. The target
    * predicate rides the feature table as a boolean column — at
    * 100 TB the target corpus is typically a separate small input,
    * which composes the same way (union with a flag column).
    */
  def dsirScore(docs: DataFrame, isTarget: Column,
                buckets: Int = 4096): DataFrame = {
    val feats = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), isTarget.as("is_tgt"), tokensOf(col("text")).as("toks"))
      .select(col("doc_id"), col("is_tgt"),
        explode(concat(col("toks"), bigramsOf(col("toks")))).as("g"))
      .select(col("doc_id"), col("is_tgt"),
        pmod(hash52(col("g")), lit(buckets)).as("b"))
    val docB = feats.groupBy("doc_id", "b")
      .agg(count(lit(1)).as("c"), first(col("is_tgt")).as("is_tgt"))
    val rcArr = Array.fill(buckets)(0L)
    val tcArr = Array.fill(buckets)(0L)
    docB.groupBy("b")
      .agg(sum("c").as("rc"),
        sum(when(col("is_tgt"), col("c")).otherwise(lit(0L))).as("tc"))
      .collect()
      .foreach { r =>
        val b = r.getLong(0).toInt
        rcArr(b) = r.getLong(1)
        tcArr(b) = r.getLong(2)
      }
    val rTot = rcArr.sum + buckets
    val tTot = tcArr.sum + buckets
    val idx = (col("b") + 1).cast("int")
    docB.groupBy("doc_id")
      .agg(sum("c").as("n_feats"),
        sum(col("c") * ((log(element_at(typedLit(tcArr), idx) + 1) - log(lit(tTot))) -
          (log(element_at(typedLit(rcArr), idx) + 1) - log(lit(rTot))))).as("lw"))
      .select(col("doc_id"), col("n_feats"),
        round(col("lw") / col("n_feats"), 6).as("dsir_score"))
  }

  /** PII redaction patterns — deliberately the common subset of Java
    * regex and RE2 (ASCII classes, bounded quantifiers, no
    * backreferences/lookaround) so the redaction replays exactly in
    * the DuckDB oracle. Order matters and is part of the contract:
    * emails first (their local parts contain digit runs), then IPv4
    * (dotted digits would otherwise be eaten as digit runs), then
    * bare long digit runs (account/card/phone-ish numbers).
    */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val digitRunPattern = "[0-9]{7,}"

  /** Masked text + per-stage match counts: the admission-time PII
    * scrub every published training-data pipeline runs before
    * pretraining. Counts are computed on the text each stage actually
    * sees (post-prior-stage), so n_email + n_ip + n_num is exactly
    * the number of `<EMAIL>`/`<IP>`/`<NUM>` masks in the output.
    *
    * Scale shape: pure per-row regex projections — whole-stage
    * codegen, no shuffle, no UDF; composes with any stream (the same
    * Column works under readStream) and with `Sampling`/`Dedup`
    * stages order-independently.
    */
  def redactPii(docs: DataFrame, textCol: String = "text",
                keep: Seq[String] = Nil): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, emailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, ipv4Pattern, "<IP>")
    val t3 = regexp_replace(t2, digitRunPattern, "<NUM>")
    docs.select(col("doc_id") +: keep.map(col) ++: Seq(
      size(regexp_extract_all(t0, lit(emailPattern), lit(0))).as("n_email"),
      size(regexp_extract_all(t1, lit(ipv4Pattern), lit(0))).as("n_ip"),
      size(regexp_extract_all(t2, lit(digitRunPattern), lit(0))).as("n_num"),
      t3.as("redacted")): _*)
  }
}
