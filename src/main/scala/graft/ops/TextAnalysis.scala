package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over a
  * documents table (doc_id, text, ...). Everything is built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs in the hot path) so filters
  * and projections stay inside WholeStageCodegen and push down to the scan.
  */
object TextAnalysis {

  /** Whitespace tokens (split on runs of whitespace). */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword proxy: alnum runs (with apostrophes) and single
    * punctuation marks — the same class regex as the engine tokenizer
    * (graft.text.Tok), written lookaround-free so the identical pattern
    * runs on RE2-based engines (DuckDB oracle).
    */
  val BpeishPattern = "[A-Za-z0-9']+|[^\\sA-Za-z0-9']"

  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Token counting per doc: whitespace tokens, distinct tokens, BPE-ish
    * subword count.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    // tokenize once into a column; the two size() uses then share it
    docs.select(col("doc_id"), wsTokens(col("text")).as("toks"),
      bpeishCount(col("text")).as("n_subwords"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        col("n_subwords"))

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Deterministic, tiny, inline (a gazetteer of function
    * words — the classic cheap language identifier).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "y", "una"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  /** Language ID: score = non-overlapping count of marker-word hits per
    * language over the whitespace tokens; predicted language = argmax,
    * ties broken by language code DESCENDING (deterministic — a zero-hit
    * doc therefore predicts "zh", the last code). Pure column algebra —
    * one pass, no shuffle, no UDF.
    *
    * Two documented approximations, both mirrored EXACTLY by the DuckDB
    * oracle (SparkEntry.langPredSqlExprs), so the cross-engine gate pins
    * them: (a) the replace-based count is non-overlapping — in
    * "the the the" the middle occurrence's surrounding spaces are consumed
    * by its neighbors' matches, so marker_hits = 2, not 3; (b) the
    * tie-break is the ASCIIbetically LARGEST code (greatest() on the
    * (score, lang) struct). Changing either side alone breaks the gate's
    * hash equality; change both together or neither.
    */
  def langId(docs: DataFrame): DataFrame = {
    // the padded token string is materialized once: every marker word's
    // length/replace pair references the attribute instead of re-running
    // the tokenize+concat chain (25 marker words -> 50 references)
    val toks = col("padded_toks")
    val scores = langMarkers.map { case (lang, words) =>
      val s = words.map { w =>
        // occurrence count of " w " in the padded token string
        ((length(toks) - length(replace(toks, lit(s" $w "), lit("")))) /
          lit(w.length + 2)).cast("int")
      }.reduce(_ + _)
      struct(s.as("score"), lit(lang).as("lang"))
    }
    // argmax: max on the (score, lang) struct — lang breaks ties DESCENDING
    val best = greatest(scores.map(s =>
      struct(s.getField("score").as("score"),
        s.getField("lang").as("lang"))): _*)
    docs.select(col("doc_id"), col("lang"),
      lower(concat(lit(" "),
        concat_ws(" ", wsTokens(lower(col("text")))), lit(" ")))
        .as("padded_toks"))
      .select(col("doc_id"), col("lang").as("lang_meta"),
        scores.map(s => s.getField("score")).reduce(_ + _).as("marker_hits"),
        best.getField("lang").as("lang_pred"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio,
    * type-token ratio — the standard cheap quality features; `quality` is
    * a deterministic [0,1] score combining them. Ratios are rounded to 6dp
    * so results are engine-portable (oracle-comparable).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    // tokenize ONCE into a projected column: the stopword filters and the
    // distinct/size uses below each reference the attribute instead of
    // re-running split+filter per use (HOF expressions sit outside
    // whole-stage codegen, so common-subexpression elimination never
    // collapses repeated wsTokens chains — measured as ~10 tokenize
    // passes per row in the one-select formulation)
    val toks = col("toks")
    val nTok = size(toks)
    val nChar = length(col("text"))
    val punct = (length(col("text")) -
      length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", "")))
    val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")
    val stopHits = stopwords.map(w =>
      size(filter(toks, t => lower(t) === lit(w)))).reduce(_ + _)
    docs.select(col("doc_id"), col("text"),
      wsTokens(col("text")).as("toks")).select(
      col("doc_id"),
      nChar.as("n_chars"),
      nTok.as("n_tokens"),
      round(nChar.cast("double") / greatest(nTok, lit(1)), 6).as("avg_token_len"),
      round(punct.cast("double") / greatest(nChar, lit(1)), 6).as("punct_ratio"),
      round(stopHits.cast("double") / greatest(nTok, lit(1)), 6).as("stopword_ratio"),
      round(size(array_distinct(toks)).cast("double") / greatest(nTok, lit(1)), 6)
        .as("type_token_ratio"))
  }

  /** Windowed fingerprint digest (winnowing-style, DuckDB-checkable): the
    * lowercased whitespace tokens are cut into consecutive w-token blocks,
    * each block md5-hashed; emits the block count and the min/max block
    * hash — the digest an incremental dedup index would store per doc. The
    * xxhash64-chain variant (fingerprint below) is the cheap at-scale path;
    * this one exists so the windowing logic has a driver-checkable oracle.
    */
  def windowFingerprint(docs: DataFrame, w: Int = 8): DataFrame = {
    // tokens and the per-window hash array are each materialized as a
    // projected column before reuse: `slice(toks, ...)` inside the
    // transform lambda would otherwise re-tokenize the text per window
    // (lambda bodies see the raw expression, not a shared value), and
    // array_min/array_max would each recompute the whole hash array
    val nw = ceil(size(col("toks")).cast("double") / w).cast("int")
    val hashes = transform(sequence(lit(0), col("n_windows") - 1), k =>
      md5(concat_ws(" ", slice(col("toks"), k * w + 1, lit(w)))
        .cast("binary")))
    docs.select(col("doc_id"), wsTokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), col("toks"), nw.as("n_windows"))
      .select(col("doc_id"), col("n_windows"),
        when(col("n_windows") > 0, hashes).as("hashes"))
      .select(col("doc_id"), col("n_windows"),
        array_min(col("hashes")).as("win_md5_min"),
        array_max(col("hashes")).as("win_md5_max"))
  }

  /** Document fingerprints: md5 content hash (exact-dedup key) and a
    * 64-bit rolling hash over whitespace tokens — order-sensitive (token
    * swaps change it) and whitespace/casing-robust — computed with
    * `aggregate` folding xxhash64(acc, token) (hash chaining; no raw
    * multiply, so ANSI-mode safe).
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val toks = wsTokens(lower(col("text")))
    val rolling = aggregate(
      toks,
      lit(1469598103934665603L), // FNV offset basis as seed
      (acc, t) => xxhash64(acc, t))
    docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_md5"),
      rolling.as("rolling_hash"))
  }

  /** Gopher-style repetition filters over a lines-bearing text column —
    * the standard boilerplate screens a training-data pipeline runs before
    * anything model-based (Rae et al. 2021 §A1.1: duplicate-line fraction,
    * duplicate-line character fraction, top n-gram fraction).
    *
    * Per doc: `n_lines`, `dup_line_frac` (lines occurring more than once,
    * all occurrences, over total lines), `dup_line_char_frac` (characters
    * in those lines over total line characters), `top_bigram_frac` (count
    * of the most frequent token 2-gram over total 2-grams). Ratios are
    * rounded to 6dp (engine-portable).
    *
    * Plan shape at scale: two narrow explode passes (lines, bigrams), each
    * into a (doc_id, key) partial-aggregated groupBy, re-aggregated to
    * doc granularity, then a doc_id join — all map-side-combined
    * shuffles on (doc_id, key); nothing is collected.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val lineCounts = docs
      .select(col("doc_id"),
        explode(filter(split(col("text"), "\n"), l => length(l) > 0))
          .as("line"))
      .groupBy(col("doc_id"), col("line"))
      .agg(count(lit(1)).as("cnt"))
    val lineAgg = lineCounts.groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("n_lines"),
      round(coalesce(
        sum(when(col("cnt") > 1, col("cnt"))).cast("double") /
          sum(col("cnt")), lit(0.0)), 6).as("dup_line_frac"),
      round(coalesce(
        sum(when(col("cnt") > 1, col("cnt") * length(col("line"))))
          .cast("double") /
          greatest(sum(col("cnt") * length(col("line"))), lit(1)),
        lit(0.0)), 6).as("dup_line_char_frac"))
    // tokens materialized as a column BEFORE the lambda: element_at inside
    // the transform would otherwise re-tokenize the full text per bigram
    // position — O(tokens²) work per doc (lambda bodies inline the raw
    // expression; no CSE applies across HOF boundaries)
    val toks = col("toks")
    // guard: sequence(1, 0) DESCENDS in Spark and element_at(toks, 0)
    // throws under ANSI, so 0/1-token docs must short-circuit to no bigrams
    val bigrams = when(size(toks) >= 2, transform(
      sequence(lit(1), size(toks) - 1),
      k => concat_ws(" ", element_at(toks, k), element_at(toks, k + 1))))
      .otherwise(array().cast("array<string>"))
    val bigramCounts = docs
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), explode(bigrams).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
    val bigramAgg = bigramCounts.groupBy(col("doc_id")).agg(
      round(max(col("cnt")).cast("double") / sum(col("cnt")), 6)
        .as("top_bigram_frac"))
    lineAgg.join(bigramAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"), col("dup_line_frac"),
        col("dup_line_char_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
  }

  /** PII patterns (email / IPv4 / international-format phone) written
    * lookaround-free so the identical regex runs on Java (Spark) and RE2
    * (DuckDB oracle) engines.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d[\\d ()-]{7,}\\d"

  /** PII redaction: emails, then IPv4 addresses, then phone numbers are
    * replaced with typed placeholder tags (the order is part of the
    * contract — emails are replaced first so their alnum-dot bodies can
    * never be re-matched as addresses). Pure `regexp_replace` column
    * algebra: codegen'd, one pass per pattern, no UDF.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-doc PII scrub report: match counts per category (counted on the
    * ORIGINAL text) plus the md5 of the redacted text — what a curation
    * pipeline materializes to audit a scrub pass without storing raw PII.
    */
  def piiStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
        .as("n_ipv4"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
        .as("n_phones"),
      md5(redactPii(col("text")).cast("binary")).as("redacted_md5"))

  /** Top-k characteristic terms per document by tf-idf (smoothed:
    * tf · ln((N+1)/(df+1))) — the classic keyword/feature extractor a
    * training pipeline runs for topic tagging and quality filtering.
    *
    * Plan shape at scale: one narrow tokenize+explode pass → one
    * (doc_id, term) shuffle for tf → one (term) shuffle for df (rows =
    * vocabulary, FAR smaller than the corpus — Zipf) → tf⋈df sort-merge
    * on term → per-doc top-k window. All aggregates get map-side partial
    * combine; nothing is collected to the driver except the corpus-count
    * scalar (a parquet rowcount read from footer metadata).
    *
    * Ranking ties are broken by term ascending, and the rank ORDERS BY the
    * 4dp-ROUNDED score so an engine-vs-oracle ulp difference in ln cannot
    * flip adjacent ranks (both engines see identical rounded keys).
    */
  /** Okapi BM25 document ranking for a bag-of-terms query — the classic
    * lexical retrieval scorer (Robertson et al., TREC-3; the Lucene
    * `1 + (N - df + 0.5)/(df + 0.5)` non-negative idf variant).
    *
    * Plan shape at scale: ONE narrow pass computes per-doc length and
    * per-term tf (column algebra over the token array — no explode, no
    * per-term scan); corpus stats (N, avgdl, df per term) come from a
    * single 1-row aggregate that is broadcast back with a crossJoin — no
    * driver collect, no second shuffle. The final top-k is a
    * TakeOrderedAndProject, not a global sort. Ranking orders by the
    * 4dp-ROUNDED score (ties → doc_id asc) so an engine-vs-oracle ulp
    * difference in ln cannot flip adjacent ranks.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String], topK: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = queryTerms.map(_.toLowerCase).distinct
    // tokenize once into a column; each per-term filter references the
    // attribute instead of re-running the split (1 + |terms| tokenizations
    // per row in the one-select formulation)
    val toks = col("toks")
    val withTf = docs
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("toks"))
      .select(
        col("doc_id") +: size(toks).cast("bigint").as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(toks, x => x === lit(t))).cast("bigint").as(s"tf_$i")
          }: _*)
    val statAggs =
      avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = withTf.agg(count(lit(1)).as("n_docs"), statAggs: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    val scored = withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl").as("n_tokens"),
        round(score, 4).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc))
        .cast("bigint"))
  }

  /** Corpus-trained bigram language-model scoring — the CCNet-style
    * perplexity quality filter, with the LM trained on the corpus itself
    * (deterministic; no external model). Per doc: `n_bigrams` and
    * `avg_nll`, the mean add-one-smoothed negative log-likelihood
    * −ln((C(w1w2)+1)/(C(w1)+V)) over its token bigrams, where C(w1) is
    * the corpus context count (Σ_w2 C(w1,w2) — self-consistent with the
    * bigram table) and V the corpus vocabulary size. Docs with <2 tokens
    * have no bigrams and are not emitted. Per-bigram nll is rounded to
    * 6dp before averaging so engine/oracle sums see identical addends;
    * avg_nll is rounded to 4dp.
    *
    * Plan shape at scale: one explode pass → bigram stream; the count
    * tables are vocabulary-sized (Zipf — far smaller than the corpus);
    * context counts derive from the bigram table (no second corpus
    * pass); V is a 1-row aggregate broadcast via crossJoin. The scoring
    * join shuffles the bigram stream once on (w1,w2) and once on (w1) —
    * the unavoidable cost of exact corpus-LM scoring; all aggregates are
    * map-side partial-combined.
    */
  def bigramPerplexity(docs: DataFrame): DataFrame = {
    // tokens materialized as a column BEFORE the bigram lambda: the
    // element_at calls inside the transform would otherwise re-run the
    // whole split+filter tokenization per bigram position — O(tokens²)
    // per doc (no CSE across HOF lambda boundaries; measured 12.4 s →
    // ~1 s on the sf0.1 gate query)
    val toks = col("toks")
    val tokd = docs.select(col("doc_id"),
      wsTokens(lower(col("text"))).as("toks"))
    // guard: sequence(1, 0) DESCENDS in Spark and element_at(toks, 0)
    // throws under ANSI — 0/1-token docs must short-circuit to no bigrams
    val pairs = when(size(toks) >= 2, transform(
      sequence(lit(1), size(toks) - 1),
      k => struct(element_at(toks, k).as("w1"),
        element_at(toks, k + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val bg = tokd.select(col("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    // NOTE: pre-aggregating per-doc (doc_id,w1,w2) counts before the join
    // was measured SLOWER (65 s vs 20 s cold at sf0.1): bigrams seldom
    // repeat within one doc, so the extra full shuffle collapses nothing.
    // The bigram-count table cb is vocabulary-bounded (Zipf), so AQE
    // broadcasts it and the occurrence stream never reshuffles for the
    // join.
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
    val cw = cb.groupBy(col("w1")).agg(sum(col("cnt")).as("ctx"))
    val vocab = tokd.select(explode(toks).as("w"))
      .agg(countDistinct(col("w")).as("vocab"))
    bg.join(cb, Seq("w1", "w2")).join(cw, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(-log((col("cnt") + lit(1.0)) / (col("ctx") + col("vocab"))), 6)
          .as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nll")), 4).as("avg_nll"))
  }

  /** Per-stratum token-length distribution — the corpus report a
    * pretraining pipeline cuts before choosing packing lengths and length
    * filters: doc count, mean tokens, and EXACT interpolated percentiles
    * (p50/p90/p99 — Spark's `percentile`, same linear-interpolation
    * definition as DuckDB's `quantile_cont`, so the oracle recomputes it
    * bit-for-bit at 4dp). One narrow scan + one partial-aggregated
    * shuffle keyed by the stratum; exact percentiles buffer per-group
    * values, so at extreme cardinality×rows swap in approx_percentile —
    * the report contract stays the same.
    */
  def lengthStats(docs: DataFrame, strataCol: String = "lang"): DataFrame =
    docs
      .select(col(strataCol).as("stratum"),
        size(wsTokens(col("text"))).cast("double").as("n_tokens"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_tokens")), 4).as("mean_tokens"),
        round(percentile(col("n_tokens"), lit(0.5)), 4).as("p50"),
        round(percentile(col("n_tokens"), lit(0.9)), 4).as("p90"),
        round(percentile(col("n_tokens"), lit(0.99)), 4).as("p99"))

  /** Deterministic integer fixed-point natural log: lnQ30(k) ≈ ln(k)·2^30
    * computed with EXACT 64-bit-integer shift-and-square arithmetic (the
    * only wide step, the final ln2 multiply, goes through BigInt — DuckDB
    * mirrors it with HUGEINT). The point is not accuracy (it is accurate
    * to ~2^-26 nats ≈ 0.015 µnats anyway, asserted in EventsSpec) but
    * CROSS-ENGINE BIT-EQUALITY: every operation below is integer add,
    * multiply, or floor-division, so any engine that transcribes this
    * spec — the q_entropy oracle does, as a recursive CTE over
    * BIGINT/HUGEINT — produces the identical table with no libm/ulp
    * dependence at all.
    *
    * Spec (k ≥ 1; all divisions floor on non-negative values):
    *   1. m = k·2^30; while m ≥ 2^31: m = m div 2, e += 1   (m ∈ [2^30,2^31))
    *   2. 30×: m = (m·m) div 2^30;
    *           if m ≥ 2^31 then { f = 2f+1; m = m div 2 } else f = 2f
    *   3. lnQ30 = ((e·2^30 + f) · 744261118) div 2^30
    *      (744261118 = round(ln 2 · 2^30); the product needs 128 bits)
    */
  private[graft] def lnQ30(k: Long): Long = {
    // upper bound exclusive: k·2^30 must fit a signed 64-bit long, and at
    // k = 2^33 exactly the shift wraps negative instead of failing loudly
    require(k >= 1 && k < (1L << 33),
      s"lnQ30 domain is [1, 2^33), got $k")
    var m = k << 30
    var e = 0L
    while (m >= (1L << 31)) { m >>= 1; e += 1 }
    var f = 0L
    var j = 0
    while (j < 30) {
      m = (m * m) >> 30
      if (m >= (1L << 31)) { f = f * 2 + 1; m >>= 1 } else f = f * 2
      j += 1
    }
    (((BigInt(e) << 30) + f) * 744261118L >> 30).toLong
  }

  /** Token-distribution entropy per doc — the diversity signal quality
    * filters use to drop keyword-stuffed / boilerplate pages (low entropy)
    * without reading the text twice. H = -Σ p·ln(p) over the whitespace
    * unigram distribution, emitted in integer MICRO-nats with NO floating
    * point anywhere on the measured path (round 5; through r4 the per-term
    * value went through Math.log vs DuckDB ln before its round, a
    * documented theoretical 1-ulp/.5-boundary flake): per term,
    *   ΔI  = lnQ30(n) − lnQ30(c)                  (= ln(n/c)·2^30)
    *   ΔIµ = (ΔI·15625) div 2^24                  (= ln(n/c) in µnats;
    *                                               15625/2^24 = 10^6/2^30)
    *   h   = (2·c·ΔIµ + n) div (2·n)              (= round(c·ΔIµ/n))
    * then an exact integer SUM per doc — immune to float summation order,
    * decimal .5 boundaries AND libm ulp differences, because both engines
    * run the identical integer spec ([[lnQ30]]; the oracle's recursive
    * CTE). Worst-case deviation from true −(c/n)ln(c/n)·10^6 is ~1.6 µnats
    * per term (table ~0.02, ΔIµ floor < 1, final round ≤ 0.5).
    *
    * Shape: same two shuffles as tf-idf ((doc_id, term) counts with
    * map-side combine, then a doc_id rollup) plus one BROADCAST join of
    * the log table over distinct counts (bounded by max tokens per doc).
    * lnQ30 runs as a typed UDF only over those tiny distinct tables —
    * the hot per-(doc,term) path stays codegen'd integer column algebra.
    */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(wsTokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"))
    val lnU = udf((k: Long) => lnQ30(k))
    val n = tf.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
      .withColumn("ln_n_q30", lnU(col("n")))
    val cTab = tf.select(col("c")).distinct()
      .withColumn("ln_c_q30", lnU(col("c")))
    tf.join(n, "doc_id")
      .join(broadcast(cTab), "c")
      .selectExpr("doc_id", "n",
        "(2 * c * (((ln_n_q30 - ln_c_q30) * 15625) div 16777216) + n) " +
          "div (2 * n) AS h_unats")
      .groupBy(col("doc_id"))
      .agg(first(col("n")).as("n_tokens"),
        sum(col("h_unats")).as("entropy_unats"))
  }

  /** Text normalization — the first stage of every web-scale text
    * pipeline: strip control characters (C0 + DEL), collapse whitespace
    * runs to a single space, trim. Emits the normalized text plus the
    * raw/normalized char counts so downstream filters can gate on how
    * much was removed. Pure codegen'd column algebra, zero shuffle.
    */
  /** The normalization expression alone, for fusing into other passes
    * (CurateJob applies it under --normalize before any analysis).
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1f\\x7f]", " "), "\\s+", " "))

  def normalizeText(docs: DataFrame): DataFrame = {
    val norm = normalized(col("text"))
    docs.select(col("doc_id"),
      norm.as("norm_text"),
      length(col("text")).as("n_raw_chars"),
      length(norm).as("n_norm_chars"))
  }

  /** URL/domain extraction + per-domain corpus stats — the source-level
    * view a crawl-curation pipeline filters on (domain allow/deny lists,
    * per-domain caps). Extracts every http(s) URL, keys by lowercased
    * host, and counts total URL occurrences and distinct docs per domain.
    * One explode + one domain-keyed shuffle (domains are low-cardinality
    * relative to docs, and partial aggregation collapses repeats
    * map-side).
    */
  val UrlPattern = "https?://[A-Za-z0-9.-]+"

  def urlDomains(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(UrlPattern), lit(0)))
          .as("url"))
      .select(col("doc_id"),
        lower(regexp_replace(col("url"), "^https?://", "")).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))

  def tfidfTopTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"),
        explode(wsTokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score",
        round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 4))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("term_rank", row_number().over(w).cast("bigint"))
      .where(col("term_rank") <= k)
      .select("doc_id", "term", "tf", "df", "score", "term_rank")
  }
}
