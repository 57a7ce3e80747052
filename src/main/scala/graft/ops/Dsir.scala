package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw-corpus document by how much more
  * likely its hashed n-gram features are under a small target corpus
  * (the domain you want more of) than under the raw corpus itself,
  * log w(doc) = Σ_b c_b · (log p̂_target(b) − log p̂_raw(b)),
  * then resample the raw corpus proportionally to w. This is the standard
  * pretraining-mixture shaping step between quality filtering and
  * tokenization.
  *
  * Deterministic, engine-portable contract (the DuckDB gate re-runs it
  * from scratch):
  *   - features: lowercased whitespace word BIGRAMS, hashed into `dim`
  *     buckets via the 32-bit md5-prefix trick shared with
  *     [[Sampling]]/[[TextClassifier]] (bit-identical in Spark/DuckDB);
  *   - bucket distributions: add-one smoothing over `dim` buckets,
  *     p̂(b) = (count(b) + 1) / (total + dim); the log-ratio is pinned as
  *     INTEGER MICRO-UNITS, λ₆(b) = round₀((ln p̂_t − ln p̂_q)·10⁶) as a
  *     bigint — per-bucket values are identical integers in both engines
  *     (same counts → same doubles → same single rounding);
  *   - per doc: the sum Σ_b c_b · λ₆(b) is EXACT integer arithmetic, so
  *     summation order cannot shift a rounding boundary;
  *     logw = round₄(Σ / 10⁶); docs with < 2 tokens have no bigrams and
  *     score 0.
  *
  * Plan shape at scale: one tokenize+hash pass per corpus builds
  * (doc, bucket, cnt) feature tables — map-side partial-combined, the
  * groupBy key is (doc_id, int bucket). The two bucket marginals are ≤
  * `dim` rows each; the λ table is their join, broadcast back onto the
  * raw feature table, so scoring is one narrow broadcast-hash-join pass +
  * one doc_id-keyed partial agg. Nothing driver-side grows with the
  * corpus; the target corpus is small by definition but is never
  * collected — only its dim-row marginal is.
  */
object Dsir {

  /** Hashed lowercased word-bigram counts: (doc_id, b, cnt). Documents
    * with fewer than two tokens emit no rows.
    */
  def bigramFeatures(docs: DataFrame, dim: Int,
      salt: String = ""): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    // tokens materialized as a column BEFORE the lambda — element_at
    // inside the transform would otherwise re-tokenize the text per
    // bigram position, O(tokens²) per doc (same fix as bigramPerplexity)
    val toks = col("toks")
    // same 0/1-token guard as bigramPerplexity: sequence(1, 0) DESCENDS
    // and element_at(toks, 0) throws under ANSI
    val grams = when(size(toks) >= 2, transform(
      sequence(lit(1), size(toks) - 1),
      k => concat(element_at(toks, k), lit(" "), element_at(toks, k + 1))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"),
      TextAnalysis.wsTokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), explode(grams).as("bg"))
      .groupBy(col("doc_id"),
        TextClassifier.bucket(col("bg"), dim, salt).as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-bucket smoothed log-likelihood-ratio table λ (≤ dim rows):
    * every bucket observed in `rawFeats`, with target counts defaulting
    * to zero. Inputs are feature tables from [[bigramFeatures]].
    */
  private def lambdaTable(rawFeats: DataFrame, tgtFeats: DataFrame,
      dim: Int): DataFrame = {
    // nq (the raw-corpus bigram total) is a WINDOW sum over the ≤dim-row
    // bucket marginal, not a separate rb.agg subtree: the latter embedded
    // a second full tokenize+hash pass over the raw corpus in the lazy
    // plan (the window costs one single-partition exchange of ≤dim rows).
    // nt keeps the separate-agg shape — the target corpus is small by
    // definition, and a target bucket absent from the raw marginal must
    // still contribute to nt (a window over the left join would lose it).
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val rb = rawFeats.groupBy(col("b")).agg(sum(col("cnt")).as("cq"))
      .withColumn("nq", sum(col("cq")).over(wAll))
    val tb = tgtFeats.groupBy(col("b")).agg(sum(col("cnt")).as("ct"))
    val nt = tb.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    rb.join(tb, Seq("b"), "left")
      .crossJoin(broadcast(nt))
      .select(col("b"),
        round((log((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
            (col("nt") + lit(dim.toDouble))) -
          log((col("cq") + lit(1.0)) / (col("nq") + lit(dim.toDouble)))) *
          lit(1000000.0), 0).cast("long").as("lam6"))
  }

  /** DSIR importance log-weights for every raw document:
    * (doc_id, n_bigrams, logw). Higher logw ⇒ more target-like.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, dim: Int = 256,
      salt: String = ""): DataFrame = {
    // the plan stays PURE-LAZY (no persist/collect at construction): the
    // weights-only consumers keep their optimizer-pruned fast path, and
    // with nq folded into the λ subtree as a window (see lambdaTable) a
    // full evaluation runs the raw tokenize+hash pass twice (λ build +
    // scoring probe), down from three
    val rawF = bigramFeatures(raw, dim, salt)
    val lam = lambdaTable(rawF, bigramFeatures(target, dim, salt), dim)
    val scored = rawF.join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        round(sum(col("cnt") * col("lam6")) / lit(1000000.0), 4)
          .as("logw"))
    raw.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logw"), lit(0.0)).as("logw"))
  }

  /** Gumbel top-k resampling of the scored corpus — the paper's sampling
    * step made deterministic: u(doc) = (md5-bucket₁₀ₖ(doc_id·salt)+0.5)/10⁴
    * plays the uniform draw, key = round₆(logw + g) with the Gumbel
    * transform g = −ln(−ln u), and the k largest keys win. A pure
    * column-algebra pass + TakeOrdered(k) — no global sort materializes.
    */
  def gumbelTopK(weights: DataFrame, k: Int,
      salt: String = "g"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(salt))), 1, 8), 16, 10).cast("bigint") % 10000 + lit(0.5)) /
      lit(10000.0)
    weights
      .withColumn("key", round(col("logw") - log(-log(u)), 6))
      .orderBy(col("key").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_bigrams"), col("logw"), col("key"))
  }
}
