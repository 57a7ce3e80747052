package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear text classification — the quality/language filter a
  * pretraining pipeline trains on its own corpus (CCNet / fastText-style:
  * hashed bag-of-tokens features, logistic regression, full-batch gradient
  * descent) and then applies corpus-wide as a keep/drop screen.
  *
  * Everything is deterministic and engine-portable, so training itself is
  * oracle-checkable (the DuckDB gate re-runs the same epochs from scratch
  * in unrolled SQL):
  *   - features: the hashing trick over whitespace tokens — bucket =
  *     first-8-hex-digits of md5(token+salt) mod `dim` (the same
  *     engine-portable bucket arithmetic as Sampling), value = token count
  *     L1-normalized by the doc's token total;
  *   - model: w ∈ R^dim, bias; init all-zero;
  *   - epoch: full-batch GD. z = round₆(bias + (Σ xu_b·wu_b)/10¹²),
  *     p = round₆(σ(z)), grad_b = (Σ_docs (pu−yu)·xu_b)/10¹² ,
  *     w ← round₆(w − lr·grad/N) (bias likewise), where xu/wu/pu/yu are
  *     the 6dp values in integer MICRO-units (xu = round(x·10⁶) etc.).
  *     Every distributed Σ is therefore a sum of exact integers
  *     (decimal(38,0) — DuckDB sums BIGINT into exact HUGEINT) — immune
  *     to float summation ORDER, not just to magnitude drift: the earlier
  *     double-sum version rounded z/p/w to 6dp each step, but a
  *     partition-order ulp landing within 1e-10 of a .5 boundary still
  *     flipped a rounded value once in a while (observed in round 4: one
  *     doc's final score read 0.470998 vs the oracle's 0.470999). With
  *     integer sums the two engines see bit-identical values at every
  *     step by construction, on any partitioning, at any corpus size.
  *
  * Plan shape at scale: one tokenize+hash pass builds the feature table
  * (doc, bucket, x) — 8-byte-ish rows, corpus-proportional; each epoch is
  * one scoring pass (weights attached as a broadcast — a literal array
  * indexed in codegen for small dim, a broadcast hash join above
  * `LiteralDimCap`) plus one bucket-keyed partial-aggregated shuffle that
  * emits at most `dim` gradient rows. Driver state is the weight vector
  * (dim doubles, the k-means-centroid pattern); nothing driver-side grows
  * with the corpus.
  */
object TextClassifier {

  /** Above this dim the per-epoch weight lookup switches from a literal
    * array (pure codegen, zero join) to a broadcast hash join — a literal
    * of a million doubles would bloat the plan and the codegen constant
    * pool, while a broadcast ships once per executor.
    */
  val LiteralDimCap = 4096

  /** Engine-portable feature bucket (same md5 arithmetic as
    * Sampling.bucket10k, which the DuckDB oracle reproduces exactly).
    */
  def bucket(tok: Column, dim: Int, salt: String): Column =
    conv(substring(md5(concat(tok, lit(salt))), 1, 8), 16, 10)
      .cast("bigint") % dim

  /** Hashed, L1-normalized bag-of-tokens: (id, b, x, xu) with
    * x = count(token in bucket b) / (total tokens in doc) and
    * xu = round(x·10⁶) — the exact micro-unit integer all training math
    * runs on. Docs with zero tokens simply have no rows (they score at
    * the bias).
    */
  def features(docs: DataFrame, dim: Int, salt: String = "",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val tf = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("tok"))
      .groupBy(col("id"), bucket(col("tok"), dim, salt).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val nt = tf.groupBy(col("id")).agg(sum(col("cnt")).as("n"))
    tf.join(nt, "id")
      .select(col("id"), col("b"),
        (col("cnt").cast("double") / col("n").cast("double")).as("x"))
      .withColumn("xu", round(col("x") * lit(1e6), 0).cast("long"))
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** A 6dp double in integer micro-units. HALF_UP (= half away from zero
    * for either sign) to mirror SQL round(); the inputs are already
    * 6dp-rounded doubles, so v·10⁶ sits within an ulp of an integer and
    * never at a genuine .5 boundary.
    */
  private def microUnits(v: Double): Long =
    BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
      .toLongExact

  /** (id, y, z, p) under a fixed model: z = round₆(bias + Σ x·w_b),
    * p = round₆(σ(z)). `labels` must cover every doc (left-join keeps
    * zero-token docs at z = bias).
    */
  def score(feats: DataFrame, labels: DataFrame, w: Array[Double],
      bias: Double, forceJoin: Boolean = false): DataFrame = {
    // weights ride along in micro-units so every per-row product
    // xu·wu (≤ 10⁶·|wu|) is an exact long and the per-doc Σ is an exact
    // decimal — z is then identical on any partitioning/engine
    val wu = w.map(microUnits)
    val xwu =
      if (w.length <= LiteralDimCap && !forceJoin) {
        val warr = typedLit(wu.toSeq)
        feats.select(col("id"),
          (col("xu") * element_at(warr, col("b").cast("int") + 1)).as("xwu"))
      } else {
        val spark = feats.sparkSession
        import spark.implicits._
        val wdf = wu.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toSeq.toDF("b", "wu")
        feats.join(broadcast(wdf), "b")
          .select(col("id"), (col("xu") * col("wu")).as("xwu"))
      }
    val zs = xwu.groupBy(col("id"))
      .agg(sum(col("xwu").cast("decimal(38,0)")).as("zu"))
    labels.join(zs, Seq("id"), "left")
      .select(col("id"), col("y"),
        round(lit(bias) +
          coalesce(col("zu").cast("double"), lit(0.0)) / lit(1e12), 6).as("z"))
      .withColumn("p",
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6))
  }

  /** Full-batch GD for `epochs` rounds from the all-zero model. `labels`
    * is (id, y ∈ {0.0, 1.0}). Returns (weights, bias), every component
    * 6dp-rounded. Persists the two inputs for the duration (each epoch is
    * two actions over them).
    */
  def trainLogreg(feats: DataFrame, labels: DataFrame, dim: Int,
      epochs: Int, lr: Double = 1.0,
      forceJoin: Boolean = false): (Array[Double], Double) = {
    require(epochs >= 0 && lr > 0.0, "epochs >= 0, lr > 0 required")
    val f = feats.persist()
    val l = labels.persist()
    try {
      val n = l.count().toDouble
      require(n > 0, "no labeled docs")
      var w = Array.fill(dim)(0.0)
      var bias = 0.0
      var e = 0
      while (e < epochs) {
        val scored = score(f, l, w, bias, forceJoin)
          .select(col("id"), col("y"), col("p")).persist()
        // gradient in exact micro²-units: (pu−yu)·xu ≤ 10¹² per feature
        // row as a long, summed as decimal(38,0) so the Σ is exact at any
        // row count (DuckDB mirrors with its exact HUGEINT bigint-sum).
        // The bias gradient rides in the SAME aggregation as a sentinel
        // bucket b = −1 with xu = 10⁶ (so its micro²-sum is exactly
        // gbu·10⁶, divided back out in exact decimal arithmetic) — one
        // driver action per epoch instead of two (the scored frame stays
        // persisted for the epoch: the union references it twice).
        val pu = round(col("p") * lit(1e6), 0).cast("long")
        val yu = (col("y") * lit(1e6)).cast("long")
        val diffs = scored.select(col("id"), (pu - yu).as("d"))
        val rows = diffs.join(f, "id")
          .select(col("b"), (col("d") * col("xu")).as("v"))
          .unionByName(diffs.select(lit(-1L).as("b"),
            (col("d") * lit(1000000L)).as("v")))
          .groupBy(col("b"))
          .agg(sum(col("v").cast("decimal(38,0)")).as("gsu"))
          .collect()
        scored.unpersist()
        val grads = rows.filter(_.getLong(0) >= 0L)
          .map(r => r.getLong(0).toInt -> r.getDecimal(1))
          .toMap
        // Σ(d·10⁶) is divisible by 10⁶ by construction — exact division
        val gbu = rows.find(_.getLong(0) == -1L)
          .map(_.getDecimal(1)
            .divide(java.math.BigDecimal.valueOf(1000000L)))
          .getOrElse(java.math.BigDecimal.ZERO)
        w = w.indices.map(b =>
          round6(w(b) - lr * grads.get(b)
            .map(_.doubleValue / 1e12).getOrElse(0.0) / n)).toArray
        bias = round6(bias - lr * (gbu.doubleValue / 1e6) / n)
        e += 1
      }
      (w, bias)
    } finally { f.unpersist(); l.unpersist() }
  }

  /** Train on (docs, labelExpr) and return the corpus scored under the
    * final model: (doc_id, y, score, pred) with score = the 6dp-rounded
    * probability and pred = score ≥ 0.5.
    */
  def trainScore(docs: DataFrame, labelExpr: Column, dim: Int, epochs: Int,
      lr: Double = 1.0, salt: String = "", idCol: String = "doc_id",
      textCol: String = "text", forceJoin: Boolean = false): DataFrame = {
    val feats = features(docs, dim, salt, idCol, textCol)
    val labels = docs.select(col(idCol).as("id"),
      labelExpr.cast("double").as("y"))
    val (w, bias) = trainLogreg(feats, labels, dim, epochs, lr, forceJoin)
    score(feats, labels, w, bias, forceJoin)
      .select(col("id").as(idCol), col("y"), col("p").as("score"),
        (col("p") >= 0.5).as("pred"))
  }
}
