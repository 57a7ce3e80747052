package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-split operators for a training-data
  * pipeline. Every assignment is a pure function of the row's key — no RNG
  * state, no seed tables, no shuffle — so splits are reproducible across
  * runs, engines and cluster sizes, and a re-run (or a resumed ingest)
  * lands every document in the same fold.
  *
  * The hash is the first 8 hex chars of md5(key) read as an integer: md5
  * is available bit-identically in Spark, DuckDB, Python and shell, which
  * makes the fold assignment auditable outside the engine (the DuckDB
  * oracle recomputes it from scratch). 32 bits of md5 over a mod-100
  * bucket keeps the per-bucket bias below 1e-8 — negligible against any
  * corpus. Everything is codegen'd column algebra: the scan reads only
  * the key column (+ projected payload), filters push down, nothing
  * shuffles, so the operator costs one narrow pass at any scale.
  */
object Sampling {

  /** 32-bit md5 prefix of the key, as a non-negative bigint. */
  def md5Bucket32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")

  /** Percent bucket 0-99, uniform over keys. */
  def pctBucket(key: Column): Column = md5Bucket32(key) % 100

  /** Deterministic train/val/test split: (idCol, bucket, split) with
    * bucket < trainPct → "train", < trainPct+valPct → "val", else "test".
    * A row's fold depends only on its id — stable under corpus growth
    * (new docs land in folds at the configured rates; old docs never
    * move), the property batch re-training pipelines rely on.
    */
  def hashSplit(docs: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    docs.select(col(idCol), pctBucket(col(idCol)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < lit(trainPct), lit("train"))
          .when(col("bucket") < lit(trainPct + valPct), lit("val"))
          .otherwise(lit("test")))
  }

  /** Deterministic fraction-sample: keep a row iff its 10k-bucket falls
    * under fraction*10000. `salt` decorrelates independent samples over
    * the same keys (salt-concatenated before hashing).
    */
  def sampleByHash(docs: DataFrame, idCol: String = "doc_id",
      fraction: Double = 0.1, salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    docs.where(bucket10k(col(idCol), salt) <
      lit(math.round(fraction * 10000)))
  }

  private def bucket10k(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))),
      1, 8), 16, 10).cast("bigint") % 10000

  /** Per-stratum deterministic sampling — the downsample/upweight knob of
    * corpus mixing (e.g. keep 50% of English, 25% of German, 10% of the
    * rest). Same md5-bucket mechanics as sampleByHash, so each stratum's
    * sample is a stable subset of the full corpus and of any
    * larger-fraction sample of the same stratum (nested samples: raising
    * a stratum's fraction only ADDS documents — reproducible curriculum
    * growth). Still a single narrow filter: the per-stratum threshold is
    * a when-chain literal, no join, no shuffle.
    */
  def stratifiedSampleByHash(docs: DataFrame, idCol: String = "doc_id",
      strataCol: String = "lang", fractions: Map[String, Double],
      defaultFraction: Double = 0.0, salt: String = ""): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"bad fraction $f"))
    val limit = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultFraction * 10000)): Column) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum),
          lit(math.round(f * 10000))).otherwise(acc)
    }
    docs.where(bucket10k(col(idCol), salt) < limit)
  }

  /** Source-mix resampling: downsample each source so the kept corpus
    * approaches a TARGET mixture — the domain-reweighting step every
    * pretraining recipe runs (Pile/ROOTS-style static mixes). For source s
    * with n_s rows in a corpus of N, the keep fraction is
    * min(1, w_s · N / n_s): over-represented sources are thinned toward
    * their target share w_s, under-represented ones are kept whole
    * (hash sampling cannot upsample — repetition is the loader's job).
    *
    * Same md5-bucket mechanics as sampleByHash, so each source's kept set
    * is deterministic and nested under fraction growth. Plan: one
    * map-side-combined groupBy for the per-source counts (rows =
    * #sources), a 1-row total crossJoin, then a broadcast join back — the
    * corpus itself streams through a single narrow filter; nothing is
    * collected.
    *
    * Output: the kept rows as (idCol, srcCol, n_src, keep_frac) with
    * keep_frac rounded to 6dp for auditability.
    */
  def sourceMixSample(docs: DataFrame, weights: Map[String, Double],
      defaultWeight: Double = 0.0, idCol: String = "doc_id",
      srcCol: String = "source", salt: String = ""): DataFrame = {
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0.0, s"negative weight $w"))
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight): Column) {
      case (acc, (s, f)) => when(col(srcCol) === lit(s), lit(f)).otherwise(acc)
    }
    val counts = docs.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_src"))
    val total = counts.agg(sum(col("n_src")).as("n_total"))
    val frac = least(lit(1.0),
      w * col("n_total").cast("double") / col("n_src").cast("double"))
    docs.join(broadcast(counts.crossJoin(total)), Seq(srcCol))
      // floor, not a bare cast: Spark's cast(double→bigint) truncates but
      // DuckDB's CAST rounds — floor is the one spelling both agree on
      .where(bucket10k(col(idCol), salt) < floor(frac * 10000).cast("bigint"))
      .select(col(idCol), col(srcCol), col("n_src"),
        round(frac, 6).as("keep_frac"))
  }

  /** Sequence packing (concatenate-and-chop): lay the corpus out as the
    * fixed-length training sequences a pretraining data loader feeds the
    * model. Documents are concatenated in deterministic (shard, doc_id)
    * order and chopped every maxTokens; each document reports the
    * sequence it starts in and its token offset there (documents straddle
    * sequence boundaries — that IS concatenate-and-chop).
    *
    * Packing is per-shard (shard = md5 bucket of the id): a single global
    * running sum would funnel the whole corpus through one window
    * partition, while per-shard packing keeps the cumulative sum
    * shard-parallel — and matches how loaders actually shard pretraining
    * data. Deterministic: same corpus → same sequences, independent of
    * cluster size or partitioning.
    *
    * Output: (idCol, shard, n_tokens, cum_before, seq_id, tok_offset)
    * where cum_before is the shard-local token count before this doc,
    * seq_id = cum_before / maxTokens, tok_offset = cum_before % maxTokens.
    */
  def packSequences(docs: DataFrame, maxTokens: Int, shards: Int = 256,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxTokens > 0 && shards > 0, "maxTokens and shards must be > 0")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        (md5Bucket32(col(idCol)) % shards).as("shard"),
        size(TextAnalysis.wsTokens(col("text"))).cast("bigint")
          .as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id",
        floor(col("cum_before") / lit(maxTokens)).cast("bigint"))
      .withColumn("tok_offset", col("cum_before") % lit(maxTokens))
  }
}
