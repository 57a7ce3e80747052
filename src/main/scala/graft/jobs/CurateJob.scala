package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.TableIO
import graft.ops.{Dedup, Sampling, TextAnalysis}

/** The training-data curation entry point: raw documents parquet in,
  * training-ready table out, with a TableIO snapshot at every stage
  * boundary (same resume semantics as IngestJob — a killed run restarts
  * from the last committed stage, and every stage is deterministic so the
  * resumed output is byte-identical).
  *
  * Stage DAG (each a classic large-corpus curation step):
  *
  *   analyzed      fingerprints + token/quality stats + language ID in one
  *                 narrow pass over (doc_id, text), plus Gopher-style
  *                 repetition stats and PII match counts (each one
  *                 explode/agg pass, map-side combined, joined by doc_id)
  *   filtered      quality gate: minimum token count, optional language
  *                 allowlist, optional repetition screens (max duplicate-
  *                 line fraction / max top-bigram fraction) — cheap
  *                 filters run BEFORE any pair work. With --redact-pii the
  *                 surviving text is scrubbed here, so every downstream
  *                 stage (dedup shingles included) sees redacted text only
  *   line_scrubbed (only with --dedup-lines N) cross-document boilerplate
  *                 removal: lines occurring in >= N distinct docs are
  *                 stripped from every doc (C4/RefinedWeb rule); docs left
  *                 empty drop out
  *   decontam_kept (only with --decontam-input) eval-set decontamination:
  *                 train docs sharing any n-gram shingle with the
  *                 benchmark corpus are dropped (broadcast eval shingles,
  *                 no train shuffle)
  *   exact_kept    exact dedup: one row per distinct content_md5,
  *                 keep = min doc_id (one 16-byte-key shuffle)
  *   neardup_pairs MinHash-LSH banding → exact-Jaccard verification over
  *                 the exact-dedup survivors (all pair generation blocked
  *                 and frequency-capped; see ops/Dedup)
  *   clusters      connected components over verified pairs → cluster id
  *   curated       keep-best retention (longest doc per cluster survives)
  *                 + optional source-mix resampling toward target domain
  *                 weights + deterministic train/val/test split,
  *                 partitioned by split so a trainer reads its fold via
  *                 partition pruning
  *
  * Usage:
  *   CurateJob --work DIR --input docs.parquet [--threshold 0.7]
  *             [--min-tokens N] [--langs en,de] [--max-dup-line-frac X]
  *             [--max-top-bigram-frac X] [--normalize] [--redact-pii]
  *             [--decontam-input eval.parquet] [--decontam-ngram 8]
  *             [--dedup-lines N] [--source-mix web:0.5,default:0.05]
  *             [--train 80] [--val 10] [--resume]
  */
object CurateJob {

  final case class Args(
      work: String = "",
      input: String = "",
      threshold: Double = 0.7,
      minTokens: Int = 0,
      langs: Option[Set[String]] = None,
      maxDupLineFrac: Option[Double] = None,
      maxTopBigramFrac: Option[Double] = None,
      normalize: Boolean = false,
      redactPii: Boolean = false,
      decontamInput: Option[String] = None,
      decontamNgram: Int = 8,
      dedupLines: Option[Int] = None,
      sourceMix: Option[(Map[String, Double], Double)] = None,
      trainPct: Int = 80,
      valPct: Int = 10,
      resume: Boolean = false)

  /** "--source-mix web:0.5,books:0.3,default:0.05" → (weights, default). */
  def parseMix(spec: String): (Map[String, Double], Double) = {
    val kv = spec.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
      part.split(":") match {
        case Array(k, v) => k.trim -> v.trim.toDouble
        case _ => sys.error(s"bad --source-mix entry '$part'")
      }
    }.toMap
    (kv - "default", kv.getOrElse("default", 0.0))
  }

  def parse(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--work" => a = a.copy(work = argv(i + 1)); i += 2
        case "--input" => a = a.copy(input = argv(i + 1)); i += 2
        case "--threshold" => a = a.copy(threshold = argv(i + 1).toDouble); i += 2
        case "--min-tokens" => a = a.copy(minTokens = argv(i + 1).toInt); i += 2
        case "--langs" =>
          a = a.copy(langs = Some(argv(i + 1).split(",").map(_.trim).toSet))
          i += 2
        case "--max-dup-line-frac" =>
          a = a.copy(maxDupLineFrac = Some(argv(i + 1).toDouble)); i += 2
        case "--max-top-bigram-frac" =>
          a = a.copy(maxTopBigramFrac = Some(argv(i + 1).toDouble)); i += 2
        case "--normalize" => a = a.copy(normalize = true); i += 1
        case "--redact-pii" => a = a.copy(redactPii = true); i += 1
        case "--decontam-input" =>
          a = a.copy(decontamInput = Some(argv(i + 1))); i += 2
        case "--decontam-ngram" =>
          a = a.copy(decontamNgram = argv(i + 1).toInt); i += 2
        case "--dedup-lines" =>
          a = a.copy(dedupLines = Some(argv(i + 1).toInt)); i += 2
        case "--source-mix" =>
          a = a.copy(sourceMix = Some(parseMix(argv(i + 1)))); i += 2
        case "--train" => a = a.copy(trainPct = argv(i + 1).toInt); i += 2
        case "--val" => a = a.copy(valPct = argv(i + 1).toInt); i += 2
        case "--resume" => a = a.copy(resume = true); i += 1
        case other => sys.error(s"unknown arg $other")
      }
    }
    require(a.work.nonEmpty, "--work DIR is required")
    require(a.input.nonEmpty, "--input PATH is required")
    a
  }

  private def stage(io: TableIO, spark: SparkSession, table: String,
      resume: Boolean, partitionBy: Seq[String])(compute: => DataFrame): DataFrame = {
    if (resume && io.exists(table)) {
      System.err.println(s"[curate] stage $table: resumed from snapshot " +
        s"${io.currentSnapshotId(table).get}")
    } else {
      val t0 = System.nanoTime()
      val snap = io.commit(table, compute, partitionBy, stage = table)
      System.err.println(f"[curate] stage $table: committed snapshot " +
        f"${snap.snapshotId} rows=${snap.rows} in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    io.read(spark, table)
  }

  def run(spark: SparkSession, a: Args): TableIO = {
    val io = new TableIO(a.work)

    val analyzed = stage(io, spark, "analyzed", a.resume, Seq.empty) {
      val raw0 = spark.read.parquet(a.input)
      // --normalize: strip controls + collapse whitespace FIRST, so every
      // downstream stat, gate, shingle and the curated text itself
      // describe the normalized form (fused into the same narrow pass)
      val raw = if (a.normalize)
        raw0.withColumn("text", TextAnalysis.normalized(col("text")))
      else raw0
      // langId reports the source-metadata language next to its
      // prediction; inputs without one get a null meta column
      val docs = if (raw.columns.contains("lang")) raw
        else raw.withColumn("lang", lit(null).cast("string"))
      // three column-algebra operators fused into ONE narrow pass over
      // (doc_id, text): fingerprints, quality stats, language ID — the
      // joins below are by doc_id against projections of the same scan,
      // which Catalyst collapses (no exchange appears in the plan). The
      // repetition and PII screens each add one explode/agg pass
      // (map-side combined) joined back by doc_id.
      docs
        .join(TextAnalysis.fingerprint(docs), "doc_id")
        .join(TextAnalysis.qualityScore(docs)
          .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
            "type_token_ratio"), "doc_id")
        .join(TextAnalysis.langId(docs).select(col("doc_id"),
          col("lang_pred").as("lang_id"), col("marker_hits")), "doc_id")
        // left: repetitionStats has no row for docs with no non-empty
        // lines (whitespace-only text) — those default to 0.0
        .join(TextAnalysis.repetitionStats(docs)
          .select("doc_id", "dup_line_frac", "top_bigram_frac"),
          Seq("doc_id"), "left")
        .withColumn("dup_line_frac", coalesce(col("dup_line_frac"), lit(0.0)))
        .withColumn("top_bigram_frac",
          coalesce(col("top_bigram_frac"), lit(0.0)))
        .join(TextAnalysis.piiStats(docs)
          .select(col("doc_id"),
            (col("n_emails") + col("n_ipv4") + col("n_phones"))
              .as("pii_count")), "doc_id")
    }

    val filtered = stage(io, spark, "filtered", a.resume, Seq.empty) {
      var f = analyzed.where(col("n_tokens") >= lit(a.minTokens))
      a.langs.foreach(ls => f = f.where(col("lang_id").isin(ls.toSeq: _*)))
      a.maxDupLineFrac.foreach(x =>
        f = f.where(col("dup_line_frac") <= lit(x)))
      a.maxTopBigramFrac.foreach(x =>
        f = f.where(col("top_bigram_frac") <= lit(x)))
      // scrub AFTER the gates, BEFORE dedup: downstream stages (shingles,
      // retention, the curated table itself) must never see raw PII
      if (a.redactPii)
        f = f.withColumn("text", TextAnalysis.redactPii(col("text")))
      f
    }

    // optional cross-document line-level scrub (C4/RefinedWeb boilerplate
    // rule): every line occurring in >= minDf distinct docs is stripped
    // from every doc; docs left with no lines drop out. Runs AFTER the
    // per-doc gates (their stats describe the original text), BEFORE
    // decontam/dedup so shingles see scrubbed text
    val lineScrubbed = a.dedupLines match {
      case Some(minDf) =>
        stage(io, spark, "line_scrubbed", a.resume, Seq.empty) {
          filtered.drop("text").join(
            Dedup.removeSharedLines(
              filtered.select(col("doc_id"), col("text")), minDf),
            "doc_id")
        }
      case None => filtered
    }

    // optional eval-set decontamination (GPT-3 appendix-C n-gram overlap):
    // drops train docs sharing any n-gram with the benchmark corpus. Runs
    // AFTER the cheap gates, BEFORE the pair stage — contaminated docs
    // must not survive into dedup retention where they could displace a
    // clean representative
    val decontamed = a.decontamInput match {
      case Some(evalPath) =>
        stage(io, spark, "decontam_kept", a.resume, Seq.empty) {
          val flagged = Dedup.decontaminate(
            lineScrubbed.select(col("doc_id"), col("text")),
            spark.read.parquet(evalPath), n = a.decontamNgram)
            .select(col("doc_id"))
          // the flagged set is contamination-sized (small); AQE broadcasts
          lineScrubbed.join(flagged, Seq("doc_id"), "left_anti")
        }
      case None => lineScrubbed
    }

    val exactKept = stage(io, spark, "exact_kept", a.resume, Seq.empty) {
      // content_md5 is RECOMPUTED from the CURRENT text: the analyzed-stage
      // fingerprint describes the original input, but --redact-pii and
      // --dedup-lines rewrite `text`, and exact dedup must key on what
      // actually survives — two docs differing only in PII are exact
      // duplicates after redaction, and the stale pre-redaction hash would
      // silently keep both. Keep the minimum doc_id per identical content;
      // doc counts per md5 are tiny, so the row_number window is one
      // bounded-state shuffle.
      val keyed = decontamed.withColumn("content_md5",
        md5(col("text").cast("binary")))
      val w = Window.partitionBy(col("content_md5")).orderBy(col("doc_id"))
      keyed.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).drop("rn")
    }

    // the shingle table feeds the banding pass AND four subtrees of the
    // exact-Jaccard verify; persisted for the duration of the stage commit
    // (the commit inside `stage` materializes the result, so the cache is
    // both used and safely released right after)
    val shForPairs = Dedup.withShingles(
      exactKept.select(col("doc_id"), col("text")), n = 5).persist()
    val pairs = stage(io, spark, "neardup_pairs", a.resume, Seq.empty) {
      Dedup.verifyJaccardSh(shForPairs,
        Dedup.minhashLshSh(shForPairs, numHashes = 64, bands = 32,
          threshold = 0.0),
        threshold = a.threshold)
    }
    shForPairs.unpersist()

    val clusters = stage(io, spark, "clusters", a.resume, Seq.empty) {
      Dedup.clusterNearDups(spark, pairs.select(
        lpad(col("id1").cast("string"), 20, "0").as("id1"),
        lpad(col("id2").cast("string"), 20, "0").as("id2")))
        .select(col("doc_id").cast("bigint").as("doc_id"),
          col("canonical_doc_id").cast("bigint").as("canonical_doc_id"))
    }

    stage(io, spark, "curated", a.resume, Seq("split")) {
      val kept = Dedup.keepBestPerCluster(clusters,
        exactKept.select(col("doc_id"),
          length(col("text")).cast("bigint").as("score")))
      // cluster members that are NOT the kept representative drop out.
      // NO forced broadcast hint: the loser table scales with corpus
      // DUPLICATION, not a constant — on a boilerplate-heavy crawl at the
      // 100 TB posture it can be a large fraction of the corpus, and a
      // broadcast() hint would bypass AQE's size check and OOM the driver.
      // AQE broadcasts it when it is actually small (the sf0.01 case) and
      // falls back to a shuffle join when it is not — the same posture as
      // the funnel/retention stages after the round-4 ADVICE fix.
      val losers = clusters.join(
        kept.select(col("kept_doc_id").as("doc_id")), Seq("doc_id"),
        "left_anti").select(col("doc_id"))
      val survivors = exactKept.join(losers, Seq("doc_id"), "left_anti")
      // optional source-mix resampling toward the target domain weights —
      // AFTER dedup retention (mix ratios should describe unique content),
      // BEFORE the fold split
      val mixed = a.sourceMix match {
        case Some((weights, default)) =>
          require(survivors.columns.contains("source"),
            "--source-mix needs a 'source' column in the input")
          survivors.join(
            Sampling.sourceMixSample(survivors, weights, default)
              .select("doc_id"), Seq("doc_id"), "left_semi")
        case None => survivors
      }
      mixed.join(
        Sampling.hashSplit(mixed, trainPct = a.trainPct,
          valPct = a.valPct).select("doc_id", "split"), "doc_id")
    }

    io
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, a) finally spark.stop()
  }
}
