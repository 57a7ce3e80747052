package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.SpanChunker
import graft.ops.{Clustering, Dedup, Dsir, Events, GraphMetrics, Multimodal, Sampling, Similarity, TextAnalysis, TextClassifier}
import graft.retrieval.{GraphSearch, HybridSearch, Ppr}
import graft.temporal.Temporal

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2 + the training-data ops), each with an equivalent DuckDB
  * SQL oracle where the operator is SQL-expressible (others get the
  * driver's rows-only check and are verified engine-vs-oracle in ScalaTest
  * instead).
  */
object SparkEntry {

  /** Tiny demo gazetteer over the synthetic corpus vocabulary, used only by
    * the DuckDB-checkable mention/cooccurrence/entity queries (the real KG
    * pipeline runs on the interleaved spans corpus with the fixture
    * gazetteer; see graft.fixtures.Fixtures).
    */
  private val demoGaz: Seq[(String, String)] = Seq(
    ("spark", "PRODUCT"), ("customer", "GROUP"), ("window", "PRODUCT"),
    ("table", "PRODUCT"), ("stream", "PRODUCT"), ("partition", "PRODUCT"),
    ("merge", "EVENT"), ("shuffle", "EVENT"))

  private def gazValuesSql: String =
    demoGaz.map { case (n, t) => s"('$n','$t')" }.mkString(", ")

  private def docsPath(dir: String) = s"$dir/documents.parquet"
  private def embPath(dir: String) = s"$dir/embeddings.parquet"

  private def gazDf(s: SparkSession): DataFrame = {
    import s.implicits._
    demoGaz.toDF("name", "type")
  }

  /** Substring mention detection (the reference containment semantics,
    * pipeline.py:369-384: entity appears in chunk iff lower(name) in
    * lower(text)) with occurrence counts and first position.
    */
  private def mentionsDf(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(docsPath(dir))
    docs.crossJoin(broadcast(gazDf(s)))
      .where(instr(col("text"), col("name")) > 0)
      .select(col("doc_id"), col("name"), col("type"),
        instr(col("text"), col("name")).cast("int").as("first_pos"),
        ((length(col("text")) -
          length(call_function("replace", col("text"), col("name"), lit("")))) /
          length(col("name"))).cast("int").as("mention_count"))
  }

  /** Fixed-window chunk table with a stable synthetic chunk_id
    * (doc_id * 100000 + chunk_index) — shared by the chunker, neighbor and
    * document-context rows. Narrow flatMap of the Tok/window kernel.
    */
  private def fixedChunksDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cfg = SpanChunker.Config(60, 12, strategy = "fixed")
    s.read.parquet(docsPath(dir)).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = graft.text.Tok.tokenize(text)
        SpanChunker.fixedWindowStarts(toks.length, cfg).zipWithIndex
          .map { case (start, idx) =>
            val w = toks.slice(start, math.min(start + cfg.chunkSize, toks.length))
            (id * 100000L + idx, id, idx, w.length, w.mkString(" "))
          }
      }.toDF("chunk_id", "doc_id", "chunk_index", "token_count", "chunk_text")
  }

  /** DuckDB CTE bodies replaying the fixed chunker (same RE2-safe token
    * grammar as graft.text.Tok, same k*48-stride window arithmetic, same
    * synthetic chunk_id) — shared by the chunker/neighbor/doc-context
    * oracles.
    */
  /** RE2-safe DuckDB transcription of the Tok.tokenize grammar ('' is the
    * SQL-escaped single quote), shared by the fixed- and semantic-chunker
    * oracles.
    */
  private val chunkTokPat =
    """[A-Za-z0-9]+(?:''[A-Za-z0-9]+)*|[^\sA-Za-z0-9]"""

  /** DuckDB expression for the Java String.trim character set (every char
    * <= U+0020 except NUL, which a DuckDB varchar cannot hold) — one-arg
    * trim() strips ' ' only and would diverge from Tok.sentenceSplit on
    * sentence-edge \n/\t.
    */
  private val javaTrimSet =
    (1 to 32).map(c => s"chr($c)").mkString(" || ")

  private val fixedChunkCte = {
    val tokPat = chunkTokPat
    s"""p AS (
       |  SELECT doc_id, regexp_extract_all(text, '$tokPat') AS t
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, t,
       |    unnest(range(0, CAST(ceil(len(t) / 48.0) AS BIGINT))) AS k
       |  FROM p WHERE len(t) > 0),
       |fc AS (
       |  SELECT doc_id * 100000 + k AS chunk_id, doc_id,
       |    CAST(k AS INT) AS chunk_index,
       |    CAST(len(list_slice(t, k * 48 + 1, k * 48 + 60)) AS INT)
       |      AS token_count,
       |    array_to_string(list_slice(t, k * 48 + 1, k * 48 + 60), ' ')
       |      AS chunk_text
       |  FROM w)""".stripMargin
  }

  private val mentionsSql =
    s"""WITH gaz(name, type) AS (VALUES $gazValuesSql)
       |SELECT d.doc_id, g.name, g.type,
       |  CAST(strpos(d.text, g.name) AS INT) AS first_pos,
       |  CAST((length(d.text) - length(replace(d.text, g.name, ''))) /
       |       length(g.name) AS INT) AS mention_count
       |FROM documents d CROSS JOIN gaz g
       |WHERE strpos(d.text, g.name) > 0""".stripMargin

  /** The synthetic-corpus KG pipeline, memoized per session (several
    * queries expose different output tables of the same run).
    */
  private val kgCache =
    new java.util.concurrent.ConcurrentHashMap[String, Pipeline.Result]()

  private def kg(s: SparkSession, nDocs: Long): Pipeline.Result =
    kgCache.computeIfAbsent(s"${s.hashCode()}:$nDocs", key => {
      val r = Pipeline.runSynth(s, nDocs, seed = KgSeed, cfg = KgCfg)
      r.edges.persist(); r.nodes.persist(); r.mentionsFinal.persist()
      // releasable between jobs without clearCache() (VERDICT r5 #4):
      // the thunk also evicts the memo entry so a later query rebuilds
      graft.core.SessionCaches.registerThunk(s) { () =>
        r.unpersistAll(); r.edges.unpersist(); r.nodes.unpersist()
        r.mentionsFinal.unpersist(); kgCache.remove(key); ()
      }
      r
    })

  /** Force the memoized KG pipeline for a dir (Bench times the build apart
    * from the per-table reads so per-query numbers mean per-query work).
    */
  def warmKg(s: SparkSession, dir: String): Unit = {
    val r = kg(s, kgDocs(dir))
    r.edges.count(); r.nodes.count(); r.mentionsFinal.count()
  }

  /** Memoized per-session pre-shingled documents table: ONE pass of the
    * compiled shingling kernel serves the Jaccard, MinHash and SimHash
    * dedup queries (previously each ran its own full-corpus shingling —
    * five scans per bench run). First user pays the build (shows up in its
    * bench time); the persist is what an ingest job would materialize as a
    * stage table anyway.
    */
  private val shCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def memo(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    shCache.computeIfAbsent(key, k => {
      val df = build.persist()
      graft.core.SessionCaches.registerThunk(s) { () =>
        df.unpersist(); shCache.remove(k); ()
      }
      df
    })

  private def shingled(s: SparkSession, dir: String, n: Int): DataFrame =
    memo(s, s"${s.hashCode()}:$dir:$n")(
      Dedup.withShingles(s.read.parquet(docsPath(dir)), n))

  /** Memoized MinHash band candidates (threshold 0, 64 hashes x 32 bands):
    * one signature pass serves both the minhash dedup query and the
    * simhash query's provable-recall floor.
    */
  private def minhashCands(s: SparkSession, dir: String): DataFrame =
    memo(s, s"${s.hashCode()}:$dir:mhcands")(
      Dedup.minhashLshSh(shingled(s, dir, 5), numHashes = 64, bands = 32,
        threshold = 0.0))

  /** Force the memoized shared shingle + MinHash-candidate tables (Bench
    * times this build apart from the dedup queries that consume it, so the
    * alphabetically-first consumer doesn't absorb the whole build cost).
    */
  def warmShingles(s: SparkSession, dir: String): Unit = {
    shingled(s, dir, 5).count()
    minhashCands(s, dir).count()
  }

  /** Memoized decoded media-features table: ONE synth + decode pass serves
    * q_media_features / q_media_resize / q_media_frames (previously each
    * rebuilt and re-decoded the full media table from scratch — three
    * decodes of identical input per bench run; VERDICT r4 "What's wrong"
    * #4). Same pattern as `shingled`: the persist is the stage table an
    * ingest job would materialize anyway.
    */
  private def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    memo(s, s"${s.hashCode()}:$dir:media") {
      val docs = graft.synth.CorpusSynth.docs(s, kgDocs(dir), KgSeed)
      Multimodal.extractFeatures(s, Multimodal.mediaTable(s, docs)).toDF()
    }

  /** Force the memoized media-features table (timed separately by Bench,
    * like `warmShingles`, so the alphabetically-first media query doesn't
    * absorb the whole decode cost).
    */
  def warmMedia(s: SparkSession, dir: String): Unit =
    mediaFeatures(s, dir).count()

  /** KG-pipeline knobs shared with Verify's serial-oracle dump (the DuckDB
    * gate compares the engine's kg_* tables against the oracle's, so both
    * sides MUST run the identical corpus/config).
    */
  val KgSeed = 42L
  val KgCfg: SpanChunker.Config = SpanChunker.Config(200, 40)

  def kgDocs(dir: String): Long =
    sys.env.get("SPARK_GRAFT_KG_DOCS").map(_.toLong).getOrElse {
      if (dir.contains("sf0.1")) 20000L
      else if (dir.contains("sf0.01")) 2000L
      else 400L
    }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full KG construction pipeline's canonical temporal triples.
    */
  def entry(spark: SparkSession): DataFrame =
    kg(spark, 400L).edges

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational / scale ops over the TPC-H-ish tables ---------------
    "q_agg_pushdown" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_price"),
          count(lit(1)).as("n_rows"))
    }),
    "q_broadcast_join" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("revenue"))
    }),
    "q_window_top_order" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 4).as("top_price"))
    }),
    // ---- temporal operators (SURVEY §2.7) over events --------------------
    "q_asof_latest" -> ((s, dir) => {
      // as-of/current-version semantics (versioning.py:102-161): latest
      // event per user at-or-before the cutoff
      val e = s.read.parquet(s"$dir/events.parquet")
        .where(col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 4).as("value"))
    }),
    "q_time_range_counts" -> ((s, dir) => {
      // get_chunks_modified_in_range analogue (versioning.py:163-200)
      s.read.parquet(s"$dir/events.parquet")
        .where(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
    }),
    // ---- event-stream analytics over events -------------------------------
    "q_sessionize" -> ((s, dir) =>
      // gap-based sessionization (4h gap): one user_id shuffle shared by
      // the window and the session rollup
      Events.sessionize(s.read.parquet(s"$dir/events.parquet"))),
    "q_funnel" -> ((s, dir) =>
      // ordered-step funnel view→click→purchase; per-stage first-hit
      // times and furthest stage per user
      Events.funnel(s.read.parquet(s"$dir/events.parquet"))),
    "q_retention" -> ((s, dir) =>
      // weekly cohort retention counts (absolute epoch-week cohorts)
      Events.retention(s.read.parquet(s"$dir/events.parquet"))),
    "q_stream_sessionize" -> ((s, dir) =>
      // the STREAMING face of sessionize: a real file-source
      // flatMapGroupsWithState query (Trigger.AvailableNow) over the same
      // events table, checked against the same DuckDB gap-sessionization
      // oracle restricted to sessions the stream must have closed by
      // end-of-input (see sessionizeBoundedRun's emission-semantics note).
      // Verification face: the memory sink collects the (session-level,
      // already-aggregated) result — the production sink is a table write
      graft.streaming.StreamingIngest.sessionizeBoundedRun(
        s, s"$dir/events.parquet")),
    "q_compare_periods" -> ((s, dir) => {
      // TimeTraveler.compare_periods (time_travel.py:100-136) over a
      // versioned view derived from events: version = per-user event rank,
      // superseded_at = next event's ts — so versionsAtTime's
      // created/superseded/max-version path all do real work, while the
      // oracle derives the same counts independently (lineages with any
      // event at-or-before each cutoff)
      val w = Window.partitionBy(col("lineage_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val versioned = s.read.parquet(s"$dir/events.parquet")
        .withColumnRenamed("user_id", "lineage_id")
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("version", row_number().over(w))
        .withColumn("created_at", col("ts"))
        .withColumn("superseded_at", lead(col("ts"), 1).over(w))
        .withColumn("is_current", col("superseded_at").isNull)
      Temporal.comparePeriods(versioned,
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    }),
    // ---- KG-shaped extraction ops over documents -------------------------
    "q_mentions" -> ((s, dir) => mentionsDf(s, dir)),
    "q_entities" -> ((s, dir) => {
      mentionsDf(s, dir)
        .groupBy(col("name"), col("type"))
        .agg(countDistinct(col("doc_id")).as("doc_freq"),
          sum(col("mention_count")).as("total_mentions"))
    }),
    "q_cooccur" -> ((s, dir) => {
      val m = mentionsDf(s, dir).select(col("doc_id"), col("name"))
      val a = m.select(col("doc_id"), col("name").as("name1"))
      val b = m.select(col("doc_id").as("d2"), col("name").as("name2"))
      a.join(b, col("doc_id") === col("d2") && col("name1") < col("name2"))
        .groupBy(col("name1"), col("name2"))
        .agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") >= 10)
    }),
    "q_triples" -> ((s, dir) => {
      // pattern relation extraction demo: first "X merge Y" per doc
      s.read.parquet(docsPath(dir))
        .select(col("doc_id"),
          regexp_extract(col("text"), "(\\w+) merge (\\w+)", 1).as("subj"),
          lit("merge").as("pred"),
          regexp_extract(col("text"), "(\\w+) merge (\\w+)", 2).as("obj"))
        .where(col("subj") =!= "" && col("obj") =!= "")
    }),
    "q_chunk_fixed" -> ((s, dir) =>
      // fixed-strategy chunker (chunker.py:195-233): sliding token windows,
      // stride chunkSize - overlap, decode = space-join. Narrow flatMap,
      // kernel shared with SpanChunker.chunkDocFixed.
      fixedChunksDf(s, dir)
        .select(col("doc_id"), col("chunk_index"), col("token_count"),
          col("chunk_text"))),
    "q_chunk_semantic" -> ((s, dir) => {
      // the SEMANTIC chunker (chunker.py:92-178: greedy sentence packing,
      // suffix overlap <= 12 tokens, oversized-sentence token windows) run
      // through the REAL SpanChunker.chunkDocSemantic kernel — and, unlike
      // the kg_chunks row, checked against a SELF-CONTAINED DuckDB replay
      // (recursive-CTE packer), not a serial-oracle dump (VERDICT r4 #6).
      // Every 7th doc gets a deterministic 152-token sentence appended on
      // BOTH engines so the oversized flush+window path is exercised too;
      // every 5th doc gets edge \n/\t whitespace wrapped around its text
      // on BOTH engines so the gate PROVES Java-trim <-> DuckDB
      // trim-charset parity at sentence edges (a one-arg DuckDB trim()
      // strips spaces only and would silently diverge here).
      import s.implicits._
      val cfg = SpanChunker.Config(60, 12)
      val longSent = " " + ("zz " * 150) + "end."
      s.read.parquet(docsPath(dir)).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text1) =>
          val text0 = if (id % 5 == 0) "\n\t " + text1 + " \n" else text1
          val text = if (id % 7 == 0) text0 + longSent else text0
          val doc = graft.core.Schema.DocRow(s"d$id",
            Vector(graft.core.Schema.Span("text", text, "", 0)))
          val meta = graft.core.Schema.DocMeta(s"d$id", "", "", "", 2020,
            "Q1", "", 0)
          SpanChunker.chunkDocSemantic(doc, meta, cfg)
            .map(c => (id, c.chunk_index, c.token_count, c.text))
        }.toDF("doc_id", "chunk_index", "token_count", "chunk_text")
    }),
    "q_neighbors" -> ((s, dir) => {
      // ContextExpander neighbor attachment (context_expansion.py:100-121):
      // lag/lead previews over (doc_id, chunk_index) — one window, no
      // self-join; the result set here is the whole chunk table so every
      // boundary case (first/last chunk per doc) is exercised
      val ch = fixedChunksDf(s, dir)
      graft.retrieval.ContextExpansion.withNeighbors(
        ch.withColumnRenamed("chunk_text", "text"),
        ch.select(col("chunk_id")))
    }),
    "q_doc_context" -> ((s, dir) => {
      // ContextExpander document context (context_expansion.py:202-226):
      // per-doc chunk count + top-10 entities by doc-level mention volume,
      // rank order pinned (sort_array over (rn, name) structs)
      val m = mentionsDf(s, dir)
        .select(col("doc_id"), col("name").as("entity_name"),
          col("mention_count"))
      graft.retrieval.ContextExpansion
        .documentContext(fixedChunksDf(s, dir), m)
        .select(col("doc_id"), col("n_chunks"),
          array_join(col("top_entities"), ",").as("top_entities"))
    }),
    // ---- JSONL source path (ECTQALoader semantics, SURVEY §2.1) ----------
    // The reference's primary input is ECT-QA JSONL (ectqa_loader.py:41-119)
    // with per-record filters, title derivation and quarter-end created_at
    // (:142-242); both queries run the real spark.read.json PERMISSIVE path
    // over a deterministic synthesized fixture, and DuckDB re-derives
    // everything via read_json on the same file.
    "q_jsonl_docs" -> ((s, dir) => {
      val path = graft.sources.JsonlCorpus.writeFixture(
        JsonlFixtureDocs, JsonlFixtureSeed)
      val (corpus, _) = graft.sources.JsonlCorpus.load(s, path,
        graft.sources.JsonlCorpus.Filters(sector = Some("Technology")))
      corpus.select(col("doc_id"), col("title"), col("created_at"),
        col("company_name"), col("year"), col("quarter"))
    }),
    "q_jsonl_stats" -> ((s, dir) => {
      val path = graft.sources.JsonlCorpus.writeFixture(
        JsonlFixtureDocs, JsonlFixtureSeed)
      val (corpus, _) = graft.sources.JsonlCorpus.load(s, path)
      graft.sources.JsonlCorpus.stats(corpus)
    }),
    // ---- file-format loaders (document_loader.py:20-227, SURVEY §2.1) ----
    // binaryFile scan → per-file decode of all four reference formats with
    // REAL pure-JVM parsers (strict-UTF-8/latin-1 text, markdown→HTML→text,
    // BS4-style HTML get_text, PDF FlateDecode + Tj/TJ operators) plus the
    // unsupported-extension error row; the oracle is the fixture
    // generator's independently-derived expected text (never produced by
    // running these parsers), dumped by Verify like the media features
    "q_doc_load" -> ((s, dir) => {
      val path = graft.sources.DocLoader.writeFixture(
        DocFixtureDocs, DocFixtureSeed)
      graft.sources.DocLoader.load(s, path)
        .select(col("filename"), col("ext"), col("byte_len"), col("text"),
          col("error"))
    }),
    // ---- dedup suite ------------------------------------------------------
    "q_dedup_exact" -> ((s, dir) => {
      // the synth corpus has no EXACT dups at the verify SF (only
      // near-dups), which made this row a vacuous 0-row match — seed a
      // deterministic dup set (identical predicate in the oracle) so the
      // grouping, count and canonical-min logic are actually exercised
      val docs = s.read.parquet(docsPath(dir)).withColumn("text",
        when(col("doc_id") % 101 === 0, lit("identical seeded body"))
          .otherwise(col("text")))
      Dedup.exact(docs)
        .select("content_md5", "dup_count", "canonical_doc_id")
    }),
    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardSh(shingled(s, dir, 5), threshold = 0.8)),
    "q_dedup_minhash" -> ((s, dir) =>
      // LSH-then-verify: banded MinHash candidates, exact Jaccard emitted —
      // DuckDB recomputes the exact all-pairs >= 0.7 set and checks recall.
      // 32 bands x 2 rows: per-pair miss at J=0.7 is (1-0.49)^32 ≈ 4e-10 —
      // provable recall at the gate threshold, not corpus luck
      Dedup.verifyJaccardSh(shingled(s, dir, 5), minhashCands(s, dir),
        threshold = 0.7)),
    "q_dedup_simhash" -> ((s, dir) =>
      // SimHash 8x8 band candidates (Hamming <= 7) + the minhash recall
      // floor (simhash alone cannot promise Jaccard recall — a J=0.92 pair
      // beyond Hamming 7 exists at sf0.001), exact-Jaccard verified
      Dedup.simhashExactFloored(s.read.parquet(docsPath(dir)),
        shingled(s, dir, 5), minhashCands(s, dir),
        maxHamming = 7, threshold = 0.9)),
    "q_dedup_cluster" -> ((s, dir) => {
      // near-dup canonicalization: CC over the verified >= 0.7 pairs ->
      // min-id canonical per cluster. Numeric ids are zero-padded for the
      // CC loop (string labels: lexicographic min must equal numeric min),
      // then cast back. DuckDB recomputes via recursive transitive closure.
      val pairs = Dedup.verifyJaccardSh(shingled(s, dir, 5),
        minhashCands(s, dir), threshold = 0.7)
      Dedup.clusterNearDups(s, pairs.select(
        lpad(col("id1").cast("string"), 20, "0").as("id1"),
        lpad(col("id2").cast("string"), 20, "0").as("id2")))
        .select(col("doc_id").cast("bigint").as("doc_id"),
          col("canonical_doc_id").cast("bigint").as("canonical_doc_id"))
    }),
    "q_decontam" -> ((s, dir) => {
      // decontamination screen: docs with doc_id % 97 == 0 play the
      // benchmark/eval corpus (deterministic split, same predicate in the
      // oracle); flag every remaining train doc sharing a 4-gram with it
      // (4-grams catch the synth corpus's real near-dup injections — a
      // multi-row varied-overlap contract at sf0.01)
      val docs = s.read.parquet(docsPath(dir))
      Dedup.decontaminate(
        docs.where(col("doc_id") % 97 =!= 0),
        docs.where(col("doc_id") % 97 === 0), n = 4)
    }),
    "q_dedup_keep_best" -> ((s, dir) => {
      // retention policy: keep the LONGEST document per near-dup cluster
      // (score = char length; ties -> min doc_id). Same cluster assignment
      // as q_dedup_cluster; DuckDB recomputes closure + argmax from scratch.
      val pairs = Dedup.verifyJaccardSh(shingled(s, dir, 5),
        minhashCands(s, dir), threshold = 0.7)
      val clusters = Dedup.clusterNearDups(s, pairs.select(
        lpad(col("id1").cast("string"), 20, "0").as("id1"),
        lpad(col("id2").cast("string"), 20, "0").as("id2")))
        .select(col("doc_id").cast("bigint").as("doc_id"),
          col("canonical_doc_id").cast("bigint").as("canonical_doc_id"))
      val scored = s.read.parquet(docsPath(dir))
        .select(col("doc_id"), length(col("text")).cast("bigint").as("score"))
      Dedup.keepBestPerCluster(clusters, scored)
    }),
    "q_stratified" -> ((s, dir) =>
      Sampling.stratifiedSampleByHash(s.read.parquet(docsPath(dir)),
        fractions = Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1)
        .select(col("doc_id"), col("lang"))),
    "q_source_mix" -> ((s, dir) =>
      // domain reweighting toward a target mix: src0 -> 4%, src1 -> 2%,
      // everything else 1% of the corpus (the corpus is 20 uniform
      // sources, so fractions 0.8 / 0.4 / 0.2 — three distinct regimes)
      Sampling.sourceMixSample(s.read.parquet(docsPath(dir)),
        weights = Map("src0" -> 0.04, "src1" -> 0.02),
        defaultWeight = 0.01)),
    "q_line_dedup" -> ((s, dir) => {
      // cross-document boilerplate-line scrub over the same derived
      // 8-token-per-line view as q_repetition (the synth corpus is
      // single-line); the corpus vocabulary is small, so lines genuinely
      // repeat across docs and both branches (shared / kept) are exercised.
      // tokens materialized before the lambda: slice(toks, ...) inside the
      // transform would re-tokenize the text per 8-token window
      val toks = col("toks")
      val nl = s.read.parquet(docsPath(dir))
        .select(col("doc_id"),
          TextAnalysis.wsTokens(col("text")).as("toks"))
        .select(col("doc_id"),
          concat_ws("\n", transform(
            sequence(lit(0),
              greatest(ceil(size(toks) / lit(8.0)).cast("int") - 1, lit(0))),
            k => concat_ws(" ", slice(toks, k * 8 + 1, lit(8))))).as("text"))
      Dedup.lineDedupStats(nl, minDf = 2)
    }),
    "q_kmeans" -> ((s, dir) =>
      // distributed Lloyd k-means over the embeddings table: k=8, 2 full
      // update rounds from the deterministic smallest-vec_id seed; the
      // DuckDB oracle re-runs both rounds from scratch in SQL
      Clustering.kmeans(s.read.parquet(embPath(dir)), k = 8, iters = 2)),
    "q_emb_quant" -> ((s, dir) =>
      Similarity.quantizeInt8(s.read.parquet(embPath(dir)))),
    "q_graph_degree" -> ((s, dir) =>
      // degree histogram of the constructed KG (undirected simple view);
      // oracle recomputes from the serial-oracle edge dump
      GraphMetrics.degreeHistogram(kg(s, kgDocs(dir)).edges)),
    "q_graph_triangles" -> ((s, dir) =>
      // triangle census via degree-ordered wedge counting; the oracle
      // recounts with a plain a<b<c 3-way self-join — an independent
      // algorithm, so a green row checks the orientation logic itself
      GraphMetrics.triangleStats(kg(s, kgDocs(dir)).edges)
        .select("n_nodes", "n_edges", "n_triangles")),
    "q_communities" -> ((s, dir) =>
      // deterministic synchronous label propagation, 2 rounds, over the
      // constructed KG; oracle re-runs both rounds from the serial-oracle
      // edge dump in unrolled SQL
      GraphMetrics.labelPropagation(kg(s, kgDocs(dir)).edges, rounds = 2)),
    "q_logreg_langid" -> ((s, dir) =>
      // fastText-style lang-id classifier TRAINED distributedly on the
      // corpus itself (hashed-token logreg, 2 full-batch GD epochs, y =
      // lang=='en'); the DuckDB oracle re-runs the whole training from
      // scratch in unrolled SQL, so a green row checks the TRAINING math,
      // not just the scoring pass
      TextClassifier.trainScore(s.read.parquet(docsPath(dir)),
        labelExpr = col("lang") === "en", dim = 64, epochs = 2)),
    "q_dup_ngrams" -> ((s, dir) =>
      // duplicated-substring profile (8-token stride-1 windows, df >= 2
      // across docs); engine blocks on xxhash64(window), oracle groups on
      // the raw window text — a green row cross-checks the hashing too
      Dedup.dupNgramStats(s.read.parquet(docsPath(dir)), n = 8)),
    "q_emb_neardup" -> ((s, dir) => {
      // label-blocked exact cosine near-dup (blocking = the label column).
      // the corpus has no true near-dups, so seed deterministic scaled
      // copies (cosine is scale-invariant -> exact hits) of vec_id < 20
      val base = s.read.parquet(embPath(dir))
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("emb"))
      val pert = base.where(col("vec_id") < 20)
        .select((col("vec_id") + 100000).as("vec_id"), col("label"),
          transform(col("emb"), x => x * lit(1.01)).as("emb"))
      val all = base.union(pert)
      val a = all.select(col("label"), col("vec_id").as("id1"),
        col("emb").as("e1"))
      val b = all.select(col("label").as("l2"), col("vec_id").as("id2"),
        col("emb").as("e2"))
      a.join(b, col("label") === col("l2") && col("id1") < col("id2"))
        .withColumn("cosine", round(Similarity.cosineKernel(col("e1"), col("e2")), 4))
        .where(col("cosine") >= 0.999)
        .select("id1", "id2", "cosine")
    }),
    "q_dedup_incremental" -> ((s, dir) => {
      // batch-vs-corpus dedup: docs with doc_id % 89 == 0 play the new
      // ingest batch, the rest the already-indexed corpus; old x old pairs
      // are never generated. oracle = exact all-pairs Jaccard >= 0.7
      // restricted to pairs touching the new split (blind to the hashing),
      // so a green row proves the incremental banding's recall
      val sh = shingled(s, dir, 5)
      Dedup.incrementalNearDupsSh(
        sh.where(col("doc_id") % 89 =!= 0),
        sh.where(col("doc_id") % 89 === 0),
        numHashes = 64, bands = 32, threshold = 0.7)
    }),
    "q_curate_pipeline" -> ((s, dir) => curateRow(s, dir)),
    "q_len_stats" -> ((s, dir) =>
      TextAnalysis.lengthStats(s.read.parquet(docsPath(dir)),
        strataCol = "lang")),
    "q_asof_join" -> ((s, dir) => {
      // generic backward as-of join: attribute every click to the user's
      // most recent view at-or-before it. DuckDB recomputes with its
      // NATIVE ASOF LEFT JOIN — an algorithmically independent oracle.
      // right side deduped per (user, ts) by max event_id so the as-of
      // tie-break is well-defined in both engines
      val ev = s.read.parquet(s"$dir/events.parquet")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), col("event_id"),
          col("value"))
        .groupBy("user_id", "vts")
        .agg(max(col("event_id")).as("view_event_id"),
          max_by(col("value"), col("event_id")).as("view_value"))
      graft.ops.AsofJoin.backward(clicks, views, keys = Seq("user_id"),
        leftTime = "ts", rightTime = "vts")
        .select(col("event_id"), col("user_id"),
          coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"),
          coalesce(col("view_value"), lit(0.0)).as("view_value"))
    }),
    "q_semdedup" -> ((s, dir) => {
      // SemDeDup over the same near-dup-seeded corpus as q_emb_neardup,
      // but with k-means as the blocking stage (the paper's design); the
      // oracle re-runs Lloyd + in-cluster cosine + retention from scratch
      val base = s.read.parquet(embPath(dir)).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val pert = base.where(col("vec_id") < 20)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.01)).as("embedding"))
      Clustering.semDedup(base.union(pert), k = 8, iters = 2,
        threshold = 0.999)
    }),
    "q_dsir" -> ((s, dir) => {
      // DSIR importance weights toward the same deterministic eval split
      // as q_decontam (doc_id % 97 == 0 plays the target domain); the
      // oracle re-runs feature hashing + both bucket LMs from scratch
      val docs = s.read.parquet(docsPath(dir))
      Dsir.importanceWeights(
        docs.where(col("doc_id") % 97 =!= 0),
        docs.where(col("doc_id") % 97 === 0), dim = 256)
    }),
    "q_dsir_sample" -> ((s, dir) => {
      // the resampling step: deterministic Gumbel top-50 over the weights
      val docs = s.read.parquet(docsPath(dir))
      Dsir.gumbelTopK(Dsir.importanceWeights(
        docs.where(col("doc_id") % 97 =!= 0),
        docs.where(col("doc_id") % 97 === 0), dim = 256), k = 50)
    }),
    // ---- similarity search ------------------------------------------------
    "q_ann_brute" -> ((s, dir) => {
      val e = s.read.parquet(embPath(dir))
      val q = e.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble)
      // order on the 4dp-rounded score so ranking ties break identically
      // across engines (double-vs-float accumulation differs below 4dp)
      Similarity.bruteForceTopK(e, q, k = 10, excludeId = Some(0L), roundTo = 4)
    }),
    "q_ann_lsh" -> ((s, dir) => {
      // bucket-probed ANN over a corpus seeded with TRUE near neighbors of
      // the query (12 positively-scaled copies of vec 0 — cosine exactly 1,
      // and positive scaling preserves every sign-LSH bit, so they land in
      // the query's own bucket). The DuckDB oracle is the EXACT brute-force
      // top-k over the same seeded corpus, so a green row proves the
      // LSH probe achieves recall 1.0 on the actual near neighbors — the
      // contract an ANN index must meet (far-apart random vectors are not
      // recoverable by any sub-linear probe, by design).
      val base = s.read.parquet(embPath(dir))
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val pert = base.where(col("vec_id") === 0)
        .select(explode(sequence(lit(1), lit(12))).as("i"), col("embedding"))
        .select((col("i") + 200000).cast("long").as("vec_id"),
          transform(col("embedding"),
            x => x * (lit(1.0) + col("i").cast("double") * 0.01)).as("embedding"))
      val all = base.union(pert)
      val q = base.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Double](0)
      Similarity.lshTopK(all, q, k = 10, planes = 8, roundTo = 4,
        excludeId = Some(0L))
    }),
    "q_ann_ivf" -> ((s, dir) => {
      // IVF-flat cell-probed ANN, same seeded-true-neighbor contract as
      // q_ann_lsh (12 positively-scaled copies of vec 0 share its cosine
      // profile, so cell probing must recover them); oracle = exact
      // brute-force top-k — green row proves IVF recall 1.0
      val base = s.read.parquet(embPath(dir))
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val pert = base.where(col("vec_id") === 0)
        .select(explode(sequence(lit(1), lit(12))).as("i"), col("embedding"))
        .select((col("i") + 300000).cast("long").as("vec_id"),
          transform(col("embedding"),
            x => x * (lit(1.0) + col("i").cast("double") * 0.01)).as("embedding"))
      val all = base.union(pert)
      val q = base.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Double](0)
      Similarity.ivfTopK(all, q, k = 10, numCentroids = 16, nProbe = 4,
        roundTo = 4, excludeId = Some(0L))
    }),
    // ---- text analysis ----------------------------------------------------
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(s.read.parquet(docsPath(dir)))),
    "q_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(s.read.parquet(docsPath(dir)))),
    "q_token_count" -> ((s, dir) =>
      TextAnalysis.tokenCounts(s.read.parquet(docsPath(dir)))),
    "q_tfidf_top" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(s.read.parquet(docsPath(dir)), k = 5)),
    "q_bm25" -> ((s, dir) =>
      // lexical retrieval: Okapi BM25 top-10 for a fixed bag-of-terms query
      TextAnalysis.bm25(s.read.parquet(docsPath(dir)),
        Seq("vector", "merge", "scan"), topK = 10)),
    "q_perplexity" -> ((s, dir) =>
      // CCNet-style quality filter: corpus-trained bigram-LM mean NLL
      TextAnalysis.bigramPerplexity(s.read.parquet(docsPath(dir)))),
    "q_split" -> ((s, dir) =>
      Sampling.hashSplit(s.read.parquet(docsPath(dir)))),
    "q_pack" -> ((s, dir) =>
      Sampling.packSequences(s.read.parquet(docsPath(dir)),
        maxTokens = 256, shards = 8)),
    "q_repetition" -> ((s, dir) => {
      // Gopher-style repetition screens need multi-line text; the synth
      // corpus is single-line, so the query derives a deterministic
      // 8-token-per-line view with the IDENTICAL expression in the oracle
      // SQL — the repetition stats then have real duplicate lines to find
      // (the corpus vocabulary is small, so 8-token lines genuinely repeat).
      // tokens materialized before the lambda: slice(toks, ...) inside the
      // transform would re-tokenize the text per 8-token window
      val toks = col("toks")
      val nl = s.read.parquet(docsPath(dir))
        .select(col("doc_id"),
          TextAnalysis.wsTokens(col("text")).as("toks"))
        .select(col("doc_id"),
          concat_ws("\n", transform(
            sequence(lit(0),
              greatest(ceil(size(toks) / lit(8.0)).cast("int") - 1, lit(0))),
            k => concat_ws(" ", slice(toks, k * 8 + 1, lit(8))))).as("text"))
      TextAnalysis.repetitionStats(nl)
    }),
    "q_pii_scrub" -> ((s, dir) => {
      // deterministic PII augmentation, same expression in the oracle SQL:
      // every doc gains one email, one IPv4 and one phone; every third doc
      // a second email — the scrub has real matches and varying counts
      val aug = s.read.parquet(docsPath(dir)).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" cc admin"), col("doc_id").cast("string"),
              lit("@corp.io"))).otherwise(lit("")),
          lit(" at 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 100).cast("string"),
          lit(" call +1 555 01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0")).as("text"))
      TextAnalysis.piiStats(aug)
    }),
    "q_entropy" -> ((s, dir) =>
      // token-distribution entropy (quality/diversity filter signal)
      TextAnalysis.tokenEntropy(s.read.parquet(docsPath(dir)))),
    "q_normalize" -> ((s, dir) => {
      // deterministic whitespace/control augmentation, mirrored in the
      // oracle SQL: tab+spaces prefix, every space tripled, trailing CRLF
      // — the normalizer has real work to undo on every row
      val aug = s.read.parquet(docsPath(dir)).select(col("doc_id"),
        concat(lit("\t  "), regexp_replace(col("text"), " ", "   "),
          lit(" \r\n")).as("text"))
      TextAnalysis.normalizeText(aug)
    }),
    "q_url_extract" -> ((s, dir) => {
      // deterministic URL augmentation (mixed-case host exercises the
      // lowercase fold; every 4th doc gains a second, shared domain)
      val aug = s.read.parquet(docsPath(dir)).select(col("doc_id"),
        concat(col("text"),
          lit(" see https://Host"), (col("doc_id") % 50).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          when(col("doc_id") % 4 === 0,
            lit(" and http://cdn.example.net/x"))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.urlDomains(aug)
    }),
    "q_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(s.read.parquet(docsPath(dir)))
        .select("doc_id", "content_md5")),
    "q_fingerprint_rolling" -> ((s, dir) =>
      // windowed digest (DuckDB-checkable); the xxhash64-chain rolling
      // hash stays in TextAnalysis.fingerprint (OpsSpec property-tested)
      TextAnalysis.windowFingerprint(s.read.parquet(docsPath(dir)), w = 8)),
    // ---- retrieval operators (SURVEY §2.8) --------------------------------
    "q_entity_any" -> ((s, dir) => {
      // ANY-match entity search (graph_search.py:136-165) at doc granularity
      val m = mentionsDf(s, dir)
        .select(col("doc_id").as("chunk_id"), col("name").as("entity_name"))
      GraphSearch.searchByEntitiesAny(s, m, Seq("spark", "merge", "window"),
          topK = 10)
        .select(col("chunk_id").as("doc_id"), col("matched"),
          round(col("score"), 6).as("score"))
    }),
    "q_entity_all" -> ((s, dir) => {
      // ALL-match relational division (graph_search.py:104-134): docs whose
      // matched set covers every queried name
      val m = mentionsDf(s, dir)
        .select(col("doc_id").as("chunk_id"), col("name").as("entity_name"))
      GraphSearch.searchByEntitiesAll(s, m, Seq("spark", "merge", "window"),
          topK = 10)
        .select(col("chunk_id").as("doc_id"), col("matched"), col("score"))
    }),
    "q_entity_type" -> ((s, dir) => {
      // by-type entity search (graph_search.py:181-240): docs ranked by
      // distinct PRODUCT entities mentioned
      val m = mentionsDf(s, dir)
        .select(col("doc_id").as("chunk_id"), col("name").as("entity_name"),
          col("type").as("entity_type"))
      GraphSearch.searchByEntityType(m, "PRODUCT", topK = 10)
        .select(col("chunk_id").as("doc_id"), col("score"))
    }),
    "q_related_2hop" -> ((s, dir) => {
      // bounded BFS (graph_search.py:242-309) over the co-occurrence graph
      val m = mentionsDf(s, dir).select(col("doc_id"), col("name"))
      val a = m.select(col("doc_id"), col("name").as("subj"))
      val b = m.select(col("doc_id").as("d2"), col("name").as("obj"))
      val edges = a.join(b, col("doc_id") === col("d2") && col("subj") < col("obj"))
        .groupBy(col("subj"), col("obj")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 10).drop("n")
      GraphSearch.relatedEntities(s, edges, "spark", depth = 2)
    }),
    "q_hybrid_rrf" -> ((s, dir) => {
      // RRF fusion (hybrid_search.py:106-163): length-ranked list fused
      // with mention-volume-ranked list, k=60, alpha=0.5
      val docs = s.read.parquet(docsPath(dir))
      val vector = docs.select(col("doc_id").as("chunk_id"),
          length(col("text")).cast("double").as("score"))
        .orderBy(col("score").desc, col("chunk_id").asc).limit(50)
      val graph = mentionsDf(s, dir)
        .groupBy(col("doc_id").as("chunk_id"))
        .agg(sum(col("mention_count")).cast("double").as("score"))
        .orderBy(col("score").desc, col("chunk_id").asc).limit(50)
      HybridSearch.rrf(vector, graph, topK = 20)
        .select(col("chunk_id").as("doc_id"),
          round(col("rrf_score"), 6).as("rrf_score"))
    }),
    "q_doc_similarity" -> ((s, dir) => {
      val m = mentionsDf(s, dir).select(col("doc_id"),
        col("name").as("entity_name"), col("type").as("entity_type"))
      GraphSearch.documentSimilarityGraph(m, 0L, minShared = 2)
    }),
    "q_version_prune" -> ((s, dir) => {
      // delete_old_versions semantics (versioning.py:224-262): keep the
      // current version + 2 superseded per chain; events stand in as
      // version rows
      val e = s.read.parquet(s"$dir/events.parquet")
        .withColumnRenamed("user_id", "lineage_id")
        .withColumnRenamed("event_id", "version")
      Temporal.pruneOldVersions(e, keep = 2)
        .select(col("lineage_id").as("user_id"),
          col("version").as("event_id"), col("event_type"))
    }),
    // ---- KG construction pipeline (north rule). The DuckDB oracle is the
    // independent SerialOracle run dumped to parquet by Verify (same corpus,
    // same config); array columns are serialized to strings because the
    // driver's pandas sort cannot hash arrays. ------------------------------
    "kg_edges" -> ((s, dir) => kg(s, kgDocs(dir)).edges
      .withColumn("source_chunks", array_join(col("source_chunks"), ","))),
    "kg_nodes" -> ((s, dir) => kg(s, kgDocs(dir)).nodes
      .withColumn("merged_entity_ids",
        array_join(col("merged_entity_ids"), ","))),
    "kg_mentions" -> ((s, dir) => kg(s, kgDocs(dir)).mentionsFinal),
    "kg_ppr" -> ((s, dir) => {
      // personalized-PageRank retrieval (ppr_traversal.py:85-448) over the
      // constructed graph; verified against a serial power iteration in
      // RetrievalSpec, rows-only here
      val r = kg(s, kgDocs(dir))
      Ppr.search(s, r.nodes,
        r.edges.select(col("subj"), col("pred"), col("obj")),
        r.mentionsFinal, Seq("Skyline Systems"), topK = 20)
    }),
    "kg_chunks" -> ((s, dir) => kg(s, kgDocs(dir)).chunks.toDF()
      .select(col("chunk_id"), col("doc_id"), col("chunk_index"),
        col("token_count"), size(col("spans")).as("n_spans"))),
    // ---- distributed-path evidence: the same kg_nodes / kg_ppr contracts
    // with the driver-local small-graph shortcuts DISABLED (localEdgeCap=0),
    // so the DataFrame label-propagation CC loop and the distributed PPR
    // power iteration — the code paths that run at 100x scale — are
    // themselves checked against the identical serial-oracle dumps. --------
    "kg_nodes_dist" -> ((s, dir) => {
      val r = kg(s, kgDocs(dir))
      val comps = graft.canon.ConnectedComponents.run(s,
        r.dupPairs.select(col("id1"), col("id2")), localEdgeCap = 0L)
      graft.canon.Canonicalize.nodes(r.entities, comps)
        .withColumn("merged_entity_ids",
          array_join(col("merged_entity_ids"), ","))
    }),
    "kg_ppr_dist" -> ((s, dir) => {
      val r = kg(s, kgDocs(dir))
      Ppr.search(s, r.nodes,
        r.edges.select(col("subj"), col("pred"), col("obj")),
        r.mentionsFinal, Seq("Skyline Systems"), topK = 20,
        localEdgeCap = 0L)
    }),
    // ---- SparkSessionExtensions surface: the same label-blocked cosine
    // near-dup as q_emb_neardup, but expressed in SQL through the
    // registered native cosine_sim() function (GraftFunctions /
    // GraftExtensions) — driver-evidences the SQL registration path. ------
    "q_sql_cosine" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      s.read.parquet(embPath(dir)).createOrReplaceTempView("graft_emb")
      s.sql("""
        WITH base AS (
          SELECT vec_id, label,
            transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM graft_emb),
        pert AS (
          SELECT vec_id + 100000 AS vec_id, label,
            transform(emb, x -> x * 1.01D) AS emb
          FROM base WHERE vec_id < 20),
        a AS (SELECT * FROM base UNION ALL SELECT * FROM pert)
        SELECT x.vec_id AS id1, y.vec_id AS id2,
          round(cosine_sim(x.emb, y.emb), 4) AS cosine
        FROM a x JOIN a y ON x.label = y.label AND x.vec_id < y.vec_id
        WHERE round(cosine_sim(x.emb, y.emb), 4) >= 0.999""")
    }),
    // ---- multimodal: real pure-JVM decoders for all four kinds ------------
    // (PPM image / RIFF-WAVE audio / YUV4MPEG2 video / CSV table; the
    // oracle dump re-derives each format's header arithmetic independently)
    "q_media_features" -> ((s, dir) => {
      mediaFeatures(s, dir)
        .select("doc_id", "media_ref", "kind", "byte_len", "width",
          "height", "n_frames")
    }),
    "q_media_resize" -> ((s, dir) => {
      import s.implicits._
      // maxDim 48 straddles the real decoded dims (PPM images 8..63, y4m
      // video 16..62, audio width sr/100 = 80..159, CSV tables 3..40) —
      // both resize branches (scale and pass-through) exercised
      Multimodal.resize(
        mediaFeatures(s, dir).as[Multimodal.MediaFeatures], maxDim = 48)(s)
        .select("doc_id", "media_ref", "width", "height",
          "out_width", "out_height")
    }),
    "q_media_frames" -> ((s, dir) => {
      import s.implicits._
      Multimodal.sampleFrames(
        mediaFeatures(s, dir).as[Multimodal.MediaFeatures],
        every = 5, maxFrames = 12)
        .select("doc_id", "media_ref", "kind", "n_frames", "n_sampled")
    }))

  /** JSONL fixture knobs, shared by the queries and their oracle SQL. */
  val JsonlFixtureDocs = 500
  val JsonlFixtureSeed = 7L

  /** Doc-file fixture knobs (q_doc_load): 400 corpus docs round-robin over
    * txt/md/html/pdf (every 8th txt latin-1-encoded) plus one unsupported
    * `.dat` file — 401 rows. Shared by the query and Verify's expected-rows
    * oracle dump.
    */
  val DocFixtureDocs = 400
  val DocFixtureSeed = 11L

  private def jsonlReadSql: String =
    s"""read_json('${graft.sources.JsonlCorpus.fixturePath(JsonlFixtureDocs,
        JsonlFixtureSeed)}',
       |  format='newline_delimited', ignore_errors=true,
       |  columns={company_name:'VARCHAR', stock_code:'VARCHAR',
       |    sector:'VARCHAR', year:'INTEGER', quarter:'VARCHAR',
       |    transcript:'VARCHAR', url:'VARCHAR'})""".stripMargin

  /** Placeholder replaced by Verify with its absolute output dir: the kg_*
    * oracles compare the engine output against the independent serial-
    * oracle run that Verify dumps to `<outDir>/_oracle_<name>` parquet.
    */
  val VerifyOutPlaceholder = "__VERIFY_OUT__"

  private def oracleDumpSql(name: String): String =
    s"SELECT * FROM read_parquet('$VerifyOutPlaceholder/_oracle_$name/*.parquet')"

  /** DuckDB oracle SQL per query (same column names — the driver sorts
    * columns by name before hashing). The kg_* pipeline tables and
    * q_media_features are checked against the serial oracle's parquet dump
    * (see VerifyOutPlaceholder) — every query key is oracle-checked.
    */
  def oracleSql: Map[String, String] = Map(
    "kg_edges" -> oracleDumpSql("kg_edges"),
    "kg_nodes" -> oracleDumpSql("kg_nodes"),
    "kg_mentions" -> oracleDumpSql("kg_mentions"),
    "kg_chunks" -> oracleDumpSql("kg_chunks"),
    "kg_ppr" -> oracleDumpSql("kg_ppr"),
    // the _dist variants must reproduce the SAME oracle dumps with the
    // distributed code paths forced on
    "kg_nodes_dist" -> oracleDumpSql("kg_nodes"),
    "kg_ppr_dist" -> oracleDumpSql("kg_ppr"),
    "q_media_features" -> oracleDumpSql("q_media_features"),
    // expected table derived by the fixture generator from pre-render
    // inputs (never by running the engine's parsers) — dumped by Verify
    "q_doc_load" -> oracleDumpSql("q_doc_load"),
    // resize/frame-sample derive arithmetically from the dumped features —
    // DuckDB recomputes the contract instead of trusting the engine
    "q_media_resize" ->
      s"""SELECT doc_id, media_ref, width, height,
         |  CAST(ceil(width * least(1.0, 48.0 / greatest(width, height)))
         |    AS INTEGER) AS out_width,
         |  CAST(ceil(height * least(1.0, 48.0 / greatest(width, height)))
         |    AS INTEGER) AS out_height
         |FROM read_parquet('$VerifyOutPlaceholder/_oracle_q_media_features/*.parquet')""".stripMargin,
    "q_media_frames" ->
      s"""SELECT doc_id, media_ref, kind, n_frames,
         |  least(12, ((n_frames - 1) // 5) + 1) AS n_sampled
         |FROM read_parquet('$VerifyOutPlaceholder/_oracle_q_media_features/*.parquet')""".stripMargin,
    "q_agg_pushdown" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_price,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_broadcast_join" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
        |  round(sum(o.o_totalprice), 4) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,
    "q_window_top_order" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS top_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders) WHERE rn = 1""".stripMargin,
    "q_asof_latest" ->
      """SELECT user_id, event_id, event_type, round(value, 4) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |WHERE rn = 1""".stripMargin,
    "q_time_range_counts" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY 1""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value
        |  FROM events),
        |m AS (
        |  SELECT *, lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC) AS prev_us
        |  FROM e),
        |x AS (
        |  SELECT *, CAST(sum(CASE WHEN prev_us IS NULL
        |        OR us - prev_us > 14400000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS session_idx
        |  FROM m)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(us) AS t_start_us, max(us) AS t_end_us,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |  round(sum(value), 4) AS sum_value,
        |  max(us) - min(us) AS duration_us
        |FROM x GROUP BY 1, 2""".stripMargin,
    // the streaming face: same gap sessionization, restricted to sessions
    // the bounded stream must have CLOSED by end-of-input — every
    // non-last session per user (gap-closed in the single data batch)
    // plus last sessions whose end + gap lies strictly below the final
    // watermark (= max event time, lateness 0; Spark's timeout predicate
    // is timeoutTimestamp < watermark at millisecond resolution, hence
    // the //1000)
    "q_stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        |m AS (
        |  SELECT *, lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC) AS prev_us
        |  FROM e),
        |x AS (
        |  SELECT *, CAST(sum(CASE WHEN prev_us IS NULL
        |        OR us - prev_us > 14400000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS session_idx
        |  FROM m),
        |sess AS (
        |  SELECT user_id, session_idx, count(*) AS n_events,
        |    min(us) AS t_start_us, max(us) AS t_end_us,
        |    round(sum(value), 4) AS sum_value
        |  FROM x GROUP BY 1, 2),
        |wm AS (SELECT max(us) // 1000 AS wm_ms FROM e)
        |SELECT user_id, t_start_us, t_end_us, n_events, sum_value
        |FROM sess, wm
        |WHERE session_idx < (SELECT max(session_idx) FROM sess s2
        |                     WHERE s2.user_id = sess.user_id)
        |   OR (t_end_us // 1000 + 14400000) < wm_ms""".stripMargin,
    "q_compare_periods" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n, 't1' AS "at"
        |FROM events WHERE ts <= TIMESTAMP '2024-01-10 00:00:00'
        |UNION ALL
        |SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n, 't2' AS "at"
        |FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |users AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(us) AS t2 FROM e
        |  JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND us >= t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(us) AS t3 FROM e
        |  JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND us >= t2 GROUP BY 1)
        |SELECT user_id,
        |  coalesce(t1, -1) AS t_step1_us,
        |  coalesce(t2, -1) AS t_step2_us,
        |  coalesce(t3, -1) AS t_step3_us,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |    WHEN t2 IS NOT NULL THEN 2
        |    WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage
        |FROM users LEFT JOIN s1 USING (user_id)
        |  LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)"""
        .stripMargin,
    "q_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  count(*) AS n_users
        |FROM (SELECT DISTINCT cohort_week, week, e.user_id
        |      FROM e JOIN f USING (user_id))
        |GROUP BY 1, 2""".stripMargin,
    "q_mentions" -> mentionsSql,
    "q_entities" ->
      s"""WITH m AS ($mentionsSql)
         |SELECT name, type, count(DISTINCT doc_id) AS doc_freq,
         |  CAST(sum(mention_count) AS BIGINT) AS total_mentions
         |FROM m GROUP BY 1, 2""".stripMargin,
    "q_cooccur" ->
      s"""WITH m AS ($mentionsSql)
         |SELECT a.name AS name1, b.name AS name2, count(*) AS n_docs
         |FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.name < b.name
         |GROUP BY 1, 2 HAVING count(*) >= 10""".stripMargin,
    "q_triples" ->
      """SELECT doc_id,
        |  regexp_extract(text, '(\w+) merge (\w+)', 1) AS subj,
        |  'merge' AS pred,
        |  regexp_extract(text, '(\w+) merge (\w+)', 2) AS obj
        |FROM documents
        |WHERE regexp_extract(text, '(\w+) merge (\w+)', 1) <> ''
        |  AND regexp_extract(text, '(\w+) merge (\w+)', 2) <> ''""".stripMargin,
    "q_chunk_fixed" ->
      // fixedChunkCte replays the tokenizer grammar (lookaround-free for
      // RE2) and the k*48-stride window arithmetic of graft.text.Tok /
      // SpanChunker.fixedWindowStarts
      s"""WITH $fixedChunkCte
         |SELECT doc_id, chunk_index, token_count, chunk_text
         |FROM fc""".stripMargin,
    "q_chunk_semantic" ->
      // SELF-CONTAINED recursive-CTE replay of the SEMANTIC packer
      // (chunker.py:92-178 contract, SpanChunker.chunkDocSemantic):
      //   sent  — regex sentence split (delimiter = ws run after [.!?];
      //           lookbehind-free via marker substitution, RE2-safe),
      //           re-numbered after empty-drop, token lists per sentence;
      //   ovl   — per sentence i, the maximal suffix of sentences < i
      //           totalling <= 12 tokens (the overlap seed start);
      //   pack  — one recursion step per sentence carrying (chunk index,
      //           open-chunk start); emits a flush record on overflow or
      //           oversized sentence, plus a window series (stride 48,
      //           width 60) for oversized sentences;
      //   chunks0/schunks/wchunks — assemble chunk text (space-joined
      //           sentences / token windows) + exact token counts.
      // The doc_id % 7 augmentation appends a deterministic 152-token
      // sentence on both engines so flush+window paths are exercised.
      // Trim parity: the engine's Tok.sentenceSplit strips Java-trim
      // whitespace (every char <= U+0020) from sentence edges, while
      // DuckDB's one-arg trim() strips ' ' only — so the CTE trims with
      // an explicit chr(1)..chr(32) set (chr(1) doubles as the split
      // marker, already consumed). Residual documented divergences no
      // realistic corpus hits: a NUL (U+0000) at a sentence edge (DuckDB
      // varchars cannot hold one), and an INTERIOR U+000B — Java \\s
      // includes \\v, RE2's does not, so a mid-sentence \\v tokenizes as
      // punctuation only on the oracle side.
      s"""WITH RECURSIVE
         |docsw AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0
         |      THEN chr(10) || chr(9) || ' ' || text || ' ' || chr(10)
         |      ELSE text END AS text
         |  FROM documents),
         |docs0 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0
         |      THEN text || ' ' || repeat('zz ', 150) || 'end.'
         |      ELSE text END AS text
         |  FROM docsw),
         |raw AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(text, '([.!?])\\s+',
         |      '\\1' || chr(1), 'g'), chr(1)) AS ps
         |  FROM docs0),
         |sraw AS (
         |  SELECT doc_id, trim(unnest(ps), $javaTrimSet) AS s0,
         |    unnest(range(1, len(ps) + 1)) AS pi
         |  FROM raw),
         |sent AS (
         |  SELECT doc_id, s0 AS s,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pi) - 1
         |      AS INT) AS sidx,
         |    regexp_extract_all(s0, '$chunkTokPat') AS toks
         |  FROM sraw WHERE s0 <> ''),
         |scnt AS (
         |  SELECT doc_id, sidx, s, toks, CAST(len(toks) AS INT) AS st,
         |    CAST(sum(len(toks)) OVER (PARTITION BY doc_id ORDER BY sidx)
         |      AS INT) AS sc
         |  FROM sent),
         |nsent AS (SELECT doc_id, CAST(count(*) AS INT) AS n
         |          FROM scnt GROUP BY 1),
         |ovl AS (
         |  SELECT i.doc_id, i.sidx, COALESCE(MIN(j.sidx), i.sidx) AS ostart
         |  FROM scnt i LEFT JOIN scnt j
         |    ON j.doc_id = i.doc_id AND j.sidx < i.sidx
         |    AND j.sidx >= i.sidx - 12
         |    AND (i.sc - i.st) - (j.sc - j.st) <= 12
         |  GROUP BY 1, 2),
         |pack AS (
         |  SELECT doc_id, 0 AS i, 0 AS cidx, 0 AS cstart,
         |    CAST(NULL AS INT) AS e_cidx, CAST(NULL AS INT) AS e_from,
         |    CAST(NULL AS INT) AS e_to,
         |    CAST(NULL AS INT) AS w_sent, CAST(NULL AS INT) AS w_cidx0,
         |    CAST(NULL AS INT) AS w_n
         |  FROM nsent
         |  UNION ALL
         |  SELECT p.doc_id, p.i + 1,
         |    CASE WHEN s.st > 60 THEN
         |      (CASE WHEN p.cstart <= p.i - 1 THEN p.cidx + 1
         |            ELSE p.cidx END) + CAST(ceil(s.st / 48.0) AS INT)
         |    WHEN p.cstart <= p.i - 1 AND s.sc - COALESCE(cb.cb, 0) > 60
         |      THEN p.cidx + 1
         |    ELSE p.cidx END AS cidx,
         |    CASE WHEN s.st > 60 THEN p.i + 1
         |    WHEN p.cstart <= p.i - 1 AND s.sc - COALESCE(cb.cb, 0) > 60
         |      THEN GREATEST(p.cstart, o.ostart)
         |    WHEN p.cstart > p.i THEN p.i
         |    ELSE p.cstart END AS cstart,
         |    CASE WHEN (s.st > 60 OR s.sc - COALESCE(cb.cb, 0) > 60)
         |          AND p.cstart <= p.i - 1 THEN p.cidx END AS e_cidx,
         |    CASE WHEN (s.st > 60 OR s.sc - COALESCE(cb.cb, 0) > 60)
         |          AND p.cstart <= p.i - 1 THEN p.cstart END AS e_from,
         |    CASE WHEN (s.st > 60 OR s.sc - COALESCE(cb.cb, 0) > 60)
         |          AND p.cstart <= p.i - 1 THEN p.i - 1 END AS e_to,
         |    CASE WHEN s.st > 60 THEN p.i END AS w_sent,
         |    CASE WHEN s.st > 60 THEN
         |      (CASE WHEN p.cstart <= p.i - 1 THEN p.cidx + 1
         |            ELSE p.cidx END) END AS w_cidx0,
         |    CASE WHEN s.st > 60 THEN CAST(ceil(s.st / 48.0) AS INT)
         |      END AS w_n
         |  FROM pack p
         |  JOIN scnt s ON s.doc_id = p.doc_id AND s.sidx = p.i
         |  JOIN ovl o ON o.doc_id = p.doc_id AND o.sidx = p.i
         |  LEFT JOIN (SELECT doc_id, sidx, sc - st AS cb FROM scnt) cb
         |    ON cb.doc_id = p.doc_id AND cb.sidx = p.cstart
         |),
         |fin AS (
         |  SELECT p.doc_id, p.cidx, p.cstart, n.n
         |  FROM pack p JOIN nsent n ON n.doc_id = p.doc_id
         |  WHERE p.i = n.n AND p.cstart <= n.n - 1),
         |chunks0 AS (
         |  SELECT doc_id, e_cidx AS cidx, e_from AS f, e_to AS t
         |  FROM pack WHERE e_cidx IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, cidx, cstart, n - 1 FROM fin),
         |schunks AS (
         |  SELECT c.doc_id, c.cidx, CAST(sum(s.st) AS INT) AS token_count,
         |    string_agg(s.s, ' ' ORDER BY s.sidx) AS chunk_text
         |  FROM chunks0 c JOIN scnt s
         |    ON s.doc_id = c.doc_id AND s.sidx BETWEEN c.f AND c.t
         |  GROUP BY 1, 2),
         |wchunks AS (
         |  SELECT p.doc_id, p.w_cidx0 + u.k AS cidx,
         |    CAST(len(list_slice(s.toks, u.k * 48 + 1, u.k * 48 + 60))
         |      AS INT) AS token_count,
         |    array_to_string(
         |      list_slice(s.toks, u.k * 48 + 1, u.k * 48 + 60), ' ')
         |      AS chunk_text
         |  FROM pack p
         |  JOIN scnt s ON s.doc_id = p.doc_id AND s.sidx = p.w_sent,
         |  LATERAL (SELECT unnest(range(0, p.w_n)) AS k) u
         |  WHERE p.w_sent IS NOT NULL)
         |SELECT doc_id, CAST(cidx AS INT) AS chunk_index, token_count,
         |  chunk_text
         |FROM (SELECT * FROM schunks UNION ALL SELECT * FROM wchunks)"""
        .stripMargin,
    "q_neighbors" ->
      s"""WITH $fixedChunkCte
         |SELECT chunk_id, doc_id, chunk_index,
         |  substr(lag(chunk_text) OVER win, 1, 200) AS prev_preview,
         |  substr(lead(chunk_text) OVER win, 1, 200) AS next_preview
         |FROM fc
         |WINDOW win AS (PARTITION BY doc_id ORDER BY chunk_index ASC)""".stripMargin,
    "q_doc_context" ->
      s"""WITH $fixedChunkCte,
         |m AS ($mentionsSql),
         |agg AS (
         |  SELECT doc_id, name, sum(mention_count) AS tm
         |  FROM m GROUP BY 1, 2),
         |rk AS (
         |  SELECT doc_id, name, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tm DESC, name ASC) AS rn
         |  FROM agg),
         |top AS (
         |  SELECT doc_id, string_agg(name, ',' ORDER BY rn) AS top_entities
         |  FROM rk WHERE rn <= 10 GROUP BY doc_id),
         |cc AS (SELECT doc_id, count(*) AS n_chunks FROM fc GROUP BY doc_id)
         |SELECT cc.doc_id, cc.n_chunks, top.top_entities
         |FROM cc LEFT JOIN top ON cc.doc_id = top.doc_id""".stripMargin,
    "q_jsonl_docs" ->
      s"""SELECT sha256(stock_code || '|' || CAST(year AS VARCHAR) || '|'
         |    || quarter) AS doc_id,
         |  company_name || ' (' || stock_code || ') - ' || quarter || ' '
         |    || CAST(year AS VARCHAR) || ' Earnings Call' AS title,
         |  last_day(make_date(year,
         |    CAST(regexp_extract(quarter, '\\d', 0) AS INT) * 3, 1))
         |    AS created_at,
         |  company_name, year, quarter
         |FROM $jsonlReadSql
         |WHERE sector = 'Technology'""".stripMargin,
    "q_jsonl_stats" ->
      // company_name IS NOT NULL: DuckDB's ignore_errors surfaces corrupt
      // lines as all-NULL rows rather than skipping them — the engine side
      // splits them into _corrupt_record instead (the reference's skip
      // accounting), so the oracle must drop the NULL rows to compare the
      // good-record set
      s"""SELECT sector, year, quarter, count(*) AS n_docs,
         |  count(DISTINCT stock_code) AS n_companies,
         |  CAST(sum(len(string_split_regex(trim(transcript), '\\s+')))
         |    AS BIGINT) AS total_tokens
         |FROM $jsonlReadSql
         |WHERE company_name IS NOT NULL
         |GROUP BY 1, 2, 3""".stripMargin,
    "q_dedup_exact" ->
      """WITH aug AS (
        |  SELECT doc_id, CASE WHEN doc_id % 101 = 0
        |    THEN 'identical seeded body' ELSE text END AS text
        |  FROM documents)
        |SELECT md5(text) AS content_md5, count(*) AS dup_count,
        |  min(doc_id) AS canonical_doc_id
        |FROM aug GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q_dedup_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(t) - 4, 0) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS s
        |  FROM toks),
        |sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, n, unnest(s) AS shingle FROM sized),
        |capped AS (
        |  SELECT * FROM inv WHERE shingle IN (
        |    SELECT shingle FROM inv GROUP BY 1 HAVING count(*) <= 1000)),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter,
        |    any_value(a.n) AS n1, any_value(b.n) AS n2
        |  FROM capped a JOIN capped b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, inter,
        |  round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 6) AS jaccard
        |FROM pairs
        |WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= 0.8""".stripMargin,
    "q_dedup_minhash" -> exactJaccardSql(0.7),
    "q_dedup_simhash" -> exactJaccardSql(0.9),
    "q_dedup_cluster" -> dedupClusterSql(0.7),
    "q_dedup_keep_best" -> dedupKeepBestSql(0.7),
    "q_curate_pipeline" -> curatePipelineSql,
    "q_decontam" ->
      // 4-gram shingle CTEs (the Jaccard CTEs are 5-gram); eval = doc_id % 97
      s"""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
        |    x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(t) - 3, 0) + 1),
        |    i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS s
        |  FROM toks),
        |ev AS (
        |  SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 97 = 0),
        |tr AS (
        |  SELECT doc_id, len(s) AS sh_size, unnest(s) AS shingle
        |  FROM sh WHERE doc_id % 97 <> 0),
        |j AS (
        |  SELECT doc_id, sh_size, count(*) AS n_overlap
        |  FROM tr JOIN ev USING (shingle) GROUP BY 1, 2)
        |SELECT doc_id, CAST(n_overlap AS BIGINT) AS n_overlap,
        |  round(CAST(n_overlap AS DOUBLE) / sh_size, 6) AS overlap_frac
        |FROM j""".stripMargin,
    "q_pack" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> x <> '')) AS BIGINT) AS n_tokens,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 8 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (
        |      PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM p)
        |SELECT doc_id, shard, n_tokens, cum_before,
        |  cum_before // 256 AS seq_id, cum_before % 256 AS tok_offset
        |FROM c""".stripMargin,
    "q_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 10000 AS b
        |  FROM documents)
        |WHERE b < CASE WHEN lang = 'en' THEN 5000
        |               WHEN lang = 'de' THEN 2500
        |               ELSE 1000 END""".stripMargin,
    "q_source_mix" ->
      // keep fraction = min(1, w_s * N / n_s), identical op order and an
      // explicit floor (Spark casts truncate, DuckDB casts round)
      """WITH counts AS (
        |  SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_src) AS DOUBLE) AS n_total FROM counts),
        |j AS (
        |  SELECT d.doc_id, d.source, c.n_src,
        |    least(1.0,
        |      CASE d.source WHEN 'src0' THEN 0.04
        |                    WHEN 'src1' THEN 0.02
        |                    ELSE 0.01 END
        |      * t.n_total / CAST(c.n_src AS DOUBLE)) AS frac
        |  FROM documents d
        |  JOIN counts c USING (source) CROSS JOIN tot t)
        |SELECT doc_id, source, n_src, round(frac, 6) AS keep_frac
        |FROM j
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 10000
        |      < CAST(floor(frac * 10000) AS BIGINT)""".stripMargin,
    "q_line_dedup" ->
      // same derived 8-token-line view as q_repetition; a line is SHARED
      // when >= 2 distinct docs contain it; kept_md5 digests the
      // order-preserved surviving lines (md5('') when all were shared)
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |nl AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |    range(0, greatest(CAST(ceil(len(tk) / 8.0) AS INT), 1)),
        |    k -> array_to_string(list_slice(tk, k*8 + 1, k*8 + 8), ' ')),
        |    chr(10)) AS text
        |  FROM t),
        |lf AS (
        |  SELECT doc_id, list_filter(string_split(text, chr(10)),
        |    x -> x <> '') AS ls
        |  FROM nl),
        |lines AS (
        |  SELECT doc_id, r.pos AS pos, r.line AS line FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
        |      i -> {'pos': i, 'line': ls[i]})) AS r
        |    FROM lf)),
        |ldf AS (SELECT line, count(DISTINCT doc_id) AS df
        |        FROM lines GROUP BY 1),
        |fl AS (SELECT l.doc_id, l.pos, l.line, (d.df >= 2) AS shared
        |       FROM lines l JOIN ldf d USING (line))
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN shared THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared_lines,
        |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE NOT shared), '')) AS kept_md5
        |FROM fl GROUP BY 1""".stripMargin,
    "q_kmeans" -> kmeansSql(k = 8, iters = 2, dim = 64),
    "q_emb_quant" ->
      """WITH b AS (
        |  SELECT vec_id, len(embedding) AS n_dims,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, n_dims, emb,
        |    list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
        |  FROM b),
        |q AS (
        |  SELECT vec_id, n_dims, emb, scale,
        |    CASE WHEN scale > 0
        |      THEN list_transform(emb, x -> CAST(round(x / scale, 0) AS BIGINT))
        |      ELSE list_transform(emb, x -> CAST(0 AS BIGINT)) END AS qv
        |  FROM m)
        |SELECT vec_id, CAST(n_dims AS INT) AS n_dims,
        |  round(scale, 8) AS scale,
        |  md5(array_to_string(qv, ',')) AS q_md5,
        |  round(CASE WHEN scale > 0
        |    THEN list_max(list_transform(range(1, n_dims + 1),
        |      i -> abs(emb[i] - qv[i] * scale)))
        |    ELSE 0.0 END, 6) AS linf_err
        |FROM q""".stripMargin,
    "q_graph_degree" ->
      s"""WITH e AS (
         |  SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
         |  FROM read_parquet('$VerifyOutPlaceholder/_oracle_kg_edges/*.parquet')
         |  WHERE subj <> obj),
         |d AS (
         |  SELECT node, count(*) AS degree
         |  FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
         |  GROUP BY 1)
         |SELECT degree, count(*) AS n_nodes FROM d GROUP BY 1""".stripMargin,
    "q_graph_triangles" ->
      // independent recount with the naive a<b<c 3-way self-join — fine at
      // oracle scale, and algorithmically disjoint from the engine's
      // degree-ordered wedge counting
      s"""WITH e AS (
         |  SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
         |  FROM read_parquet('$VerifyOutPlaceholder/_oracle_kg_edges/*.parquet')
         |  WHERE subj <> obj),
         |tri AS (
         |  SELECT count(*) AS n_triangles
         |  FROM e e1 JOIN e e2 ON e2.a = e1.b
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |n AS (SELECT count(DISTINCT node) AS n_nodes FROM
         |  (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)),
         |m AS (SELECT count(*) AS n_edges FROM e)
         |SELECT n_nodes, n_edges, n_triangles FROM n, m, tri""".stripMargin,
    "q_communities" -> lpaSql(rounds = 2),
    "q_logreg_langid" -> logregSql(dim = 64, epochs = 2, lr = "1.0"),
    "q_dup_ngrams" ->
      // n=8 windows; the oracle keys the df table on the raw window TEXT
      // (the engine uses xxhash64) — identical modulo a 64-bit collision
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, r.pos AS pos, r.win AS win FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      range(0, greatest(len(tk) - 7, 0)),
        |      k -> {'pos': k,
        |            'win': array_to_string(list_slice(tk, k + 1, k + 8), ' ')}))
        |      AS r
        |    FROM t)),
        |wdf AS (SELECT win, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |dup AS (SELECT w.doc_id, w.pos FROM w JOIN wdf USING (win)
        |        WHERE df >= 2),
        |cov AS (SELECT doc_id, count(*) AS n_cov FROM (
        |    SELECT DISTINCT doc_id, idx FROM (
        |      SELECT doc_id, unnest(range(pos, pos + 8)) AS idx FROM dup))
        |  GROUP BY 1),
        |nw AS (SELECT doc_id, count(*) AS n_windows FROM w GROUP BY 1),
        |nd AS (SELECT doc_id, count(*) AS n_dup_windows FROM dup GROUP BY 1),
        |base AS (SELECT doc_id, len(tk) AS n_tokens FROM t)
        |SELECT b.doc_id, b.n_tokens,
        |  coalesce(n.n_windows, 0) AS n_windows,
        |  coalesce(d.n_dup_windows, 0) AS n_dup_windows,
        |  CASE WHEN b.n_tokens = 0 THEN 0.0
        |       ELSE round(CAST(coalesce(c.n_cov, 0) AS DOUBLE) / b.n_tokens, 6)
        |  END AS dup_token_frac
        |FROM base b LEFT JOIN nw n USING (doc_id)
        |LEFT JOIN nd d USING (doc_id) LEFT JOIN cov c USING (doc_id)""".stripMargin,
    "q_fingerprint_rolling" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, CAST(ceil(len(t) / 8.0) AS INT) AS n_windows,
        |    list_transform(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT)),
        |      k -> md5(array_to_string(list_slice(t, k * 8 + 1, k * 8 + 8), ' '))) AS h
        |  FROM p)
        |SELECT doc_id, n_windows,
        |  CASE WHEN n_windows > 0 THEN list_aggregate(h, 'min') END AS win_md5_min,
        |  CASE WHEN n_windows > 0 THEN list_aggregate(h, 'max') END AS win_md5_max
        |FROM w""".stripMargin,
    "q_emb_neardup" ->
      """WITH base AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |pert AS (
        |  SELECT vec_id + 100000 AS vec_id, label,
        |    list_transform(emb, x -> x * 1.01) AS emb
        |  FROM base WHERE vec_id < 20),
        |a AS (SELECT * FROM base UNION ALL SELECT * FROM pert)
        |SELECT x.vec_id AS id1, y.vec_id AS id2,
        |  round(CAST(list_cosine_similarity(x.emb, y.emb) AS DOUBLE), 4) AS cosine
        |FROM a x JOIN a y ON x.label = y.label AND x.vec_id < y.vec_id
        |WHERE round(CAST(list_cosine_similarity(x.emb, y.emb) AS DOUBLE), 4) >= 0.999""".stripMargin,
    "q_dedup_incremental" ->
      s"""WITH $exactJaccardCtes
         |SELECT id1, id2,
         |  round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 6) AS jaccard
         |FROM pairs
         |WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= 0.7
         |  AND (id1 % 89 = 0 OR id2 % 89 = 0)""".stripMargin,
    "q_len_stats" ->
      """SELECT lang AS stratum, count(*) AS n_docs,
        |  round(avg(n), 4) AS mean_tokens,
        |  round(quantile_cont(n, 0.5), 4) AS p50,
        |  round(quantile_cont(n, 0.9), 4) AS p90,
        |  round(quantile_cont(n, 0.99), 4) AS p99
        |FROM (
        |  SELECT lang, CAST(len(list_filter(
        |    string_split_regex(text, '\s+'), x -> x <> '')) AS DOUBLE) AS n
        |  FROM documents)
        |GROUP BY 1""".stripMargin,
    "q_asof_join" ->
      """WITH v AS (
        |  SELECT user_id, ts, max(event_id) AS view_event_id,
        |    arg_max(value, event_id) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id,
        |  coalesce(v.view_event_id, -1) AS view_event_id,
        |  coalesce(v.view_value, 0.0) AS view_value
        |FROM c ASOF LEFT JOIN v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin,
    "q_semdedup" -> semDedupSql(k = 8, iters = 2, dim = 64,
      threshold = 0.999),
    "q_dsir" -> dsirSql(dim = 256),
    "q_dsir_sample" ->
      s"""WITH w AS (${dsirSql(dim = 256)})
         |SELECT doc_id, n_bigrams, logw,
         |  round(logw - ln(-ln(
         |    (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'g'),
         |      1, 8)) AS BIGINT) % 10000 + 0.5) / 10000.0)), 6) AS key
         |FROM w
         |ORDER BY key DESC, doc_id ASC
         |LIMIT 50""".stripMargin,
    "q_ann_lsh" -> // brute-force exact top-k over the near-neighbor-seeded
      // corpus: green row == LSH probe recall 1.0 on true neighbors
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |pert AS (
        |  SELECT CAST(200000 + i AS BIGINT) AS vec_id,
        |    list_transform(emb, x -> x * (1.0 + i * 0.01)) AS emb
        |  FROM base, range(1, 13) t(i) WHERE vec_id = 0),
        |a AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        |q AS (SELECT emb AS qe FROM base WHERE vec_id = 0)
        |SELECT a.vec_id,
        |  round(CAST(list_cosine_similarity(a.emb, q.qe) AS DOUBLE), 4) AS score
        |FROM a, q WHERE a.vec_id <> 0
        |ORDER BY score DESC, a.vec_id ASC
        |LIMIT 10""".stripMargin,
    "q_ann_ivf" -> // exact top-k over the IVF-seeded corpus: green row ==
      // IVF cell-probe recall 1.0 on the true neighbors
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |pert AS (
        |  SELECT CAST(300000 + i AS BIGINT) AS vec_id,
        |    list_transform(emb, x -> x * (1.0 + i * 0.01)) AS emb
        |  FROM base, range(1, 13) t(i) WHERE vec_id = 0),
        |a AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        |q AS (SELECT emb AS qe FROM base WHERE vec_id = 0)
        |SELECT a.vec_id,
        |  round(CAST(list_cosine_similarity(a.emb, q.qe) AS DOUBLE), 4) AS score
        |FROM a, q WHERE a.vec_id <> 0
        |ORDER BY score DESC, a.vec_id ASC
        |LIMIT 10""".stripMargin,
    "q_ann_brute" -> annBruteSql,
    "q_sql_cosine" -> // identical contract to q_emb_neardup — the engine
      // side goes through the SQL-registered native cosine_sim()
      """WITH base AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |pert AS (
        |  SELECT vec_id + 100000 AS vec_id, label,
        |    list_transform(emb, x -> x * 1.01) AS emb
        |  FROM base WHERE vec_id < 20),
        |a AS (SELECT * FROM base UNION ALL SELECT * FROM pert)
        |SELECT x.vec_id AS id1, y.vec_id AS id2,
        |  round(CAST(list_cosine_similarity(x.emb, y.emb) AS DOUBLE), 4) AS cosine
        |FROM a x JOIN a y ON x.label = y.label AND x.vec_id < y.vec_id
        |WHERE round(CAST(list_cosine_similarity(x.emb, y.emb) AS DOUBLE), 4) >= 0.999""".stripMargin,
    "q_lang_id" -> langIdSql,
    "q_quality" ->
      """WITH p AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents)
        |SELECT doc_id, length(text) AS n_chars, len(t) AS n_tokens,
        |  round(CAST(length(text) AS DOUBLE) / greatest(len(t), 1), 6)
        |    AS avg_token_len,
        |  round(CAST(length(text) - length(regexp_replace(text,
        |      '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) /
        |    greatest(length(text), 1), 6) AS punct_ratio,
        |  round(CAST(len(list_filter(t,
        |      x -> lower(x) IN ('the','a','and','of','to','in','is'))) AS DOUBLE) /
        |    greatest(len(t), 1), 6) AS stopword_ratio,
        |  round(CAST(len(list_distinct(t)) AS DOUBLE) /
        |    greatest(len(t), 1), 6) AS type_token_ratio
        |FROM p""".stripMargin,
    "q_token_count" ->
      ("""WITH p AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents)
        |SELECT doc_id, len(t) AS n_tokens,
        |  len(list_distinct(t)) AS n_distinct_tokens,
        |  len(regexp_extract_all(text, '""".stripMargin +
        graft.ops.TextAnalysis.BpeishPattern.replace("'", "''") +
        """')) AS n_subwords
        |FROM p""".stripMargin),
    "q_tfidf_top" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    round(tf * ln((n + 1.0) / (df + 1.0)), 4) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS term_rank
        |  FROM scored)
        |SELECT doc_id, term, tf, df, score, term_rank
        |FROM r WHERE term_rank <= 5""".stripMargin,
    "q_bm25" ->
      // same float-op ordering as the Spark expression (left-assoc, ln of
      // int-derived operands, rank on the 4dp-rounded score)
      """WITH toks AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, len(t) AS dl,
        |    len(list_filter(t, x -> x = 'vector')) AS tf_0,
        |    len(list_filter(t, x -> x = 'merge')) AS tf_1,
        |    len(list_filter(t, x -> x = 'scan')) AS tf_2
        |  FROM toks),
        |st AS (
        |  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
        |    sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
        |    sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
        |    sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
        |  FROM tf),
        |sc AS (
        |  SELECT doc_id, CAST(dl AS BIGINT) AS n_tokens,
        |    round(
        |      ln(1.0 + (n_docs - df_0 + 0.5) / (df_0 + 0.5)) * tf_0 * 2.2
        |        / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n_docs - df_1 + 0.5) / (df_1 + 0.5)) * tf_1 * 2.2
        |        / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n_docs - df_2 + 0.5) / (df_2 + 0.5)) * tf_2 * 2.2
        |        / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 4) AS score
        |  FROM tf CROSS JOIN st)
        |SELECT doc_id, n_tokens, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
        |    AS BIGINT) AS rank
        |FROM sc WHERE score > 0
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "q_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |bgf AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(
        |      range(1, greatest(len(t) - 1, 0) + 1),
        |      i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
        |    FROM toks)),
        |cb AS (SELECT w1, w2, count(*) AS cnt FROM bgf GROUP BY 1, 2),
        |cw AS (SELECT w1, sum(cnt) AS ctx FROM cb GROUP BY 1),
        |v AS (
        |  SELECT count(DISTINCT x) AS vocab
        |  FROM (SELECT unnest(t) AS x FROM toks)),
        |scored AS (
        |  SELECT doc_id,
        |    round(-ln((cnt + 1.0) / (ctx + vocab)), 6) AS nll
        |  FROM bgf JOIN cb USING (w1, w2) JOIN cw USING (w1) CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(nll), 4) AS avg_nll
        |FROM scored GROUP BY 1""".stripMargin,
    "q_repetition" ->
      ("""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |nl AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |    range(0, greatest(CAST(ceil(len(tk) / 8.0) AS INT), 1)),
        |    k -> array_to_string(list_slice(tk, k*8 + 1, k*8 + 8), ' ')),
        |    chr(10)) AS text
        |  FROM t),
        |lines AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split(text, chr(10)), x -> x <> '')) AS line
        |  FROM nl),
        |lc AS (SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY 1, 2),
        |la AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_lines,
        |  round(coalesce(CAST(sum(CASE WHEN cnt > 1 THEN cnt END) AS DOUBLE)
        |    / sum(cnt), 0), 6) AS dup_line_frac,
        |  round(coalesce(
        |    CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(line) END) AS DOUBLE)
        |    / greatest(sum(cnt * length(line)), 1), 0), 6)
        |    AS dup_line_char_frac
        |  FROM lc GROUP BY 1),
        |bt AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
        |  FROM nl),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk), 1)),
        |    k -> tk[k] || ' ' || tk[k+1])) AS bigram
        |  FROM bt),
        |bc AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |ba AS (SELECT doc_id,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_bigram_frac
        |  FROM bc GROUP BY 1)
        |SELECT la.doc_id, n_lines, dup_line_frac, dup_line_char_frac,
        |  coalesce(top_bigram_frac, 0.0) AS top_bigram_frac
        |FROM la LEFT JOIN ba ON la.doc_id = ba.doc_id""").stripMargin,
    "q_pii_scrub" -> {
      val (e, i, p) = (graft.ops.TextAnalysis.EmailRe,
        graft.ops.TextAnalysis.Ipv4Re, graft.ops.TextAnalysis.PhoneRe)
      s"""WITH aug AS (
        |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com' ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@corp.io'
        |      ELSE '' END ||
        |    ' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
        |    CAST(doc_id % 100 AS VARCHAR) || ' call +1 555 01' ||
        |    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '$e')) AS n_emails,
        |  len(regexp_extract_all(text, '$i')) AS n_ipv4,
        |  len(regexp_extract_all(text, '$p')) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '$e', '<EMAIL>', 'g'), '$i', '<IP>', 'g'), '$p', '<PHONE>', 'g'))
        |    AS redacted_md5
        |FROM aug""".stripMargin
    },
    "q_split" ->
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 100 AS bucket
        |  FROM documents)""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_md5 FROM documents""".stripMargin,
    "q_entropy" ->
      // integer micro-nats with NO floating point: the recursive CTEs
      // below are DuckDB's transcription of the exact integer fixed-point
      // log spec in TextAnalysis.lnQ30 (normalize to [2^30,2^31) counting
      // the exponent, 30 shift-and-square steps for the fraction, one
      // HUGEINT multiply by round(ln2*2^30)), then the identical per-term
      // integer rounding — bit-equal to Spark by construction, no libm
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY 1),
        |ks AS (
        |  -- DISTINCT over UNION ALL, not plain UNION: under WITH RECURSIVE
        |  -- DuckDB (1.0.0) treats a CTE whose top level is a UNION as
        |  -- recursive anchor/step and does NOT dedup across the branches,
        |  -- so a k present as both a term count and a doc length came out
        |  -- twice and the logtab join double-counted those terms
        |  SELECT DISTINCT k FROM (
        |    SELECT CAST(c AS BIGINT) AS k FROM tf
        |    UNION ALL SELECT n AS k FROM n)),
        |norm AS (
        |  SELECT k, k * 1073741824 AS m, 0 AS e FROM ks
        |  UNION ALL
        |  SELECT k, m // 2, e + 1 FROM norm WHERE m >= 2147483648),
        |normed AS (SELECT k, m, e FROM norm WHERE m < 2147483648),
        |sq AS (
        |  SELECT k, m, e, 0 AS j, CAST(0 AS BIGINT) AS f FROM normed
        |  UNION ALL
        |  SELECT k,
        |    CASE WHEN (m * m) // 1073741824 >= 2147483648
        |         THEN ((m * m) // 1073741824) // 2
        |         ELSE (m * m) // 1073741824 END,
        |    e, j + 1,
        |    CASE WHEN (m * m) // 1073741824 >= 2147483648
        |         THEN f * 2 + 1 ELSE f * 2 END
        |  FROM sq WHERE j < 30),
        |logtab AS (
        |  SELECT k, CAST((CAST(e AS HUGEINT) * 1073741824 + f) * 744261118
        |    // 1073741824 AS BIGINT) AS lnq30
        |  FROM sq WHERE j = 30),
        |h AS (
        |  SELECT tf.doc_id, n.n,
        |    (2 * tf.c * (((ln_n.lnq30 - ln_c.lnq30) * 15625) // 16777216)
        |      + n.n) // (2 * n.n) AS h_unats
        |  FROM tf
        |  JOIN n USING (doc_id)
        |  JOIN logtab ln_c ON ln_c.k = tf.c
        |  JOIN logtab ln_n ON ln_n.k = n.n)
        |SELECT doc_id, any_value(n) AS n_tokens,
        |  CAST(sum(h_unats) AS BIGINT) AS entropy_unats
        |FROM h GROUP BY 1""".stripMargin,
    "q_normalize" ->
      // same augmentation expression as the Spark side; controls are
      // stripped BEFORE the \s+ collapse on both engines, so RE2-vs-Java
      // \s class differences (\x0b) never see a control char
      """WITH aug AS (
        |  SELECT doc_id,
        |    chr(9) || '  ' || regexp_replace(text, ' ', '   ', 'g')
        |      || ' ' || chr(13) || chr(10) AS text
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(
        |      regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
        |      '\s+', ' ', 'g')) AS norm_text
        |  FROM aug)
        |SELECT doc_id, norm_text,
        |  length(text) AS n_raw_chars,
        |  length(norm_text) AS n_norm_chars
        |FROM n""".stripMargin,
    "q_url_extract" ->
      """WITH aug AS (
        |  SELECT doc_id, concat(text,
        |    ' see https://Host', CAST(doc_id % 50 AS VARCHAR),
        |    '.example.org/p/', CAST(doc_id AS VARCHAR),
        |    CASE WHEN doc_id % 4 = 0
        |      THEN ' and http://cdn.example.net/x' ELSE '' END) AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text,
        |    'https?://[A-Za-z0-9.-]+')) AS url
        |  FROM aug)
        |SELECT lower(regexp_replace(url, '^https?://', '')) AS domain,
        |  count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
        |FROM u GROUP BY 1""".stripMargin,
    "q_entity_any" ->
      s"""WITH m AS ($mentionsSql),
         |w(wanted) AS (VALUES ('spark'), ('merge'), ('window'))
         |SELECT m.doc_id, count(DISTINCT w.wanted) AS matched,
         |  round(CAST(count(DISTINCT w.wanted) AS DOUBLE) / 3, 6) AS score
         |FROM m JOIN w ON lower(m.name) = w.wanted
         |GROUP BY 1
         |ORDER BY count(DISTINCT w.wanted) DESC, m.doc_id ASC
         |LIMIT 10""".stripMargin,
    "q_entity_all" ->
      s"""WITH m AS ($mentionsSql),
         |w(wanted) AS (VALUES ('spark'), ('merge'), ('window'))
         |SELECT m.doc_id, count(DISTINCT w.wanted) AS matched,
         |  1.0 AS score
         |FROM m JOIN w ON lower(m.name) = w.wanted
         |GROUP BY 1 HAVING count(DISTINCT w.wanted) = 3
         |ORDER BY m.doc_id ASC
         |LIMIT 10""".stripMargin,
    "q_entity_type" ->
      s"""WITH m AS ($mentionsSql)
         |SELECT doc_id, count(DISTINCT name) AS score
         |FROM m WHERE type = 'PRODUCT'
         |GROUP BY 1
         |ORDER BY count(DISTINCT name) DESC, doc_id ASC
         |LIMIT 10""".stripMargin,
    "q_related_2hop" ->
      s"""WITH m AS ($mentionsSql),
         |e0 AS (
         |  SELECT a.name AS n1, b.name AS n2
         |  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.name < b.name
         |  GROUP BY 1, 2 HAVING count(*) >= 10),
         |und AS (SELECT n1 AS src, n2 AS dst FROM e0
         |        UNION SELECT n2, n1 FROM e0),
         |h1 AS (SELECT DISTINCT dst AS entity FROM und WHERE src = 'spark'),
         |h2 AS (SELECT DISTINCT u.dst AS entity FROM und u
         |       JOIN h1 ON u.src = h1.entity
         |       WHERE u.dst <> 'spark'
         |         AND u.dst NOT IN (SELECT entity FROM h1))
         |SELECT entity, 1 AS distance FROM h1
         |UNION ALL SELECT entity, 2 FROM h2""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH m AS ($mentionsSql),
         |v AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS score
         |      FROM documents ORDER BY score DESC, doc_id ASC LIMIT 50),
         |vr AS (SELECT doc_id, row_number() OVER
         |         (ORDER BY score DESC, doc_id ASC) AS rnk FROM v),
         |g AS (SELECT doc_id, CAST(sum(mention_count) AS DOUBLE) AS score
         |      FROM m GROUP BY 1 ORDER BY score DESC, doc_id ASC LIMIT 50),
         |gr AS (SELECT doc_id, row_number() OVER
         |         (ORDER BY score DESC, doc_id ASC) AS rnk FROM g),
         |u AS (SELECT doc_id, 0.5 / (60 + rnk) AS contrib FROM vr
         |      UNION ALL SELECT doc_id, 0.5 / (60 + rnk) FROM gr)
         |SELECT doc_id, round(sum(contrib), 6) AS rrf_score
         |FROM u GROUP BY 1
         |ORDER BY sum(contrib) DESC, doc_id ASC LIMIT 20""".stripMargin,
    "q_doc_similarity" ->
      s"""WITH m AS ($mentionsSql),
         |target AS (SELECT DISTINCT name, type FROM m WHERE doc_id = 0)
         |SELECT m.doc_id,
         |  count(DISTINCT m.name || '|' || m.type) AS shared_entities
         |FROM m JOIN target t ON m.name = t.name AND m.type = t.type
         |WHERE m.doc_id <> 0
         |GROUP BY 1 HAVING count(DISTINCT m.name || '|' || m.type) >= 2""".stripMargin,
    "q_version_prune" ->
      """SELECT user_id, event_id, event_type
        |FROM (SELECT user_id, event_id, event_type, row_number() OVER
        |        (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn <= 3""".stripMargin)

  /** The COMPOSED curation pipeline as one driver row: a PII-augmented
    * corpus runs through the real CurateJob entry point (analyze →
    * token/lang gates → PII redaction → exact dedup → MinHash-LSH near-dup
    * → CC clusters → keep-best retention → hash split), and the row is the
    * final curated table. Each constituent op already has its own green
    * row; THIS row evidences the composition — stage ORDERING and the
    * hand-offs between stages. The PII augmentation makes ordering
    * observable: redaction runs before exact dedup, so docs differing only
    * in their doc_id-derived PII collapse to one representative — a stale
    * pre-redaction hash (or dedup-before-redact) would keep both and the
    * row would go red. The DuckDB oracle re-runs the entire composition
    * from scratch in one WITH-RECURSIVE chain (token gate, marker-argmax
    * language gate, regex redaction, md5 exact dedup, all-pairs 5-gram
    * Jaccard — blind to the engine's LSH — recursive transitive closure,
    * longest-doc retention, md5 split buckets).
    */
  /** Constant body for every doc_id % 101 == 0 in the curate row: these
    * docs differ pre-redaction ONLY in their doc_id-derived PII, so they
    * become exact duplicates precisely when redaction runs before exact
    * dedup (the corpus itself has no exact dups at the verify SF — this
    * seeds real work for that stage AND makes the ordering observable).
    * Marker-heavy English, 32 tokens, so the seeded docs survive both
    * gates.
    */
  private val CurateConstText =
    "the pipeline writes the table of rows and the scan reads the index " +
      "of chunks to the store in the merge of the stream and the batch " +
      "to the sink in order"

  private def curateRow(s: SparkSession, dir: String): DataFrame = {
    val aug = s.read.parquet(docsPath(dir)).withColumn("text",
      concat(
        when(col("doc_id") % 101 === 0, lit(CurateConstText))
          .otherwise(col("text")),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" cc admin"), col("doc_id").cast("string"),
            lit("@corp.io"))).otherwise(lit("")),
        lit(" at 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string"),
        lit(" call +1 555 01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0")))
    val base = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_curate_row_${math.abs(dir.hashCode)}")
    // fresh work dir per invocation: the row must evidence a full run of
    // the composed pipeline, not a resume of a previous query's snapshots
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (base.exists()) rm(base)
    val inPath = new java.io.File(base, "input").toString
    aug.write.mode("overwrite").parquet(inPath)
    val io = graft.jobs.CurateJob.run(s, graft.jobs.CurateJob.Args(
      work = new java.io.File(base, "work").toString,
      input = inPath, threshold = 0.7, minTokens = 30,
      langs = Some(Set("en")), redactPii = true,
      trainPct = 80, valPct = 10))
    io.read(s, "curated")
      .select(col("doc_id"), col("n_tokens"), col("lang_id"),
        col("content_md5"), col("split"))
  }

  private val annBruteSql: String =
    """WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
      |           FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  round(CAST(list_cosine_similarity(
      |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qe)
      |    AS DOUBLE), 4) AS score
      |FROM embeddings e, q WHERE e.vec_id <> 0
      |ORDER BY score DESC, e.vec_id ASC
      |LIMIT 10""".stripMargin

  /** Exact all-pairs 5-gram Jaccard >= threshold (NO df cap, no blocking) —
    * the ground truth the LSH-then-verify dedup variants must reproduce.
    */
  /** Shared CTE chain computing exact all-pairs 5-gram Jaccard from scratch
    * (no blocking — the oracle must be blind to the engine's LSH).
    */
  private val exactJaccardCtes: String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |    x -> x <> '') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(t) - 4, 0) + 1),
       |    i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS s
       |  FROM toks),
       |sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
       |inv AS (SELECT doc_id, n, unnest(s) AS shingle FROM sized),
       |pairs AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter,
       |    any_value(a.n) AS n1, any_value(b.n) AS n2
       |  FROM inv a JOIN inv b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  private def exactJaccardSql(threshold: Double): String =
    s"""WITH $exactJaccardCtes
       |SELECT id1, id2,
       |  round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 6) AS jaccard
       |FROM pairs
       |WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= $threshold""".stripMargin

  /** Transitive closure over the exact near-dup pairs (recursive CTE; the
    * clusters are tiny, so full reachability enumeration is cheap for the
    * oracle) → per-doc canonical = min id in the component. Shared by the
    * cluster-assignment and keep-best-representative oracles.
    */
  private def dedupClusterCtes(threshold: Double): String =
    s"""$exactJaccardCtes,
       |np AS (
       |  SELECT id1, id2 FROM pairs
       |  WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= $threshold),
       |und AS (SELECT id1 AS a, id2 AS b FROM np
       |        UNION SELECT id2, id1 FROM np),
       |reach(id, r) AS (
       |  SELECT a, b FROM und
       |  UNION
       |  SELECT u.a, re.r FROM und u JOIN reach re ON u.b = re.id),
       |cl AS (
       |  SELECT id AS doc_id, least(id, min(r)) AS canonical_doc_id
       |  FROM reach GROUP BY id)""".stripMargin

  private def dedupClusterSql(threshold: Double): String =
    s"""WITH RECURSIVE ${dedupClusterCtes(threshold)}
       |SELECT doc_id, canonical_doc_id FROM cl""".stripMargin

  /** Keep-one-representative oracle: per cluster, argmax char length with
    * min-doc_id tie-break, plus the cluster size.
    */
  private def dedupKeepBestSql(threshold: Double): String =
    s"""WITH RECURSIVE ${dedupClusterCtes(threshold)},
       |sc AS (
       |  SELECT cl.doc_id, cl.canonical_doc_id AS cluster_id,
       |    length(d.text) AS score
       |  FROM cl JOIN documents d ON cl.doc_id = d.doc_id),
       |rk AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY score DESC, doc_id ASC) AS rn,
       |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |  FROM sc)
       |SELECT cluster_id, doc_id AS kept_doc_id, score AS kept_score,
       |  cluster_size
       |FROM rk WHERE rn = 1""".stripMargin

  /** Unrolled Lloyd k-means in pure SQL — the independent recomputation of
    * Clustering.kmeans's contract: seed = k smallest vec_ids (components
    * rounded 6dp), assignment = argmin squared distance with cluster-id
    * tie-break, update = per-dimension mean rounded 6dp (empty cluster
    * keeps its centroid), output = final assignment with d2 rounded 4dp.
    * The 6dp centroid rounding after every update pins both engines to
    * identical centroids, so cross-engine ulp drift cannot compound.
    */
  private def kmeansSql(k: Int, iters: Int, dim: Int): String = {
    val defaultBase =
      """base AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings)""".stripMargin
    s"""WITH ${kmeansCtes(k, iters, dim, defaultBase)}
       |SELECT vec_id, CAST(cid AS INT) AS cluster, round(d2, 4) AS d2
       |FROM a$iters""".stripMargin
  }

  /** The unrolled-Lloyd CTE chain shared by kmeansSql and semDedupSql:
    * `baseCte` must define `base(vec_id, emb)`; the chain ends at
    * `a{iters}(vec_id, emb, cid, d2)` — the final assignment.
    */
  private def kmeansCtes(k: Int, iters: Int, dim: Int,
      baseCte: String): String = {
    def assignCte(n: Int): String =
      s"""a$n AS (
         |  SELECT vec_id, emb, cid, d2 FROM (
         |    SELECT vec_id, emb, cid, d2,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY d2 ASC, cid ASC) AS rn
         |    FROM (
         |      SELECT b.vec_id AS vec_id, b.emb AS emb, c.cid AS cid,
         |        list_sum(list_transform(range(1, ${dim + 1}),
         |          i -> (b.emb[i] - c.c[i]) * (b.emb[i] - c.c[i]))) AS d2
         |      FROM base b CROSS JOIN c$n c))
         |  WHERE rn = 1)""".stripMargin
    def updateCte(n: Int): String =
      s"""u$n AS (
         |  SELECT cid, i, round(avg(emb[i]), 6) AS m
         |  FROM a$n, range(1, ${dim + 1}) t(i)
         |  GROUP BY 1, 2),
         |c${n + 1} AS (
         |  SELECT p.cid, coalesce(g.c, p.c) AS c
         |  FROM c$n p LEFT JOIN (
         |    SELECT cid, list(m ORDER BY i) AS c FROM u$n GROUP BY cid) g
         |  USING (cid))""".stripMargin
    val rounds = (0 until iters)
      .map(n => s"${assignCte(n)},\n${updateCte(n)}")
      .mkString(",\n")
    s"""$baseCte,
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
       |    list_transform(emb, x -> round(x, 6)) AS c
       |  FROM (SELECT vec_id, emb FROM base ORDER BY vec_id LIMIT $k)),
       |$rounds,
       |${assignCte(iters)}""".stripMargin
  }

  /** SemDeDup re-run from scratch: the same augmented base (scaled copies
    * of vec_id < 20) as the engine query, the unrolled-Lloyd chain, then
    * an in-cluster all-pairs cosine with the keep-farthest-from-centroid
    * retention — Clustering.semDedup's exact contract (d2 rounded 4dp
    * before comparison, cosine rounded 6dp before the threshold).
    */
  private def semDedupSql(k: Int, iters: Int, dim: Int,
      threshold: Double): String = {
    val augBase =
      """raw AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |base AS (
        |  SELECT vec_id, emb FROM raw
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |    list_transform(emb, x -> x * 1.01) AS emb
        |  FROM raw WHERE vec_id < 20)""".stripMargin
    s"""WITH ${kmeansCtes(k, iters, dim, augBase)},
       |f AS (
       |  SELECT vec_id, emb, cid, round(d2, 4) AS rd2 FROM a$iters),
       |p AS (
       |  SELECT id1, r1, id2, r2 FROM (
       |    SELECT x.vec_id AS id1, x.rd2 AS r1,
       |      y.vec_id AS id2, y.rd2 AS r2,
       |      list_sum(list_transform(range(1, ${dim + 1}),
       |        i -> x.emb[i] * y.emb[i])) AS dot,
       |      list_sum(list_transform(range(1, ${dim + 1}),
       |        i -> x.emb[i] * x.emb[i])) AS nx,
       |      list_sum(list_transform(range(1, ${dim + 1}),
       |        i -> y.emb[i] * y.emb[i])) AS ny
       |    FROM f x JOIN f y ON x.cid = y.cid AND x.vec_id <> y.vec_id)
       |  WHERE round(CASE WHEN nx = 0 OR ny = 0 THEN 0.0
       |    ELSE dot / (sqrt(nx) * sqrt(ny)) END, 6) >= $threshold),
       |s AS (
       |  SELECT id1 AS vec_id, count(*) AS n_dups,
       |    max(CASE WHEN r2 > r1 OR (r2 = r1 AND id2 < id1)
       |      THEN 1 ELSE 0 END) AS dom
       |  FROM p GROUP BY 1)
       |SELECT f.vec_id, CAST(f.cid AS INT) AS cluster,
       |  CAST(coalesce(s.n_dups, 0) AS BIGINT) AS n_dups,
       |  coalesce(s.dom, 0) = 0 AS kept
       |FROM f LEFT JOIN s USING (vec_id)""".stripMargin
  }

  /** DSIR re-run from scratch: lowercased word bigrams, the shared
    * md5-prefix bucket hash, add-one-smoothed bucket LMs for the target
    * (doc_id % 97 == 0) and raw splits, λ rounded 6dp, per-doc weight
    * rounded 4dp — Dsir.importanceWeights' exact contract.
    */
  private def dsirSql(dim: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text),
       |    '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN list_transform(
       |      range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
       |    ELSE [] END) AS bg
       |  FROM toks),
       |f AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5(bg), 1, 8)) AS BIGINT) % $dim AS b,
       |    count(*) AS cnt
       |  FROM bg GROUP BY 1, 2),
       |rawf AS (SELECT * FROM f WHERE doc_id % 97 <> 0),
       |tgtf AS (SELECT * FROM f WHERE doc_id % 97 = 0),
       |rb AS (SELECT b, sum(cnt) AS cq FROM rawf GROUP BY 1),
       |tb AS (SELECT b, sum(cnt) AS ct FROM tgtf GROUP BY 1),
       |nq AS (SELECT sum(cq) AS nq FROM rb),
       |nt AS (SELECT coalesce(sum(ct), 0) AS nt FROM tb),
       |lam AS (
       |  SELECT rb.b, CAST(round((ln((coalesce(tb.ct, 0) + 1.0) /
       |      (nt.nt + $dim)) - ln((rb.cq + 1.0) / (nq.nq + $dim))) *
       |      1000000.0, 0) AS BIGINT) AS lam6
       |  FROM rb LEFT JOIN tb USING (b) CROSS JOIN nt CROSS JOIN nq),
       |sc AS (
       |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       |    round(sum(cnt * lam6) / 1000000.0, 4) AS logw
       |  FROM rawf JOIN lam USING (b) GROUP BY 1)
       |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
       |  coalesce(sc.logw, 0.0) AS logw
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
       |LEFT JOIN sc USING (doc_id)""".stripMargin

  /** Unrolled synchronous label propagation in pure SQL over the
    * serial-oracle edge dump — the independent recomputation of
    * GraphMetrics.labelPropagation's contract: undirected simple graph,
    * labels start as node ids, each round every node takes the most
    * frequent neighbor label (ties → smallest label), all nodes update
    * simultaneously.
    */
  private def lpaSql(rounds: Int): String = {
    def roundCtes(i: Int): String =
      s"""c$i AS (
         |  SELECT und.u AS node, l.community AS community, count(*) AS c
         |  FROM und JOIN l${i - 1} l ON l.node = und.v
         |  GROUP BY 1, 2),
         |l$i AS (
         |  SELECT node, community FROM (
         |    SELECT node, community, row_number() OVER (
         |      PARTITION BY node ORDER BY c DESC, community ASC) AS rn
         |    FROM c$i)
         |  WHERE rn = 1)""".stripMargin
    val body = (1 to rounds).map(roundCtes).mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
       |  FROM read_parquet('$VerifyOutPlaceholder/_oracle_kg_edges/*.parquet')
       |  WHERE subj <> obj),
       |und AS (SELECT a AS u, b AS v FROM e
       |        UNION ALL SELECT b AS u, a AS v FROM e),
       |l0 AS (SELECT DISTINCT u AS node, u AS community FROM und),
       |$body
       |SELECT node, community FROM l$rounds""".stripMargin
  }

  /** Unrolled full-batch logistic-regression TRAINING in pure SQL — the
    * independent recomputation of TextClassifier.trainScore's contract:
    * hashed L1-normalized bag-of-tokens features (md5-bucket mod dim, the
    * Sampling arithmetic), all-zero init, per epoch z/p/weights each
    * rounded 6dp (pins both engines so float-order drift cannot compound),
    * final output (doc_id, y, score, pred).
    */
  private def logregSql(dim: Int, epochs: Int, lr: String): String = {
    // micro-unit replay of TextClassifier: every Σ is over exact BIGINTs
    // (DuckDB sums BIGINT into exact HUGEINT; the engine sums
    // decimal(38,0)), so both engines see bit-identical z/p/w at every
    // step regardless of summation order — the earlier double-sum form
    // was green-by-luck at the ulp level (see TextClassifier's scaladoc)
    def epochCtes(k: Int): String =
      s"""z$k AS (
         |  SELECT l.id, l.y,
         |    round((SELECT bias FROM b$k)
         |      + CAST(coalesce(sum(f.xu *
         |          CAST(round(w$k.w * 1000000, 0) AS BIGINT)), 0) AS DOUBLE)
         |        / 1000000000000.0, 6) AS z
         |  FROM lab l LEFT JOIN f ON f.id = l.id
         |  LEFT JOIN w$k ON w$k.b = f.b
         |  GROUP BY 1, 2),
         |p$k AS (SELECT id, y, round(1.0 / (1.0 + exp(-z)), 6) AS p FROM z$k),
         |g$k AS (
         |  SELECT f.b,
         |    sum((CAST(round(p.p * 1000000, 0) AS BIGINT)
         |       - CAST(round(p.y * 1000000, 0) AS BIGINT)) * f.xu) AS gsu
         |  FROM f JOIN p$k p ON p.id = f.id
         |  GROUP BY 1),
         |w${k + 1} AS (
         |  SELECT w.b,
         |    round(w.w - $lr * (CAST(coalesce(g.gsu, 0) AS DOUBLE)
         |      / 1000000000000.0) / (SELECT n FROM nn), 6) AS w
         |  FROM w$k w LEFT JOIN g$k g USING (b)),
         |b${k + 1} AS (
         |  SELECT round((SELECT bias FROM b$k)
         |    - $lr * (CAST(sum(CAST(round(p * 1000000, 0) AS BIGINT)
         |        - CAST(round(y * 1000000, 0) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0) / (SELECT n FROM nn), 6) AS bias
         |  FROM p$k)""".stripMargin
    val body = (0 until epochs).map(epochCtes).mkString(",\n")
    s"""WITH tok AS (
       |  SELECT doc_id AS id,
       |    unnest(list_filter(string_split_regex(text, '\\s+'),
       |      x -> x <> '')) AS tok
       |  FROM documents),
       |tf AS (
       |  SELECT id,
       |    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % $dim AS b,
       |    count(*) AS cnt
       |  FROM tok GROUP BY 1, 2),
       |nt AS (SELECT id, CAST(sum(cnt) AS DOUBLE) AS n FROM tf GROUP BY 1),
       |f AS (SELECT t.id, t.b,
       |        CAST(round(t.cnt / n.n * 1000000, 0) AS BIGINT) AS xu
       |      FROM tf t JOIN nt n USING (id)),
       |lab AS (SELECT doc_id AS id,
       |          CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |        FROM documents),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lab),
       |w0 AS (SELECT DISTINCT b, 0.0 AS w FROM f),
       |b0 AS (SELECT 0.0 AS bias),
       |$body,
       |zf AS (
       |  SELECT l.id, l.y,
       |    round((SELECT bias FROM b$epochs)
       |      + CAST(coalesce(sum(f.xu *
       |          CAST(round(w$epochs.w * 1000000, 0) AS BIGINT)), 0) AS DOUBLE)
       |        / 1000000000000.0, 6) AS z
       |  FROM lab l LEFT JOIN f ON f.id = l.id
       |  LEFT JOIN w$epochs ON w$epochs.b = f.b
       |  GROUP BY 1, 2)
       |SELECT id AS doc_id, y,
       |  round(1.0 / (1.0 + exp(-z)), 6) AS score,
       |  round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS pred
       |FROM zf""".stripMargin
  }

  /** Marker-count SQL fragments over a column named `padded` (the
    * space-padded lowercased token string) — shared by the langId oracle
    * and the composed curate oracle. Returns (total-hits expression,
    * argmax-language expression); the argmax sorts (score, lang) structs
    * ascending and takes the last — the same tie-break as the Spark side's
    * greatest(struct(score, lang)).
    */
  private def langPredSqlExprs: (String, String) = {
    val scores = TextAnalysis.langMarkers.map { case (lang, words) =>
      val s = words.map { w =>
        s"CAST((length(padded) - length(replace(padded, ' $w ', ''))) / ${w.length + 2} AS INT)"
      }.mkString(" + ")
      (lang, s)
    }
    val totalExpr = scores.map(_._2).mkString(" + ")
    val structs = scores.map { case (lang, s) =>
      s"{'score': $s, 'lang': '$lang'}"
    }.mkString(", ")
    (totalExpr, s"list_sort([$structs])[-1].lang")
  }

  private def langIdSql: String = {
    val (totalExpr, predExpr) = langPredSqlExprs
    s"""WITH p AS (
       |  SELECT doc_id, lang AS lang_meta,
       |    ' ' || array_to_string(list_filter(
       |      string_split_regex(lower(text), '\\s+'), x -> x <> ''), ' ')
       |      || ' ' AS padded
       |  FROM documents)
       |SELECT doc_id, lang_meta, $totalExpr AS marker_hits,
       |  $predExpr AS lang_pred
       |FROM p""".stripMargin
  }

  /** The composed CurateJob oracle — every stage re-run from scratch in one
    * WITH-RECURSIVE chain over the identically PII-augmented corpus:
    * token-count gate (>= 30) and marker-argmax language gate (= 'en') on
    * the PRE-redaction text, then redaction, then md5 exact dedup (min
    * doc_id survives), then exact all-pairs 5-gram Jaccard >= 0.7 (blind
    * to the engine's MinHash banding), recursive transitive closure,
    * longest-redacted-text retention (min-doc_id tie-break), md5-bucket
    * train/val/test split. Any stage-ordering divergence in the engine
    * (e.g. dedup keyed on a stale pre-redaction hash) breaks the compare.
    */
  private def curatePipelineSql: String = {
    val (_, predExpr) = langPredSqlExprs
    val (e, i, p) = (TextAnalysis.EmailRe, TextAnalysis.Ipv4Re,
      TextAnalysis.PhoneRe)
    s"""WITH RECURSIVE aug AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 101 = 0 THEN '$CurateConstText' ELSE text END
       |      || ' contact user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com' ||
       |      CASE WHEN doc_id % 3 = 0
       |        THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@corp.io'
       |        ELSE '' END ||
       |      ' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
       |      CAST(doc_id % 100 AS VARCHAR) || ' call +1 555 01' ||
       |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
       |  FROM documents),
       |an AS (
       |  SELECT doc_id, text,
       |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
       |      AS n_tokens,
       |    $predExpr AS lang_id
       |  FROM (
       |    SELECT doc_id, text,
       |      ' ' || array_to_string(list_filter(
       |        string_split_regex(lower(text), '\\s+'), x -> x <> ''), ' ')
       |        || ' ' AS padded
       |    FROM aug)),
       |filt AS (
       |  SELECT doc_id, n_tokens, lang_id,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '$e', '<EMAIL>', 'g'), '$i', '<IP>', 'g'),
       |      '$p', '<PHONE>', 'g') AS text
       |  FROM an WHERE n_tokens >= 30 AND lang_id IN ('en')),
       |ex AS (
       |  SELECT doc_id, n_tokens, lang_id, text, md5(text) AS content_md5
       |  FROM (SELECT *, row_number() OVER (PARTITION BY md5(text)
       |          ORDER BY doc_id) AS rnx
       |        FROM filt)
       |  WHERE rnx = 1),
       |ctoks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |    x -> x <> '') AS t
       |  FROM ex),
       |csh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(t) - 4, 0) + 1),
       |    i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS s
       |  FROM ctoks),
       |csized AS (SELECT doc_id, s, len(s) AS n FROM csh),
       |cinv AS (SELECT doc_id, n, unnest(s) AS shingle FROM csized),
       |cpairs AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter,
       |    any_value(a.n) AS n1, any_value(b.n) AS n2
       |  FROM cinv a JOIN cinv b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |np AS (
       |  SELECT id1, id2 FROM cpairs
       |  WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= 0.7),
       |und AS (SELECT id1 AS a, id2 AS b FROM np
       |        UNION SELECT id2, id1 FROM np),
       |reach(id, r) AS (
       |  SELECT a, b FROM und
       |  UNION
       |  SELECT u.a, re.r FROM und u JOIN reach re ON u.b = re.id),
       |cl AS (
       |  SELECT id AS doc_id, least(id, min(r)) AS cluster_id
       |  FROM reach GROUP BY id),
       |rk AS (
       |  SELECT cl.doc_id, row_number() OVER (PARTITION BY cl.cluster_id
       |      ORDER BY length(ex.text) DESC, cl.doc_id ASC) AS rnb
       |  FROM cl JOIN ex ON cl.doc_id = ex.doc_id),
       |losers AS (SELECT doc_id FROM rk WHERE rnb > 1)
       |SELECT doc_id, n_tokens, lang_id, content_md5,
       |  CASE WHEN b < 80 THEN 'train'
       |       WHEN b < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (
       |  SELECT *, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |    AS BIGINT) % 100 AS b
       |  FROM ex)
       |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin
  }
}
