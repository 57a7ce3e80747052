package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * For the kg_* north-rule tables the DuckDB "oracle" is the independent
  * SerialOracle run (plain-collections implementation of the reference
  * contract, graft.oracle.SerialOracle) executed here on the identical
  * synthetic corpus and dumped to `<outDir>/_oracle_<name>` parquet; the
  * kg_* oracle SQL then just reads those files (placeholder substituted
  * with the absolute outDir below).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // iteration aid: SPARK_GRAFT_VERIFY_ONLY=q_a,q_b restricts the dump
    // (and skips the kg-oracle pass unless a kg_* query is selected);
    // the driver sets nothing and gets the full dump
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (only.forall(_.exists(_.startsWith("kg_"))))
      try dumpKgOracle(spark, sfDir, outDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] kg oracle dump failed: ${e.getMessage}")
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val absOut = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(SparkEntry.VerifyOutPlaceholder, absOut))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** Run the serial oracle on the same corpus/config as the kg_* queries
    * and dump its expected tables (array columns serialized — the driver's
    * pandas sort cannot hash arrays).
    */
  def dumpKgOracle(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    import spark.implicits._
    import graft.oracle.SerialOracle
    import graft.synth.CorpusSynth
    val nDocs = SparkEntry.kgDocs(sfDir)
    val corpus = CorpusSynth.serial(nDocs.toInt, SparkEntry.KgSeed)
    val o = SerialOracle.run(corpus, SparkEntry.KgCfg)
    def dump(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_oracle_$name")
    dump("kg_edges") {
      o.edges.map(t => (t.subj, t.subjType, t.pred, t.obj, t.objType,
        t.tStart, t.tEnd, t.confidence, t.description,
        t.sourceChunks.mkString(",")))
        .toDF("subj", "subj_type", "pred", "obj", "obj_type", "t_start",
          "t_end", "confidence", "description", "source_chunks")
    }
    dump("kg_nodes") {
      o.nodes.map { case (e, merged) => (e.id, e.name, e.tpe, e.firstSeen,
        e.lastSeen, e.mentionCount, merged.mkString(","))
      }.toDF("entity_id", "name", "entity_type", "first_seen", "last_seen",
        "mention_count", "merged_entity_ids")
    }
    dump("kg_mentions") {
      o.mentionsFinal.map(m => (m.chunk_id, m.doc_id, m.entity_name,
        m.entity_type, m.position, m.mention_count.toLong, m.confidence,
        m.context, m.valid_from))
        .toDF("chunk_id", "doc_id", "entity_name", "entity_type", "position",
          "mention_count", "confidence", "context", "valid_from")
    }
    dump("kg_chunks") {
      o.chunks.map(c => (c.chunk_id, c.doc_id, c.chunk_index, c.token_count,
        c.spans.size))
        .toDF("chunk_id", "doc_id", "chunk_index", "token_count", "n_spans")
    }
    dump("kg_ppr")(serialPpr(spark, o, Seq("Skyline Systems"), topK = 20))
    // independent recomputation of the decode contract from SHA-256
    // (media_ref) alone. Every kind is a REAL format parsed by the engine's
    // pure-JVM decoders (PPM / RIFF-WAVE / YUV4MPEG2 / CSV), so the oracle
    // re-derives each format's header/size arithmetic WITHOUT running the
    // parsers or payload builders: byte_len is the format spec's layout
    // (ASCII header + pixel planes; 44-byte canonical WAV header + PCM16
    // frames; y4m stream header + FRAME-marked 4:2:0 planes; fixed-width
    // %03d CSV cells), and (width, height, n_frames) is the documented
    // per-kind metadata mapping.
    dump("q_media_features") {
      corpus.flatMap { case (d, _) =>
        d.spans.filter(_.kind != "text").map { s =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
            .digest(s.media_ref.getBytes("UTF-8"))
          def b(i: Int) = java.lang.Byte.toUnsignedInt(md(i))
          val v = s.kind match {
            case "image" =>
              val w = 8 + b(1) % 56
              val h = 8 + b(2) % 56
              (s"P6\n$w $h\n255\n".length + w * h * 3, w, h, 1)
            case "audio" =>
              val channels = 1 + b(1) % 2
              val sampleRate = 8000 + 100 * (b(2) % 80)
              val nSamples = 100 * (1 + b(3) % 300)
              (44 + nSamples * channels * 2, sampleRate / 100, channels,
                nSamples / 100)
            case "video" =>
              val w = 16 + 2 * (b(1) % 24)
              val h = 16 + 2 * (b(2) % 24)
              val frames = 1 + b(3) % 12
              (s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".length +
                frames * (6 + w * h * 3 / 2), w, h, frames)
            case _ => // table: headerless CSV, every row is cols*4 bytes
              val cols = 3 + b(1) % 6
              val rows = 5 + b(2) % 36
              (rows * cols * 4, cols, rows, 1)
          }
          (d.doc_id, s.media_ref, s.kind, v._1, v._2, v._3, v._4)
        }
      }.toDF("doc_id", "media_ref", "kind", "byte_len", "width", "height",
        "n_frames")
    }
    // q_doc_load expected table: the fixture generator's side-by-side
    // derivation (expected text from pre-render inputs, byte_len from the
    // bytes it wrote) — the engine row must reproduce it by PARSING the
    // rendered txt/md/html/pdf bytes, so generator arithmetic and engine
    // parsing are two independent derivations of the same contract
    dump("q_doc_load") {
      graft.sources.DocLoader
        .expectedRows(SparkEntry.DocFixtureDocs, SparkEntry.DocFixtureSeed)
        .toDF("filename", "ext", "byte_len", "text", "error")
    }
  }

  /** Serial PPR chunk scoring over the oracle's graph — seeds / induced
    * subgraph / top-50 chunk scoring as straight folds (the power iteration
    * itself is Ppr.serialScores, independently property-verified in
    * RetrievalSpec). Both sides round to 6dp before the top-k cut, so the
    * engine's distributed sum order cannot move the boundary.
    */
  def serialPpr(spark: SparkSession, o: graft.oracle.SerialOracle.Result,
      queryEntities: Seq[String], topK: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val qls = queryEntities.map(_.toLowerCase)
    val seeds = o.nodes.map(_._1.name.toLowerCase)
      .filter(n => qls.exists(q => n.contains(q) || q.contains(n)))
      .distinct.toSet
    val und = o.edges.flatMap(t => Seq(
      (t.subj.toLowerCase, t.obj.toLowerCase),
      (t.obj.toLowerCase, t.subj.toLowerCase))).filter(e => e._1 != e._2).toSet
    var reach = seeds
    (1 to 2).foreach { _ =>
      reach = reach ++ und.iterator.filter(e => reach(e._1)).map(_._2)
    }
    val sub = und.filter(e => reach(e._1) && reach(e._2)).toSeq.sorted
    val scores = graft.retrieval.Ppr.serialScores(sub, seeds)
    // the top-50 cut orders by the 9dp-rounded score (mirroring
    // Ppr.scoreChunks exactly — see the boundary-stability note there);
    // the unrounded score still feeds the chunk sum
    def r9(s: Double): Double =
      BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val top = scores.toSeq.sortBy { case (e, s) => (-r9(s), e) }.take(50).toMap
    o.mentionsFinal
      .filter(m => top.contains(m.entity_name.toLowerCase))
      .groupBy(_.chunk_id)
      .map { case (cid, ms) =>
        val s = ms.map(m => top(m.entity_name.toLowerCase) * m.confidence).sum
        // HALF_UP, mirroring Spark's round(col, 6) exactly (math.rint is
        // half-even and would diverge on a .5e-6 boundary)
        (cid, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
      .toSeq.sortBy { case (c, s) => (-s, c) }.take(topK)
      .toDF("chunk_id", "score")
  }
}
