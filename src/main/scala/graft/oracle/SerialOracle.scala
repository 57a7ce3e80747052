package graft.oracle

import java.sql.Date

import scala.collection.mutable

import graft.core.Schema._
import graft.fixtures.Fixtures
import graft.ingest.SpanChunker
import graft.link.{JaroWinkler, NameFeatures}
import graft.text.Tok

/** Serial, single-threaded deterministic oracle (SURVEY §5): an independent
  * plain-collections implementation of the reference's non-LLM ingestion
  * contract, used as the ground truth for the P/R >= 0.95 gate.
  *
  * Deliberately different algorithms from the engine wherever the contract
  * permits, so the comparison is a real cross-check:
  *   - NER: naive per-surface indexOf scan (vs the engine's trie automaton)
  *   - linking stage 1: the reference's full N×N cosine ranking
  *     (entity_deduplication.py:233-297) with NO blocking approximation
  *   - clustering: classic Union-Find with path compression
  *     (entity_deduplication.py:490-530) vs the engine's iterative
  *     DataFrame label propagation
  *   - all aggregation/merge/dedup: serial folds.
  *
  * Shared kernels (must match bit-for-bit by design, SURVEY §7.4.6):
  * tokenizer/sentence split (Tok), Jaro-Winkler, name feature vectors, the
  * span-preserving chunk packing (the chunker IS the contract), fixtures.
  */
object SerialOracle {

  final case class Triple(
      subj: String, subjType: String, pred: String, obj: String,
      objType: String, tStart: Date, tEnd: Option[Date], confidence: Double,
      description: String, sourceChunks: Vector[String])

  final case class Entity(
      id: String, name: String, tpe: String, firstSeen: Date, lastSeen: Date,
      mentionCount: Long)

  final case class Result(
      chunks: Vector[ChunkRow],
      mentions: Vector[MentionRow],
      triplesRaw: Vector[Triple],
      entities: Vector[Entity],
      dupPairs: Vector[(String, String)],
      canonicalOf: Map[String, String],
      nodes: Vector[(Entity, Vector[String])], // canonical node + merged ids
      edges: Vector[Triple], // canonicalized + re-deduped
      mentionsFinal: Vector[MentionRow]) // canonicalized + re-grouped

  def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  // ---- NER: naive scan ----------------------------------------------------

  private val regexDetectors = Vector(
    ("""\$\d+(?:\.\d+)?\s(?:million|billion)""", "MONEY"),
    ("""\d+(?:\.\d+)?\s?(?:percent|%)""", "PERCENT"),
    ("""\d{4}-\d{2}-\d{2}""", "DATE"),
    ("""Q[1-4]\s\d{4}""", "DATE"),
    ("""\d{1,2}:\d{2}\s?(?:am|pm)""", "TIME")
  ).map { case (p, t) =>
    (java.util.regex.Pattern.compile(p, java.util.regex.Pattern.CASE_INSENSITIVE), t)
  }

  final case class M(start: Int, end: Int, name: String, tpe: String)

  def scan(text: String): Vector[M] = scan(text, Fixtures.gazetteer)

  def scan(text: String, gaz: Seq[Fixtures.GazEntry]): Vector[M] = {
    // per-char locale-insensitive fold, matching GazetteerNer's trie
    // (Character.toLowerCase on both sides — String.toLowerCase is locale-
    // sensitive and can change string length)
    val lower = text.map(Character.toLowerCase)
    def bOk(i: Int) = i == 0 || !Character.isLetterOrDigit(lower.charAt(i - 1))
    def eOk(i: Int) = i >= lower.length || !Character.isLetterOrDigit(lower.charAt(i))
    val cands = mutable.ArrayBuffer.empty[M]
    gaz.foreach { g =>
      val s = g.surface.map(Character.toLowerCase)
      var from = 0
      var i = lower.indexOf(s, from)
      while (i >= 0) {
        if (bOk(i) && eOk(i + s.length)) cands += M(i, i + s.length, g.surface, g.tpe)
        from = i + 1
        i = lower.indexOf(s, from)
      }
    }
    regexDetectors.foreach { case (pat, tpe) =>
      val m = pat.matcher(text)
      while (m.find()) {
        if (bOk(m.start()) && eOk(m.end()))
          cands += M(m.start(), m.end(), text.substring(m.start(), m.end()), tpe)
      }
    }
    val sorted = cands.sortBy(m => (m.start, -m.end)).toVector
    val out = Vector.newBuilder[M]
    var lastEnd = 0
    sorted.foreach { m => if (m.start >= lastEnd) { out += m; lastEnd = m.end } }
    out.result()
  }

  def mentionsOf(chunk: ChunkRow,
      gaz: Seq[Fixtures.GazEntry] = Fixtures.gazetteer): Vector[MentionRow] = {
    val grouped = mutable.LinkedHashMap.empty[(String, String), (Int, Int)]
    scan(chunk.text, gaz).foreach { m =>
      val name = Tok.normalizeEntityName(m.name)
      if (name.nonEmpty) {
        val key = (name, m.tpe)
        grouped.get(key) match {
          case Some((pos, cnt)) => grouped(key) = (pos, cnt + 1)
          case None => grouped(key) = (m.start, 1)
        }
      }
    }
    grouped.iterator.map { case ((name, tpe), (pos, cnt)) =>
      MentionRow(chunk.chunk_id, chunk.doc_id, name, tpe, pos, cnt,
        Const.MentionConfidence, chunk.text.take(200), chunk.fiscal_period_end)
    }.toVector
  }

  // ---- relations ----------------------------------------------------------

  private val OnDate = """(?i)\bon (\d{4}-\d{2}-\d{2})""".r
  private val InQuarter = """(?i)\bin Q([1-4]) (\d{4})""".r
  private val InYear = """(?i)\bin (\d{4})\b""".r
  private val UntilDate = """(?i)\buntil (\d{4}-\d{2}-\d{2})""".r

  private def quarterEnd(year: Int, q: Int): Date = {
    val m = q * 3
    val d = if (m == 6 || m == 9) 30 else 31
    Date.valueOf(f"$year%04d-$m%02d-$d%02d")
  }

  def triplesOf(chunk: ChunkRow,
      gaz: Seq[Fixtures.GazEntry] = Fixtures.gazetteer): Vector[Triple] = {
    val out = Vector.newBuilder[Triple]
    Tok.sentenceSplit(chunk.text).foreach { sentence =>
      val ms = scan(sentence, gaz)
      if (ms.length >= 2) {
        val tStart = OnDate.findFirstMatchIn(sentence).map(m => Date.valueOf(m.group(1)))
          .orElse(InQuarter.findFirstMatchIn(sentence)
            .map(m => quarterEnd(m.group(2).toInt, m.group(1).toInt)))
          .orElse(InYear.findFirstMatchIn(sentence)
            .map(m => Date.valueOf(m.group(1) + "-12-31")))
          .getOrElse(chunk.fiscal_period_end)
        val tEnd = UntilDate.findFirstMatchIn(sentence).map(m => Date.valueOf(m.group(1)))
        ms.sliding(2).foreach {
          case Vector(a, b) =>
            val infix = Tok.normInfix(sentence.substring(a.end, b.start))
            Fixtures.patternByInfix.get(infix).foreach { p =>
              if (p.subjType == a.tpe && p.objType == b.tpe) {
                val subj = Tok.normalizeEntityName(a.name)
                val obj = Tok.normalizeEntityName(b.name)
                if (subj.nonEmpty && obj.nonEmpty && subj != obj)
                  out += Triple(subj, a.tpe, p.pred, obj, b.tpe, tStart, tEnd,
                    Const.RelationConfidence, sentence, Vector(chunk.chunk_id))
              }
            }
          case _ =>
        }
      }
    }
    out.result()
  }

  def dedupTriples(ts: Seq[Triple]): Vector[Triple] = {
    val m = mutable.LinkedHashMap.empty[(String, String, String, String, String), Triple]
    ts.foreach { t =>
      val key = (t.subj, t.subjType, t.pred.toLowerCase, t.obj, t.objType)
      m.get(key) match {
        case None => m(key) = t.copy(pred = t.pred.toLowerCase)
        case Some(prev) =>
          val desc = // longer wins; tie -> lexicographically larger
            if (t.description.length > prev.description.length) t.description
            else if (t.description.length == prev.description.length &&
              t.description > prev.description) t.description
            else prev.description
          val tEnd = (prev.tEnd, t.tEnd) match {
            case (Some(a), Some(b)) => Some(if (a.after(b)) a else b)
            case (a, b) => a.orElse(b)
          }
          m(key) = prev.copy(
            sourceChunks = prev.sourceChunks ++ t.sourceChunks,
            confidence = math.max(prev.confidence, t.confidence),
            description = desc,
            tStart = if (t.tStart.before(prev.tStart)) t.tStart else prev.tStart,
            tEnd = tEnd)
      }
    }
    m.values.map(t => t.copy(sourceChunks = t.sourceChunks.distinct.sorted)).toVector
  }

  // ---- entity aggregation + N×N linking + union-find ----------------------

  def aggregateEntities(mentions: Seq[MentionRow]): Vector[Entity] = {
    val m = mutable.LinkedHashMap.empty[(String, String), Entity]
    mentions.foreach { mn =>
      val key = (mn.entity_name, mn.entity_type)
      m.get(key) match {
        case None =>
          m(key) = Entity(sha256Hex(s"${mn.entity_name}|${mn.entity_type}"),
            mn.entity_name, mn.entity_type, mn.valid_from, mn.valid_from,
            mn.mention_count.toLong)
        case Some(e) =>
          m(key) = e.copy(
            firstSeen = if (mn.valid_from.before(e.firstSeen)) mn.valid_from else e.firstSeen,
            lastSeen = if (mn.valid_from.after(e.lastSeen)) mn.valid_from else e.lastSeen,
            mentionCount = e.mentionCount + mn.mention_count)
      }
    }
    m.values.toVector
  }

  /** Reference blocking contract on the FULL N×N similarity matrix:
    * entity list order = entity_id ascending (our deterministic list
    * order); per i, pairs (i,j) with j "after" i, same type, cosine >=
    * 0.85*0.8, ranked sim desc (tie: id asc), capped at 10; then JW
    * stage-2 filter; then the no-LLM accept rule emb>=0.85 && jw>=0.7.
    */
  def dupPairs(entities: Vector[Entity]): Vector[(String, String)] = {
    val es = entities.sortBy(_.id)
    val vecs = es.map(e => NameFeatures.vector(e.name))
    val out = Vector.newBuilder[(String, String)]
    val slack = Const.EmbThreshold * Const.BlockingSlack
    var i = 0
    while (i < es.length) {
      val sims = mutable.ArrayBuffer.empty[(Int, Double)]
      var j = i + 1
      while (j < es.length) {
        if (es(j).tpe == es(i).tpe) {
          val s = NameFeatures.dot(vecs(i), vecs(j))
          if (s >= slack) sims += ((j, s))
        }
        j += 1
      }
      sims.sortBy { case (jj, s) => (-s, es(jj).id) }
        .take(Const.MaxCandidatesPerEntity)
        .foreach { case (jj, embSim) =>
          val strSim = JaroWinkler.similarity(es(i).name, es(jj).name)
          val stage2 = strSim >= Const.StrThreshold * Const.BlockingSlack ||
            embSim >= Const.HighEmbBypass
          val accept = embSim >= Const.EmbThreshold && strSim >= Const.StrThreshold
          if (stage2 && accept) out += ((es(i).id, es(jj).id))
        }
      i += 1
    }
    out.result()
  }

  /** Union-Find with path compression (entity_deduplication.py:490-530),
    * canonical = min entity_id of the component (SURVEY §7.4.3).
    */
  def unionFind(pairs: Seq[(String, String)]): Map[String, String] = {
    val parent = mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        // keep the lexicographically smaller id as root -> canonical
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    pairs.foreach { case (a, b) => union(a, b) }
    parent.keys.map(k => k -> find(k)).toMap
  }

  // ---- full run -----------------------------------------------------------

  def run(docs: Seq[(DocRow, DocMeta)],
      cfg: SpanChunker.Config = SpanChunker.Config(),
      gaz: Seq[Fixtures.GazEntry] = Fixtures.gazetteer): Result = {
    val chunks = docs.iterator.flatMap { case (d, m) =>
      SpanChunker.chunkDoc(d, m, cfg)
    }.toVector
    val mentions = chunks.flatMap(c => mentionsOf(c, gaz))
    val triplesRaw = chunks.flatMap(c => triplesOf(c, gaz))
    val triples = dedupTriples(triplesRaw)
    val entities = aggregateEntities(mentions)
    val pairs = dupPairs(entities)
    val canonicalOf = unionFind(pairs)

    val byId = entities.map(e => e.id -> e).toMap
    def canonId(id: String) = canonicalOf.getOrElse(id, id)

    // canonical nodes with merge lineage
    val groups = entities.groupBy(e => canonId(e.id))
    val nodes = groups.toVector.sortBy(_._1).map { case (cid, es) =>
      val canon = byId(cid)
      val merged = es.map(_.id).filter(_ != cid).sorted
      val node = Entity(cid, canon.name, canon.tpe,
        es.map(_.firstSeen).min(Ordering.by((d: Date) => d.getTime)),
        es.map(_.lastSeen).max(Ordering.by((d: Date) => d.getTime)),
        es.map(_.mentionCount).sum)
      (node, merged)
    }

    // endpoint rewrite to canonical names, drop collapsed self-edges, re-dedup
    def canonName(name: String, tpe: String): String = {
      val id = sha256Hex(s"$name|$tpe")
      byId.get(canonId(id)).map(_.name).getOrElse(name)
    }
    val rewritten = triples.map { t =>
      t.copy(subj = canonName(t.subj, t.subjType), obj = canonName(t.obj, t.objType))
    }.filter(t => t.subj != t.obj)
    val edges = dedupTriples(rewritten)

    // canonical mention view (graph/operations.py:358-370 repoints MENTIONS
    // to the canonical entity): rewrite names, re-group per (chunk, name,
    // type) with min position, summed counts, max confidence — the serial
    // mirror of Canonicalize.rewriteMentions.
    val mentionsFinal = {
      val mm = mutable.LinkedHashMap.empty[(String, String, String, String), MentionRow]
      mentions.foreach { mn =>
        val cname = canonName(mn.entity_name, mn.entity_type)
        val key = (mn.chunk_id, mn.doc_id, cname, mn.entity_type)
        mm.get(key) match {
          case None => mm(key) = mn.copy(entity_name = cname)
          case Some(prev) => mm(key) = prev.copy(
            position = math.min(prev.position, mn.position),
            mention_count = prev.mention_count + mn.mention_count,
            confidence = math.max(prev.confidence, mn.confidence),
            context = if (mn.context < prev.context) mn.context else prev.context,
            valid_from = if (mn.valid_from.before(prev.valid_from)) mn.valid_from
              else prev.valid_from)
        }
      }
      mm.values.toVector
    }

    Result(chunks, mentions, triplesRaw, entities, pairs, canonicalOf,
      nodes, edges, mentionsFinal)
  }
}
