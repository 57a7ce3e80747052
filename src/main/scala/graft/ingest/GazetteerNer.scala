package graft.ingest

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.Schema._
import graft.fixtures.Fixtures
import graft.text.Tok

/** Deterministic gazetteer/dictionary NER — the re-expression of the
  * reference's LLM entity extraction (entity_extractor.py:68-154) mandated
  * by the north_star: batched dictionary mention detection with
  * mapPartitions-pooled scoring.
  *
  * Matching: case-insensitive, word-boundary, leftmost-longest,
  * non-overlapping scan with a trie automaton compiled once per executor
  * (pooled in a companion-object cache — the per-partition closure reuses
  * it, so the compile cost is paid once per JVM, not per task). Regex
  * detectors add MONEY / PERCENT / DATE / TIME mentions; overlaps between
  * all matchers resolve leftmost-longest.
  *
  * Per (chunk, name, type): mention_count accumulates occurrences
  * (entity_extractor.py:117-124), position = first occurrence char offset
  * (entity_extractor.py:126-129), confidence = 0.8 (entity_extractor.py:137),
  * context = chunk text[:200] (entity_extractor.py:133-135), valid_from =
  * the chunk's fiscal period end (content time, never wall clock —
  * SURVEY §7.4.2).
  */
object GazetteerNer {

  final case class Match(start: Int, end: Int, name: String, tpe: String)

  /** Trie over lowercased surfaces; values carry the canonical-case name.
    * Children are a direct-indexed ASCII array (plus a map fallback for
    * non-ASCII keys): the scan probes the trie once per text character,
    * and a boxed HashMap[Char, _] lookup there was the single hottest
    * operation of the whole NER/relations extraction path. Node count is
    * gazetteer-surface-bounded (tiny), so the 128-slot arrays cost
    * nothing.
    */
  final class Trie {
    private val root = new TrieNode
    final class TrieNode {
      private val ascii = new Array[TrieNode](128)
      private var wide: mutable.HashMap[Char, TrieNode] = null
      var hit: Option[(String, String)] = None // (surface, type)
      def get(c: Char): TrieNode =
        if (c < 128) ascii(c)
        else if (wide == null) null
        else wide.getOrElse(c, null)
      def getOrCreate(c: Char): TrieNode =
        if (c < 128) {
          if (ascii(c) == null) ascii(c) = new TrieNode
          ascii(c)
        } else {
          if (wide == null) wide = new mutable.HashMap[Char, TrieNode]
          wide.getOrElseUpdate(c, new TrieNode)
        }
    }
    def add(surface: String, tpe: String): Unit = {
      var n = root
      // fold per-char with the SAME function the probe uses (Character
      // .toLowerCase, locale-insensitive): String.toLowerCase is locale-
      // sensitive (Turkish 'I' → 'ı') and can change length, which would
      // desynchronize build-time keys from probe-time folding
      surface.foreach { c =>
        n = n.getOrCreate(Character.toLowerCase(c))
      }
      n.hit = Some((surface, tpe))
    }
    /** Longest word-boundary match starting at position i, if any. The
      * text is lowercased per-char at lookup (trie keys are lowercase) —
      * no full-text lowercase copy, which at corpus scale was a measurable
      * slice of the extraction pass's allocation.
      */
    def longestAt(text: String, i: Int): Option[Match] = {
      var n = root
      var j = i
      var best: Option[Match] = None
      var continue = true
      while (continue && j < text.length) {
        val nx = n.get(Character.toLowerCase(text.charAt(j)))
        if (nx == null) continue = false
        else {
          n = nx
          j += 1
          if (n.hit.isDefined) {
            val endOk = j >= text.length ||
              !Character.isLetterOrDigit(text.charAt(j))
            if (endOk) {
              val (surface, tpe) = n.hit.get
              best = Some(Match(i, j, surface, tpe))
            }
          }
        }
      }
      best
    }
  }

  private def boundaryOk(text: String, i: Int): Boolean =
    i == 0 || !Character.isLetterOrDigit(text.charAt(i - 1))

  /** Pooled compiled automatons, one per (JVM, gazetteer): the gazetteer is
    * DATA, not code — callers pass any surface→type table and the compiled
    * trie is cached per executor so the compile cost is paid once per JVM,
    * not per task. Keyed by the gazetteer value itself (tiny; equality scan
    * on a cache hit is O(|gazetteer|)).
    */
  private val trieCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[Fixtures.GazEntry], Trie]

  def trieFor(gaz: Seq[Fixtures.GazEntry]): Trie =
    trieCache.computeIfAbsent(gaz, g => {
      val t = new Trie
      g.foreach(e => t.add(e.surface, e.tpe))
      t
    })

  /** Pooled automaton for the default fixture gazetteer. */
  def trie: Trie = trieFor(Fixtures.gazetteer)

  // Regex mention detectors for value-typed entities. Patterns anchored by
  // the scanner, not with \b, because boundary checks are shared with the
  // trie path.
  private val regexDetectors: Vector[(java.util.regex.Pattern, String)] = Vector(
    ("""\$\d+(?:\.\d+)?\s(?:million|billion)""", "MONEY"),
    ("""\d+(?:\.\d+)?\s?(?:percent|%)""", "PERCENT"),
    ("""\d{4}-\d{2}-\d{2}""", "DATE"),
    ("""Q[1-4]\s\d{4}""", "DATE"),
    ("""\d{1,2}:\d{2}\s?(?:am|pm)""", "TIME")
  ).map { case (p, t) =>
    (java.util.regex.Pattern.compile(p, java.util.regex.Pattern.CASE_INSENSITIVE), t)
  }

  /** All non-overlapping leftmost-longest typed matches in `text`. */
  def scan(text: String): Vector[Match] = scan(text, trie)

  def scan(text: String, automaton: Trie): Vector[Match] = {
    val cands = ArrayBuffer.empty[Match]
    // trie candidates (case-folding per char — no lowercase text copy)
    var i = 0
    while (i < text.length) {
      if (boundaryOk(text, i)) {
        automaton.longestAt(text, i) match {
          case Some(m) => cands += m; i = m.end
          case None => i += 1
        }
      } else i += 1
    }
    // regex candidates (boundary-checked; patterns are CASE_INSENSITIVE).
    // every value-typed pattern requires a digit, so a one-pass digit
    // probe skips all five regex engines on digit-free text
    var hasDigit = false
    var d = 0
    while (!hasDigit && d < text.length) {
      val c = text.charAt(d)
      if (c >= '0' && c <= '9') hasDigit = true
      d += 1
    }
    if (hasDigit) regexDetectors.foreach { case (pat, tpe) =>
      val m = pat.matcher(text)
      while (m.find()) {
        val ok = boundaryOk(text, m.start()) &&
          (m.end() >= text.length || !Character.isLetterOrDigit(text.charAt(m.end())))
        if (ok) cands += Match(m.start(), m.end(), text.substring(m.start(), m.end()), tpe)
      }
    }
    // leftmost-longest resolution across all matchers
    val sorted = cands.sortBy(m => (m.start, -m.end)).toVector
    val out = Vector.newBuilder[Match]
    var lastEnd = 0
    sorted.foreach { m =>
      if (m.start >= lastEnd) { out += m; lastEnd = m.end }
    }
    out.result()
  }

  /** Pure per-chunk mention extraction. */
  def mentionsOf(chunk: ChunkRow): Vector[MentionRow] = mentionsOf(chunk, trie)

  def mentionsOf(chunk: ChunkRow, automaton: Trie): Vector[MentionRow] = {
    val ms = scan(chunk.text, automaton)
    val grouped = mutable.LinkedHashMap.empty[(String, String), (Int, Int)]
    ms.foreach { m =>
      val name = Tok.normalizeEntityName(m.name)
      if (name.nonEmpty) {
        val key = (name, m.tpe)
        grouped.get(key) match {
          case Some((pos, cnt)) => grouped(key) = (pos, cnt + 1)
          case None => grouped(key) = (m.start, 1)
        }
      }
    }
    val context = chunk.text.take(200)
    grouped.iterator.map { case ((name, tpe), (pos, cnt)) =>
      MentionRow(chunk.chunk_id, chunk.doc_id, name, tpe, pos, cnt,
        Const.MentionConfidence, context, chunk.fiscal_period_end)
    }.toVector
  }

  /** Distributed mention detection: narrow mapPartitions; the gazetteer
    * table ships as a Spark broadcast (one copy per executor, not per task)
    * and compiles into a pooled per-JVM trie.
    */
  def detect(spark: SparkSession, chunks: Dataset[ChunkRow],
      gazetteer: Seq[Fixtures.GazEntry] = Fixtures.gazetteer): Dataset[MentionRow] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    chunks.mapPartitions { it =>
      val automaton = trieFor(bc.value) // pooled compile once per JVM
      it.flatMap(c => mentionsOf(c, automaton))
    }
  }
}
