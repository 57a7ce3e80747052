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

  /** Trie over lowercased surfaces; values carry the canonical-case name. */
  final class Trie {
    private val root = new TrieNode
    final class TrieNode {
      val next = new mutable.HashMap[Char, TrieNode]
      var hit: Option[(String, String)] = None // (surface, type)
    }
    def add(surface: String, tpe: String): Unit = {
      var n = root
      surface.toLowerCase.foreach { c => n = n.next.getOrElseUpdate(c, new TrieNode) }
      n.hit = Some((surface, tpe))
    }
    /** Longest word-boundary match starting at position i, if any. */
    def longestAt(lower: String, i: Int): Option[Match] = {
      var n = root
      var j = i
      var best: Option[Match] = None
      while (j < lower.length && n.next.contains(lower.charAt(j))) {
        n = n.next(lower.charAt(j))
        j += 1
        n.hit.foreach { case (surface, tpe) =>
          val endOk = j >= lower.length || !Character.isLetterOrDigit(lower.charAt(j))
          if (endOk) best = Some(Match(i, j, surface, tpe))
        }
      }
      best
    }
  }

  private def boundaryOk(lower: String, i: Int): Boolean =
    i == 0 || !Character.isLetterOrDigit(lower.charAt(i - 1))

  /** Pooled compiled automaton (one per JVM/executor). */
  lazy val trie: Trie = {
    val t = new Trie
    Fixtures.gazetteer.foreach(g => t.add(g.surface, g.tpe))
    t
  }

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
  def scan(text: String): Vector[Match] = {
    val lower = text.toLowerCase
    val cands = ArrayBuffer.empty[Match]
    // trie candidates
    var i = 0
    while (i < lower.length) {
      if (boundaryOk(lower, i)) {
        trie.longestAt(lower, i) match {
          case Some(m) => cands += m; i = m.end
          case None => i += 1
        }
      } else i += 1
    }
    // regex candidates (boundary-checked)
    regexDetectors.foreach { case (pat, tpe) =>
      val m = pat.matcher(text)
      while (m.find()) {
        val ok = boundaryOk(lower, m.start()) &&
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
  def mentionsOf(chunk: ChunkRow): Vector[MentionRow] = {
    val ms = scan(chunk.text)
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

  /** Distributed mention detection: narrow mapPartitions, automaton pooled
    * per JVM via the lazy `trie`.
    */
  def detect(spark: SparkSession, chunks: Dataset[ChunkRow]): Dataset[MentionRow] = {
    import spark.implicits._
    chunks.mapPartitions { it =>
      val _ = trie // force pooled compile once per partition/JVM
      it.flatMap(mentionsOf)
    }
  }
}
