package graft.ingest

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schema._
import graft.fixtures.Fixtures
import graft.synth.CorpusSynth
import graft.text.Tok

/** Deterministic pattern relation extraction — the re-expression of the
  * reference's LLM relation extractor (relation_extractor.py:73-235)
  * mandated by the north_star ("pattern-plus-dependency relation
  * extraction emitting temporally-qualified (subj, pred, obj, t_start,
  * t_end) triples").
  *
  * Contract: within each sentence of a chunk, every ADJACENT pair of typed
  * mentions whose normalized infix text exactly matches a fixture pattern
  * (with matching subject/object types) emits one triple. Temporal
  * qualification comes from date phrases in the sentence ("on YYYY-MM-DD",
  * "in Qn YYYY", "in YYYY" → t_start; "until YYYY-MM-DD" → t_end) with
  * t_start falling back to the chunk's fiscal period end — content time,
  * never executor wall clock (divergence from relation_extractor.py:322
  * documented in SURVEY §7.4.2). Confidence fixed 0.85
  * (relation_extractor.py:323); description = the evidence sentence;
  * source_chunks = [chunk_id].
  */
object RelationPatterns {

  private val OnDate = """(?i)\bon (\d{4}-\d{2}-\d{2})""".r
  private val InQuarter = """(?i)\bin Q([1-4]) (\d{4})""".r
  private val InYear = """(?i)\bin (\d{4})\b""".r
  private val UntilDate = """(?i)\buntil (\d{4}-\d{2}-\d{2})""".r

  private def parseTStart(sentence: String): Option[Date] =
    OnDate.findFirstMatchIn(sentence).map(m => Date.valueOf(m.group(1)))
      .orElse(InQuarter.findFirstMatchIn(sentence).map { m =>
        CorpusSynth.fiscalPeriodEnd(m.group(2).toInt, "Q" + m.group(1))
      })
      .orElse(InYear.findFirstMatchIn(sentence).map { m =>
        Date.valueOf(m.group(1) + "-12-31")
      })

  private def parseTEnd(sentence: String): Option[Date] =
    UntilDate.findFirstMatchIn(sentence).map(m => Date.valueOf(m.group(1)))

  /** Pure per-chunk triple extraction (raw, pre-dedup). */
  def triplesOf(chunk: ChunkRow): Vector[TripleRow] =
    triplesOf(chunk, GazetteerNer.trie)

  def triplesOf(chunk: ChunkRow,
      automaton: GazetteerNer.Trie): Vector[TripleRow] = {
    val out = Vector.newBuilder[TripleRow]
    Tok.sentenceSplit(chunk.text).foreach { sentence =>
      val ms = GazetteerNer.scan(sentence, automaton)
      if (ms.length >= 2) { // >=2 entities required (relation_extractor.py:84)
        // the four date regexes are parsed LAZILY, on the first emitted
        // triple: most ≥2-mention sentences match no relation pattern, and
        // paying four regex scans per sentence for an unused result was a
        // measurable slice of the relations stage
        var tParsed = false
        var tStartOpt: Option[Date] = None
        var tEnd: Option[Date] = None
        var i = 0
        while (i < ms.length - 1) {
          val a = ms(i)
          val b = ms(i + 1)
          val infix = Tok.normInfix(sentence.substring(a.end, b.start))
          Fixtures.patternByInfix.get(infix).foreach { p =>
            if (p.subjType == a.tpe && p.objType == b.tpe) {
              val subj = Tok.normalizeEntityName(a.name)
              val obj = Tok.normalizeEntityName(b.name)
              if (subj.nonEmpty && obj.nonEmpty && subj != obj) {
                if (!tParsed) {
                  tStartOpt = parseTStart(sentence)
                  tEnd = parseTEnd(sentence)
                  tParsed = true
                }
                out += TripleRow(subj, a.tpe, p.pred, obj, b.tpe,
                  tStartOpt.getOrElse(chunk.fiscal_period_end), tEnd,
                  Const.RelationConfidence, sentence, Seq(chunk.chunk_id))
              }
            }
          }
          i += 1
        }
      }
    }
    out.result()
  }

  /** Distributed extraction: narrow mapPartitions over chunks (shares the
    * pooled NER automaton — gazetteer broadcast as data, compiled once per
    * JVM; no join with the mention table is needed because mention
    * detection is pure per chunk).
    */
  def extract(spark: SparkSession, chunks: Dataset[ChunkRow],
      gazetteer: Seq[Fixtures.GazEntry] = Fixtures.gazetteer): Dataset[TripleRow] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    chunks.mapPartitions { it =>
      val automaton = GazetteerNer.trieFor(bc.value)
      it.flatMap(c => triplesOf(c, automaton))
    }
  }

  /** Relation dedup — reference key (source_id, target_id,
    * lower(relationship)) with ids keyed by (name, type)
    * (relation_extractor.py:430-467): union source_chunks, max confidence,
    * keep the LONGER description (ties broken lexicographically for
    * determinism, SURVEY §7.4.7); t_start = min, t_end = max non-null.
    * One shuffle; partial aggregation is map-side (built-in hash agg).
    */
  def dedup(triples: Dataset[TripleRow]): DataFrame = {
    triples.toDF()
      .groupBy(col("subj"), col("subj_type"), lower(col("pred")).as("pred"),
        col("obj"), col("obj_type"))
      .agg(
        array_sort(array_distinct(flatten(collect_list(col("source_chunks")))))
          .as("source_chunks"),
        max(col("confidence")).as("confidence"),
        max(struct(length(col("description")).as("len"),
          col("description"))).getField("description").as("description"),
        min(col("t_start")).as("t_start"),
        max(col("t_end")).as("t_end"))
      .select("subj", "subj_type", "pred", "obj", "obj_type",
        "t_start", "t_end", "confidence", "description", "source_chunks")
  }
}
