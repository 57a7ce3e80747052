package graft.core

import java.sql.Date

/** Core row types of the KG-construction engine.
  *
  * Mirrors the reference data model (see /root/reference —
  * models/document.py:11-34, models/chunk.py:11-62, models/entity.py:11-242)
  * re-expressed as Spark-encodable case classes. The interleaved input shape
  * (doc_id, spans) is fixed by BASELINE.json input_hint.
  */
object Schema {

  /** One interleaved span: kind ∈ {text,image,audio,table,…}; `text` is
    * non-empty iff kind=='text'; `media_ref` non-empty iff kind!='text';
    * `offset` is monotonically increasing within a doc and defines order.
    */
  case class Span(kind: String, text: String, media_ref: String, offset: Int)

  /** Input row of the interleaved documents table. */
  case class DocRow(doc_id: String, spans: Seq[Span])

  /** Sidecar document metadata, mirroring ECT-QA record fields
    * (reference ingestion/ectqa_loader.py:142-200).
    */
  case class DocMeta(
      doc_id: String,
      company_name: String,
      stock_code: String,
      sector: String,
      year: Int,
      quarter: String, // Q1..Q4
      url: String,
      token_count: Int)

  /** A chunk. Span-preserving: `spans` is the exact contiguous slice of the
    * parent doc's span sequence assigned to this chunk (spans partition the
    * doc; overlap sentences are repeated in `text` only, never in `spans`),
    * so exploding chunks in chunk_index order reproduces the original
    * sequence (kind, text, media_ref, order) — the north-rule invariant.
    */
  case class ChunkRow(
      chunk_id: String,
      doc_id: String,
      chunk_index: Int,
      text: String,
      token_count: Int,
      fiscal_year: Int,
      fiscal_quarter: String,
      fiscal_period_end: Date,
      version: Int,
      is_current: Boolean,
      spans: Seq[Span])

  /** chunk→entity mention edge (reference models/entity.py:102-127).
    * `position` = char offset of first occurrence in chunk text;
    * confidence fixed 0.8 (entity_extractor.py:137).
    */
  case class MentionRow(
      chunk_id: String,
      doc_id: String,
      entity_name: String,
      entity_type: String,
      position: Int,
      mention_count: Int,
      confidence: Double,
      context: String,
      valid_from: Date)

  /** Entity node. Identity key is (name, type) — the reference MERGEs on
    * (name, type) (graph/operations.py:173,336) — with a deterministic id
    * = sha256(name|type) (SURVEY §7.4.4).
    */
  case class EntityRow(
      entity_id: String,
      name: String,
      entity_type: String,
      first_seen: Date,
      last_seen: Date,
      mention_count: Long)

  /** Canonicalized entity node with bi-temporal merge lineage
    * (reference consolidation.py:296-304: merged_entity_ids).
    */
  case class NodeRow(
      entity_id: String,
      name: String,
      entity_type: String,
      first_seen: Date,
      last_seen: Date,
      mention_count: Long,
      merged_entity_ids: Seq[String])

  /** A temporally-qualified triple = the reference EntityRelationship
    * quadruple (models/entity.py:145-242): (subj, pred, obj, t_start, t_end).
    * confidence fixed 0.85 for extracted relations (relation_extractor.py:323).
    */
  case class TripleRow(
      subj: String,
      subj_type: String,
      pred: String,
      obj: String,
      obj_type: String,
      t_start: Date,
      t_end: Option[Date],
      confidence: Double,
      description: String,
      source_chunks: Seq[String])

  /** Reference configuration constants that must match for parity
    * (reference config/settings.py:47-48,55-65,100-142;
    * entity_extractor.py:137; relation_extractor.py:323).
    */
  object Const {
    val RefChunkSize = 1000
    val RefChunkOverlap = 100
    val MentionConfidence = 0.8
    val RelationConfidence = 0.85
    val EmbThreshold = 0.85 // dedup embedding (cosine) threshold
    val StrThreshold = 0.7 // dedup Jaro-Winkler threshold
    val BlockingSlack = 0.8 // thresholds are multiplied by this in blocking
    val MaxCandidatesPerEntity = 10
    val HighEmbBypass = 0.95 // stage-2 filter passes if emb >= this
  }

  /** Entity type enum — the 14-type closed set of the reference
    * (entity_extractor.py:19-34) + OTHER.
    */
  val EntityTypes: Set[String] = Set(
    "PERSON", "ORGANIZATION", "LOCATION", "FACILITY", "DATE", "TIME",
    "MONEY", "PERCENT", "PRODUCT", "EVENT", "WORK", "LAW", "LANGUAGE",
    "GROUP", "OTHER")
}
