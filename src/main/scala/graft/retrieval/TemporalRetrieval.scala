package graft.retrieval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.temporal.Temporal
import graft.temporal.Temporal.{PointInTime, TemporalFilter, TimeRange}

/** Temporally-aware search orchestration (reference
  * retrieval/temporal_retrieval.py:221-334): auto-detect a temporal filter
  * from the query, restrict the search to it, hybrid-search, annotate.
  *
  * The hybrid flow is the reference's (graph_search.py:450-507 +
  * hybrid_search.py:34-163) with deterministic legs: the vector leg is
  * cosine over the chunks' embedding/feature column; the graph leg is
  * query-NER → ANY-entity search over the mentions of the filtered chunk
  * set, falling back to fulltext keyword scoring when the query yields no
  * entities; the two ranked lists fuse with RRF (k=60, α=0.5).
  *
  * Everything is a bounded composition of already-scale-shaped operators —
  * the temporal predicate prunes partitions (tables partition by
  * fiscal_year), the legs each end in a top-(k·2) TakeOrdered, and the
  * fusion runs over ≤ 4k rows.
  */
object TemporalRetrieval {

  final case class TemporalSearchResult(
      results: DataFrame,
      context: TemporalParse.TemporalContext,
      filterApplied: Boolean)

  /** The deterministic hybrid search with an optional temporal filter.
    * `chunks` must carry (chunk_id, text, embedding, is_current,
    * fiscal_year, fiscal_quarter); `mentions` (chunk_id, entity_name, ...).
    */
  def hybridSearch(spark: SparkSession, query: String, queryVec: Seq[Double],
      chunks: DataFrame, mentions: DataFrame, topK: Int = 10,
      temporal: Option[TemporalFilter] = None): DataFrame = {
    val fetchK = topK * HybridSearch.Multiplier
    val vector = VectorSearch.search(chunks, queryVec, fetchK, temporal)
    val pred = temporal.map(Temporal.toPredicate)
      .getOrElse(col("is_current") === true)
    val filteredChunks = chunks.where(pred)
    val names = GraphSearch.entitiesFromQuery(query)
    val graph =
      if (names.nonEmpty) {
        val m = mentions.join(filteredChunks.select(col("chunk_id")),
          Seq("chunk_id"), "left_semi")
        GraphSearch.searchByEntitiesAny(spark, m, names, fetchK)
          .select(col("chunk_id"), col("score"))
      } else GraphSearch.fulltextSearch(filteredChunks, query, fetchK)
        .select(col("chunk_id"), col("score").cast("double").as("score"))
    HybridSearch.rrf(vector.select(col("chunk_id"), col("score")), graph, topK)
  }

  /** search_with_temporal_context (temporal_retrieval.py:221-261): parse
    * the query for temporal references; a manual filter overrides
    * auto-detection.
    */
  def searchWithTemporalContext(spark: SparkSession, query: String,
      queryVec: Seq[Double], chunks: DataFrame, mentions: DataFrame,
      topK: Int = 10, autoDetect: Boolean = true,
      manual: Option[TemporalFilter] = None): TemporalSearchResult = {
    val ctx = TemporalParse.parse(query)
    val filter = manual.orElse(
      if (autoDetect && ctx.hasTemporalReference) ctx.filter else None)
    val results = hybridSearch(spark, query, queryVec, chunks, mentions,
      topK, filter)
    TemporalSearchResult(results, ctx, filter.nonEmpty)
  }

  /** search_at_time (temporal_retrieval.py:262-289): point-in-time search
    * at a date's fiscal (year, quarter), results annotated with the query
    * time and type.
    */
  def searchAtTime(spark: SparkSession, query: String, queryVec: Seq[Double],
      chunks: DataFrame, mentions: DataFrame, at: java.time.LocalDate,
      topK: Int = 10): DataFrame = {
    val (y, q) = Temporal.toFiscal(at)
    val filter = TemporalFilter(PointInTime, fiscalYear = Some(y),
      fiscalQuarter = Some(q))
    hybridSearch(spark, query, queryVec, chunks, mentions, topK, Some(filter))
      .withColumn("query_timestamp", lit(at.toString))
      .withColumn("temporal_query_type", lit("point_in_time"))
  }

  /** search_time_range (temporal_retrieval.py:291-334). */
  def searchTimeRange(spark: SparkSession, query: String,
      queryVec: Seq[Double], chunks: DataFrame, mentions: DataFrame,
      from: java.time.LocalDate, to: java.time.LocalDate,
      topK: Int = 10): DataFrame = {
    val (y1, q1) = Temporal.toFiscal(from)
    val (y2, q2) = Temporal.toFiscal(to)
    val filter = TemporalFilter(TimeRange,
      startYear = Some(y1), startQuarter = Some(q1),
      endYear = Some(y2), endQuarter = Some(q2))
    hybridSearch(spark, query, queryVec, chunks, mentions, topK, Some(filter))
      .withColumn("query_start_time", lit(from.toString))
      .withColumn("query_end_time", lit(to.toString))
      .withColumn("temporal_query_type", lit("time_range"))
  }
}
