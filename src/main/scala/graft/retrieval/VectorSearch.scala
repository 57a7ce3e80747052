package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.temporal.Temporal

/** Vector retrieval (reference retrieval/vector_search.py) over a chunks
  * table carrying a feature/embedding column (array<float|double>).
  *
  * The reference hits a Neo4j vector index; here the scan is a narrow
  * cosine projection + TakeOrdered top-k (no full sort). The scale path for
  * repeated queries is Similarity.lshTopK's bucket pruning — this module
  * keeps the exact semantics: score threshold (0.7, settings.py:55-57),
  * is_current + temporal predicate, per-chunk entity collection.
  */
object VectorSearch {

  val ScoreThreshold = 0.7

  /** Top-k chunks by cosine to `query`, filtered to current versions, an
    * optional temporal filter, and score >= threshold
    * (vector_search.py:33-126). Input chunks must carry (chunk_id,
    * embedding, is_current, fiscal_year, fiscal_quarter).
    */
  def search(chunks: DataFrame, query: Seq[Double], topK: Int = 10,
      temporal: Option[Temporal.TemporalFilter] = None,
      threshold: Double = ScoreThreshold): DataFrame = {
    val q = typedLit(query)
    val pred = temporal.map(Temporal.toPredicate)
      .getOrElse(col("is_current") === true)
    chunks.where(pred)
      .select(col("chunk_id"),
        Similarity.cosineCol(col("embedding"), q).as("score"))
      .where(col("score") >= threshold)
      .orderBy(col("score").desc, col("chunk_id").asc)
      .limit(topK)
  }

  /** Attach per-result entity lists and document ids
    * (vector_search.py:78-95: join Document + collect(DISTINCT entity)).
    * The chunk→doc map is restricted to current versions: chunk_id is
    * stable across versions, so an unfiltered join would emit one result
    * row per VERSION of each hit.
    */
  def withEntities(results: DataFrame, chunks: DataFrame,
      mentions: DataFrame): DataFrame =
    results
      .join(chunks.where(col("is_current") === true)
        .select(col("chunk_id"), col("doc_id")), Seq("chunk_id"))
      .join(mentions.groupBy(col("chunk_id"))
          .agg(sort_array(collect_set(col("entity_name"))).as("entities")),
        Seq("chunk_id"), "left")
      .orderBy(col("score").desc, col("chunk_id").asc)

  /** Neighbor context (vector_search.py:128-181): for each hit, the chunks
    * of the same document with |chunk_index − i| <= window, excluding the
    * hit itself. One self-join on doc_id with a bounded index range. Both
    * sides filter to current versions (the reference's context query has
    * `WHERE c.is_current = true`, `:160`) — without it a versioned chunk
    * joined once per version.
    */
  def searchWithContext(results: DataFrame, chunks: DataFrame,
      window: Int = 1): DataFrame = {
    val cur = chunks.where(col("is_current") === true)
    val hits = results
      .join(cur.select(col("chunk_id"), col("doc_id"),
        col("chunk_index")), Seq("chunk_id"))
    val neighbors = cur.select(col("doc_id").as("n_doc"),
      col("chunk_id").as("neighbor_id"), col("chunk_index").as("n_idx"))
    hits.join(neighbors,
        col("n_doc") === col("doc_id") &&
        abs(col("n_idx") - col("chunk_index")) <= window &&
        col("neighbor_id") =!= col("chunk_id"))
      .select(col("chunk_id"), col("score"), col("neighbor_id"), col("n_idx"))
      .orderBy(col("score").desc, col("chunk_id").asc, col("n_idx").asc)
  }

  /** Chunks most similar to a given chunk, excluding itself and optionally
    * its document (vector_search.py:183-255 — the reference over-fetches
    * k+1 then drops self; here the self filter is in the plan). Candidates
    * are restricted to CURRENT versions (`WHERE node.is_current = true`,
    * `:222`) while the target chunk is looked up by id alone, exactly the
    * reference's shape; the default excludeSameDocument = true also
    * matches the reference signature (`:187`). Before round 5 neither
    * held: superseded versions competed in the top-k (once per version)
    * and same-doc chunks were kept by default.
    */
  def findSimilarChunks(chunks: DataFrame, chunkId: String, topK: Int = 10,
      excludeSameDocument: Boolean = true): DataFrame = {
    val target = chunks.where(col("chunk_id") === chunkId)
      .select(col("embedding").as("q_emb"), col("doc_id").as("q_doc"))
      .limit(1)
    val base = chunks.where(col("is_current") === true)
      .where(col("chunk_id") =!= chunkId)
      .crossJoin(broadcast(target))
    val filtered = if (excludeSameDocument)
      base.where(col("doc_id") =!= col("q_doc")) else base
    filtered
      .select(col("chunk_id"), col("doc_id"),
        Similarity.cosineCol(col("embedding"), col("q_emb")).as("score"))
      .orderBy(col("score").desc, col("chunk_id").asc)
      .limit(topK)
  }

  /** Rank column helper shared with HybridSearch. */
  def ranked(results: DataFrame, scoreCol: String = "score"): DataFrame =
    results.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col("chunk_id").asc)))
}
