package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result-set evolution and misc graph queries (reference
  * temporal_retrieval.py:336-416 compare_over_time,
  * context_expansion.py:228-274 expand_with_entity_graph,
  * operations.py:571-597 search_documents, neo4j_client.py:304-327
  * get_database_stats). Pure id-set algebra and bounded joins.
  */
object Evolution {

  /** Compare two ranked result sets (chunk_id columns): which ids appeared,
    * disappeared, persisted (temporal_retrieval.py:389-414).
    */
  def compareResults(earlier: DataFrame, later: DataFrame): DataFrame = {
    val a = earlier.select(col("chunk_id"))
    val b = later.select(col("chunk_id"))
    b.except(a).withColumn("evolution", lit("new"))
      .unionByName(a.except(b).withColumn("evolution", lit("disappeared")))
      .unionByName(a.intersect(b).withColumn("evolution", lit("persistent")))
  }

  /** Per-period evolution over N ordered result sets: fold consecutive
    * pairs (temporal_retrieval.py:336-388).
    */
  def compareOverTime(results: Seq[(String, DataFrame)]): Seq[(String, String, DataFrame)] =
    results.sliding(2).collect { case Seq((l1, d1), (l2, d2)) =>
      (l1, l2, compareResults(d1, d2))
    }.toSeq

  /** Depth-1 entity neighborhoods of a chunk's entities
    * (context_expansion.py:228-274): for each entity mentioned in the
    * chunk, its direct RELATES_TO neighbors with predicates.
    */
  def expandWithEntityGraph(mentions: DataFrame, edges: DataFrame,
      chunkId: String): DataFrame = {
    val seeds = mentions.where(col("chunk_id") === chunkId)
      .select(lower(col("entity_name")).as("seed")).distinct()
    val fwd = edges.select(col("subj").as("entity"), col("pred"),
      col("obj").as("neighbor"))
    val bwd = edges.select(col("obj").as("entity"), col("pred"),
      col("subj").as("neighbor"))
    fwd.unionByName(bwd)
      .join(broadcast(seeds), lower(col("entity")) === col("seed"))
      .drop("seed")
      .distinct()
      .orderBy(col("entity"), col("pred"), col("neighbor"))
  }

  /** Fulltext-ish title search, score = matched query tokens, title order
    * as tiebreak (operations.py:571-597).
    */
  def searchDocuments(documents: DataFrame, query: String,
      topK: Int = 10): DataFrame = {
    val toks = query.toLowerCase.split("\\W+").filter(_.length > 2).distinct.toSeq
    // same (doc_id, title, score) schema as the scored path — an empty
    // query must not produce a frame a union/title-reader breaks on
    if (toks.isEmpty)
      return documents.select(col("doc_id"), col("title"),
        lit(0).as("score")).limit(0)
    val score = toks.map(t =>
      when(lower(col("title")).contains(t), 1).otherwise(0)).reduce(_ + _)
    documents.select(col("doc_id"), col("title"), score.as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Corpus-level stats: one row of counts (neo4j_client.py:304-327). */
  def databaseStats(documents: DataFrame, chunks: DataFrame, nodes: DataFrame,
      edges: DataFrame, mentions: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Seq((documents.count(), chunks.count(), nodes.count(), edges.count(),
      mentions.count()))
      .toDF("n_documents", "n_chunks", "n_entities", "n_relationships",
        "n_mentions")
  }
}
