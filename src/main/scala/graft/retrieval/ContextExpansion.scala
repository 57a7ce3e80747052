package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context expansion (reference retrieval/context_expansion.py:23-274):
  * attach neighbor chunks, entity detail and related-chunk signals to a
  * result set. Windows run partitioned by doc_id (never global), related
  * chunks come from one mentions self-join.
  */
object ContextExpansion {

  /** Before/after neighbor texts via lag/lead over (doc_id, chunk_index) —
    * context_expansion.py:100-121 with window = 1. Previews truncated to
    * 200 chars like the reference's build_context_summary (276-319).
    */
  def withNeighbors(chunks: DataFrame, results: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_index"))
    val withNbr = chunks.select(col("chunk_id"), col("doc_id"),
        col("chunk_index"), col("text"))
      .withColumn("prev_preview", substring(lag(col("text"), 1).over(w), 1, 200))
      .withColumn("next_preview", substring(lead(col("text"), 1).over(w), 1, 200))
      .drop("text")
    results.join(withNbr, Seq("chunk_id"))
  }

  /** Entity details per result chunk, ordered by confidence then
    * mention_count (context_expansion.py:123-160).
    */
  def withEntityDetails(mentions: DataFrame, results: DataFrame): DataFrame =
    results.join(
      mentions.groupBy(col("chunk_id"))
        .agg(sort_array(collect_list(struct(
          col("confidence").as("c"),
          col("mention_count").as("m"),
          col("entity_name").as("name"),
          col("entity_type").as("type"))), asc = false).as("entity_details")),
      Seq("chunk_id"), "left")

  /** Top related chunks by shared-entity count (context_expansion.py:162-200,
    * top 3). One mentions self-join on entity identity, restricted to the
    * result set on the left side.
    */
  def relatedChunks(mentions: DataFrame, results: DataFrame,
      topPer: Int = 3): DataFrame = {
    val left = mentions
      .join(results.select(col("chunk_id")), Seq("chunk_id"), "left_semi")
      .select(col("chunk_id"), col("entity_name"), col("entity_type"))
    val right = mentions.select(col("chunk_id").as("related_id"),
      col("entity_name"), col("entity_type"))
    val w = Window.partitionBy(col("chunk_id"))
      .orderBy(col("shared").desc, col("related_id").asc)
    left.join(right, Seq("entity_name", "entity_type"))
      .where(col("chunk_id") =!= col("related_id"))
      .groupBy(col("chunk_id"), col("related_id"))
      .agg(countDistinct(col("entity_name"), col("entity_type")).as("shared"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= topPer)
      .drop("rn")
  }

  /** Textual context assembly for RAG (context_expansion.py:276-319):
    * per result "[Result i from 'title']", the chunk text, the top-5 entity
    * names, and 200-char previews of the previous/next chunk. Driver-side
    * string formatting over an already-small top-k result set, exactly like
    * the reference.
    *
    * Input rows need (chunk_id, text, doc_title, entities:Seq[String],
    * prev_preview, next_preview) — the output shape of
    * withNeighbors ∘ withEntityDetails.
    */
  def buildContextSummary(
      rows: Seq[(String, String, String, Seq[String], Option[String], Option[String])]): String = {
    val parts = rows.zipWithIndex.flatMap {
      case ((_, text, title, entities, prev, next), i) =>
        Seq(s"[Result ${i + 1} from '$title']", text) ++
          (if (entities.nonEmpty)
            Seq(s"Key entities: ${entities.take(5).mkString(", ")}")
          else Seq.empty) ++
          prev.toSeq.flatMap(p =>
            Seq("[Previous context]", p.take(200) + "...")) ++
          next.toSeq.flatMap(n =>
            Seq("[Following context]", n.take(200) + "...")) ++
          Seq("")
    }
    parts.mkString("\n")
  }

  /** Document context (context_expansion.py:202-226): per document the
    * chunk count and the top-10 entity names by doc-level mention volume.
    */
  def documentContext(chunks: DataFrame, mentions: DataFrame): DataFrame = {
    val chunkCounts = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("total_mentions").desc, col("entity_name").asc)
    val topEntities = mentions
      .groupBy(col("doc_id"), col("entity_name"))
      .agg(sum(col("mention_count")).as("total_mentions"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 10)
      .groupBy(col("doc_id"))
      // collect_list order is partition-arrival order (nondeterministic
      // after the shuffle); sorting (rn, name) structs pins the list to
      // the rank order the window defined, so the output is exact-compare
      // stable across runs and engines
      .agg(transform(
        sort_array(collect_list(struct(col("rn"), col("entity_name")))),
        e => e("entity_name")).as("top_entities"))
    chunkCounts.join(topEntities, Seq("doc_id"), "left")
  }
}
