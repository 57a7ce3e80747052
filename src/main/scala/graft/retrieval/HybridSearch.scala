package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid fusion (reference retrieval/hybrid_search.py:34-163): vector and
  * graph result lists combined with Reciprocal Rank Fusion —
  * score(d) = Σᵢ wᵢ / (k + rankᵢ(d)), k = 60, weights (α, 1−α), α = 0.5
  * (settings.py:58-65). α = 1 short-circuits to vector-only, α = 0 to
  * graph-only.
  *
  * Shape: each input is already a small top-(k·multiplier) frame, so the
  * fusion is a union + one aggregation over ≤ 2·k·multiplier rows — the
  * rank windows are single-partition by construction (tiny inputs), never
  * run over base tables.
  */
object HybridSearch {

  val RrfK = 60
  val DefaultAlpha = 0.5
  val Multiplier = 2

  private def withRank(df: DataFrame): DataFrame =
    df.withColumn("rank", row_number().over(
      Window.orderBy(col("score").desc, col("chunk_id").asc)))

  /** RRF-fuse two ranked lists on chunk_id. Inputs need (chunk_id, score).
    * Output schema is (chunk_id, rrf_score) on EVERY path — the alpha
    * extremes used to return the input frame with its original `score`
    * column, so a caller selecting `rrf_score` broke only when alpha hit
    * 0/1 (on the short-circuits rrf_score carries the single leg's own
    * score, matching the reference's vector-/graph-only passthrough).
    */
  def rrf(vector: DataFrame, graph: DataFrame, topK: Int = 10,
      alpha: Double = DefaultAlpha, k: Int = RrfK): DataFrame = {
    if (alpha >= 1.0)
      return vector.orderBy(col("score").desc, col("chunk_id").asc).limit(topK)
        .select(col("chunk_id"), col("score").cast("double").as("rrf_score"))
    if (alpha <= 0.0)
      return graph.orderBy(col("score").desc, col("chunk_id").asc).limit(topK)
        .select(col("chunk_id"), col("score").cast("double").as("rrf_score"))
    val v = withRank(vector).select(col("chunk_id"),
      (lit(alpha) / (lit(k) + col("rank"))).as("contrib"))
    val g = withRank(graph).select(col("chunk_id"),
      (lit(1.0 - alpha) / (lit(k) + col("rank"))).as("contrib"))
    v.unionByName(g)
      .groupBy(col("chunk_id"))
      .agg(sum(col("contrib")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("chunk_id").asc)
      .limit(topK)
  }

  /** Rerank-to-topK over wider inputs (hybrid_search.py:165-204). The
    * reference's OVER-FETCH — each leg retrieving `fetchK` = 50 before the
    * fusion — happens at the CALLER, which passes legs already limited to
    * fetchK (TemporalRetrieval does); this function only fuses the legs it
    * is given at depth fetchK and keeps topK by the fused score. Passing
    * un-widened top-topK legs makes fetchK a no-op by construction.
    */
  def searchWithReranking(vector: DataFrame, graph: DataFrame,
      topK: Int = 10, fetchK: Int = 50,
      alpha: Double = DefaultAlpha): DataFrame =
    rrf(vector, graph, fetchK, alpha).limit(topK)

  /** Result-set overlap diagnostics (hybrid_search.py:206-263): ids in
    * both / vector-only / graph-only.
    */
  def explainResults(vector: DataFrame, graph: DataFrame): DataFrame = {
    val v = vector.select(col("chunk_id"))
    val g = graph.select(col("chunk_id"))
    val both = v.intersect(g).withColumn("bucket", lit("both"))
    val vOnly = v.except(g).withColumn("bucket", lit("vector_only"))
    val gOnly = g.except(v).withColumn("bucket", lit("graph_only"))
    both.unionByName(vOnly).unionByName(gOnly)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
  }
}
