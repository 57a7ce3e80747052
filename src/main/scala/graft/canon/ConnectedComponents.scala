package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative DataFrame connected components over the validated duplicate-
  * pair graph — the distributed replacement for the reference's in-memory
  * Union-Find (entity_deduplication.py:490-530), per the north rule
  * ("canonicalization runs as iterative DataFrame self-joins computing
  * connected components ... salted keys for hot-entity skew").
  *
  * Algorithm: min-label propagation. label(v) starts as v (labels ARE
  * entity ids, so the converged label is the group's min entity_id — the
  * deterministic canonical-representative rule of SURVEY §7.4.3). Each
  * round: label(v) <- min(label(v), min over neighbors u of label(u)).
  * Converges in O(diameter) rounds; alias groups are shallow (diameter
  * <= ~4) so <= maxIters=20 with an assertion. Each round's result is
  * localCheckpoint()ed to truncate lineage (mandatory for iterative DF
  * algorithms — otherwise the plan doubles per round). Hot vertices are a
  * groupBy min — map-side partial aggregation + AQE handle skew; no
  * explicit salting is needed because min() is associative.
  */
object ConnectedComponents {

  /** @param edges DataFrame with string columns (id1, id2), undirected.
    * @return (id, component) for every vertex appearing in edges.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val bi = edges.select(col("id1").as("src"), col("id2").as("dst"))
      .union(edges.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = bi.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val viaNeighbors = bi
        .join(labels.withColumnRenamed("id", "dst2"),
          bi("dst") === col("dst2"))
        .select(col("src").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(viaNeighbors)
        .groupBy("id").agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.component") =!= col("o.component"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIters iterations")
    bi.unpersist()
    labels
  }
}
