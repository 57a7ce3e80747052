package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exact baseline (a single
  * narrow projection + one top-k, no shuffle until the final ordering);
  * sign-LSH bucketing is the scale path (probe only matching buckets).
  * All vector math is `zip_with`/`aggregate` column algebra in double
  * precision — codegen'd, no UDFs.
  */
object Similarity {

  /** Cosine similarity; zero-norm → 0 (matches the reference
    * _cosine_similarity, entity_deduplication.py:558-571). Delegates to the
    * native codegen expression — identical per-index widening and
    * accumulation order as the dotCol/normCol column algebra, so results
    * are bit-for-bit equal, at plain-loop speed.
    */
  def cosineCol(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosineSim(a, b)

  /** Compiled cosine kernel for PAIR-JOIN paths: higher-order-function
    * columns are interpreted per row (no codegen), ~10x slower than a plain
    * loop at millions of candidate pairs, and a Scala UDF pays Seq boxing
    * per call on top — this is the native codegen expression
    * (graft.functions.CosineSim) reading unsafe array data directly. Same
    * math and accumulation order as cosineCol, zero-norm → 0.
    */
  def cosineKernel(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosineSim(a, b)

  /** Sign-LSH bucket id: one bit per hyperplane = sign of the projection
    * onto a deterministic pseudo-random plane (native codegen expression,
    * graft.functions.SignLsh).
    */
  def signLshBucket(embedding: Column, planes: Int): Column =
    graft.functions.SignLsh.signLsh(embedding, planes)

  /** Exact brute-force cosine top-k neighbors of one query vector.
    * The scan is a narrow projection; the only shuffle is the final
    * ordering of k rows (Spark turns orderBy+limit into TakeOrdered —
    * no full sort).
    */
  def bruteForceTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
      excludeId: Option[Long] = None, roundTo: Int = 6): DataFrame = {
    val q = typedLit(query)
    val base = excludeId.map(id => embeddings.where(col("vec_id") =!= id))
      .getOrElse(embeddings)
    base.select(col("vec_id"),
        round(cosineCol(col("embedding"), q), roundTo).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-style bucketed ANN: probe only vectors whose sign-LSH bucket
    * matches the query's bucket (plus optional 1-bit-flip probes for
    * recall), then exact cosine within the probed set. At 100 TB the
    * embeddings table is stored partitioned by bucket, so probing is
    * partition pruning, not a scan.
    */
  def lshTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
      planes: Int = 8, multiProbe: Boolean = true, roundTo: Int = 6,
      excludeId: Option[Long] = None): DataFrame = {
    val q = typedLit(query)
    val base = excludeId.map(id => embeddings.where(col("vec_id") =!= id))
      .getOrElse(embeddings)
    val withBucket = base.select(col("vec_id"), col("embedding"),
      signLshBucket(col("embedding"), planes).as("bucket"))
    val qBucket = signLshBucket(q, planes)
    val probeSet = if (multiProbe)
      array((0 until planes).map(p =>
        qBucket.bitwiseXOR(shiftleft(lit(1L), p))) :+ qBucket: _*)
    else array(qBucket)
    withBucket
      .where(array_contains(probeSet, col("bucket")))
      .select(col("vec_id"),
        round(cosineCol(col("embedding"), q), roundTo).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }
}
