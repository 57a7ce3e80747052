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

  /** Dot product of two array columns (double accumulation). */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normCol(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; zero-norm → 0 (matches the reference
    * _cosine_similarity, entity_deduplication.py:558-571).
    */
  def cosineCol(a: Column, b: Column): Column = {
    val denom = normCol(a) * normCol(b)
    when(denom === 0.0, 0.0).otherwise(dotCol(a, b) / denom)
  }

  /** Compiled cosine kernel for PAIR-JOIN paths: higher-order-function
    * columns are interpreted per row (no codegen), which at millions of
    * candidate pairs is ~10x slower than this plain loop. Same math and
    * accumulation order as cosineCol, zero-norm → 0.
    */
  val cosineUdfD = udf { (a: Seq[Double], b: Seq[Double]) =>
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val len = math.min(a.length, b.length)
    while (i < len) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Deterministic pseudo-random hyperplane component for sign-LSH:
    * plane p, dimension i → a value in [-1, 1) derived from xxhash64.
    */
  private def planeComponent(p: Column, i: Column): Column =
    (pmod(xxhash64(concat_ws(":", p.cast("string"), i.cast("string"))),
      lit(1000003L)).cast("double") / lit(500001.5)) - lit(1.0)

  /** Sign-LSH bucket id: one bit per hyperplane = sign of the projection. */
  def signLshBucket(embedding: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(embedding, sequence(lit(0), size(embedding) - 1),
          (v, i) => v.cast("double") * planeComponent(lit(p), i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

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
