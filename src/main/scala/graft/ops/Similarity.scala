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

  /** Sign-LSH bucketed ANN: probe only vectors whose sign-LSH bucket
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

  /** IVF-flat ANN: a deterministic coarse quantizer — centroids are the
    * `numCentroids` corpus vectors with the smallest xxhash64(vec_id), a
    * uniform deterministic sample — assigns every vector to its
    * highest-cosine centroid (its CELL); a query probes only its `nProbe`
    * nearest cells, then scores exact cosine inside them.
    *
    * Scale posture: at 100 TB the embeddings table is written partitioned
    * by cell id, so probing nProbe of numCentroids cells is partition
    * pruning — the scan touches nProbe/numCentroids of the data. Assignment
    * is one narrow codegen'd projection (numCentroids CosineSim kernels per
    * row); the centroid sample is a bounded driver collect (numCentroids ×
    * dim doubles).
    *
    * Recall contract: cosine is scale-invariant, so positively-scaled
    * copies of the query share its cosine profile against every centroid —
    * near-ties in the argmax can only move a copy to a cell whose centroid
    * is ~equally close to the query, which the nProbe probe set covers.
    * The q_ann_ivf oracle (exact brute-force top-k over a corpus seeded
    * with true neighbors) checks exactly this.
    */
  /** Symmetric int8 scalar quantization of the embedding column — the
    * standard 4× ANN-index shrink (FAISS SQ8): per vector,
    * scale = max|xᵢ|/127 and qᵢ = round(xᵢ/scale) ∈ [−127, 127]; a
    * zero vector quantizes to scale 0, q all-zero.
    *
    * Emits the audit row a pipeline materializes next to the quantized
    * index: (vec_id, n_dims, scale, q_md5, linf_err) where q_md5 digests
    * the comma-joined int codes (the payload without shipping it to the
    * gate) and linf_err = max|xᵢ − qᵢ·scale| is the worst per-component
    * reconstruction error (bounded by scale/2 — the property QuantSpec
    * asserts). Pure column algebra over the array — codegen'd, one narrow
    * pass, no shuffle, no UDF; scale/linf rounded (8/6dp) so the oracle
    * compares engine-portable values.
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val emb = transform(col("embedding"), x => x.cast("double"))
    val maxAbs = array_max(transform(emb, x => abs(x)))
    val scale = maxAbs / 127.0
    val q = when(maxAbs > 0.0,
      transform(emb, x => round(x / scale, 0).cast("bigint")))
      .otherwise(transform(emb, _ => lit(0L)))
    val linf = when(maxAbs > 0.0,
      array_max(zip_with(emb, q, (x, qq) => abs(x - qq * scale))))
      .otherwise(lit(0.0))
    embeddings.select(col("vec_id"),
      size(col("embedding")).as("n_dims"),
      round(scale, 8).as("scale"),
      md5(concat_ws(",", q).cast("binary")).as("q_md5"),
      round(linf, 6).as("linf_err"))
  }

  def ivfTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
      numCentroids: Int = 16, nProbe: Int = 4, roundTo: Int = 6,
      excludeId: Option[Long] = None): DataFrame = {
    require(nProbe >= 1 && nProbe <= numCentroids)
    // deterministic centroid sample (vec_id tiebreak for stability)
    val centroids: Array[Array[Double]] = embeddings
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("emb"))
      .orderBy(xxhash64(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(numCentroids)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    def cosLocal(a: Seq[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
    val probeCells: Seq[Int] = centroids.zipWithIndex
      .map { case (c, i) => (cosLocal(query, c), i) }
      .sortBy { case (s, i) => (-s, i) }
      .take(nProbe).map(_._2 + 1) // 1-based, matching array_position below
    val cellCosines = array(centroids.map(c =>
      cosineCol(col("embedding"), typedLit(c.toSeq))): _*)
    val q = typedLit(query)
    val base = excludeId.map(id => embeddings.where(col("vec_id") =!= id))
      .getOrElse(embeddings)
    base
      .withColumn("cell",
        array_position(cellCosines, array_max(cellCosines)).cast("int"))
      .where(col("cell").isin(probeCells: _*))
      .select(col("vec_id"),
        round(cosineCol(col("embedding"), q), roundTo).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }
}
