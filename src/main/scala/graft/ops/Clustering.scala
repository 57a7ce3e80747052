package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SqDist

/** Distributed k-means (Lloyd's algorithm) over an embedding column —
  * the coarse-quantizer / domain-clustering step of a training-data
  * pipeline (IVF cell training, topic bucketing, DoReMi-style domain
  * discovery all start here).
  *
  * Everything is deterministic so runs are reproducible and
  * oracle-checkable:
  *   - init: the k corpus vectors with the smallest `vec_id` (cluster id =
  *     rank by vec_id, 0-based);
  *   - assignment: argmin squared Euclidean distance, ties broken by
  *     cluster id ascending;
  *   - update: per-dimension mean of the assigned vectors, each component
  *     rounded HALF_UP to 6dp (rounding pins the centroids to values every
  *     engine reproduces bit-identically, so cross-engine ulp drift cannot
  *     compound across iterations);
  *   - an emptied cluster keeps its previous centroid.
  *
  * Plan shape at scale: assignment is one narrow codegen'd projection — k
  * native SqDist kernels per row (graft.functions.SqDist), argmin via
  * array_min over (d2, cid) structs, no shuffle, no UDF. The update is one
  * posexplode → (cluster, dim) partial-aggregated groupBy — k·dim result
  * rows — collected to the driver (bounded: k×dim doubles, exactly the
  * IVF-centroid pattern) and re-broadcast as literals for the next round.
  * Iterations cost one corpus pass each; nothing driver-side grows with
  * the corpus.
  */
object Clustering {

  /** Embeddings with the vector column cast to array<double>. */
  private def base(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))

  /** Deterministic seed: the k vectors with the smallest vec_id; cluster
    * id = 0-based rank by vec_id. Components rounded like every update so
    * iteration 0 plays by the same cross-engine rules.
    */
  def seedCentroids(embeddings: DataFrame, k: Int): Array[Array[Double]] =
    seedFromBase(base(embeddings), k)

  private def seedFromBase(baseDf: DataFrame, k: Int): Array[Array[Double]] =
    baseDf
      .orderBy(col("vec_id").asc)
      .limit(k)
      .collect()
      .map(_.getSeq[Double](1).toArray.map(round6))

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Assignment under fixed centroids: (vec_id, emb, cluster, d2), cluster
    * = argmin_i ‖emb − cᵢ‖² with cluster-id tie-break (struct ordering of
    * (d2, cid)). One codegen'd projection, no shuffle.
    */
  def assign(embeddings: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    assignBase(base(embeddings), centroids)

  private def assignBase(baseDf: DataFrame,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "no centroids")
    val dists = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(SqDist.sqDist(col("emb"), typedLit(c.toSeq)).as("d2"),
        lit(i).as("cid"))
    }: _*)
    baseDf
      .withColumn("best", array_min(dists))
      .select(col("vec_id"), col("emb"),
        col("best.cid").as("cluster"), col("best.d2").as("d2"))
  }

  /** One Lloyd update: per-(cluster, dimension) mean of the assigned
    * vectors, rounded to 6dp; clusters with no members keep `prev`'s
    * centroid. The groupBy result is k·dim rows — bounded independent of
    * corpus size.
    */
  def updateCentroids(assigned: DataFrame,
      prev: Array[Array[Double]]): Array[Array[Double]] = {
    val means = assigned
      .select(col("cluster"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(r => round6(r.getDouble(2)))
      }
    prev.indices.map(i => means.getOrElse(i, prev(i))).toArray
  }

  /** `iters` full Lloyd rounds from the deterministic seed, then the final
    * assignment: (vec_id, cluster, d2).
    */
  def kmeans(embeddings: DataFrame, k: Int, iters: Int,
      roundTo: Int = 4): DataFrame = {
    require(k > 0 && iters >= 0, "k > 0, iters >= 0 required")
    val cached = base(embeddings).persist()
    try {
      var cs = seedFromBase(cached, k)
      var it = 0
      while (it < iters) {
        cs = updateCentroids(assignBase(cached, cs), cs)
        it += 1
      }
      assignBase(cached, cs)
        .select(col("vec_id"), col("cluster"),
          round(col("d2"), roundTo).as("d2"))
    } finally cached.unpersist()
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication via k-means blocking — cluster the embeddings, then
    * compare pairs only WITHIN a cluster and drop all but one of every
    * semantic-duplicate set. Retention follows the paper: within a
    * duplicate pair, the point FARTHER from its centroid survives (low
    * centroid-similarity ⇒ keeps the cluster's diversity), ties broken
    * by smaller vec_id. Deterministic contract for the oracle:
    *   - clusters/d2 from [[kmeans]]'s seed + `iters` Lloyd rounds, d2
    *     rounded to 4dp before any comparison;
    *   - a pair duplicates iff round₆(cosine) ≥ threshold;
    *   - vec v is dropped iff some same-cluster τ-neighbor u has
    *     (d2_u > d2_v) ∨ (d2_u = d2_v ∧ id_u < id_v).
    * Output one row per vector: (vec_id, cluster, n_dups, kept).
    *
    * Plan shape at scale: the quadratic is confined to clusters — k is
    * the blocking knob and grows with the corpus (the paper runs k=50k
    * on LAION; cost per cluster is |c|²·dim inside one hash-join probe,
    * cosine evaluated by the native codegen kernel at probe time). The
    * self-join shuffles (cluster, id, emb) once on the cluster key; AQE
    * skew-join splits oversized clusters.
    */
  def semDedup(embeddings: DataFrame, k: Int, iters: Int,
      threshold: Double): DataFrame = {
    val cs = kmeansCentroids(embeddings, k, iters)
    val a = assignBase(base(embeddings), cs)
      .select(col("vec_id"), col("emb"), col("cluster"),
        round(col("d2"), 4).as("rd2"))
    val l = a.select(col("cluster"), col("vec_id").as("id1"),
      col("emb").as("e1"), col("rd2").as("r1"))
    val r = a.select(col("cluster"), col("vec_id").as("id2"),
      col("emb").as("e2"), col("rd2").as("r2"))
    val pairs = l.join(r, Seq("cluster"))
      .where(col("id1") =!= col("id2") &&
        round(Similarity.cosineKernel(col("e1"), col("e2")), 6) >=
          lit(threshold))
    val stats = pairs
      .groupBy(col("id1").as("vec_id"))
      .agg(count(lit(1)).as("n_dups"),
        max(when(col("r2") > col("r1") ||
          (col("r2") === col("r1") && col("id2") < col("id1")),
          1).otherwise(0)).as("dominated"))
    a.select(col("vec_id"), col("cluster"))
      .join(stats, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (coalesce(col("dominated"), lit(0)) === 0).as("kept"))
  }

  /** Final centroids only (for persisting a model / seeding IVF cells). */
  def kmeansCentroids(embeddings: DataFrame, k: Int,
      iters: Int): Array[Array[Double]] = {
    val cached = base(embeddings).persist()
    try {
      var cs = seedFromBase(cached, k)
      var it = 0
      while (it < iters) {
        cs = updateCentroids(assignBase(cached, cs), cs)
        it += 1
      }
      cs
    } finally cached.unpersist()
  }
}
