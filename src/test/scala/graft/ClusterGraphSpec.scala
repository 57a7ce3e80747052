package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SqDist
import graft.ops.{Clustering, Dedup, GraphMetrics, Sampling, Similarity}

/** Specs for the round-3 additions: k-means clustering, KG graph metrics,
  * corpus line dedup, int8 quantization and source-mix resampling.
  */
class ClusterGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // --------------------------------------------------------------- SqDist

  test("sq_dist matches the plain-loop definition and handles floats") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(0.0, 2.0, 5.0)), // 1 + 0 + 4 = 5
      (Array.empty[Double], Array(1.0, 2.0))        // min-length -> 0
    ).toDF("a", "b")
    val got = df.select(SqDist.sqDist(col("a"), col("b"))).as[Double].collect()
    assert(got.toSeq === Seq(5.0, 0.0))
    val f = Seq((Array(1.5f, -2.0f), Array(0.5f, 0.0f))).toDF("a", "b")
      .select(SqDist.sqDist(col("a"), col("b"))).as[Double].head()
    assert(f === (1.0 + 4.0))
  }

  // --------------------------------------------------------------- kmeans

  /** Two well-separated blobs around (0,0,..) and (10,10,..). */
  private def blobs(n: Int, dim: Int): org.apache.spark.sql.DataFrame =
    spark.range(n.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)), i =>
        (when(col("id") % 2 === 0, 0.0).otherwise(10.0) +
          // deterministic jitter in [0, 1): position- and id-dependent
          (pmod(xxhash64(col("id"), i), lit(1000L)).cast("double") / 1000.0))
          .cast("float")).as("embedding"))

  test("kmeans separates two blobs and is deterministic") {
    val e = blobs(40, 8)
    val a = Clustering.kmeans(e, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every even id clusters with vec 0, every odd id with vec 1
    assert(a.keySet.size === 40)
    val evenCluster = a(0L)
    val oddCluster = a(1L)
    assert(evenCluster !== oddCluster)
    a.foreach { case (id, c) =>
      assert(c === (if (id % 2 == 0) evenCluster else oddCluster),
        s"vec $id landed in $c")
    }
    val c1 = Clustering.kmeansCentroids(e, k = 2, iters = 3)
    val c2 = Clustering.kmeansCentroids(e, k = 2, iters = 3)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    // converged centroids sit near the blob centers (jitter mean ~0.5)
    val lo = c1.minBy(_.head)
    val hi = c1.maxBy(_.head)
    assert(lo.forall(v => v > 0.0 && v < 1.0), lo.toSeq.toString)
    assert(hi.forall(v => v > 10.0 && v < 11.0), hi.toSeq.toString)
  }

  test("kmeans: an emptied cluster keeps its previous centroid") {
    // seed = 3 smallest vec_ids; vector 1 duplicates vector 0, so every
    // point ties to both seed centroids and the cid tie-break sends them
    // all to cluster 0 — cluster 1 is empty from round 1 onward
    val e = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(50.0f, 50.0f)),
      (3L, Array(0.05f, 0.0f)),
      (4L, Array(50.1f, 50.0f))
    ).toDF("vec_id", "embedding")
    val cs = Clustering.kmeansCentroids(e, k = 3, iters = 2)
    assert(cs.length === 3)
    // the emptied cluster keeps its seed centroid, not null/NaN
    assert(cs(1).toSeq === Seq(0.0, 0.0))
    assert(cs.forall(c => c.forall(v => !v.isNaN)))
    val assigned = Clustering.kmeans(e, k = 3, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned(2L) === assigned(4L))
    // the retained (0,0) centroid legitimately recaptures the exact-zero
    // vectors in the following round; the duplicate pair must co-cluster
    // and the far blob must stay apart from them
    assert(assigned(1L) === assigned(0L))
    assert(assigned(0L) !== assigned(2L))
    assert(assigned(3L) !== assigned(2L))
  }

  test("kmeans/semDedup survive k larger than the vector count") {
    // the empty-cluster-heavy regime: k = 10 over 5 rows of which only 3
    // are distinct vectors. Seeding yields one centroid per ROW (duplicate
    // rows become duplicate centroids; the LIMIT caps at the row count),
    // assignment tie-breaks identical distances by cluster id, and every
    // emptied/never-filled cluster keeps its centroid through the updates
    // instead of dividing by zero.
    val e = Seq(
      // nonzero dup pairs: cosine(0-vector, anything) is 0 by the
      // zero-norm rule, which would NOT count as a semantic dup
      (0L, Seq(1.0f, 1.0f)), (1L, Seq(1.0f, 1.0f)),     // dup pair A
      (2L, Seq(10.0f, -10.0f)), (3L, Seq(10.0f, -10.0f)), // dup pair B
      (4L, Seq(-5.0f, -5.0f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeans(e, k = 10, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size === 5)
    // identical vectors tie on every distance -> same (lowest) cluster id
    assert(got(0L) === got(1L))
    assert(got(2L) === got(3L))
    assert(got(4L) != got(0L) && got(4L) != got(2L))
    // deterministic across runs
    val again = Clustering.kmeans(e, k = 10, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again === got)
    // semDedup in the same regime: each dup pair collapses to one kept
    // vector, the singleton survives
    val sd = Clustering.semDedup(e, k = 10, iters = 2, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(sd.count(_._2) === 3, sd.toString)
    assert(sd(4L), "the singleton must be kept")
    assert(sd(0L) ^ sd(1L), "exactly one of dup pair A survives")
    assert(sd(2L) ^ sd(3L), "exactly one of dup pair B survives")
  }

  test("semDedup keeps the farthest-from-centroid member of a dup set") {
    // one cluster (k=1): v0=v1 exact dups, v4 a scaled near-dup of both;
    // v2/v3 unrelated (cos 0.8 < 0.95). centroid = mean of all five ->
    // v0/v1 sit FARTHER from it than v4, so the paper's retention keeps
    // v0 (tie with v1 broken by smaller id) and drops v1 and v4
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f, 0.0f)),
      (4L, Array(0.98f, 0.199f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.semDedup(e, k = 1, iters = 1, threshold = 0.95)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(got(0L) === ((2L, true)), s"v0: ${got(0L)}")  // dominates both
    assert(got(1L) === ((2L, false)))                    // tie -> id0 wins
    assert(got(4L) === ((2L, false)))                    // closer to centroid
    assert(got(2L) === ((0L, true)))
    assert(got(3L) === ((0L, true)))
  }

  test("semDedup blocks by cluster: cross-cluster dups are not compared") {
    // two colinear pairs far apart; with k=2/iters=2 each pair is a
    // cluster. each vector's only tau-neighbor is its in-cluster twin
    // (cross-blob cosine is 0), so every n_dups is exactly 1 and one
    // vector per blob survives the tie-break
    val e = Seq(
      (0L, Array(10.0f, 0.0f)), (1L, Array(10.1f, 0.0f)),
      (2L, Array(0.0f, 10.0f)), (3L, Array(0.0f, 10.2f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.semDedup(e, k = 2, iters = 2, threshold = 0.999)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val byId = got.map(r => r._1 -> r).toMap
    // colinear in-blob pairs are exact cosine dups; across blobs cos = 0
    assert(byId(0L)._2 === byId(1L)._2 && byId(2L)._2 === byId(3L)._2)
    assert(byId(0L)._2 !== byId(2L)._2)
    assert(got.forall(_._3 === 1L), got.mkString(","))
    assert(got.count(_._4) === 2, got.mkString(","))
  }

  // -------------------------------------------------------- graph metrics

  private lazy val triEdges = Seq(
    // a-b-c triangle, plus pendant c-d, plus duplicate/reverse/self noise
    ("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
    ("b", "a"), ("a", "b"), ("d", "d")
  ).toDF("subj", "obj")

  test("degree histogram collapses duplicates, orientations, self-loops") {
    val hist = GraphMetrics.degreeHistogram(triEdges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // degrees: a=2 b=2 c=3 d=1 -> histogram {1:1, 2:2, 3:1}
    assert(hist === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("triangle stats count the one triangle") {
    val r = GraphMetrics.triangleStats(triEdges).head()
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 4L)
    assert(r.getAs[Long]("n_triangles") === 1L)
  }

  test("degree-ordered triangle count matches naive 3-join on a random graph") {
    // seeded pseudo-random graph: 40 nodes, ~p=0.2 via hash predicate
    val ids = spark.range(40).select(col("id"))
    val edges = ids.as("x").crossJoin(ids.as("y"))
      .select(col("x.id").as("subj"), col("y.id").as("obj"))
      .where(col("subj") < col("obj") &&
        pmod(xxhash64(col("subj"), col("obj"), lit(7)), lit(5L)) === 0)
      .select(concat(lit("n"), col("subj")).as("subj"),
        concat(lit("n"), col("obj")).as("obj"))
    val fast = GraphMetrics.triangleStats(edges).head().getAs[Long]("n_triangles")
    val e = GraphMetrics.canonicalEdges(edges).persist()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") &&
        col("e3.b") === col("e2.b"))
      .count()
    e.unpersist()
    assert(fast === naive, s"fast=$fast naive=$naive")
    assert(fast > 0, "degenerate test graph: no triangles")
  }

  // ----------------------------------------------------------- line dedup

  private lazy val lineDocs = Seq(
    (0L, "keep me alpha\nshared banner\nkeep me beta"),
    (1L, "shared banner\nunique middle\nshared footer"),
    (2L, "shared footer\nshared banner\nonly here"),
    (3L, "totally unique document")
  ).toDF("doc_id", "text")

  test("lineDedupStats flags cross-document lines only") {
    val got = Dedup.lineDedupStats(lineDocs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // banner in 3 docs, footer in 2 -> shared; everything else df=1
    assert(got(0L) === ((3L, 1L)))
    assert(got(1L) === ((3L, 2L)))
    assert(got(2L) === ((3L, 2L)))
    assert(got(3L) === ((1L, 0L)))
  }

  test("removeSharedLines rebuilds order-preserved scrubbed text") {
    val got = Dedup.removeSharedLines(lineDocs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) === "keep me alpha\nkeep me beta")
    assert(got(1L) === "unique middle")
    assert(got(2L) === "only here")
    assert(got(3L) === "totally unique document")
  }

  test("lineDedupStats kept_md5 digests the scrubbed text") {
    val stats = Dedup.lineDedupStats(lineDocs)
      .select(col("doc_id"), col("kept_md5"))
    val expect = Dedup.removeSharedLines(lineDocs)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("kept_md5"))
    assert(stats.except(expect).count() === 0)
    assert(expect.except(stats).count() === 0)
  }

  // --------------------------------------------------------- quantization

  test("int8 quantization: scale, reconstruction bound, zero vector") {
    val e = Seq(
      (0L, Array(127.0f, -63.5f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(e).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r0 = got(0L)
    assert(r0.getAs[Int]("n_dims") === 3)
    assert(r0.getAs[Double]("scale") === 1.0) // 127/127
    // q = [127, -64, 0] (HALF_UP away from zero at -63.5)
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("127,-64,0".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r0.getAs[String]("q_md5") === expectMd5)
    assert(r0.getAs[Double]("linf_err") <= 0.5 + 1e-9)
    val r1 = got(1L)
    assert(r1.getAs[Double]("scale") === 0.0)
    assert(r1.getAs[Double]("linf_err") === 0.0)
  }

  test("int8 quantization error is bounded by scale/2 on random vectors") {
    val e = spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(16)), i =>
        ((pmod(xxhash64(col("id"), i), lit(2001L)).cast("double") - 1000.0)
          / 250.0).cast("float")).as("embedding"))
    val bad = Similarity.quantizeInt8(e)
      .where(col("linf_err") > col("scale") / 2 + lit(1e-9))
      .count()
    assert(bad === 0)
  }

  // ----------------------------------------------------------- source mix

  test("sourceMixSample thins over-represented sources, keeps rare ones") {
    val docs = spark.range(1000).select(col("id").as("doc_id"),
      when(col("id") < 900, "web").otherwise("books").as("source"))
    val kept = Sampling.sourceMixSample(docs,
      weights = Map("web" -> 0.5, "books" -> 0.5))
    val bySource = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // books: w*N/n = 0.5*1000/100 = 5 -> capped at 1 -> all 100 kept
    assert(bySource("books") === 100L)
    // web: 0.5*1000/900 = 0.5556 -> ~500 of 900 kept (md5-uniform)
    assert(bySource("web") > 450L && bySource("web") < 650L,
      bySource.toString)
    val fracs = kept.select("source", "keep_frac").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fracs("books") === 1.0)
    assert(math.abs(fracs("web") - 0.555556) < 1e-6)
    // determinism: same input -> identical kept set
    val again = Sampling.sourceMixSample(docs,
      weights = Map("web" -> 0.5, "books" -> 0.5))
    assert(kept.select("doc_id").except(again.select("doc_id")).count() === 0)
    assert(again.select("doc_id").except(kept.select("doc_id")).count() === 0)
  }

  // ---------------------------------------------------- label propagation

  test("labelPropagation matches the hand-run on two bridged triangles") {
    // triangles {1,2,3} and {10,11,12}, bridge 3-10; edges in mixed
    // orientation with a duplicate to exercise canonicalization
    val edges = Seq((1L, 2L), (3L, 1L), (2L, 3L), (10L, 11L), (12L, 10L),
      (11L, 12L), (3L, 10L), (10L, 3L)).toDF("subj", "obj")
    // hand-run, synchronous, ties -> smallest label:
    // r1: 1->2, 2->1, 3->1, 10->3, 11->10, 12->10
    // r2: 1->1, 2->1, 3->1, 10->10, 11->3, 12->3
    val got = GraphMetrics.labelPropagation(edges, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 3L, 12L -> 3L))
    // rounds = 0 is the identity labeling
    val id0 = GraphMetrics.labelPropagation(edges, rounds = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(id0 === Map(1L -> 1L, 2L -> 2L, 3L -> 3L,
      10L -> 10L, 11L -> 11L, 12L -> 12L))
  }

  // -------------------------------------------------------- dup n-grams

  test("dupNgramStats computes per-doc duplicated-window coverage") {
    val docs = Seq(
      (0L, "a b c d e"),     // windows: "a b c" "b c d" "c d e"
      (1L, "x a b c d y"),   // shares "a b c" (pos 1), "b c d" (pos 2)
      (2L, "p q")            // shorter than the window -> zero windows
    ).toDF("doc_id", "text")
    val got = Dedup.dupNgramStats(docs, n = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // d0: dup windows at pos 0,1 -> covered {0,1,2,3} of 5 tokens
    assert(got(0L) === ((5L, 3L, 2L, 0.8)))
    // d1: dup windows at pos 1,2 -> covered {1,2,3,4} of 6 tokens
    assert(got(1L) === ((6L, 4L, 2L, 0.666667)))
    assert(got(2L) === ((2L, 0L, 0L, 0.0)))
  }
}
