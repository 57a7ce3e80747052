package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative DataFrame connected components over the validated duplicate-
  * pair graph — the distributed replacement for the reference's in-memory
  * Union-Find (entity_deduplication.py:490-530), per the north rule
  * ("canonicalization runs as iterative DataFrame self-joins computing
  * connected components ... salted keys for hot-entity skew").
  *
  * Algorithm: min-label propagation with pointer doubling. label(v) starts
  * as v (labels ARE entity ids, so the converged label is the group's min
  * entity_id — the deterministic canonical-representative rule of SURVEY
  * §7.4.3). Each round: (hook) label(v) <- min(label(v), min over
  * neighbors u of label(u)); then (jump) label(v) <- label(label(v)) —
  * the path-compression step that turns O(diameter) convergence into
  * O(log diameter), needed because similarity chains over value-typed
  * entities (dates, amounts) can be hundreds of hops long at scale.
  *
  * Physical shape per round: the label table is orders of magnitude
  * smaller than the corpus (it is the entity-vertex set), so when it fits
  * the broadcast budget every join in the round is a broadcast-hash join —
  * the big edge table is NEVER reshuffled across iterations (it is
  * partitioned once, up front) and a round costs two small jobs. Above the
  * budget the joins fall back to Spark's shuffle path on the same plan.
  * Each round's result is localCheckpoint()ed to truncate lineage
  * (mandatory for iterative DF algorithms — the plan would double per
  * round). Hot vertices are a groupBy min — map-side partial aggregation +
  * AQE handle skew; min() is associative so no explicit salting is needed.
  */
object ConnectedComponents {

  /** Vertex count under which the label table is broadcast each round. */
  val BroadcastVertexCap = 500000L

  /** Edge count under which the duplicate-pair graph is pulled to the
    * driver and solved with in-memory Union-Find — the reference's own
    * execution model (entity_deduplication.py:490-530 runs union-find in
    * memory), and the same precedent as Ppr.LocalEdgeCap. The dup-pair
    * graph is the ACCEPTED-duplicate set (post-verdict), orders of
    * magnitude smaller than the entity table, so this is the common case;
    * bigger graphs take the distributed label-propagation loop below with
    * identical results (both converge to min-entity-id labels). The
    * iterative loop costs ~2 driver round-trips per round regardless of
    * data size — a fixed ~10 s that would dominate wall clock (and wreck
    * scaling efficiency) whenever the graph is small.
    */
  val LocalEdgeCap = 200000L

  /** In-memory Union-Find with path compression; roots merge min-under-max
    * so every root is its component's min id (the canonical rule).
    */
  def unionFindLocal(pairs: Array[(String, String)]): Seq[(String, String)] = {
    val parent = scala.collection.mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      parent.getOrElseUpdate(x, x)
      var root = x
      while (parent(root) != root) root = parent(root)
      var cur = x
      while (parent(cur) != cur) {
        val nxt = parent(cur); parent(cur) = root; cur = nxt
      }
      root
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keysIterator.map(k => (k, find(k))).toSeq
  }

  /** @param edges DataFrame with string columns (id1, id2), undirected.
    * @return (id, component) for every vertex appearing in edges.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIters: Int = 30,
      localEdgeCap: Long = LocalEdgeCap): DataFrame = {
    import spark.implicits._
    // path choice on the RAW pair count (2x is an upper bound on the
    // bidirectional-distinct edge count): building the distinct'd
    // bidirectional table just to decide the path cost a full extra
    // shuffle+job, all serial-fraction in the scaling bench
    val nPairs = edges.count()
    if (nPairs * 2 <= localEdgeCap) {
      val pairs = edges.select(col("id1"), col("id2")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      return unionFindLocal(pairs).toDF("id", "component")
    }
    val bi0 = edges.select(col("id1").as("src"), col("id2").as("dst"))
      .union(edges.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
    val nEdges = bi0.count()
    // size the iteration's partitioning by the data, not the session: tiny
    // graphs otherwise pay hundreds of empty tasks per round
    val parts = math.max(2, math.min(spark.sparkContext.defaultParallelism,
      (nEdges / 50000L).toInt + 1))
    // scope the loop's shuffle width + AQE to the data as well (same
    // rationale and restore discipline as Ppr.scores): each round's groupBy
    // would otherwise exchange at session width with AQE re-planning every
    // tiny stage
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    // localCheckpoint (not persist): also truncates the edge table's
    // lineage — the caller's plan can embed the whole upstream construct
    // DAG, which every round's actions would otherwise re-stringify into
    // the SQL-execution event (minutes of driver CPU at scale-0 caps)
    val bi = bi0.repartition(parts, col("dst")).localCheckpoint(true)

    var labels = bi.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    val nVertices = labels.count()
    def maybeBcast(df: DataFrame): DataFrame =
      if (nVertices <= BroadcastVertexCap) broadcast(df) else df

    // pointer doubling: label(v) <- label(label(v)). The invariant
    // label(x) <= x makes the looked-up label never larger, but least()
    // keeps the step monotone regardless. Applied as a broadcast self-join;
    // identical exchange subplans are deduplicated by ReuseExchange, so
    // chaining two jumps inside one job costs one extra hash lookup, not a
    // recompute.
    def jump(df: DataFrame): DataFrame = {
      val to = df.select(col("id").as("jid"), col("component").as("jcomp"))
      df.join(maybeBcast(to), df("component") === col("jid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("jcomp"), col("component")))
            .as("component"))
    }

    var iter = 0
    var converged = false
    var prevCk: DataFrame = null
    while (!converged && iter < maxIters) {
      val viaNeighbors = bi
        .join(maybeBcast(labels.withColumnRenamed("id", "dst2")),
          bi("dst") === col("dst2"))
        .select(col("src").as("id"), col("component"))
      val hooked = labels.select(col("id"), col("component"))
        .union(viaNeighbors)
        .groupBy("id").agg(min(col("component")).as("component"))
      // hook + jump twice, then ONE driver action per round: the old-label
      // comparison rides the round's frame as a `chg` column (broadcast
      // join against the previous labels), the checkpoint is LAZY, and the
      // single sum(chg) aggregate both materializes it and answers the
      // convergence probe — every round, where the old separate limit(1)
      // probe cost a second round-trip and only ran every other round
      val next = jump(jump(hooked))
        .join(maybeBcast(labels.select(col("id").as("oid"),
          col("component").as("ocomp"))), col("id") === col("oid"))
        .select(col("id"), col("component"),
          (col("component") =!= col("ocomp")).cast("long").as("chg"))
        .localCheckpoint(false)
      val changed = next.agg(coalesce(sum(col("chg")), lit(0L)))
        .head().getLong(0)
      converged = changed == 0
      // the previous round's checkpoint blocks are dead once the new one
      // is materialized (the new labels' plan references only `next`)
      if (prevCk != null) prevCk.unpersist()
      prevCk = next
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIters iterations")
    bi.unpersist()
    labels

    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
