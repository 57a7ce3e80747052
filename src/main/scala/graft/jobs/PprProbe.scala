package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Pipeline
import graft.ingest.SpanChunker
import graft.retrieval.Ppr

/** Phase-timing probe for the forced-distributed PPR path (the
  * `kg_ppr_dist` gate query): times seeds / induced subgraph / power
  * iteration / chunk scoring separately so the loop's wall clock is
  * attributable. Run with GRAFT_PPR_TRACE=1 for per-iteration timing.
  */
object PprProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 20000L
    val spark = SparkSession.builder()
      .master("local[32]").appName("ppr-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val r = t("pipeline") {
      val res = Pipeline.runSynth(spark, nDocs, 42L,
        SpanChunker.Config(200, 40))
      res.edges.persist().count(); res.nodes.persist().count()
      res.mentionsFinal.persist().count(); res
    }
    for (_ <- 1 to 2) {
      val s = t("seeds") {
        val x = Ppr.seeds(r.nodes, Seq("Skyline Systems")).persist()
        x.count(); x
      }
      val edges = r.edges.select(col("subj"), col("pred"), col("obj"))
      val sub = t("inducedSubgraph") {
        val x = Ppr.inducedSubgraph(edges, s).persist(); x.count(); x
      }
      val ppr = t("scores") {
        val x = Ppr.scores(spark, sub, s, localEdgeCap = 0L); x.count(); x
      }
      t("scoreChunks") {
        Ppr.scoreChunks(r.mentionsFinal, ppr, topK = 20).collect()
      }
      s.unpersist(); sub.unpersist()
    }
    spark.stop()
  }
}
