package graft

import org.apache.spark.sql.SparkSession

import graft.ingest.SpanChunker

/** Benchmark main. Prints ONE JSON line:
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *    "scaling":{...}}
  *
  * Two parts:
  *   1. headline queries from SparkEntry.queries on SPARK_GRAFT_SF_DIR at
  *      local[SPARK_GRAFT_CPUS];
  *   2. the north-rule scaling evidence: the full KG construction pipeline
  *      on the identical synthetic corpus at local[8] vs local[32]
  *      (sandbox proxy for N vs 4N executors per BASELINE.md), reporting
  *      docs/sec at both and efficiency = (T_8 / T_32) / 4.
  */
object Bench {

  private def timeSec[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One full pipeline pass; returns wall seconds (synth → canonical edges
    * count, forcing every stage).
    */
  private def pipelineOnce(cores: Int, nDocs: Long): Double = {
    val s = session(cores)
    try {
      timeSec {
        val r = Pipeline.runSynth(s, nDocs, seed = 42L,
          cfg = SpanChunker.Config(200, 40), partitions = cores * 2)
        r.edges.count()
        r.nodes.count()
        r.mentionsFinal.count()
        r.chunks.unpersist()
      }
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "20000").toLong

    // part 1: headline queries
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try {
        timeSec(fn(spark, sfDir).count())
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
      name -> sec
    }
    spark.stop()

    // part 2: scaling evidence (identical code + input, two parallelism
    // levels; warm-up pass first so JIT/classloading doesn't pollute T_8)
    pipelineOnce(8, math.max(benchDocs / 10, 500L))
    val t8 = pipelineOnce(8, benchDocs)
    val t32 = pipelineOnce(32, benchDocs)
    val efficiency = (t8 / t32) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val scaling =
      f"""{"pipeline_docs":$benchDocs,"t_local8_sec":$t8%.3f,""" +
      f""""t_local32_sec":$t32%.3f,"docs_per_sec_8":${benchDocs / t8}%.1f,""" +
      f""""docs_per_sec_32":${benchDocs / t32}%.1f,""" +
      f""""speedup_8_to_32":${t8 / t32}%.3f,"efficiency":$efficiency%.3f}"""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","scaling":$scaling%s}""")
  }
}
