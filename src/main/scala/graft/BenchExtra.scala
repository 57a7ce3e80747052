package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimization-round isolation bench (guide §1.4): times individual
  * SparkEntry queries with BOTH the driver Bench's action (`.count()`)
  * and a noop sink (forces every column), and optionally dumps
  * `.explain("formatted")` per query so plan claims are checkable.
  *
  * This main is SEPARATE from graft.Bench on purpose — Bench.scala is
  * frozen for measurement; every number cited from here is labelled as
  * BenchExtra in OPTIMIZATION_r06.md.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... scripts/run_main.sh graft.BenchExtra \
  *     [--plans OUTDIR] [--reps N] [--noop] [query ...]
  * With no query names, runs every SparkEntry query (builds first, like
  * Bench). `--plans DIR` writes DIR/<query>.txt explain dumps.
  */
object BenchExtra {

  private def timeSec[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    var plansDir: Option[String] = None
    var reps = 1
    var noop = false
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--noop" => noop = true; i += 1
        case q => names += q; i += 1
      }
    }

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    plansDir.foreach(d => Files.createDirectories(Paths.get(d)))

    def dumpPlan(name: String, df: DataFrame): Unit = plansDir.foreach { d =>
      val txt =
        try df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: ${e.getMessage}" }
      Files.write(Paths.get(d, s"$name.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
    }

    val all = SparkEntry.queries
    val selected =
      if (names.isEmpty) all.keys.toSeq.sorted
      else names.toSeq

    // builds first, timed, mirroring Bench's attribution
    val buildTimes = scala.collection.mutable.LinkedHashMap[String, Double]()
    buildTimes("kg_pipeline_build") = timeSec(SparkEntry.warmKg(spark, sfDir))
    buildTimes("dedup_shingle_build") =
      timeSec(SparkEntry.warmShingles(spark, sfDir))
    buildTimes("media_features_build") =
      timeSec(SparkEntry.warmMedia(spark, sfDir))
    buildTimes.foreach { case (n, t) => println(f"$n%-28s $t%8.3f s (build)") }

    selected.foreach { name =>
      all.get(name) match {
        case None => System.err.println(s"[bench-extra] unknown query: $name")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"bench-extra: $name")
          var best = Double.MaxValue
          var bestNoop = Double.MaxValue
          (1 to reps).foreach { _ =>
            val t = timeSec(fn(spark, sfDir).count())
            if (t < best) best = t
            if (noop) {
              val tn = timeSec(
                fn(spark, sfDir).write.format("noop").mode("overwrite").save())
              if (tn < bestNoop) bestNoop = tn
            }
          }
          dumpPlan(name, fn(spark, sfDir))
          val extra = if (noop) f" noop=$bestNoop%8.3f s" else ""
          println(f"$name%-28s $best%8.3f s (count)$extra")
          spark.sparkContext.setJobDescription(null)
      }
    }
    spark.stop()
  }
}
