package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest.{GazetteerNer, RelationPatterns, SpanChunker}
import graft.link.Linker

/** Sub-step attribution inside the two heaviest pipeline stages at query
  * scale (relations, linking): times the narrow extract kernel apart from
  * the dedup shuffle, and candidate generation apart from the verdict
  * filter. A JVM-warmup chunk pass runs first so codegen/classload cost
  * doesn't land on the first timed step.
  *
  * Usage: StageProbe <cores> <nDocs>
  */
object StageProbe {

  private def timeSec[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    // SPARK_GRAFT_PROBE_UI=1 → keep the UI up and sleep at the end so the
    // REST API (/api/v1) can be scraped for per-stage metrics
    val ui = sys.env.get("SPARK_GRAFT_PROBE_UI").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-stageprobe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", ui.toString)
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.storage.StorageLevel

    val cfg = SpanChunker.Config(200, 40)
    // warmup: small pass to pay session/codegen startup before timing
    SpanChunker.chunkSynth(spark, 200L, 42L, cfg, cores).count()

    val chunks = timeSec("chunk") {
      val c = SpanChunker.chunkSynth(spark, nDocs, 42L, cfg, cores * 2)
        .persist(StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    timeSec("ner_noop") {
      GazetteerNer.detect(spark, chunks).toDF()
        .write.format("noop").mode("overwrite").save()
    }
    val mentions = timeSec("ner_persist") {
      val m = GazetteerNer.detect(spark, chunks).toDF()
        .persist(StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }
    timeSec("rel_extract_noop") {
      RelationPatterns.extract(spark, chunks).toDF()
        .write.format("noop").mode("overwrite").save()
    }
    val triples = timeSec("rel_dedup") {
      val t = RelationPatterns.dedup(RelationPatterns.extract(spark, chunks))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    timeSec("rel_dedup_rep2") {
      RelationPatterns.dedup(RelationPatterns.extract(spark, chunks))
        .write.format("noop").mode("overwrite").save()
    }
    val entities = timeSec("entities") {
      val e = Linker.entities(mentions).persist(StorageLevel.MEMORY_AND_DISK)
      val n = e.count(); println(s"[probe]   n_entities=$n"); e
    }
    val cands = timeSec("candidates") {
      val c = Linker.candidates(entities).persist(StorageLevel.MEMORY_AND_DISK)
      val n = c.count(); println(s"[probe]   n_cands=$n"); c
    }
    timeSec("verdicts") {
      Linker.verdicts(cands).write.format("noop").mode("overwrite").save()
    }
    timeSec("candidates_rep2") {
      Linker.candidates(entities).write.format("noop").mode("overwrite").save()
    }
    // total Janino wall time this JVM spent compiling generated code — the
    // direct measurement of the codegen share of the per-child fixed slice
    val cm = org.apache.spark.metrics.source.CodegenMetrics
    println(f"[probe] codegen_compile   ${cm.METRIC_COMPILATION_TIME.getSnapshot.getValues.map(_.toDouble).sum / 1000}%8.2f s over ${cm.METRIC_COMPILATION_TIME.getCount} compiles, " +
      f"${cm.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getSnapshot.getValues.map(_.toDouble).sum / 1e6}%.1f MB bytecode")
    println(s"[probe] triples=${triples.count()}")
    if (ui) {
      println(s"[probe] ui=${spark.sparkContext.uiWebUrl.getOrElse("")}")
      Thread.sleep(600000L)
    }
    spark.stop()
  }
}
