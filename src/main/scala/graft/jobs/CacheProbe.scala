package graft.jobs
import org.apache.spark.sql.SparkSession
import graft.ingest.{GazetteerNer, SpanChunker}
/** One-off probe: cost of materializing the NER mention table under
  * different cache formats (columnar persist vs row localCheckpoint vs
  * noop write) — attribution for the ner stage's non-kernel half.
  *
  * Round-6 measurements (150k docs): at 1 core, noop 21.7s / columnar
  * persist 43.3s / localCheckpoint 26.3s — the compressed columnar cache
  * build doubles the stage. At 4 cores the level is memory-bus-bound and
  * the formats converge (full-pipeline hi child 37.2s persist vs 37.0s
  * ckpt), so switching Pipeline's big caches to localCheckpoint cut only
  * the 1-core level (118 -> 108.9s) and DROPPED the 1-to-4-core scaling
  * efficiency 0.793 -> 0.736 on this shared-bus box. The switch was
  * therefore reverted: on a real cluster (per-executor memory channels)
  * the row cache wins both levels, and this probe plus the one-line
  * change in Pipeline.fromChunks/runSynth is the documented evidence.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val mode = args(2) // persist | ckpt | noop
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-cacheprobe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.storage.StorageLevel
    val cfg = SpanChunker.Config(200, 40)
    val chunks = SpanChunker.chunkSynth(spark, nDocs, 42L, cfg, cores * 2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    chunks.count()
    val t0 = System.nanoTime()
    val m = GazetteerNer.detect(spark, chunks).toDF()
    mode match {
      case "persist" =>
        val p = m.persist(StorageLevel.MEMORY_AND_DISK); p.count()
      case "ckpt" =>
        m.localCheckpoint(true).count()
      case "noop" =>
        m.write.format("noop").mode("overwrite").save()
    }
    println(f"mode=$mode cores=$cores docs=$nDocs " +
      f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
