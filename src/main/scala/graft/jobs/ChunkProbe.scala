package graft.jobs
import org.apache.spark.sql.SparkSession
import graft.ingest.SpanChunker
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt; val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = SpanChunker.chunkSynth(spark, n, 42L, SpanChunker.Config(200, 40), cores * 2)
      println(s"round $round cores=$cores chunks=${c.count()} sec=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
