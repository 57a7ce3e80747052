package graft.jobs
import org.apache.spark.sql.SparkSession
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      println(f"$q%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
    }
    spark.stop()
  }
}
