package graft.jobs
import org.apache.spark.sql.SparkSession
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // UTC pin: the NTZ→TIMESTAMP casts in the event queries are
      // zone-dependent; every engine entry point must pin this or timings
      // and row counts shift across machines
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val n = df.count()
      println(f"$q%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
      // SPARK_GRAFT_EXPLAIN=1 → dump the post-AQE executed plan too
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
        df.collect() // finalize THIS df's AQE plan (count() plans a new QE)
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
