package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Attribution inside dedup_shingle_build: shingling-UDF pass vs MinHash
  * signature aggregation vs banding/candidate join.
  *
  * Usage: ShingleProbe <cores> <sfDir>
  */
object ShingleProbe {

  private def timeSec[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val dir = args(1)
    val ui = sys.env.get("SPARK_GRAFT_PROBE_UI").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-shingleprobe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", ui.toString)
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm the scan
    timeSec("shingle_noop") {
      Dedup.withShingles(docs, 5)
        .write.format("noop").mode("overwrite").save()
    }
    val sh = timeSec("shingle_persist") {
      val s = Dedup.withShingles(docs, 5).persist()
      val n = s.count(); println(s"[probe]   docs=$n"); s
    }
    timeSec("explode_only") {
      sh.select(col("doc_id"), explode(col("sh")).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    timeSec("signature_agg") {
      sh.select(col("doc_id"), explode(col("sh")).as("s"))
        .groupBy(col("doc_id"))
        .agg(array((0 until 64).map(i =>
          min(xxhash64(col("s"), lit(i)))): _*).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    timeSec("mh_cands_full") {
      val n = Dedup.minhashLshSh(sh, numHashes = 64, bands = 32,
        threshold = 0.0).count()
      println(s"[probe]   cands=$n")
    }
    // second run in the same JVM: if the first was codegen/plan-bound the
    // repeat is the steady-state number
    timeSec("mh_cands_rep2") {
      Dedup.minhashLshSh(sh, numHashes = 64, bands = 32, threshold = 0.0)
        .count()
    }
    // q_dedup_simhash attribution: structural candidates vs the recall
    // floor vs the exact-Jaccard verify
    val simCands = timeSec("simhash_cands") {
      val c = Dedup.simhashNearDup(docs, maxHamming = 7, bands = 8).persist()
      val n = c.count(); println(s"[probe]   sim_cands=$n"); c
    }
    val mhCands = timeSec("mh_cands_persist") {
      val c = Dedup.minhashLshSh(sh, numHashes = 64, bands = 32,
        threshold = 0.0).persist()
      c.count(); c
    }
    timeSec("floored_union") {
      val u = simCands.select(col("id1"), col("id2"))
        .union(mhCands.select(col("id1"), col("id2")))
        .dropDuplicates("id1", "id2").persist()
      val n = u.count(); println(s"[probe]   union_cands=$n")
      timeSec("verify_only") {
        val v = Dedup.verifyJaccardSh(sh, u, threshold = 0.9).count()
        println(s"[probe]   verified=$v")
      }
    }
    if (ui) {
      println(s"[probe] ui=${spark.sparkContext.uiWebUrl.getOrElse("")}")
      Thread.sleep(600000L)
    }
    spark.stop()
  }
}
