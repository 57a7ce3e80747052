package graft.jobs
import graft.ingest.{GazetteerNer, RelationPatterns, SpanChunker}
import graft.synth.CorpusSynth
/** No-Spark kernel probe: times genDoc+chunkDoc, mentionsOf and triplesOf
  * over the synthetic corpus on one thread — separates kernel CPU from
  * Spark encode/shuffle/persist cost when attributing stage times.
  */
object RawNerProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cfg = SpanChunker.Config(200, 40)
    for (pass <- 1 to 2) {
      var t0 = System.nanoTime()
      val chunks = (0L until n).flatMap { i =>
        val (doc, meta) = CorpusSynth.genDoc(42L, i)
        SpanChunker.chunkDoc(doc, meta, cfg)
      }
      val tChunk = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var nm = 0L
      chunks.foreach(c => nm += GazetteerNer.mentionsOf(c).length)
      val tNer = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var nt = 0L
      chunks.foreach(c => nt += RelationPatterns.triplesOf(c).length)
      val tRel = (System.nanoTime() - t0) / 1e9
      println(f"pass=$pass docs=$n chunks=${chunks.length} mentions=$nm " +
        f"triples=$nt chunk=$tChunk%.2f ner=$tNer%.2f rel=$tRel%.2f")
    }
  }
}
