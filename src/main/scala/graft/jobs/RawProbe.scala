package graft.jobs
import java.util.concurrent.atomic.AtomicLong
import graft.ingest.SpanChunker
import graft.synth.CorpusSynth
/** No-Spark parallelism probe: N raw threads running genDoc+chunkDoc. */
object RawProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt; val n = args(1).toLong
    val cfg = SpanChunker.Config(200, 40)
    for (_ <- 1 to 2) {
      val next = new AtomicLong(0)
      val total = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = next.getAndIncrement()
          while (i < n) {
            val (doc, meta) = CorpusSynth.genDoc(42L, i)
            total.addAndGet(SpanChunker.chunkDoc(doc, meta, cfg).length)
            i = next.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      println(s"threads=$threads docs=$n chunks=${total.get()} sec=${(System.nanoTime()-t0)/1e9}")
    }
  }
}
