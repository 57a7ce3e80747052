package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.SpanChunker
import graft.oracle.SerialOracle
import graft.synth.CorpusSynth

/** Linking parity: the engine's blocking-key candidate generation must
  * reproduce the oracle's full-N×N blocking contract EXACTLY at test scale
  * (every bucket below the frequency cap) — a strictly stronger check than
  * the P/R gate, catching silent recall loss in the blocking keys.
  */
class LinkerParitySpec extends AnyFunSuite {
  test("validated duplicate pairs: engine (blocking keys) == oracle (N×N)") {
    val spark = SparkTestBase.spark
    val cfg = SpanChunker.Config(200, 40)
    val oracle = SerialOracle.run(CorpusSynth.serial(120, 42), cfg)
    val engine = Pipeline.runSynth(spark, 120, 42, cfg, 4)
    val got = engine.dupPairs.select("id1", "id2").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = oracle.dupPairs.toSet
    val byId = oracle.entities.map(e => e.id -> s"${e.name}[${e.tpe}]").toMap
    val missing = (want -- got).map { case (a, b) => s"${byId(a)} <-> ${byId(b)}" }
    val extra = (got -- want).map { case (a, b) => s"${byId(a)} <-> ${byId(b)}" }
    assert(missing.isEmpty, s"engine missed pairs: ${missing.take(10)}")
    assert(extra.isEmpty, s"engine invented pairs: ${extra.take(10)}")
  }
}
