package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Schema._
import graft.ingest.SpanChunker
import graft.synth.CorpusSynth
import graft.text.Tok

class ChunkerSpec extends AnyFunSuite {

  private val cfg = SpanChunker.Config(chunkSize = 60, overlap = 12)

  private def reassemble(chunks: Seq[ChunkRow]): Seq[Span] =
    chunks.sortBy(_.chunk_index).flatMap(_.spans)

  test("span-sequence invariant holds on 300 synthetic docs") {
    CorpusSynth.serial(300, seed = 42).foreach { case (doc, meta) =>
      val chunks = SpanChunker.chunkDoc(doc, meta, cfg)
      val got = reassemble(chunks).map(s => (s.kind, s.text, s.media_ref, s.offset))
      val want = doc.spans.sortBy(_.offset).map(s => (s.kind, s.text, s.media_ref, s.offset))
      assert(got === want, s"span sequence broken for ${doc.doc_id}")
      // every chunk index unique and dense
      assert(chunks.map(_.chunk_index) === chunks.indices.toVector)
    }
  }

  test("token bounds: every chunk <= chunkSize tokens (+ overlap seeds)") {
    CorpusSynth.serial(200, seed = 7).foreach { case (doc, meta) =>
      SpanChunker.chunkDoc(doc, meta, cfg).foreach { c =>
        assert(c.token_count <= cfg.chunkSize,
          s"${c.chunk_id} has ${c.token_count} tokens > ${cfg.chunkSize}")
        assert(c.token_count === Tok.countTokens(c.text))
      }
    }
  }

  test("oversized single sentence is token-window split with stride size-overlap") {
    val words = (1 to 150).map(i => s"w$i").mkString(" ") + "."
    val doc = DocRow("doc_x", Vector(Span("text", words, "", 0)))
    val meta = DocMeta("doc_x", "Acme", "AC", "Technology", 2021, "Q2", "", 0)
    val chunks = SpanChunker.chunkDoc(doc, meta, SpanChunker.Config(50, 10))
    assert(chunks.length === 4) // 151 tokens, stride 40: 0,40,80,120
    assert(chunks.head.token_count === 50)
    assert(chunks.map(_.spans.length).sum === 1) // span owned exactly once
    assert(chunks.head.spans.length === 1)
  }

  test("overlap: next chunk re-includes trailing sentences up to overlap tokens") {
    val sents = (1 to 10).map(i => s"alpha beta gamma delta s$i.")
    val text = sents.mkString(" ") // 6 tokens each
    val doc = DocRow("doc_y", Vector(Span("text", text, "", 0)))
    val meta = DocMeta("doc_y", "Acme", "AC", "Technology", 2021, "Q2", "", 0)
    val chunks = SpanChunker.chunkDoc(doc, meta, SpanChunker.Config(20, 6))
    assert(chunks.length > 1)
    chunks.sliding(2).foreach {
      case Seq(a, b) =>
        // the first sentence of b.text must be the last sentence of a.text
        val lastOfA = Tok.sentenceSplit(a.text).last
        val firstOfB = Tok.sentenceSplit(b.text).head
        assert(lastOfA === firstOfB, "overlap seed missing")
      case _ =>
    }
  }

  test("media spans attach to the open chunk and are never dropped") {
    val doc = DocRow("doc_m", Vector(
      Span("image", "", "media://doc_m/0", 0),
      Span("text", "One two three four five.", "", 1),
      Span("audio", "", "media://doc_m/1", 30),
      Span("text", "Six seven eight nine ten.", "", 31),
      Span("table", "", "media://doc_m/2", 60)))
    val meta = DocMeta("doc_m", "Acme", "AC", "Technology", 2021, "Q2", "", 0)
    val chunks = SpanChunker.chunkDoc(doc, meta, SpanChunker.Config(8, 2))
    val media = reassemble(chunks).filter(_.kind != "text").map(_.media_ref)
    assert(media === Seq("media://doc_m/0", "media://doc_m/1", "media://doc_m/2"))
  }

  test("fixed strategy: sliding token windows with stride size-overlap") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val doc = DocRow("doc_f", Vector(Span("text", words, "", 0)))
    val meta = DocMeta("doc_f", "Acme", "AC", "Technology", 2021, "Q2", "", 0)
    val fixedCfg = SpanChunker.Config(40, 10, strategy = "fixed")
    val chunks = SpanChunker.chunkDoc(doc, meta, fixedCfg)
    // 100 tokens, stride 30: windows at 0, 30, 60, 90
    assert(chunks.length === 4)
    assert(chunks.map(_.token_count) === Vector(40, 40, 40, 10))
    assert(chunks.head.text.startsWith("w1 w2 ") &&
      chunks(1).text.startsWith("w31 "))
    // consecutive windows share exactly `overlap` tokens
    val t0 = chunks(0).text.split(" ").toSeq
    val t1 = chunks(1).text.split(" ").toSeq
    assert(t0.takeRight(10) === t1.take(10))
    // the single text span is owned exactly once (by the first window)
    assert(chunks.map(_.spans.length).sum === 1)
    assert(chunks.head.spans.length === 1)
  }

  test("fixed strategy preserves span sequences incl. media on 300 docs") {
    val fixedCfg = SpanChunker.Config(60, 12, strategy = "fixed")
    CorpusSynth.serial(300, seed = 42).foreach { case (doc, meta) =>
      val chunks = SpanChunker.chunkDoc(doc, meta, fixedCfg)
      val got = reassemble(chunks).map(s => (s.kind, s.text, s.media_ref, s.offset))
      val want = doc.spans.sortBy(_.offset).map(s => (s.kind, s.text, s.media_ref, s.offset))
      assert(got === want, s"span sequence broken for ${doc.doc_id}")
      assert(chunks.map(_.chunk_index) === chunks.indices.toVector)
      chunks.foreach(c => assert(c.token_count <= fixedCfg.chunkSize))
    }
  }

  test("estimateChunks: max(1, ceil(total / (size - overlap))); bad overlap rejected") {
    val c = SpanChunker.Config(50, 10)
    // reference chunker.py:312-331 returns max(1, ...) — 1 even for empty
    assert(SpanChunker.estimateChunks(0, c) === 1)
    assert(SpanChunker.estimateChunks(40, c) === 1)
    assert(SpanChunker.estimateChunks(41, c) === 2)
    assert(SpanChunker.estimateChunks(400, c) === 10)
    assertThrows[IllegalArgumentException](SpanChunker.Config(50, 50))
    assertThrows[IllegalArgumentException](SpanChunker.Config(50, 10, "bogus"))
  }

  test("all-media doc still yields one chunk owning every span") {
    val doc = DocRow("doc_am", Vector(
      Span("image", "", "media://doc_am/0", 0),
      Span("audio", "", "media://doc_am/1", 1)))
    val meta = DocMeta("doc_am", "Acme", "AC", "Technology", 2021, "Q2", "", 0)
    val chunks = SpanChunker.chunkDoc(doc, meta, cfg)
    assert(chunks.length === 1)
    assert(chunks.head.spans.length === 2)
    assert(chunks.head.text === "")
  }
}
