package graft.ingest

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.Schema._
import graft.synth.CorpusSynth
import graft.text.Tok

/** Span-preserving chunker with the reference's strategy dispatch
  * (chunker.py:57-90): `semantic` (default) or `fixed`.
  *
  * Semantic packing contract = the reference semantic chunker (chunker.py:92-178):
  * greedy sentence packing into <= chunkSize tokens; on overflow emit the
  * chunk and seed the next with a suffix overlap of trailing sentences
  * totalling <= overlap tokens (chunker.py:146-160); a single sentence
  * larger than chunkSize is token-window split with stride
  * chunkSize - overlap (chunker.py:235-268). Sentences come from the
  * deterministic regex splitter (chunker.py:180-193 fallback).
  *
  * Span preservation (north-rule invariant, BASELINE.json:15): every input
  * span is OWNED by exactly one output chunk — a text span by the chunk
  * where its first sentence is first placed (overlap re-copies never own),
  * a media span by the chunk under construction when it is encountered —
  * so concatenating `spans` over chunks in chunk_index order reproduces the
  * document's original (kind, text, media_ref, order) sequence exactly.
  *
  * `chunkDoc` is pure; the Spark wrapper is a narrow flatMap (no shuffle).
  */
object SpanChunker {

  final case class Config(chunkSize: Int = 200, overlap: Int = 40,
      strategy: String = "semantic") {
    require(overlap < chunkSize, "overlap must be smaller than chunk size")
    require(strategy == "semantic" || strategy == "fixed",
      s"unknown chunking strategy '$strategy' (semantic|fixed)")
  }

  /** estimate_chunks (chunker.py:312-331): max(1, ceil(total / (size −
    * overlap))) — the reference returns 1 even for empty text; overlap >=
    * size is rejected by Config (the reference raises ValueError).
    */
  def estimateChunks(totalTokens: Int, cfg: Config): Int = {
    val step = cfg.chunkSize - cfg.overlap
    math.max(1, (math.max(totalTokens, 0) + step - 1) / step)
  }

  /** Strategy dispatch (chunker.py:57-90). */
  def chunkDoc(doc: DocRow, meta: DocMeta, cfg: Config): Vector[ChunkRow] =
    if (cfg.strategy == "fixed") chunkDocFixed(doc, meta, cfg)
    else chunkDocSemantic(doc, meta, cfg)

  /** Fixed-window token starts for a token count: start = k·(size−overlap)
    * while start < nTokens (the reference _chunk_fixed loop,
    * chunker.py:195-233). Shared by the chunker and SparkEntry's
    * DuckDB-checkable q_chunk_fixed.
    */
  def fixedWindowStarts(nTokens: Int, cfg: Config): Vector[Int] = {
    val step = math.max(1, cfg.chunkSize - cfg.overlap)
    Iterator.from(0).map(_ * step).takeWhile(_ < nTokens).toVector
  }

  /** Fixed-strategy chunking (chunker.py:195-233): the document's token
    * stream (text spans concatenated in offset order) is cut into sliding
    * windows of `chunkSize` tokens with stride chunkSize − overlap; decode
    * = space-join (the deterministic stand-in for tiktoken decode).
    *
    * Span ownership keeps the north-rule invariant: a text span is owned by
    * the window in which its FIRST token is new (not overlap-copied); a
    * media span by the owner of the nearest preceding text token (window 0
    * when none). Owners are monotone in span order, so concatenating
    * `spans` over chunks in chunk_index order reproduces the original
    * sequence.
    */
  def chunkDocFixed(doc: DocRow, meta: DocMeta, cfg: Config): Vector[ChunkRow] = {
    val periodEnd = CorpusSynth.fiscalPeriodEnd(meta.year, meta.quarter)
    val step = math.max(1, cfg.chunkSize - cfg.overlap)
    // token t is first covered (new) in window 0 when t < chunkSize, else
    // in window floor((t - chunkSize) / step) + 1
    def windowOfNewToken(t: Int): Int =
      if (t < cfg.chunkSize) 0 else (t - cfg.chunkSize) / step + 1

    val ordered = doc.spans.sortBy(_.offset)
    val tokens = ArrayBuffer.empty[String]
    val ownerOf = ordered.map { span =>
      if (span.kind == "text") {
        val firstTok = tokens.length
        tokens ++= Tok.tokenize(span.text)
        if (tokens.length > firstTok) windowOfNewToken(firstTok)
        // empty text span: attach like media to the preceding token's owner
        else if (firstTok == 0) 0
        else windowOfNewToken(firstTok - 1)
      } else if (tokens.isEmpty) 0
      else windowOfNewToken(tokens.length - 1)
    }
    val starts = fixedWindowStarts(tokens.length, cfg)
    // a doc with no text tokens still emits one empty chunk owning its spans
    val effStarts = if (starts.isEmpty) Vector(0) else starts
    effStarts.zipWithIndex.map { case (start, idx) =>
      val end = math.min(start + cfg.chunkSize, tokens.length)
      val owned = ordered.zip(ownerOf).collect {
        case (span, owner) if owner == idx => span
      }
      ChunkRow(
        chunk_id = s"${doc.doc_id}#$idx",
        doc_id = doc.doc_id,
        chunk_index = idx,
        text = tokens.slice(start, end).mkString(" "),
        token_count = math.max(end - start, 0),
        fiscal_year = meta.year,
        fiscal_quarter = meta.quarter,
        fiscal_period_end = periodEnd,
        version = 1,
        is_current = true,
        spans = owned)
    }
  }

  /** Semantic strategy (the north-rule default). */
  def chunkDocSemantic(doc: DocRow, meta: DocMeta, cfg: Config): Vector[ChunkRow] = {
    val periodEnd = CorpusSynth.fiscalPeriodEnd(meta.year, meta.quarter)

    final case class Pending(text: String, tokens: Int)
    val out = ArrayBuffer.empty[(Vector[Pending], Vector[Span])]
    var cur = Vector.empty[Pending]
    var curTokens = 0
    var curOwned = Vector.empty[Span]

    def emit(): Unit = {
      if (cur.nonEmpty || curOwned.nonEmpty) {
        out += ((cur, curOwned))
        cur = Vector.empty
        curTokens = 0
        curOwned = Vector.empty
      }
    }

    val ordered = doc.spans.sortBy(_.offset)
    ordered.foreach { span =>
      if (span.kind != "text") {
        curOwned = curOwned :+ span // media attaches to the open chunk
      } else {
        var spanOwned = false
        def ownNow(): Unit = { // first sentence placed -> cur owns the span
          if (!spanOwned) { curOwned = curOwned :+ span; spanOwned = true }
        }
        Tok.sentenceSplit(span.text).foreach { s =>
          val st = Tok.countTokens(s)
          if (st > cfg.chunkSize) {
            // oversized sentence: flush, then token-window split
            emit()
            val toks = Tok.tokenize(s)
            val step = math.max(1, cfg.chunkSize - cfg.overlap)
            var start = 0
            var first = true
            while (start < toks.length) {
              val end = math.min(start + cfg.chunkSize, toks.length)
              cur = Vector(Pending(toks.slice(start, end).mkString(" "), end - start))
              curTokens = end - start
              if (first) ownNow()
              first = false
              emit()
              start += step
            }
          } else if (curTokens + st > cfg.chunkSize && cur.nonEmpty) {
            emit()
            // suffix overlap from the just-emitted chunk's sentences
            val prev = out.last._1
            var overlapChunk = Vector.empty[Pending]
            var overlapTokens = 0
            var j = prev.length - 1
            var stop = false
            while (j >= 0 && !stop) {
              val p = prev(j)
              if (overlapTokens + p.tokens <= cfg.overlap) {
                overlapChunk = p +: overlapChunk
                overlapTokens += p.tokens
                j -= 1
              } else stop = true
            }
            cur = overlapChunk :+ Pending(s, st)
            curTokens = overlapTokens + st
            ownNow()
          } else {
            cur = cur :+ Pending(s, st)
            curTokens += st
            ownNow()
          }
        }
      }
    }
    emit()

    out.iterator.zipWithIndex.map { case ((parts, owned), idx) =>
      val text = parts.map(_.text).mkString(" ")
      ChunkRow(
        chunk_id = s"${doc.doc_id}#$idx",
        doc_id = doc.doc_id,
        chunk_index = idx,
        text = text,
        token_count = parts.map(_.tokens).sum,
        fiscal_year = meta.year,
        fiscal_quarter = meta.quarter,
        fiscal_period_end = periodEnd,
        version = 1,
        is_current = true,
        spans = owned)
    }.toVector
  }

  /** Narrow distributed chunking: docs joined with sidecar metadata by
    * doc_id (broadcast-sized in tests; hash-co-partitioned at scale since
    * both sides are generated/stored bucketed by doc_id), then a flatMap.
    */
  def chunk(spark: SparkSession, docs: Dataset[DocRow],
      metas: Dataset[DocMeta], cfg: Config): Dataset[ChunkRow] = {
    import spark.implicits._
    docs.joinWith(metas, docs("doc_id") === metas("doc_id"), "inner")
      .flatMap { case (doc, meta) => chunkDoc(doc, meta, cfg) }
  }

  /** Chunk a synthetic corpus without materializing the doc/meta join:
    * both halves come from the same generator, so this is a pure narrow map
    * from the range — the preferred at-scale path (zero shuffle).
    */
  def chunkSynth(spark: SparkSession, nDocs: Long, seed: Long, cfg: Config,
      partitions: Int = 0): Dataset[ChunkRow] = {
    import spark.implicits._
    // docIds (closure-captured size), not spark.range (size literal in the
    // generated code) — see CorpusSynth.docIds
    spark.createDataset(CorpusSynth.docIds(spark, nDocs, partitions)
      .mapPartitions { it =>
        it.flatMap { i =>
          val (doc, meta) = CorpusSynth.genDoc(seed, i)
          chunkDoc(doc, meta, cfg)
        }
      })
  }
}
