package graft.text

import scala.collection.mutable.ArrayBuffer

/** Deterministic text kernels shared bit-for-bit by the distributed engine
  * and the serial oracle (SURVEY §7.4.6: tiktoken is unavailable offline on
  * the JVM, so token_count is defined by THIS tokenizer on both sides; the
  * engine/oracle comparison contract holds as long as the kernel is shared).
  *
  * All functions here are pure and total.
  */
object Tok {

  private val WordOrPunct = """[A-Za-z0-9]+(?:'[A-Za-z0-9]+)*|[^\sA-Za-z0-9]""".r

  /** Tokens = maximal alnum runs (with internal apostrophes) or single
    * non-space punctuation chars. A deterministic stand-in for the
    * reference's tiktoken cl100k_base (chunker.py:50).
    */
  def tokenize(text: String): Vector[String] =
    WordOrPunct.findAllIn(text).toVector

  def countTokens(text: String): Int = {
    // counting without materializing the token vector (hot path)
    var n = 0
    val it = WordOrPunct.findAllIn(text)
    while (it.hasNext) { it.next(); n += 1 }
    n
  }

  private val SentenceEnd = """(?<=[.!?])\s+""".r

  /** Sentence split, exactly the reference fallback splitter
    * (chunker.py:180-193): split after [.!?]+whitespace, trim, drop empties.
    * (The NLTK punkt path is data-dependent and non-deterministic across
    * versions; the regex fallback is the deterministic contract.)
    */
  def sentenceSplit(text: String): Vector[String] =
    SentenceEnd.split(text).iterator.map(_.trim).filter(_.nonEmpty).toVector

  /** Normalize an entity name: collapse whitespace, strip trailing
    * punctuation — reference entity_extractor.py:344-360.
    */
  def normalizeEntityName(name: String): String =
    name.trim.replaceAll("\\s+", " ").replaceAll("[.,;:!?]+$", "")

  private val Suffixes = List(" Inc.", " Inc", " Corp.", " Corp", " LLC",
    " Ltd.", " Ltd", " GmbH", " AG", " Co.", " Company", " Corporation")
  private val Prefixes = List("The ", "Dr. ", "Mr. ", "Mrs. ", "Ms. ", "Prof. ")

  /** Strip common org suffixes / person prefixes — reference
    * relation_extractor.py:357-374 (exact constant lists).
    */
  def simplifyEntityName(name0: String): String = {
    var name = name0.trim
    Suffixes.foreach { s => if (name.endsWith(s)) name = name.dropRight(s.length) }
    Prefixes.foreach { p => if (name.startsWith(p)) name = name.drop(p.length) }
    name.trim
  }

  /** Collapse internal whitespace + lowercase — used as the infix
    * normalization for pattern-based relation extraction.
    */
  def normInfix(s: String): String =
    s.trim.replaceAll("\\s+", " ").toLowerCase

  /** Greedy sentence packing per the reference semantic chunker
    * (chunker.py:92-178). Returns chunk assignments as
    * (sentenceIndicesOwned, textOfChunk, tokenCount) where
    * sentenceIndicesOwned are the NON-overlap sentences first placed in the
    * chunk (overlap sentences are re-included in the next chunk's text only).
    *
    * tokenOf(i) must equal countTokens(sentences(i)).
    */
  def packSentences(
      sentences: IndexedSeq[String],
      tokenOf: Int => Int,
      chunkSize: Int,
      overlap: Int): Vector[(Vector[Int], String, Int)] = {
    val out = ArrayBuffer.empty[(Vector[Int], String, Int)]
    // current chunk state: list of (sentence text, owned index or -1 for
    // overlap-copies, token count)
    var cur = Vector.empty[(String, Int, Int)]
    var curTokens = 0

    def emit(): Unit = {
      if (cur.nonEmpty) {
        val text = cur.map(_._1).mkString(" ")
        out += ((cur.map(_._2).filter(_ >= 0), text, curTokens))
      }
    }

    var i = 0
    while (i < sentences.length) {
      val s = sentences(i)
      val st = tokenOf(i)
      if (st > chunkSize) {
        // single oversized sentence: flush current, then token-window split
        emit(); cur = Vector.empty; curTokens = 0
        val toks = tokenize(s)
        var start = 0
        var first = true
        val step = math.max(1, chunkSize - overlap)
        while (start < toks.length) {
          val end = math.min(start + chunkSize, toks.length)
          val part = toks.slice(start, end).mkString(" ")
          // the oversized sentence is owned by its FIRST emitted window
          out += ((if (first) Vector(i) else Vector.empty, part, end - start))
          first = false
          start += step
        }
      } else if (curTokens + st > chunkSize && cur.nonEmpty) {
        emit()
        // suffix overlap: trailing sentences totalling <= overlap tokens
        // (chunker.py:146-160)
        var overlapChunk = Vector.empty[(String, Int, Int)]
        var overlapTokens = 0
        var j = cur.length - 1
        var break = false
        while (j >= 0 && !break) {
          val (txt, _, tc) = cur(j)
          if (overlapTokens + tc <= overlap) {
            overlapChunk = (txt, -1, tc) +: overlapChunk
            overlapTokens += tc
            j -= 1
          } else break = true
        }
        cur = overlapChunk :+ ((s, i, st))
        curTokens = overlapTokens + st
      } else {
        cur = cur :+ ((s, i, st))
        curTokens += st
      }
      i += 1
    }
    emit()
    out.toVector
  }
}
