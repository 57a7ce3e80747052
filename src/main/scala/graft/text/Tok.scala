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

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  // java.util.regex \s for ASCII: [ \t\n\x0B\f\r]
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Token count, allocation-free char scan — exactly the WordOrPunct
    * grammar (the regex path allocates a String per token, which made this
    * the pipeline's memory-bandwidth hot spot; it is called once per
    * sentence in both the chunker and the synth generator).
    */
  def countTokens(text: String): Int = {
    var n = 0
    var i = 0
    val len = text.length
    while (i < len) {
      val c = text.charAt(i)
      if (isAlnum(c)) {
        // alnum run with internal 'x runs: [A-Za-z0-9]+(?:'[A-Za-z0-9]+)*
        i += 1
        while (i < len && isAlnum(text.charAt(i))) i += 1
        while (i + 1 < len && text.charAt(i) == '\'' && isAlnum(text.charAt(i + 1))) {
          i += 2
          while (i < len && isAlnum(text.charAt(i))) i += 1
        }
        n += 1
      } else if (!isWs(c)) {
        n += 1 // single non-space punctuation char
        i += 1
      } else i += 1
    }
    n
  }

  private val SentenceEnd = """(?<=[.!?])\s+""".r

  /** Sentence split, exactly the reference fallback splitter
    * (chunker.py:180-193): split after [.!?]+whitespace, trim, drop empties.
    * (The NLTK punkt path is data-dependent and non-deterministic across
    * versions; the regex fallback is the deterministic contract.)
    * Char-scan equivalent of SentenceEnd.split: a delimiter is a whitespace
    * run immediately following [.!?].
    */
  def sentenceSplit(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val len = text.length
    var start = 0
    var i = 0
    while (i < len) {
      val c = text.charAt(i)
      if ((c == '.' || c == '!' || c == '?') && i + 1 < len && isWs(text.charAt(i + 1))) {
        val piece = text.substring(start, i + 1).trim
        if (piece.nonEmpty) out += piece
        i += 1
        while (i < len && isWs(text.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    if (start < len) {
      val piece = text.substring(start).trim
      if (piece.nonEmpty) out += piece
    }
    out.result()
  }

  /** Normalize an entity name: collapse whitespace, strip trailing
    * punctuation — reference entity_extractor.py:344-360. Called once per
    * mention and per triple endpoint, so it short-circuits to the input
    * when already normal (the overwhelmingly common case for gazetteer
    * surfaces) instead of paying two regex replaceAll passes.
    */
  def normalizeEntityName(name: String): String = {
    val t = name.trim
    val len = t.length
    var needsCollapse = false
    var i = 0
    while (i < len && !needsCollapse) {
      val c = t.charAt(i)
      if (isWs(c) && (c != ' ' || (i + 1 < len && isWs(t.charAt(i + 1)))))
        needsCollapse = true
      i += 1
    }
    val collapsed =
      if (!needsCollapse) t
      else {
        val sb = new java.lang.StringBuilder(len)
        var j = 0
        var inWs = false
        while (j < len) {
          val c = t.charAt(j)
          if (isWs(c)) inWs = true
          else {
            if (inWs && sb.length > 0) sb.append(' ')
            sb.append(c)
            inWs = false
          }
          j += 1
        }
        sb.toString
      }
    var end = collapsed.length
    while (end > 0 && {
      val c = collapsed.charAt(end - 1)
      c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?'
    }) end -= 1
    if (end == collapsed.length) collapsed else collapsed.substring(0, end)
  }

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
    * normalization for pattern-based relation extraction (once per adjacent
    * mention pair: char-scan, single allocation).
    */
  def normInfix(s: String): String = {
    val t = s.trim
    val len = t.length
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    var inWs = false
    while (i < len) {
      val c = t.charAt(i)
      if (isWs(c)) inWs = true
      else {
        if (inWs && sb.length > 0) sb.append(' ')
        sb.append(Character.toLowerCase(c))
        inWs = false
      }
      i += 1
    }
    sb.toString
  }

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
