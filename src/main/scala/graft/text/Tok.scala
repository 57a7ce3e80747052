package graft.text

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

}
