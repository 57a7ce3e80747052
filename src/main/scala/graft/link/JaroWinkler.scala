package graft.link

/** Jaro-Winkler similarity — an exact Scala re-expression of the reference's
  * hand-rolled implementation (entity_deduplication.py:573-639): lowercase +
  * trim, classic Jaro with match window max(l1,l2)/2 - 1 (floored at 0),
  * transpositions/2, Winkler prefix boost prefix*0.1*(1-jaro) with prefix
  * capped at 4 and NO boost threshold. Must match bit-for-bit for P/R parity
  * (SURVEY §2.5).
  */
object JaroWinkler {

  def similarity(s1raw: String, s2raw: String): Double = {
    val s1 = s1raw.toLowerCase.trim
    val s2 = s2raw.toLowerCase.trim
    if (s1 == s2) return 1.0
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0

    val matchDistance = math.max(0, math.max(len1, len2) / 2 - 1)
    val s1Matches = new Array[Boolean](len1)
    val s2Matches = new Array[Boolean](len2)

    var matches = 0
    var i = 0
    while (i < len1) {
      val start = math.max(0, i - matchDistance)
      val end = math.min(i + matchDistance + 1, len2)
      var j = start
      var found = false
      while (j < end && !found) {
        if (!s2Matches(j) && s1.charAt(i) == s2.charAt(j)) {
          s1Matches(i) = true
          s2Matches(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0

    var transpositions = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (s1Matches(i)) {
        while (!s2Matches(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }

    val m = matches.toDouble
    val jaro = (m / len1 + m / len2 + (m - transpositions / 2.0) / m) / 3.0

    var prefix = 0
    val maxPrefix = math.min(math.min(len1, len2), 4)
    var p = 0
    var cont = true
    while (p < maxPrefix && cont) {
      if (s1.charAt(p) == s2.charAt(p)) prefix += 1 else cont = false
      p += 1
    }
    jaro + prefix * 0.1 * (1 - jaro)
  }
}
