package graft.link

/** Deterministic name feature vectors for entity-linking cosine similarity.
  *
  * The reference embeds entity names via an external embedding service
  * (entity_deduplication.py:233-256); that is non-deterministic and
  * unavailable offline, so — per the north_star ("TF-IDF/embedding cosine
  * scoring") — we use character n-gram (n=2,3) hashed term-frequency
  * vectors, L2-normalized, computed over the SIMPLIFIED name (corporate
  * suffix / honorific prefix stripped, relation_extractor.py:357-374): a
  * semantic-name-embedding stand-in should treat "Acme" and "Acme Inc" as
  * the same concept, which raw char-ngrams do not. The SAME pure function
  * is used by the Spark engine and the serial oracle, so values agree and the
  * reference's thresholds (0.68 blocking slack, 0.85 accept,
  * settings.py:100-120) carry over unchanged.
  *
  * Vectors are sparse: (sorted index array, value array). Dim 512.
  */
object NameFeatures {

  val Dim = 512

  /** Deterministic polynomial hash of a char n-gram into [0, Dim). */
  private def bucket(s: CharSequence, from: Int, until: Int): Int = {
    var h = 7
    var i = from
    while (i < until) { h = h * 31 + s.charAt(i); i += 1 }
    // force non-negative then mask into dim
    (h & 0x7fffffff) % Dim
  }

  /** Sparse L2-normalized char-2,3-gram TF vector of the lowercased,
    * whitespace-collapsed name, padded with boundary markers.
    */
  def vector(name: String): (Array[Int], Array[Double]) = {
    val norm = "^" + graft.text.Tok.simplifyEntityName(name)
      .toLowerCase.trim.replaceAll("\\s+", " ") + "$"
    val counts = scala.collection.mutable.TreeMap.empty[Int, Int]
    var n = 2
    while (n <= 3) {
      var i = 0
      while (i + n <= norm.length) {
        val b = bucket(norm, i, i + n)
        counts.update(b, counts.getOrElse(b, 0) + 1)
        i += 1
      }
      n += 1
    }
    val sz = counts.size
    val idx = new Array[Int](sz)
    val vals = new Array[Double](sz)
    var k = 0
    var ss = 0.0
    counts.foreach { case (key, v) =>
      idx(k) = key
      vals(k) = v.toDouble
      ss += vals(k) * vals(k)
      k += 1
    }
    val inv = if (ss == 0) 0.0 else 1.0 / math.sqrt(ss)
    var j = 0
    while (j < sz) { vals(j) *= inv; j += 1 }
    (idx, vals)
  }

  /** Sparse dot product of two sorted sparse vectors. */
  def dot(a: (Array[Int], Array[Double]), b: (Array[Int], Array[Double])): Double = {
    val (ai, av) = a
    val (bi, bv) = b
    var i = 0; var j = 0; var s = 0.0
    while (i < ai.length && j < bi.length) {
      if (ai(i) == bi(j)) { s += av(i) * bv(j); i += 1; j += 1 }
      else if (ai(i) < bi(j)) i += 1
      else j += 1
    }
    s
  }

  /** Cosine of two names (vectors are L2-normalized so cosine = dot). */
  def cosine(n1: String, n2: String): Double = dot(vector(n1), vector(n2))
}
