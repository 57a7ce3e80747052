package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64
import graft.ops.{Dedup, Sampling, Similarity, TextAnalysis}

class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat", "en"), // near dup of 0
    (3L, "der schnelle braune fuchs und der faule hund ist da", "de"),
    (4L, "completely different text about spark engines and shuffles", "en"),
    (5L, "le chat et la souris et les grands des animaux", "fr")
  ).toDF("doc_id", "text", "lang")

  test("exact dedup groups identical texts under min doc_id") {
    val got = Dedup.exact(docs).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("canonical_doc_id") === 0L)
    assert(got.head.getAs[Long]("dup_count") === 2L)
  }

  test("shingle kernel hashes are bit-equal to SQL xxhash64 of the n-gram") {
    // withShingles now hashes each distinct n-gram inside the kernel; the
    // hash-keyed consumers (inverted index, verify) previously applied SQL
    // xxhash64(string) themselves, so the kernel MUST reproduce it exactly
    val d = Seq((1L, "Alpha beta GAMMA delta epsilon")).toDF("doc_id", "text")
    val got = Dedup.withShingles(d, 3)
      .select(explode(col("sh"))).collect().map(_.getLong(0)).toSet
    val grams = Seq("alpha beta gamma", "beta gamma delta",
      "gamma delta epsilon")
    val want = grams.toDF("g")
      .select(xxhash64(col("g"))).collect().map(_.getLong(0)).toSet
    assert(got === want)
  }

  test("session-lifetime dedup caches release through SessionCaches") {
    // minhashLshSh persists its signature table for the lifetime of the
    // returned lazy frame; the registry must free those blocks on demand.
    // Assertions go through a probe frame's OWN storage level (global
    // persistent-RDD counts are perturbed by other suites sharing the
    // session and by the ContextCleaner)
    Dedup.minhashLshSh(Dedup.withShingles(docs, 3), numHashes = 64,
      bands = 32, threshold = 0.0).count()
    val probe = graft.core.SessionCaches.register(docs.limit(2).persist())
    probe.count()
    assert(probe.storageLevel.useMemory)
    val released = graft.core.SessionCaches.release(spark)
    assert(released >= 2) // at least the signature cache + the probe
    assert(!probe.storageLevel.useMemory)
    // idempotent: nothing left registered for this session
    assert(graft.core.SessionCaches.release(spark) === 0)
  }

  test("sorted_inter_count equals size(array_intersect) on shingle sets") {
    // the verify kernel must count exactly what array_intersect counted —
    // over every doc pair of the fixture corpus, including disjoint sets
    // and the identical pair
    val sh = Dedup.withShingles(docs, 3)
    val a = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
    val b = sh.select(col("doc_id").as("id2"), col("sh").as("sh2"))
    val got = a.crossJoin(b).where(col("id1") <= col("id2"))
      .select(
        graft.functions.SortedInterCount.sortedInterCount(
          col("sh1"), col("sh2")).as("k"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("long").as("s"))
      .collect()
    assert(got.nonEmpty && got.exists(_.getLong(0) > 0))
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("ngram jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup -> jaccard 1
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash LSH estimate approximates true jaccard") {
    val got = Dedup.minhashLsh(docs, n = 3, numHashes = 64, bands = 16,
      threshold = 0.4).collect()
      .map(r => ((r.getAs[Long]("id1"), r.getAs[Long]("id2")),
        r.getAs[Double]("est_jaccard"))).toMap
    assert(got((0L, 1L)) === 1.0) // identical signatures
    assert(got.contains((0L, 2L)), s"near-dup pair missing: $got")
    assert(math.abs(got((0L, 2L)) - 0.5) < 0.35) // true 3-gram jaccard ~0.54
  }

  test("simhash: identical text -> same hash; near dup -> small hamming") {
    val h = docs.select(col("doc_id"), SimHash64.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) === h(1L))
    val hamming02 = java.lang.Long.bitCount(h(0L) ^ h(2L))
    val hamming04 = java.lang.Long.bitCount(h(0L) ^ h(4L))
    assert(hamming02 < hamming04, s"near-dup $hamming02 !< unrelated $hamming04")
    val nd = Dedup.simhashNearDup(docs, maxHamming = 12).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(nd.contains((0L, 1L)))
  }

  test("simhash expression matches its eval kernel and participates in codegen") {
    val expected = SimHash64.compute("the quick brown fox jumps over the lazy dog")
    val got = docs.where(col("doc_id") === 0L)
      .select(SimHash64.simhash64(col("text"))).head().getLong(0)
    assert(got === expected)
  }

  test("cosine/sign-lsh expressions: float==double widening, sign invariance") {
    import graft.functions.{CosineSim, SignLsh}
    val vecs = Seq(
      (0L, Seq(1.0f, 2.0f, -3.0f), Seq(1.0, 2.0, -3.0)),
      (1L, Seq(0.5f, -0.25f, 4.0f), Seq(0.5, -0.25, 4.0)),
      (2L, Seq(0.0f, 0.0f, 0.0f), Seq(0.0, 0.0, 0.0))
    ).toDF("vec_id", "f", "d")
    val r = vecs.select(
      CosineSim.cosineSim(col("f"), col("d")).as("self"),
      CosineSim.cosineSim(col("f"),
        transform(col("d"), x => x * 3.5)).as("scaled"),
      SignLsh.signLsh(col("f"), 8).as("bf"),
      SignLsh.signLsh(col("d"), 8).as("bd"),
      SignLsh.signLsh(transform(col("d"), x => x * 2.0), 8).as("bscaled"))
      .collect()
    r.take(2).foreach { row =>
      // float and double forms of the same vector: cosine 1, same bucket
      assert(math.abs(row.getAs[Double]("self") - 1.0) < 1e-12)
      assert(math.abs(row.getAs[Double]("scaled") - 1.0) < 1e-12)
      assert(row.getAs[Long]("bf") === row.getAs[Long]("bd"))
      // positive scaling preserves every sign bit — the LSH recall contract
      assert(row.getAs[Long]("bd") === row.getAs[Long]("bscaled"))
    }
    // zero vector: cosine 0 (reference _cosine_similarity zero-norm rule)
    assert(r(2).getAs[Double]("self") === 0.0)
  }

  test("LSH-then-verify dedup equals exact ground truth on this corpus") {
    val want = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5,
      maxShingleDf = 100000L)
      .select("id1", "id2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val minhash = Dedup.minhashLshExact(docs, n = 3, numHashes = 64,
      bands = 16, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(minhash === want)
    // exact dups (J=1.0) must survive the simhash path at any band width
    val simhash = Dedup.simhashExact(docs, maxHamming = 7, n = 3,
      threshold = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simhash === Set((0L, 1L)))
  }

  test("windowed fingerprint digest: block count and min/max hashes") {
    val f = TextAnalysis.windowFingerprint(docs, w = 4)
      .where(col("doc_id") === 0L).head()
    assert(f.getAs[Int]("n_windows") === 3) // 9 tokens / 4 -> 3 blocks
    assert(f.getAs[String]("win_md5_min") != null)
    assert(f.getAs[String]("win_md5_min") <= f.getAs[String]("win_md5_max"))
    // identical docs -> identical digests
    val all = TextAnalysis.windowFingerprint(docs, w = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_windows"), r.getAs[String]("win_md5_min"))).toMap
    assert(all(0L) === all(1L))
  }

  test("brute-force ANN: self is nearest with score 1") {
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(embs, Seq(1.0, 0.0, 0.0), 2).collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(top.head.getDouble(1) === 1.0)
  }

  test("LSH ANN returns the same top-1 as brute force on clustered data") {
    val embs = (0 until 100).map { i =>
      val base = if (i % 2 == 0) Seq(1.0f, 0.0f, 0.0f, 0.0f)
        else Seq(0.0f, 1.0f, 0.0f, 0.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) =>
        v + 0.01f * ((i * 7 + d) % 5) })
    }.toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val bf = Similarity.bruteForceTopK(embs, q, 1).head().getLong(0)
    val lsh = Similarity.lshTopK(embs, q, 1, planes = 6).head().getLong(0)
    assert(bf === lsh)
  }

  test("language id picks the language with most marker hits") {
    val got = TextAnalysis.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(got(0L) === "en")
    assert(got(3L) === "de")
    assert(got(5L) === "fr")
  }

  test("quality + token counts + fingerprints are stable and sane") {
    val q = TextAnalysis.qualityScore(docs).where(col("doc_id") === 0L).head()
    assert(q.getAs[Int]("n_tokens") === 9)
    assert(q.getAs[Double]("stopword_ratio") > 0.2)
    val t = TextAnalysis.tokenCounts(docs).where(col("doc_id") === 0L).head()
    assert(t.getAs[Int]("n_tokens") === 9)
    assert(t.getAs[Int]("n_distinct_tokens") === 8) // 'the' twice
    val f = TextAnalysis.fingerprint(docs).collect()
    assert(f.map(_.getAs[String]("content_md5")).distinct.length === 5) // 0==1
  }

  test("embedding near-dup via sign-LSH buckets") {
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.999f, 0.001f)),
      (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val nd = Dedup.embeddingNearDup(embs, planes = 4, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd === Set((0L, 1L)))
  }

  test("IVF ANN returns the same top-k as brute force on clustered data") {
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Seq(1.0f, 0.1f, 0.0f) else Seq(0.0f, 0.1f, 1.0f)
      (i.toLong, base.map(v => v + (i % 7) * 0.03f))
    }.toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.1, 0.0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSeq
    val brute = ids(Similarity.bruteForceTopK(vecs, q, k = 5, roundTo = 4))
    val ivf = ids(Similarity.ivfTopK(vecs, q, k = 5, numCentroids = 8,
      nProbe = 4, roundTo = 4))
    assert(ivf === brute)
  }

  test("native expressions are callable from spark.sql after registration") {
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("fn_docs")
    val r = spark.sql(
      """SELECT simhash64(text) AS sh,
        |  cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS cs,
        |  sign_lsh(array(1.0d, 2.0d, 3.0d), 8) AS bucket
        |FROM fn_docs WHERE doc_id = 0""".stripMargin).head()
    assert(r.getAs[Long]("sh") ===
      SimHash64.compute("the quick brown fox jumps over the lazy dog"))
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(r.getAs[Long]("bucket") === graft.functions.SignLsh.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(1.0, 2.0, 3.0)), 8, aFloat = false))
  }

  test("hot band-buckets collapse to a bounded star, not a k-squared clique") {
    // 2000 identical docs land in ONE bucket of every band: uncapped that
    // is ~2M clique candidates per band; the cap must emit exactly the
    // k-1 star pairs around the bucket's min doc_id, preserving the
    // transitive duplicate cluster
    val k = 2000
    val dupes = (0 until k).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta", "en"))
    val uniq = (0 until 5).map(i =>
      ((10000 + i).toLong,
        s"unique text number $i about topic-$i widgets sprockets gears", "en"))
    val skewed = (dupes ++ uniq).toDF("doc_id", "text", "lang")
    val mh = Dedup.minhashLsh(skewed, n = 3, numHashes = 64, bands = 16,
      threshold = 0.5, maxBucketSize = 100).collect()
    assert(mh.length === k - 1, s"expected ${k - 1} star pairs, got ${mh.length}")
    assert(mh.forall(_.getAs[Long]("id1") === 0L))
    assert(mh.forall(_.getAs[Double]("est_jaccard") === 1.0))
    val sh = Dedup.simhashNearDup(skewed, maxHamming = 3, bands = 4,
      maxBucketSize = 100).collect()
    assert(sh.length === k - 1)
    assert(sh.forall(r => r.getAs[Long]("id1") === 0L &&
      r.getAs[Int]("hamming") === 0))
  }

  test("dedup ops survive null-text documents") {
    val withNull = docs.union(
      Seq((99L, null.asInstanceOf[String], "en")).toDF("doc_id", "text", "lang"))
    // null text must neither throw nor pair with anything
    val j = Dedup.ngramJaccard(withNull, n = 3, threshold = 0.5).collect()
    assert(!j.exists(r => r.getLong(0) == 99L || r.getLong(1) == 99L))
    val m = Dedup.minhashLshExact(withNull, n = 3, threshold = 0.5).collect()
    assert(!m.exists(r => r.getLong(0) == 99L || r.getLong(1) == 99L))
    val s = Dedup.simhashExact(withNull, maxHamming = 3, n = 3,
      threshold = 0.9).collect()
    assert(!s.exists(r => r.getLong(0) == 99L || r.getLong(1) == 99L))
  }

  test("multimodal decode contract: engine features == independent sha256 recompute") {
    import graft.ops.Multimodal
    val corpus = graft.synth.CorpusSynth.serial(40, seed = 7L)
    val engineDocs = spark.createDataset(corpus.map(_._1))
    val got = Multimodal
      .extractFeatures(spark, Multimodal.mediaTable(spark, engineDocs))
      .collect()
      .map(f => (f.doc_id, f.media_ref) ->
        (f.kind, f.byte_len, f.width, f.height, f.n_frames))
      .toMap
    // independent recompute: every kind is a real format, so the expected
    // values are each format spec's header/size arithmetic re-derived from
    // the sha digest — never by calling fakePayload or the parsers
    val expected = corpus.flatMap { case (d, _) =>
      d.spans.filter(_.kind != "text").map { s =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
          .digest(s.media_ref.getBytes("UTF-8"))
        def b(i: Int) = java.lang.Byte.toUnsignedInt(md(i))
        val v: (String, Int, Int, Int, Int) = s.kind match {
          case "image" =>
            val w = 8 + b(1) % 56
            val h = 8 + b(2) % 56
            (s.kind, s"P6\n$w $h\n255\n".length + w * h * 3, w, h, 1)
          case "audio" =>
            val ch = 1 + b(1) % 2
            val nSamples = 100 * (1 + b(3) % 300)
            (s.kind, 44 + nSamples * ch * 2, (8000 + 100 * (b(2) % 80)) / 100,
              ch, nSamples / 100)
          case "video" =>
            val w = 16 + 2 * (b(1) % 24)
            val h = 16 + 2 * (b(2) % 24)
            val fr = 1 + b(3) % 12
            (s.kind, s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".length +
              fr * (6 + w * h * 3 / 2), w, h, fr)
          case _ =>
            val cols = 3 + b(1) % 6
            val rows = 5 + b(2) % 36
            (s.kind, rows * cols * 4, cols, rows, 1)
        }
        (d.doc_id, s.media_ref) -> v
      }
    }.toMap
    assert(expected.nonEmpty, "synth corpus produced no media spans")
    // all four kinds must actually occur, or the contract is under-tested
    assert(Set("image", "audio", "video", "table")
      .subsetOf(expected.values.map(_._1).toSet))
    assert(got === expected)
  }

  test("PPM decoder: real header parse, comments, bad-length rejection") {
    import graft.ops.Multimodal
    // hand-built 2x2 P6 with a header comment; pixels 0..11
    val px = Array.tabulate[Byte](12)(_.toByte)
    val good = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ px
    val (w, h, f, feat) = Multimodal.parsePpm(good)
    assert((w, h, f) === (2, 2, 1))
    assert(feat.length === 8)
    // feature bins are means of the actual pixel bytes (ascending here)
    assert(feat.head < feat.last)
    // truncated pixel array must be rejected, not silently misread
    assertThrows[IllegalArgumentException](
      Multimodal.parsePpm(good.dropRight(1)))
    assertThrows[IllegalArgumentException](
      Multimodal.parsePpm("P5\n2 2\n255\n".getBytes("US-ASCII") ++ px))
    // synthesized image payloads round-trip through the real parser
    val payload = Multimodal.fakePayload("image", "media://doc_x/0")
    val md = java.security.MessageDigest.getInstance("SHA-256")
      .digest("media://doc_x/0".getBytes("UTF-8"))
    def b(i: Int) = java.lang.Byte.toUnsignedInt(md(i))
    val (pw, ph, _, _) = Multimodal.parsePpm(payload)
    assert((pw, ph) === (8 + b(1) % 56, 8 + b(2) % 56))
  }

  test("WAV decoder: RIFF chunk walk, PCM validation, corrupt rejection") {
    import graft.ops.Multimodal
    val payload = Multimodal.fakePayload("audio", "media://doc_w/0")
    val md = java.security.MessageDigest.getInstance("SHA-256")
      .digest("media://doc_w/0".getBytes("UTF-8"))
    def b(i: Int) = java.lang.Byte.toUnsignedInt(md(i))
    val (srDiv, ch, frames, feat) = Multimodal.parseWav(payload)
    assert(srDiv === (8000 + 100 * (b(2) % 80)) / 100)
    assert(ch === 1 + b(1) % 2)
    assert(frames === 1 + b(3) % 300)
    assert(feat.length === 8 && feat.forall(f => f >= -1.0f && f <= 1.0f))
    // dispatch sniffs the RIFF magic
    assert(Multimodal.decode("audio", payload)._2 === ch)
    // a chunk the walker must skip (even-padded odd-size LIST before data)
    val lst = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 'x', 'y', 'z', 0)
    val withList = payload.take(36) ++ lst ++ payload.drop(36)
    val fixed = withList.clone()
    val newRiff = withList.length - 8
    Array(0, 8, 16, 24).zipWithIndex.foreach { case (sh, i) =>
      fixed(4 + i) = ((newRiff >> sh) & 0xff).toByte }
    assert(Multimodal.parseWav(fixed)._3 === frames)
    // corrupt: truncated data chunk, bad magic, RIFF size mismatch
    assertThrows[IllegalArgumentException](
      Multimodal.parseWav(payload.dropRight(1)))
    assertThrows[IllegalArgumentException](
      Multimodal.parseWav("JUNK".getBytes ++ payload.drop(4)))
    val badSize = payload.clone(); badSize(4) = (badSize(4) ^ 1).toByte
    assertThrows[IllegalArgumentException](Multimodal.parseWav(badSize))
    // adversarial chunk size >= 2^31: before the round-5 fix the size
    // truncated to a NEGATIVE Int, slipped past the overrun check, and
    // `pos += 8 + size` stopped advancing — this call HUNG the executor
    // task instead of throwing. (Keep the RIFF size field consistent so
    // the walk actually reaches the bogus chunk.)
    val evil = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](36, 0, 0, 0) ++ // RIFF size = total(44) - 8
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++
      Array[Byte](1, 0, 1, 0, 0x40, 0x1f, 0, 0, -128, 0x3e, 0, 0, 2, 0, 16, 0) ++
      "junk".getBytes("US-ASCII") ++
      Array[Byte](-8, -1, -1, -1) // size 0xFFFFFFF8 = 4294967288
    assert(evil.length === 44)
    assertThrows[IllegalArgumentException](Multimodal.parseWav(evil))
  }

  test("Y4M decoder: stream header, FRAME walk, 4:2:0 size validation") {
    import graft.ops.Multimodal
    val payload = Multimodal.fakePayload("video", "media://doc_v/3")
    val md = java.security.MessageDigest.getInstance("SHA-256")
      .digest("media://doc_v/3".getBytes("UTF-8"))
    def b(i: Int) = java.lang.Byte.toUnsignedInt(md(i))
    val (w, h, frames, feat) = Multimodal.parseY4m(payload)
    assert((w, h) === (16 + 2 * (b(1) % 24), 16 + 2 * (b(2) % 24)))
    assert(frames === 1 + b(3) % 12)
    assert(feat.length === 8 && feat.forall(f => f >= -1.0f && f <= 1.0f))
    assert(Multimodal.decode("video", payload)._3 === frames)
    // hand-built 2x2 single-frame stream with per-frame params (spec-legal)
    val tiny = "YUV4MPEG2 W2 H2 F30000:1001 Ip A0:0 C420 Xfoo\n".getBytes("US-ASCII") ++
      "FRAME Ixyz\n".getBytes("US-ASCII") ++ Array.tabulate[Byte](6)(_.toByte)
    val (tw, th, tf, _) = Multimodal.parseY4m(tiny)
    assert((tw, th, tf) === ((2, 2, 1)))
    // corrupt: truncated frame, missing FRAME marker, odd dims, bad chroma
    assertThrows[IllegalArgumentException](
      Multimodal.parseY4m(payload.dropRight(1)))
    assertThrows[IllegalArgumentException](Multimodal.parseY4m(
      "YUV4MPEG2 W2 H2 C420\nBOGUS\n      "
        .getBytes("US-ASCII")))
    assertThrows[IllegalArgumentException](Multimodal.parseY4m(
      "YUV4MPEG2 W3 H2 C420\n".getBytes("US-ASCII")))
    assertThrows[IllegalArgumentException](Multimodal.parseY4m(
      "YUV4MPEG2 W2 H2 C444\n".getBytes("US-ASCII")))
    // adversarial header whose w*h overflows Int (1073741824*2 = 2^31):
    // before the round-5 fix frameBytes went NEGATIVE, pos walked BACKWARD
    // and the frame loop buffered luma offsets forever — this call HUNG
    // then OOMed instead of throwing
    assertThrows[IllegalArgumentException](Multimodal.parseY4m(
      ("YUV4MPEG2 W1073741824 H2 C420\n" + "FRAME\nxxxx")
        .getBytes("US-ASCII")))
    // and the PPM analog: 65536x65536 overflows the Int pixel product to
    // a small value that could collide with the remaining byte count
    assertThrows[IllegalArgumentException](Multimodal.parsePpm(
      "P6\n65536 65536\n255\n".getBytes("US-ASCII")))
  }

  test("CSV table decoder: rectangularity + numeric validation") {
    import graft.ops.Multimodal
    val payload = Multimodal.fakePayload("table", "media://doc_t/1")
    val md = java.security.MessageDigest.getInstance("SHA-256")
      .digest("media://doc_t/1".getBytes("UTF-8"))
    def b(i: Int) = java.lang.Byte.toUnsignedInt(md(i))
    val (cols, rows, one, feat) = Multimodal.parseCsvTable(payload)
    assert((cols, rows, one) === (3 + b(1) % 6, 5 + b(2) % 36, 1))
    assert(feat.length === 8 && feat.forall(f => f >= -1.0f && f <= 1.0f))
    assert(Multimodal.decode("table", payload)._1 === cols)
    // ragged and non-numeric tables must be rejected
    assertThrows[IllegalArgumentException](
      Multimodal.parseCsvTable("1,2,3\n4,5\n".getBytes("US-ASCII")))
    assertThrows[IllegalArgumentException](
      Multimodal.parseCsvTable("1,2\n3,x\n".getBytes("US-ASCII")))
    // unknown-format payload for a non-table kind falls back to the stub
    val junk = Array.tabulate[Byte](80)(i => (i * 7).toByte)
    val (dw, dh, df, dfeat) = Multimodal.decode("audio", junk)
    val (sw, sh, sf, sfeat) = Multimodal.decodeStub("audio", junk)
    assert((dw, dh, df) === ((sw, sh, sf)))
    assert(dfeat.toSeq === sfeat.toSeq)
  }

  test("hash split is deterministic, complete, and matches reference md5 buckets") {
    val ids = spark.range(0, 2000).toDF("doc_id")
    val got = Sampling.hashSplit(ids).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.size === 2000)
    // cross-engine reference: md5("42")[0:8] = a1d0c6e8 -> 2714814184 % 100 = 84
    assert(got(42L) === ((84L, "val")))
    // every bucket within [0,100); split labels consistent with bucket
    got.values.foreach { case (b, s) =>
      assert(b >= 0 && b < 100)
      assert(s === (if (b < 80) "train" else if (b < 90) "val" else "test"))
    }
    // rates roughly match the configured percentages on 2000 uniform keys
    val byCat = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(math.abs(byCat("train") - 1600) < 100)
    assert(math.abs(byCat("val") - 200) < 60)
    // repartitioning does not move any document between folds
    val again = Sampling.hashSplit(ids.repartition(7)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again === got)
  }

  test("hash sample keeps a stable subset at the configured fraction") {
    val ids = spark.range(0, 5000).toDF("doc_id")
    val s1 = Sampling.sampleByHash(ids, fraction = 0.2).collect()
      .map(_.getLong(0)).toSet
    assert(math.abs(s1.size - 1000) < 120)
    // deterministic across runs; salted sample decorrelates
    val s2 = Sampling.sampleByHash(ids, fraction = 0.2).collect()
      .map(_.getLong(0)).toSet
    assert(s2 === s1)
    val salted = Sampling.sampleByHash(ids, fraction = 0.2, salt = "x")
      .collect().map(_.getLong(0)).toSet
    assert(salted !== s1)
  }

  test("tf-idf top terms rank corpus-rare terms above ubiquitous ones") {
    val corpus = Seq(
      (0L, "alpha alpha beta common common"),
      (1L, "beta gamma common common"),
      (2L, "delta delta delta common")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(corpus, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(5)) -> r.getString(1)).toMap
    // "common" appears in every doc -> idf ln(4/4)=0 -> never outranks
    // a doc-local term; doc 0's top term is the doubled doc-rare "alpha"
    assert(got((0L, 1L)) === "alpha")
    assert(got((2L, 1L)) === "delta")
    assert(!got.values.toSet.contains("common") ||
      got.count(_._2 == "common") < 3)
    // scores are 4dp-rounded, tf/df are exact counts
    val row0 = TextAnalysis.tfidfTopTerms(corpus, k = 1)
      .where(col("doc_id") === 0L).collect().head
    assert(row0.getLong(2) === 2L) // tf(alpha, doc0)
    assert(row0.getLong(3) === 1L) // df(alpha)
    assert(row0.getDouble(4) === BigDecimal(2.0 * math.log(4.0 / 2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("stratified hash sample applies per-stratum fractions and nests") {
    val rows = spark.range(0, 3000).toDF("doc_id")
      .withColumn("lang",
        when(col("doc_id") % 3 === 0, "en")
          .when(col("doc_id") % 3 === 1, "de").otherwise("fr"))
    val got = Sampling.stratifiedSampleByHash(rows,
      fractions = Map("en" -> 0.5, "de" -> 0.2), defaultFraction = 0.05)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("en") - 500) < 80)
    assert(math.abs(got("de") - 200) < 60)
    assert(got.getOrElse("fr", 0L) < 110)
    // nesting: the 20% German sample is a subset of a 50% German sample
    val de20 = Sampling.stratifiedSampleByHash(rows,
      fractions = Map("de" -> 0.2)).collect().map(_.getLong(0)).toSet
    val de50 = Sampling.stratifiedSampleByHash(rows,
      fractions = Map("de" -> 0.5)).collect().map(_.getLong(0)).toSet
    assert(de20.subsetOf(de50))
  }

  test("sequence packing: shard-local running layout, chop every maxTokens") {
    val rows = Seq(
      (10L, "a b c d e"),        // 5 tokens
      (20L, "f g h i j k l m"),  // 8 tokens
      (30L, "n o p")             // 3 tokens
    ).toDF("doc_id", "text")
    // one shard so the layout is a single deterministic stream
    val got = Sampling.packSequences(rows, maxTokens = 6, shards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    // doc 10 starts at token 0 (seq 0); doc 20 at 5 (seq 0, offset 5,
    // straddles into seq 1); doc 30 at 13 (seq 2, offset 1)
    assert(got.toSeq === Seq((10L, 0L, 0L, 0L), (20L, 5L, 0L, 5L),
      (30L, 13L, 2L, 1L)))
    // shard invariants on a larger corpus: offsets bounded, layout is
    // repartition-independent
    val big = spark.range(0, 500).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        lit("w"), col("doc_id").cast("string"), lit("x y")))
    val a = Sampling.packSequences(big, maxTokens = 7, shards = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(a.values.forall(_._2 < 7))
    val b = Sampling.packSequences(big.repartition(13), maxTokens = 7,
      shards = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(b === a)
  }

  test("keep-best retention picks max score per cluster, min-id ties") {
    val clusters = Seq(("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"),
      ("e", "d")).toDF("doc_id", "canonical_doc_id")
    val scored = Seq(("a", 10L), ("b", 50L), ("c", 50L), ("d", 7L),
      ("e", 3L)).toDF("doc_id", "score")
    val got = Dedup.keepBestPerCluster(clusters, scored).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    // cluster a: b and c tie at 50 -> min doc_id "b" wins; size 3
    assert(got("a") === (("b", 50L, 3L)))
    assert(got("d") === (("d", 7L, 2L)))
  }

  test("near-dup cluster canonicalization: transitive closure, min-id canonical") {
    // A-B, B-C chain (transitive: one cluster even with no direct A-C pair)
    // plus an independent D-E pair: two clusters, canonical = min id
    val pairs = Seq(("b", "a"), ("b", "c"), ("e", "d")).toDF("id1", "id2")
    val got = Dedup.clusterNearDups(spark, pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d"))
  }

  test("decontamination flags train docs sharing an n-gram with eval") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // shares 4-gram w/ eval
      (11L, "one two three four five six seven")    // clean
    ).toDF("doc_id", "text")
    val evalDf = Seq(
      (90L, "prefix alpha beta gamma delta suffix tail")
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, evalDf, n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // train 10 has 3 distinct 4-grams; exactly one ("alpha beta gamma
    // delta") occurs in eval
    assert(got.toSeq === Seq((10L, 1L, 0.333333)))
  }

  test("bm25 ranks by the Okapi formula with rounded-score rank order") {
    val d = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(d, Seq("apple", "banana"), topK = 10)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("score"), r.getAs[Long]("rank")))
    // hand check: N=3, avgdl=2, df(apple)=1, df(banana)=2
    val idfA = math.log(1.0 + (3 - 1 + 0.5) / 1.5)
    val idfB = math.log(1.0 + (3 - 2 + 0.5) / 2.5)
    def term(idf: Double, tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.0))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = r4(term(idfA, 2, 3) + term(idfB, 1, 3))
    val s2 = r4(term(idfA, 0, 2) + term(idfB, 1, 2))
    assert(got.toSeq === Seq((1L, 3L, s1, 1L), (2L, 2L, s2, 2L)))
  }

  test("bigram perplexity: add-one smoothed corpus LM mean NLL") {
    val d = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "x") // single token -> no bigrams -> not emitted
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramPerplexity(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("avg_nll"))).sortBy(_._1)
    // corpus: C(a,b)=3, C(b,a)=1 -> ctx C(a)=3, C(b)=1; V=3 (a,b,x)
    def nll6(c: Long, ctx: Long) = BigDecimal(-math.log((c + 1.0) / (ctx + 3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ab = nll6(3, 3); val ba = nll6(1, 1)
    assert(got.toSeq === Seq(
      (1L, 3L, r4((ab + ba + ab) / 3)),
      (2L, 1L, r4(ab))))
  }

  test("repetition stats: dup-line fractions and top-bigram fraction") {
    val d = Seq(
      (0L, "a b\na b\nc d"), // "a b" twice of 3 lines
      (1L, "x y\nz w"),      // no duplicate lines
      (2L, "solo")           // 1 token: no bigrams at all
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Long]("n_lines") === 3L)
    assert(got(0L).getAs[Double]("dup_line_frac") === 0.666667)
    // dup chars 2*3 ("a b" twice) over total 9 ("a b","a b","c d")
    assert(got(0L).getAs[Double]("dup_line_char_frac") === 0.666667)
    // tokens a b a b c d -> bigrams: "a b" x2 of 5 total
    assert(got(0L).getAs[Double]("top_bigram_frac") === 0.4)
    assert(got(1L).getAs[Double]("dup_line_frac") === 0.0)
    assert(got(1L).getAs[Double]("top_bigram_frac") === 0.333333)
    assert(got(2L).getAs[Long]("n_lines") === 1L)
    assert(got(2L).getAs[Double]("top_bigram_frac") === 0.0)
  }

  test("pii scrub: counts on original text, typed tags in redaction") {
    val d = Seq(
      (0L, "mail bob@x.io or web@a-b.org at 10.1.2.3 tel +1 555 0100 end"),
      (1L, "no pii here at all")
    ).toDF("doc_id", "text")
    val stats = TextAnalysis.piiStats(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(stats(0L).getAs[Int]("n_emails") === 2)
    assert(stats(0L).getAs[Int]("n_ipv4") === 1)
    assert(stats(0L).getAs[Int]("n_phones") === 1)
    assert(stats(1L).getAs[Int]("n_emails") === 0)
    val red = d.select(col("doc_id"),
      TextAnalysis.redactPii(col("text")).as("r")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(0L) ===
      "mail <EMAIL> or <EMAIL> at <IP> tel <PHONE> end")
    assert(red(1L) === "no pii here at all")
  }

  test("incremental near-dup pairs touch the new batch, never old x old") {
    val mk = (id: Long, tail: String) =>
      (id, s"the quick brown fox jumps over the lazy $tail")
    val old = Seq(mk(0L, "dog today"), mk(1L, "dog today"), // old dup pair
      (2L, "completely unrelated corpus text about engines and planes"))
      .toDF("doc_id", "text")
    val fresh = Seq(mk(10L, "dog today"),                    // dups 0 and 1
      (11L, "nothing like anything already present here at all"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(old, fresh, n = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 10L), (1L, 10L)), got.toString) // no (0,1)
  }

  test("incremental hot-bucket star keeps new x old pairs when the hub " +
      "is a NEW doc") {
    // identical texts -> every band bucket holds all four docs; with
    // maxBucketSize = 2 each bucket is hot and collapses to a star around
    // its min doc_id — which here is the NEW doc 1. Before the round-5
    // fix, star edges were drawn only FROM new members, so a new-doc hub
    // produced zero pairs and the duplicate entered the corpus undetected.
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val old = Seq((10L, t), (11L, t), (12L, t)).toDF("doc_id", "text")
    val fresh = Seq((1L, t)).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(old, fresh, n = 3, threshold = 0.7,
      maxBucketSize = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hub(1, new) x each old member; old x old stays excluded
    assert(got === Set((1L, 10L), (1L, 11L), (1L, 12L)), got.toString)
  }

  test("lengthStats computes exact interpolated percentiles per stratum") {
    val d = Seq(
      (0L, "a", "en"), (1L, "a b", "en"), (2L, "a b c", "en"),
      (3L, "a b c d e f g h i", "en"), (4L, "x y z", "de")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.lengthStats(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = got("en")
    assert(en.getAs[Long]("n_docs") === 4L)
    assert(en.getAs[Double]("mean_tokens") === 3.75)
    assert(en.getAs[Double]("p50") === 2.5)   // interp of [1,2,3,9]
    assert(en.getAs[Double]("p90") === 7.2)   // 3 + 0.7*(9-3)
    assert(en.getAs[Double]("p99") === 8.82)  // 3 + 0.97*(9-3)
    assert(got("de").getAs[Double]("p50") === 3.0)
  }

  test("asof backward join: inclusive, per-key, null-safe payloads") {
    val left = Seq(("a", 1L, 100L), ("a", 5L, 101L), ("a", 10L, 102L),
      ("b", 7L, 103L)).toDF("k", "t", "lid")
    val right = Seq(("a", 2L, 20L, Some("x")), ("a", 5L, 50L, None))
      .toDF("k", "rt", "rv", "tag")
    val got = graft.ops.AsofJoin.backward(left, right, keys = Seq("k"),
      leftTime = "t", rightTime = "rt").collect()
      .map(r => r.getAs[Long]("lid") ->
        ((Option(r.getAs[java.lang.Long]("rv")).map(_.toLong),
          Option(r.getAs[String]("tag"))))).toMap
    assert(got(100L) === ((None, None)))            // nothing at or before 1
    assert(got(101L) === ((Some(50L), None)))       // inclusive t=5; tag
    // legitimately null but rv must NOT fall back to the t=2 row
    assert(got(102L) === ((Some(50L), None)))       // latest before 10
    assert(got(103L) === ((None, None)))            // key b has no rights
  }

  test("dsir: target-like docs score higher; short docs score zero") {
    val target = Seq(
      (100L, "alpha beta alpha beta gamma"),
      (101L, "alpha beta gamma alpha")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (0L, "alpha beta alpha beta"),            // pure target bigrams
      (1L, "zzz yyy xxx www vvv uuu"),          // never seen in target
      (2L, "alpha beta zzz yyy"),               // mixed
      (3L, "solo")                              // < 2 tokens -> no bigrams
    ).toDF("doc_id", "text")
    val got = graft.ops.Dsir.importanceWeights(raw, target, dim = 64)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got(3L) === ((0L, 0.0)))
    assert(got(0L)._1 === 3L)
    // target-like beats mixed beats off-target
    assert(got(0L)._2 > got(2L)._2, got.toString)
    assert(got(2L)._2 > got(1L)._2, got.toString)
    assert(got(1L)._2 < 0.0, got.toString)
  }

  test("dsir gumbel top-k is deterministic and ranks by key") {
    val target = Seq((100L, "alpha beta alpha")).toDF("doc_id", "text")
    val raw = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) "alpha beta alpha beta" else "zzz yyy xxx"))
      .toDF("doc_id", "text")
    val w = graft.ops.Dsir.importanceWeights(raw, target, dim = 64)
    val a = graft.ops.Dsir.gumbelTopK(w, k = 5).collect()
    val b = graft.ops.Dsir.gumbelTopK(w, k = 5).collect()
    assert(a.length === 5)
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    val keys = a.map(_.getDouble(3))
    assert(keys.sameElements(keys.sorted.reverse), keys.toSeq.toString)
    // weight dominates the bounded gumbel noise here: winners are
    // mostly target-like docs
    val winners = a.map(_.getLong(0)).toSet
    assert(winners.count(_ % 3 == 0) >= 3, winners.toString)
  }

  test("minhash banding recall is provable at the gate thresholds") {
    // analytic: the LSH-then-verify equality contract needs a negligible
    // per-pair miss probability AT the verification threshold. The gate
    // configs (q_dedup_minhash / q_dedup_incremental / CurateJob: 64
    // hashes x 32 bands, verify >= 0.7; q_dedup_simhash recall floor:
    // verify >= 0.9) all clear 1e-4 by orders of magnitude, while the
    // pre-round-3 16-band config demonstrably did NOT (~1.2% miss) -- this
    // assertion pins the (r, b) choice so a future edit cannot silently
    // turn the DuckDB equality rows into corpus luck.
    assert(Dedup.bandingMissProb(0.7, 64, 32) < 1e-4)
    assert(Dedup.bandingMissProb(0.9, 64, 32) < 1e-4)
    assert(Dedup.bandingMissProb(0.7, 64, 16) > 1e-2)

    // empirical: a corpus DENSE in borderline pairs (true Jaccard sweeping
    // ~0.42..1.0 across per-pair-private vocabularies, straddling the 0.7
    // gate) must yield EXACTLY the all-pairs ground truth through the
    // banded path -- including the pairs sitting just above the threshold,
    // the ones a recall-deficient banding drops first.
    val borderline = (0 until 24).flatMap { k =>
      val base = (0 until 40).map(i => s"p${k}w$i")
      val m = 24 + (k % 9) * 2 // 24, 26, .. 40: J from ~0.42 to 1.0
      val b = base.take(m) ++ (0 until (40 - m)).map(i => s"p${k}x$i")
      Seq((2L * k, base.mkString(" ")), (2L * k + 1, b.mkString(" ")))
    }.toDF("doc_id", "text")
    val want = Dedup.ngramJaccard(borderline, n = 3, threshold = 0.7,
      maxShingleDf = 1000000L)
      .select("id1", "id2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.minhashLshExact(borderline, n = 3, numHashes = 64,
      bands = 32, threshold = 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    // the corpus really does straddle the gate: pairs just above AND just
    // below the threshold both exist
    assert(want.exists { case (_, _, j) => j >= 0.7 && j < 0.78 }, want)
    assert(want.nonEmpty && want.size < 24)
  }
}
