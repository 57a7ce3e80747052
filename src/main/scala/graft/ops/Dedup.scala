package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Deduplication operators for a large-scale training-data pipeline, over a
  * documents table (doc_id, text, ...).
  *
  * Scale design notes (100 TB posture):
  *   - exact dedup is one hash-groupBy shuffle on a 16-byte key;
  *   - near-dup methods NEVER do an all-pairs product: candidate pairs come
  *     from an inverted shingle index (Jaccard), LSH band buckets (MinHash),
  *     or Hamming band buckets (SimHash) — the standard sub-quadratic
  *     blocking constructions;
  *   - every pair generator is frequency-capped: ultra-hot shingles are
  *     dropped (negligible evidence, quadratic pairs), and over-cap band
  *     buckets collapse to a star around the bucket's min doc (transitive
  *     duplicate clusters survive; the k² clique never materializes);
  *   - every pair generator emits (id1 < id2) so downstream joins/groupBys
  *     shuffle once on the pair key;
  *   - all hashing is xxhash64/crc32/md5 column functions — codegen'd,
  *     deterministic, no UDFs;
  *   - the shingle set is computed ONCE per corpus (`withShingles`) and
  *     shared by Jaccard candidate gen, MinHash signatures and exact
  *     verification — one scan of the text column, not one per variant.
  */
object Dedup {

  private def wsTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Per-pair probability that (bands × rows) MinHash banding MISSES a
    * pair with true Jaccard j: (1 − j^rows)^bands, rows = numHashes/bands.
    * The LSH-then-verify entry points promise their output EQUALS the
    * exact all-pairs result, which holds iff this is negligible at the
    * verification threshold — the gate configs keep it under 1e-4 there
    * (64 hashes × 32 bands at j = 0.7: ≈ 4e-10), asserted as an OpsSpec
    * property so a future (r, b) change cannot silently turn the equality
    * contract into corpus luck (the pre-round-3 16×4 banding had a ~1.2%
    * per-pair miss at 0.7).
    */
  def bandingMissProb(j: Double, numHashes: Int, bands: Int): Double = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    math.pow(1.0 - math.pow(j, rows.toDouble), bands.toDouble)
  }

  /** Exact dedup: group by md5(text); canonical = min(doc_id); emits only
    * groups with >1 member (the duplicate sets).
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text").cast("binary")).as("content_md5"))
      .agg(count(lit(1)).as("dup_count"),
        min(col("doc_id")).as("canonical_doc_id"),
        array_sort(collect_list(col("doc_id"))).as("doc_ids"))
      .where(col("dup_count") > 1)

  /** Compiled shingling kernel (distinct word n-grams of the lowercased
    * text, each hashed to its 64-bit xxhash64 IN the kernel): the
    * column-HOF formulation (transform + slice per position) is interpreted
    * row-by-row and was ~30x slower. Hashing here instead of downstream is
    * the shuffle-fewer-bytes rule applied once for every consumer: the
    * inverted index, the MinHash signature aggregation and the exact-
    * Jaccard verify all key on the 64-bit hash anyway, so the n-gram STRING
    * never leaves the kernel — the shingle table shrinks ~4x and the
    * signature pass hashes 8-byte longs instead of re-hashing ~30-byte
    * strings 64 times. XXH64.hashUTF8String(seed 42) is bit-equal to the
    * SQL `xxhash64(stringCol)` these consumers used to apply (pinned by an
    * OpsSpec test), so hash-keyed outputs are unchanged.
    */
  private def shingleArr(n: Int) = udf { (text: String) =>
    // Scala UDFs receive raw nulls for AnyRef args — a null-text document
    // must not kill the whole dedup job
    if (text == null) Array.empty[Long]
    else {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length >= n)
        // sorted ascending: the exact-Jaccard verify intersects these with
        // a two-pointer merge kernel (SortedInterCount), and a sorted array
        // is also a deterministic cache/shuffle representation
        Iterator.range(0, toks.length - n + 1)
          .map(i => XXH64.hashUTF8String(
            UTF8String.fromString(toks.slice(i, i + n).mkString(" ")), 42L))
          .toSet.toArray.sorted
      else Array.empty[Long]
    }
  }

  /** (doc_id, sh): each doc's distinct n-gram shingle set as 64-bit
    * xxhash64 values (see shingleArr — collisions are negligible at any
    * realistic distinct-shingle count, the same posture as lineDedupStats),
    * computed once by the compiled kernel. doc_id keeps its ORIGINAL type
    * (long testdata ids and string sha2 ids both work). Callers that run
    * several dedup variants over one corpus should persist this and pass it
    * to the `*Sh` entry points — one text scan serves them all.
    */
  def withShingles(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), shingleArr(n)(col("text")).as("sh"))

  /** Inverted shingle index rows (doc_id, sh_size, shingle) — `shingle` is
    * the kernel's 64-bit xxhash64 of the n-gram, see withShingles.
    */
  def shingleRows(docs: DataFrame, n: Int): DataFrame =
    shingleRowsSh(withShingles(docs, n))

  def shingleRowsSh(docsSh: DataFrame): DataFrame =
    docsSh.select(col("doc_id"), size(col("sh")).as("sh_size"),
      explode(col("sh")).as("shingle"))

  /** N-gram Jaccard near-dup: inverted-index self-join on shingles →
    * per-pair intersection counts → |A∩B| / (|A|+|B|−|A∩B|) >= threshold.
    * Sub-quadratic as long as shingle doc-frequency is bounded; ultra-hot
    * shingles (df > maxShingleDf) are dropped from the index, the standard
    * frequency cap (they contribute negligible Jaccard evidence but
    * quadratic pairs).
    *
    * Physical shape: the index joins on the shingle's xxhash64 — an 8-byte
    * shuffle key instead of the n-gram string (64-bit collisions are
    * negligible at any realistic distinct-shingle count; the hashing
    * happens once, in the shingling kernel) — and the hot-shingle cap is a
    * broadcast ANTI join against the (tiny) hot set rather than an inner
    * join against the (huge) cold set.
    */
  def ngramJaccard(docs: DataFrame, n: Int = 4, threshold: Double = 0.6,
      maxShingleDf: Long = 1000L): DataFrame =
    ngramJaccardSh(withShingles(docs, n), threshold, maxShingleDf)

  def ngramJaccardSh(docsSh: DataFrame, threshold: Double = 0.6,
      maxShingleDf: Long = 1000L): DataFrame = {
    val inv = shingleRowsSh(docsSh)
      .select(col("doc_id"), col("sh_size"), col("shingle").as("h"))
    val hot = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") > lit(maxShingleDf))
    val capped = inv.join(broadcast(hot), Seq("h"), "left_anti")
    val a = capped.select(col("h"), col("doc_id").as("id1"), col("sh_size").as("n1"))
    val b = capped.select(col("h").as("h2"), col("doc_id").as("id2"), col("sh_size").as("n2"))
    a.join(b, col("h") === col("h2") && col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"), first(col("n1")).as("n1"),
        first(col("n2")).as("n2"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")), 6))
      .where(col("jaccard") >= lit(threshold))
      .select("id1", "id2", "inter", "jaccard")
  }

  // (A column-HOF shingling + nested-transform MinHash signature pair used
  // to live here as the rejected first formulation; deleted as dead code —
  // the measured 30x/50x interpreted-vs-codegen numbers that killed it are
  // recorded at shingleArr and minhashLshSh below, which are the one
  // maintained path. The i-th "permutation" is the seeded combined hash
  // xxhash64(shingle_hash, i) over the kernel's 64-bit shingle hash: hash
  // composition instead of an affine transform — identical independence
  // properties, no long-multiply overflow under ANSI mode, and each of the
  // 64 evaluations hashes 8 fixed bytes instead of re-hashing the ~30-byte
  // n-gram string.)

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs; estimated Jaccard = fraction of equal signature positions;
    * keep pairs >= threshold. bands must divide numHashes.
    *
    * The signature is computed via explode + an N-way min hash-aggregate
    * rather than nested `transform` lambdas: higher-order-function
    * expressions are interpreted (no whole-stage codegen), which made the
    * nested form ~50x slower; the explode/agg form is fully codegen'd with
    * map-side partial mins, and its one shuffle carries only
    * (doc_id, numHashes longs) per doc.
    *
    * Hot-bucket cap (the boilerplate-corpus scale guard): a band bucket
    * holding k near-identical docs would emit k²/2 clique pairs; buckets
    * with > maxBucketSize members instead emit a STAR around the bucket's
    * min doc_id (k−1 pairs). Transitive duplicate clusters are preserved —
    * downstream clustering reconnects the clique through the hub — while
    * candidate volume stays linear in bucket size. Cold buckets are
    * untouched, so at the df observed on the test corpus the output is
    * bit-identical to the uncapped run.
    */
  def minhashLsh(docs: DataFrame, n: Int = 4, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.5,
      maxBucketSize: Long = 5000L): DataFrame =
    minhashLshSh(withShingles(docs, n), numHashes, bands, threshold,
      maxBucketSize)

  def minhashLshSh(docsSh: DataFrame, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.5,
      maxBucketSize: Long = 5000L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val inv = docsSh.select(col("doc_id"), explode(col("sh")).as("s"))
    val sig = graft.core.SessionCaches.register(inv.groupBy(col("doc_id"))
      .agg(array((0 until numHashes).map(i =>
        min(xxhash64(col("s"), lit(i)))): _*).as("sig"))
      // persisted WITHOUT a matching unpersist: the returned pair frame is
      // lazy, so the cache must outlive this function (unpersisting here
      // would drop it before the caller's action). (doc_id + numHashes
      // longs)/doc, ~0.5 KB/doc; registered with SessionCaches so a
      // long-lived multi-job session can release it structurally between
      // jobs (graft.core.SessionCaches.release) instead of clearCache()
      .persist())
    // bucket key = xxhash64 over the band's signature slice passed as
    // DIRECT long arguments (bucket equality ⇔ slice equality, modulo a
    // 64-bit collision — the same grouping semantics as hashing the
    // stringified slice, at a fraction of the expression tree: the
    // previous concat_ws-over-cast-to-string formulation was both slower
    // per row and the dominant Janino codegen-compile cost of the whole
    // candidate pass)
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until rows).map(r =>
            element_at(col("sig"), b * rows + r + 1)): _*).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // hot buckets WITH their hub in one aggregate (tiny by construction:
    // ≤ |banded| / maxBucketSize rows; agg state is 16 bytes/group — the
    // hub SIGNATURE is fetched afterwards by a broadcast join against the
    // banded rows rather than carried as min_by agg state, which would put
    // a 64-long array per group into every partial-agg hash map)
    val hot0 = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bc"), min(col("doc_id")).as("hub_id"))
      .where(col("bc") > lit(maxBucketSize))
      .select(col("band"), col("bucket"), col("hub_id"))
    val hot = hot0.select(col("band"), col("bucket"))
    val cold = banded.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val l = cold.select(col("band"), col("bucket"),
      col("doc_id").as("id1"), col("sig").as("sig1"))
    val r = cold.select(col("band").as("band2"), col("bucket").as("bucket2"),
      col("doc_id").as("id2"), col("sig").as("sig2"))
    val cliquePairs = l.join(r,
        col("band") === col("band2") && col("bucket") === col("bucket2") &&
          col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sig1"), col("sig2"))
    // star pairs for over-cap buckets: hub = min doc_id (so hub < member
    // always holds in the id ordering and the (id1 < id2) invariant stands)
    val hotRows = banded.join(broadcast(hot), Seq("band", "bucket"), "left_semi")
    val hubs = banded.join(broadcast(hot0),
        Seq("band", "bucket")).where(col("doc_id") === col("hub_id"))
      .select(col("band"), col("bucket"), col("hub_id"),
        col("sig").as("hub_sig"))
    val starPairs = hotRows.join(broadcast(hubs), Seq("band", "bucket"))
      .where(col("doc_id") =!= col("hub_id"))
      .select(col("hub_id").as("id1"), col("doc_id").as("id2"),
        col("hub_sig").as("sig1"), col("sig").as("sig2"))
    cliquePairs.union(starPairs)
      .dropDuplicates("id1", "id2")
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig1"), col("sig2"),
          (a, b) => a === b), x => x)).cast("double") / lit(numHashes), 6))
      .where(col("est_jaccard") >= lit(threshold))
      .select("id1", "id2", "est_jaccard")
  }

  /** Exact-Jaccard verification of a candidate pair list: each side joins
    * to its distinct-shingle set and the pair intersects in place — the
    * standard LSH-then-verify shape, so verification cost scales with
    * |candidates| (tiny), never all pairs. This also makes hash-blocked
    * dedup DuckDB-checkable: the output is exact Jaccard >= threshold,
    * which an oracle can recompute without knowing the hashing.
    */
  def verifyJaccard(docs: DataFrame, cands: DataFrame, n: Int,
      threshold: Double): DataFrame =
    verifyJaccardSh(withShingles(docs, n), cands, threshold)

  def verifyJaccardSh(docsSh: DataFrame, cands: DataFrame,
      threshold: Double): DataFrame = {
    // shingles arrive as 64-bit longs straight from the shingling kernel:
    // the per-pair intersect compares longs, not UTF8 strings (same values
    // the pre-hashed table carries everywhere; DuckDB-verified
    // collision-free on this corpus)
    val sets = docsSh.select(col("doc_id"), col("sh"))
    // size screen before shipping arrays: J(A,B) <= min/max sizes, so a
    // pair whose sizes are farther apart than the threshold ratio cannot
    // qualify — only ids travel through this filter
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("sz"))
    val screened = cands.select("id1", "id2")
      .join(sizes.select(col("doc_id").as("id1"), col("sz").as("n1")), Seq("id1"))
      .join(sizes.select(col("doc_id").as("id2"), col("sz").as("n2")), Seq("id2"))
      .where(least(col("n1"), col("n2")).cast("double") >=
        lit(threshold) * greatest(col("n1"), col("n2")))
      .select("id1", "id2")
    // intersection via the native two-pointer kernel over the SORTED
    // arrays: the Jaccard predicate gets pushed into the pair join's
    // condition with its intersect subexpression duplicated (numerator +
    // union denominator, then again in the output projection), and each
    // size(array_intersect(...)) evaluation built a per-row hash set and a
    // result array — on a candidate-heavy generator (q_dedup_simhash emits
    // ~116k Hamming-<=7 candidates at sf0.1) that was most of the verify's
    // cost. The kernel walk is allocation-free, so even duplicated
    // evaluations are cheap; values are identical (both count the distinct
    // common elements; withShingles arrays are distinct by construction)
    val interC = graft.functions.SortedInterCount.sortedInterCount(
      col("sh1"), col("sh2"))
    screened
      .join(sets.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sets.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter", interC.cast("int"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")), 6))
      .where(col("jaccard") >= lit(threshold))
      .select("id1", "id2", "jaccard")
  }

  /** MinHash LSH candidates + exact-Jaccard verify: emits the pairs whose
    * TRUE Jaccard >= threshold among band-bucket candidates. Equals the
    * exact all-pairs result whenever banding recall is ~1 at the threshold;
    * with the default 32 bands x 2 rows the per-pair miss probability at
    * J = 0.7 is (1 − 0.7²)³² ≈ 4e-10 — provable recall at the gate
    * threshold (the previous 16x4 banding had a ~1.2% per-pair miss there,
    * making the DuckDB equality contract corpus-dependent). The looser
    * 2-row bands admit more moderate-J candidates; the size screen + exact
    * verify absorb them at cost linear in |candidates|.
    */
  def minhashLshExact(docs: DataFrame, n: Int = 4, numHashes: Int = 64,
      bands: Int = 32, threshold: Double = 0.5): DataFrame =
    minhashLshExactSh(withShingles(docs, n), numHashes, bands, threshold)

  def minhashLshExactSh(docsSh: DataFrame, numHashes: Int = 64,
      bands: Int = 32, threshold: Double = 0.5,
      maxBucketSize: Long = 5000L): DataFrame = {
    val cands = minhashLshSh(docsSh, numHashes, bands, threshold = 0.0,
      maxBucketSize)
    verifyJaccardSh(docsSh, cands, threshold)
  }

  /** MinHash band-bucket index rows (doc_id, band, bucket) — the table an
    * incremental pipeline PERSISTS between ingest batches so the corpus
    * side of a daily-crawl dedup is a stored index, not a recomputation.
    * Same signature arithmetic as minhashLshSh (explode + N-way min
    * hash-aggregate, fully codegen'd; one shuffle of (doc_id, 64 longs)).
    */
  def bandBuckets(docsSh: DataFrame, numHashes: Int = 64,
      bands: Int = 32): DataFrame =
    bandBucketsFlagged(docsSh.withColumn("is_new", lit(false)),
      numHashes, bands).drop("is_new")

  /** [[bandBuckets]] with an `is_new` marker column carried through the
    * signature aggregation — lets an incremental caller compute ONE
    * signature pass over old ∪ new and split afterwards.
    */
  private def bandBucketsFlagged(docsSh: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val inv = docsSh.select(col("doc_id"), col("is_new"),
      explode(col("sh")).as("s"))
    inv.groupBy(col("doc_id"), col("is_new"))
      .agg(array((0 until numHashes).map(i =>
        min(xxhash64(col("s"), lit(i)))): _*).as("sig"))
      .select(col("doc_id"), col("is_new"),
        // direct-long bucket hash, same formulation (and rationale) as
        // minhashLshSh's banding
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((0 until rows).map(r =>
              element_at(col("sig"), b * rows + r + 1)): _*).as("bucket"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("is_new"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  /** Incremental near-dup screen — dedup a NEW batch against an existing
    * corpus without ever re-pairing old×old: candidates are band-bucket
    * collisions touching at least one new doc (new×old and new×new), then
    * exact-Jaccard verified. At scale the old side is the persisted
    * [[bandBuckets]] index, so each batch costs one bucket-keyed equi-join
    * proportional to |new|·bands plus verification linear in |candidates|
    * — the only sound way to keep a 100-TB corpus deduped under daily
    * growth. Banding recall at the threshold matches minhashLshExact
    * (32×2 bands: per-pair miss ≈ 4e-10 at J = 0.7), so the output equals
    * the exact all-pairs result restricted to new-touching pairs — which
    * is what the DuckDB oracle recomputes blind to the hashing.
    *
    * Hot-bucket guard: buckets over `maxBucketSize` would emit
    * O(k·|new-in-bucket|) pairs; they collapse to a star around the
    * bucket's min doc_id (transitive clusters reconnect downstream, same
    * policy as minhashLshSh).
    */
  def incrementalNearDups(oldDocs: DataFrame, newDocs: DataFrame,
      n: Int = 4, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.7, maxBucketSize: Long = 5000L): DataFrame =
    incrementalNearDupsSh(withShingles(oldDocs, n), withShingles(newDocs, n),
      numHashes, bands, threshold, maxBucketSize)

  def incrementalNearDupsSh(oldSh: DataFrame, newSh: DataFrame,
      numHashes: Int = 64, bands: Int = 32, threshold: Double = 0.7,
      maxBucketSize: Long = 5000L): DataFrame = {
    // ONE signature/banding pass over old ∪ new with an is_new flag,
    // materialized via localCheckpoint (tiny: `bands` rows per doc), then
    // old/new/all band-bucket views are filters over it. The previous
    // per-side bandBuckets calls were referenced six times downstream
    // (cold/hot/hub subtrees), and each reference re-ran the full
    // explode + N-way-min signature aggregation — the dominant cost of
    // the gate query (431-node physical plan). At real scale the old
    // side is the PERSISTED index table, which is exactly what the
    // checkpointed frame stands in for.
    val allSh = oldSh.select(col("doc_id"), col("sh"))
      .withColumn("is_new", lit(false))
      .unionByName(newSh.select(col("doc_id"), col("sh"))
        .withColumn("is_new", lit(true)))
    val bb = bandBucketsFlagged(allSh, numHashes, bands).localCheckpoint(true)
    val oldBB = bb.where(!col("is_new")).drop("is_new")
    val newBB = bb.where(col("is_new")).drop("is_new")
    val allBB = bb.drop("is_new")
    // bucket count and star hub in ONE aggregate (16-byte agg state; see
    // minhashLshSh's hot0 for the rationale)
    val hot0 = allBB.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bc"), min(col("doc_id")).as("hub_id"))
      .where(col("bc") > lit(maxBucketSize))
      .select(col("band"), col("bucket"), col("hub_id"))
    val hot = hot0.select(col("band"), col("bucket"))
    val coldNew = newBB.join(broadcast(hot), Seq("band", "bucket"),
      "left_anti")
    val coldAll = allBB.join(broadcast(hot), Seq("band", "bucket"),
      "left_anti")
    val cliquePairs = coldNew
      .select(col("band"), col("bucket"), col("doc_id").as("nid"))
      .join(coldAll.select(col("band"), col("bucket"),
        col("doc_id").as("oid")), Seq("band", "bucket"))
      .where(col("nid") =!= col("oid"))
      .select(least(col("nid"), col("oid")).as("id1"),
        greatest(col("nid"), col("oid")).as("id2"))
    val hotNew = newBB.join(broadcast(hot), Seq("band", "bucket"),
      "left_semi")
    val hubs = hot0
    // star edges: every NEW member pairs with the hub (new-touching by
    // construction)...
    val starPairs = hotNew.join(broadcast(hubs), Seq("band", "bucket"))
      .where(col("doc_id") =!= col("hub_id"))
      .select(least(col("doc_id"), col("hub_id")).as("id1"),
        greatest(col("doc_id"), col("hub_id")).as("id2"))
    // ...and when the hub is itself a NEW doc, hub×old edges are
    // new-touching too and must be emitted — without this, a hot bucket
    // whose min doc_id lands in the new batch produced ZERO pairs for its
    // old members and a new duplicate entered the corpus undetected
    // (still O(k) per bucket, the star contract)
    val newHubs = hubs.join(
      newBB.select(col("band"), col("bucket"), col("doc_id").as("hub_id")),
      Seq("band", "bucket", "hub_id"), "left_semi")
    val hotOld = oldBB.join(broadcast(hot), Seq("band", "bucket"),
      "left_semi")
    val starOldPairs = hotOld.join(broadcast(newHubs), Seq("band", "bucket"))
      .where(col("doc_id") =!= col("hub_id"))
      .select(least(col("doc_id"), col("hub_id")).as("id1"),
        greatest(col("doc_id"), col("hub_id")).as("id2"))
    val cands = cliquePairs.union(starPairs).union(starOldPairs)
      .dropDuplicates("id1", "id2")
    verifyJaccardSh(oldSh.unionByName(newSh), cands, threshold)
  }

  /** SimHash band candidates + exact-Jaccard verify (same contract as
    * minhashLshExact, different candidate generator). 8 bands x 8 bits
    * guarantees any pair within Hamming distance 7 shares a band; the
    * Hamming ↔ Jaccard correspondence, however, is NOT provable (simhash
    * approximates cosine of token-frequency vectors, and a J = 0.92 pair
    * beyond Hamming 7 was observed on the sf0.001 corpus).
    */
  def simhashExact(docs: DataFrame, maxHamming: Int = 7, n: Int = 4,
      threshold: Double = 0.9): DataFrame =
    simhashExactSh(docs, withShingles(docs, n), maxHamming, threshold)

  def simhashExactSh(docs: DataFrame, docsSh: DataFrame, maxHamming: Int = 7,
      threshold: Double = 0.9): DataFrame =
    verifyJaccardSh(docsSh, simhashNearDup(docs, maxHamming, bands = 8),
      threshold)

  /** SimHash candidates with a PROVABLE recall floor: the band-guaranteed
    * Hamming <= bands-1 simhash pairs, unioned with MinHash 32x2 band
    * candidates whose miss probability at J >= 0.9 is (1 − 0.81)³² ≈ 1e-23.
    * SimHash alone cannot promise Jaccard-threshold recall (see
    * simhashExact); the union keeps simhash's cheap structural candidates
    * AND makes the exact-equality oracle contract sound at any corpus —
    * both generators are sub-quadratic, and the exact verify stage prices
    * precision at |candidates|. Pass a persisted `minhashCands` (threshold
    * 0 output of minhashLshSh) to share the signature pass across queries.
    */
  def simhashExactFloored(docs: DataFrame, docsSh: DataFrame,
      minhashCands: DataFrame, maxHamming: Int = 7,
      threshold: Double = 0.9): DataFrame = {
    val cands = simhashNearDup(docs, maxHamming, bands = 8)
      .select(col("id1"), col("id2"))
      .union(minhashCands.select(col("id1"), col("id2")))
      .dropDuplicates("id1", "id2")
    verifyJaccardSh(docsSh, cands, threshold)
  }

  /** SimHash near-dup: fingerprint via the native SimHash64 Catalyst
    * expression (whole-stage codegen'd, graft.functions.SimHash64), then
    * band the 64-bit hash into `bands` keys of 64/bands bits (pigeonhole:
    * any pair within Hamming distance bands-1 shares at least one exact
    * band); candidates sharing a band are verified with
    * bit_count(xor) <= maxHamming. More bands = wider Hamming recall but
    * smaller keys → more candidates per bucket; 4x16 suits exact-ish dups,
    * 8x8 suits token-level edits.
    *
    * Over-cap band buckets emit a star around the bucket's min doc_id
    * instead of the k² clique (see minhashLsh) — the Hamming screen still
    * applies to every emitted star pair.
    */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, maxBucketSize: Long = 5000L): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val withSim = graft.core.SessionCaches.register(
      docs.select(col("doc_id"),
        graft.functions.SimHash64.simhash64(col("text")).as("sim"))
        // session-lifetime persist, same rationale as minhashLshSh's sig:
        // the returned frame is lazy, so no in-function unpersist is
        // possible; 16 bytes/doc, releasable via SessionCaches.release
        .persist())
    val banded = withSim.select(col("doc_id"), col("sim"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sim"), b * width).bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("sim"), col("bk.band"), col("bk.key"))
    val hot = banded.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bc"))
      .where(col("bc") > lit(maxBucketSize))
      .select(col("band"), col("key"))
    val cold = banded.join(broadcast(hot), Seq("band", "key"), "left_anti")
    val l = cold.select(col("band"), col("key"), col("doc_id").as("id1"),
      col("sim").as("sim1"))
    val r = cold.select(col("band").as("b2"), col("key").as("k2"),
      col("doc_id").as("id2"), col("sim").as("sim2"))
    // the Hamming test rides INSIDE the join condition: templated corpora
    // cluster simhash values, so band-buckets generate many candidate
    // pairs — evaluated at hash-join probe time they cost only compute,
    // while filtering after the join would shuffle every candidate through
    // the dropDuplicates exchange (measured ~4x on the synthetic corpus)
    val cliquePairs = l.join(r, col("band") === col("b2") &&
        col("key") === col("k2") && col("id1") < col("id2") &&
        bit_count(col("sim1").bitwiseXOR(col("sim2"))) <= lit(maxHamming))
      .select(col("id1"), col("id2"),
        bit_count(col("sim1").bitwiseXOR(col("sim2"))).as("hamming"))
    val hotRows = banded.join(broadcast(hot), Seq("band", "key"), "left_semi")
    val hubs = hotRows.groupBy(col("band"), col("key"))
      .agg(min(col("doc_id")).as("hub_id"),
        min_by(col("sim"), col("doc_id")).as("hub_sim"))
    val starPairs = hotRows.join(broadcast(hubs), Seq("band", "key"))
      .where(col("doc_id") =!= col("hub_id") &&
        bit_count(col("hub_sim").bitwiseXOR(col("sim"))) <= lit(maxHamming))
      .select(col("hub_id").as("id1"), col("doc_id").as("id2"),
        bit_count(col("hub_sim").bitwiseXOR(col("sim"))).as("hamming"))
    cliquePairs.union(starPairs).dropDuplicates("id1", "id2")
  }

  /** Embedding-cosine near-dup over (vec_id, embedding array<float>):
    * within-bucket pairs only. Buckets come from sign-LSH (random
    * hyperplanes from a deterministic seed) so the join is sub-quadratic;
    * cosine is exact on the candidates. See Similarity.signLsh.
    */
  def embeddingNearDup(embeddings: DataFrame, planes: Int = 8,
      threshold: Double = 0.95): DataFrame = {
    val withBucket = embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"),
      Similarity.signLshBucket(col("embedding"), planes).as("bucket"))
    val l = withBucket.select(col("bucket"), col("vec_id").as("id1"),
      col("emb").as("e1"))
    val r = withBucket.select(col("bucket").as("bk2"), col("vec_id").as("id2"),
      col("emb").as("e2"))
    l.join(r, col("bucket") === col("bk2") && col("id1") < col("id2"))
      // compiled pair kernel — interpreted HOF cosine is ~10x slower here
      .withColumn("cosine", round(Similarity.cosineKernel(col("e1"), col("e2")), 6))
      .where(col("cosine") >= lit(threshold))
      .select("id1", "id2", "cosine")
  }

  /** Near-dup canonicalization — the keep-one-representative step that
    * closes a training-data dedup pipeline: connected components over the
    * verified near-dup pair table → (doc_id, canonical_doc_id) for every
    * document in a cluster, canonical = MIN id in the component (the same
    * deterministic rule as exact dedup and entity canonicalization).
    * Near-duplication is transitive in practice (A≈B, B≈C ⇒ one cluster
    * even when J(A,C) dips below the gate), which pairwise filtering alone
    * cannot express — this is why the star-collapse of over-cap LSH
    * buckets upstream is lossless for the final cluster assignment.
    *
    * Ids of any orderable string form work; numeric ids must be passed
    * zero-padded (the CC labels are strings, so lexicographic min must
    * coincide with the caller's intended ordering). Scale posture is CC's:
    * driver union-find under the edge cap, label propagation above it.
    */
  def clusterNearDups(spark: org.apache.spark.sql.SparkSession,
      pairs: DataFrame): DataFrame =
    graft.canon.ConnectedComponents.run(spark,
      pairs.select(col("id1"), col("id2")))
      .select(col("id").as("doc_id"), col("component").as("canonical_doc_id"))

  /** Retention policy over near-dup clusters: keep ONE representative per
    * cluster by maximum score (ties → min doc_id). Real pipelines keep the
    * best/longest duplicate, not an arbitrary one — min-id canonicalization
    * answers "which cluster", this answers "which copy survives".
    *
    * `scored` must carry (doc_id, score); `clusters` is clusterNearDups
    * output. One hash join on doc_id (broadcast-eligible: the cluster
    * table holds only documents IN clusters, a small fraction of any
    * deduplicated corpus) + one per-cluster window. Output one row per
    * cluster: (cluster_id, kept_doc_id, kept_score, cluster_size).
    */
  def keepBestPerCluster(clusters: DataFrame, scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
    val ranked = clusters
      .select(col("doc_id"), col("canonical_doc_id").as("cluster_id"))
      .join(scored.select(col("doc_id"), col("score")), "doc_id")
      .withColumn("cluster_size", count(lit(1)).over(w).cast("bigint"))
      .withColumn("rn", row_number().over(
        w.orderBy(col("score").desc, col("doc_id").asc)))
    ranked.where(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("kept_doc_id"),
        col("score").as("kept_score"), col("cluster_size"))
  }

  /** Decontamination screen: flag training documents sharing any word
    * n-gram with an eval/benchmark corpus (the GPT-3 appendix-C overlap
    * rule — 13-grams there, `n` configurable here). One row per
    * contaminated train doc: (doc_id, n_overlap, overlap_frac) where
    * overlap_frac is the fraction of the doc's distinct shingles that
    * also occur in the eval set.
    *
    * Scale shape: eval corpora are benchmark-sized, so their distinct
    * shingle set is BROADCAST (8-byte hashes, not n-gram strings — the
    * DuckDB oracle joins on the raw n-gram text instead, so a green row
    * also cross-checks the hashing, modulo a 64-bit collision); the train
    * corpus streams through one narrow shingle pass, a broadcast hash
    * join, and one (doc_id) map-side-combined aggregate. The train text
    * is never shuffled and no pair explosion exists — cost is
    * O(train shingles) regardless of corpus size.
    */
  def decontaminate(train: DataFrame, evalDf: DataFrame,
      n: Int = 8): DataFrame = {
    val evalSh = withShingles(evalDf, n)
      .select(explode(col("sh")).as("shingle")).distinct()
    shingleRowsSh(withShingles(train, n))
      .join(broadcast(evalSh), "shingle")
      .groupBy(col("doc_id"), col("sh_size"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("doc_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("sh_size"), 6)
          .as("overlap_frac"))
  }

  /** Cross-document line-level dedup (the C4 / RefinedWeb boilerplate
    * rule): a line is SHARED when it occurs in at least `minDf` distinct
    * documents — navbars, cookie banners, license footers — and a curation
    * pass strips every occurrence of shared lines from every document.
    *
    * Per doc (docs with no non-empty lines are not emitted):
    * (doc_id, n_lines, n_shared_lines, kept_md5) where kept_md5 is the md5
    * of the document's surviving lines joined with '\n' in original order
    * (md5("") when everything was boilerplate) — the auditable digest of
    * the scrubbed text without materializing it twice.
    *
    * Scale shape: one posexplode pass over the corpus; the line
    * doc-frequency table is keyed by xxhash64(line) — 8-byte keys, line
    * text never shuffles into the frequency table (the DuckDB oracle joins
    * on the line text itself; identical modulo a 64-bit collision,
    * P ≈ n²/2⁶⁵). The flag join shuffles on the same 8-byte key, then one
    * (doc_id) map-side-combined aggregate rebuilds order with an
    * array_sort over (pos, line) structs — no window, no driver state.
    */
  def lineDedupStats(docs: DataFrame, minDf: Int = 2): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val lines = docs.select(col("doc_id"),
      posexplode(filter(split(col("text"), "\n"), l => length(l) > 0))
        .as(Seq("pos", "line")))
    val lineDf = lines
      .select(xxhash64(col("line")).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    lines
      .withColumn("h", xxhash64(col("line")))
      .join(lineDf, Seq("h"))
      .withColumn("shared", col("df") >= minDf)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("shared"), 1L).otherwise(0L)).as("n_shared_lines"),
        md5(concat_ws("\n",
          transform(
            array_sort(collect_list(
              when(!col("shared"), struct(col("pos"), col("line"))))),
            s => s.getField("line"))).cast("binary")).as("kept_md5"))
  }

  /** The scrub itself: documents with every shared line removed —
    * (doc_id, text) with text rebuilt from the surviving lines. Same plan
    * as lineDedupStats. A doc whose lines were ALL shared has no surviving
    * row at all — it is absent from the output (CurateJob's line_scrubbed
    * stage documents exactly this: such docs drop out at the inner
    * join-back), unlike lineDedupStats, which still emits its stats row
    * with kept_md5 = md5(""). Callers that need one row per input doc
    * should left-join the input against this output.
    */
  def removeSharedLines(docs: DataFrame, minDf: Int = 2): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val lines = docs.select(col("doc_id"),
      posexplode(filter(split(col("text"), "\n"), l => length(l) > 0))
        .as(Seq("pos", "line")))
    val lineDf = lines
      .select(xxhash64(col("line")).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    lines
      .withColumn("h", xxhash64(col("line")))
      .join(lineDf, Seq("h"))
      .where(col("df") < minDf)
      .groupBy(col("doc_id"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("text"))
  }

  /** Duplicated-substring profile (the n-gram-window approximation of
    * exact-substring dedup, Lee et al. 2022 §4.1 — the suffix-array
    * formulation doesn't distribute; the sliding-window df formulation is
    * what corpus reports like Gopher/Dolma actually tabulate): every
    * stride-1 window of `n` whitespace tokens is a candidate substring; a
    * window is DUPLICATED when its text occurs in ≥ `minDf` distinct
    * documents; a token is duplicated when any duplicated window covers
    * it.
    *
    * Per doc (every input doc emits a row; docs shorter than `n` tokens
    * have zero windows): (doc_id, n_tokens, n_windows, n_dup_windows,
    * dup_token_frac) with the fraction = covered tokens / n_tokens rounded
    * 6dp — the per-doc signal a curation pass thresholds on.
    *
    * Scale shape: windows explode the corpus ×(tokens−n+1) but carry only
    * (doc_id, pos, 8-byte xxhash64) into the df shuffle — window TEXT
    * never shuffles (the DuckDB oracle groups on the raw window string
    * instead, so a green row also cross-checks the hashing, modulo a
    * 64-bit collision). Coverage expands only DUPLICATED windows (×n), a
    * corpus-quality-proportional set, then one distinct + per-doc count.
    */
  def dupNgramStats(docs: DataFrame, n: Int = 8,
      minDf: Int = 2): DataFrame = {
    require(n >= 2, s"window must be >= 2 tokens, got $n")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val base = docs.select(col("doc_id"),
      TextAnalysis.wsTokens(col("text")).as("tk"))
    val wins = base
      .where(size(col("tk")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("tk")) - n),
          k => xxhash64(concat_ws(" ", slice(col("tk"), k + 1, lit(n))))))
          .as(Seq("pos", "h")))
    val winDf = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val dup = wins.join(winDf, Seq("h")).where(col("df") >= minDf)
    val covered = dup
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("idx"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_cov"))
    val nWin = wins.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"))
    val nDup = dup.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"))
    base.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(nWin, Seq("doc_id"), "left")
      .join(nDup, Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(coalesce(col("n_cov"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"), 6)).as("dup_token_frac"))
  }
}
