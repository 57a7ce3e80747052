package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline, over a
  * documents table (doc_id, text, ...).
  *
  * Scale design notes (100 TB posture):
  *   - exact dedup is one hash-groupBy shuffle on a 16-byte key;
  *   - near-dup methods NEVER do an all-pairs product: candidate pairs come
  *     from an inverted shingle index (Jaccard), LSH band buckets (MinHash),
  *     or Hamming band buckets (SimHash) — the standard sub-quadratic
  *     blocking constructions;
  *   - every pair generator emits (id1 < id2) so downstream joins/groupBys
  *     shuffle once on the pair key;
  *   - all hashing is xxhash64/crc32/md5 column functions — codegen'd,
  *     deterministic, no UDFs.
  */
object Dedup {

  private def wsTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles of the lowercased text. */
  def shingles(text: Column, n: Int): Column = {
    val toks = wsTokens(text)
    array_distinct(
      filter(
        transform(toks, (_, i) =>
          when(i + lit(n) <= size(toks),
            concat_ws(" ", slice(toks, i + 1, lit(n))))),
        s => s.isNotNull))
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
    * text): the column-HOF formulation (transform + slice per position) is
    * interpreted row-by-row and was ~30x slower.
    */
  private def shingleArr(n: Int) = udf { (text: String) =>
    // Scala UDFs receive raw nulls for AnyRef args — a null-text document
    // must not kill the whole dedup job
    if (text == null) Array.empty[String]
    else {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length >= n)
        Iterator.range(0, toks.length - n + 1)
          .map(i => toks.slice(i, i + n).mkString(" "))
          .toSet.toArray
      else Array.empty[String]
    }
  }

  /** Inverted shingle index rows (doc_id, sh_size, shingle). doc_id keeps
    * its ORIGINAL type (long testdata ids and string sha2 ids both work);
    * the shingle array is computed once per row by the compiled kernel,
    * then exploded.
    */
  def shingleRows(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), shingleArr(n)(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("sh_size"),
        explode(col("sh")).as("shingle"))

  /** N-gram Jaccard near-dup: inverted-index self-join on shingles →
    * per-pair intersection counts → |A∩B| / (|A|+|B|−|A∩B|) >= threshold.
    * Sub-quadratic as long as shingle doc-frequency is bounded; ultra-hot
    * shingles (df > maxShingleDf) are dropped from the index, the standard
    * frequency cap (they contribute negligible Jaccard evidence but
    * quadratic pairs).
    *
    * Physical shape: the index joins on xxhash64(shingle) — an 8-byte
    * shuffle key instead of the n-gram string (64-bit collisions are
    * negligible at any realistic distinct-shingle count) — and the hot-
    * shingle cap is a broadcast ANTI join against the (tiny) hot set
    * rather than an inner join against the (huge) cold set.
    */
  def ngramJaccard(docs: DataFrame, n: Int = 4, threshold: Double = 0.6,
      maxShingleDf: Long = 1000L): DataFrame = {
    val inv = shingleRows(docs, n)
      .select(col("doc_id"), col("sh_size"), xxhash64(col("shingle")).as("h"))
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

  /** MinHash signature: numHashes permutation-approximations, the i-th
    * permutation realized as the seeded combined hash xxhash64(shingle, i)
    * (hash composition instead of an affine transform — identical
    * independence properties, and no long-multiply overflow under ANSI
    * mode). Pure column space: transform/array_min, no UDF, one narrow
    * projection per doc.
    */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column = {
    val sh = shingles(text, n)
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(sh, s => xxhash64(s, i))))
  }

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs; estimated Jaccard = fraction of equal signature positions;
    * keep pairs >= threshold. bands must divide numHashes.
    *
    * The signature is computed via explode + a 64-way min hash-aggregate
    * rather than nested `transform` lambdas: higher-order-function
    * expressions are interpreted (no whole-stage codegen), which made the
    * nested form ~50x slower; the explode/agg form is fully codegen'd with
    * map-side partial mins, and its one shuffle carries only
    * (doc_id, 64 longs) per doc.
    */
  def minhashLsh(docs: DataFrame, n: Int = 4, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val inv = shingleRows(docs, n)
      .select(col("doc_id"), col("shingle").as("s"))
    val sig = inv.groupBy(col("doc_id"))
      .agg(array((0 until numHashes).map(i =>
        min(xxhash64(col("s"), lit(i)))): _*).as("sig"))
      .persist()
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",",
            transform(slice(col("sig"), b * rows + 1, rows),
              x => x.cast("string")))).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id1"), col("sig").as("sig1"))
    val r = banded.select(col("band").as("band2"), col("bucket").as("bucket2"),
      col("doc_id").as("id2"), col("sig").as("sig2"))
    val pairs = l.join(r,
        col("band") === col("band2") && col("bucket") === col("bucket2") &&
          col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sig1"), col("sig2"))
      .dropDuplicates("id1", "id2")
    pairs
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
      threshold: Double): DataFrame = {
    // shingles hashed to 64-bit longs: the per-pair intersect then compares
    // longs instead of UTF8 strings (same trick as the ngramJaccard inverted
    // index, which is DuckDB-verified collision-free on this corpus)
    val sets = docs.select(col("doc_id"),
      transform(shingleArr(n)(col("text")), s => xxhash64(s)).as("sh"))
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
    screened
      .join(sets.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sets.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")), 6))
      .where(col("jaccard") >= lit(threshold))
      .select("id1", "id2", "jaccard")
  }

  /** MinHash LSH candidates + exact-Jaccard verify: emits the pairs whose
    * TRUE Jaccard >= threshold among band-bucket candidates. Equals the
    * exact all-pairs result whenever banding recall is 1 at the threshold
    * (16 bands x 4 rows: miss probability (1-J^4)^16 < 1e-6 at J=0.875) —
    * which the DuckDB oracle checks row-for-row.
    */
  def minhashLshExact(docs: DataFrame, n: Int = 4, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val cands = minhashLsh(docs, n, numHashes, bands, threshold = 0.0)
    verifyJaccard(docs, cands, n, threshold)
  }

  /** SimHash band candidates + exact-Jaccard verify (same contract as
    * minhashLshExact, different candidate generator). 8 bands x 8 bits
    * guarantees any pair within Hamming distance 7 shares a band — measured
    * on the synthetic corpus, token swaps put near-identical docs
    * (Jaccard >= 0.95) at Hamming 0-5, so <=7 has full recall there.
    */
  def simhashExact(docs: DataFrame, maxHamming: Int = 7, n: Int = 4,
      threshold: Double = 0.9): DataFrame =
    verifyJaccard(docs, simhashNearDup(docs, maxHamming, bands = 8), n,
      threshold)

  /** SimHash near-dup: fingerprint via the native SimHash64 Catalyst
    * expression (whole-stage codegen'd, graft.functions.SimHash64), then
    * band the 64-bit hash into `bands` keys of 64/bands bits (pigeonhole:
    * any pair within Hamming distance bands-1 shares at least one exact
    * band); candidates sharing a band are verified with
    * bit_count(xor) <= maxHamming. More bands = wider Hamming recall but
    * smaller keys → more candidates per bucket; 4x16 suits exact-ish dups,
    * 8x8 suits token-level edits.
    */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3,
      bands: Int = 4): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val withSim = docs.select(col("doc_id"),
      graft.functions.SimHash64.simhash64(col("text")).as("sim"))
      .persist()
    val banded = withSim.select(col("doc_id"), col("sim"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sim"), b * width).bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("sim"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("band"), col("key"), col("doc_id").as("id1"),
      col("sim").as("sim1"))
    val r = banded.select(col("band").as("b2"), col("key").as("k2"),
      col("doc_id").as("id2"), col("sim").as("sim2"))
    // the Hamming test rides INSIDE the join condition: templated corpora
    // cluster simhash values, so hot band-buckets generate k^2 candidate
    // pairs — evaluated at hash-join probe time they cost only compute,
    // while filtering after the join would shuffle every candidate through
    // the dropDuplicates exchange (measured ~4x on the synthetic corpus)
    l.join(r, col("band") === col("b2") && col("key") === col("k2") &&
        col("id1") < col("id2") &&
        bit_count(col("sim1").bitwiseXOR(col("sim2"))) <= lit(maxHamming))
      .select(col("id1"), col("id2"),
        bit_count(col("sim1").bitwiseXOR(col("sim2"))).as("hamming"))
      .dropDuplicates("id1", "id2")
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
}
