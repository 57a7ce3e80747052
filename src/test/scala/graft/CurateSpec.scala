package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.CurateJob

/** End-to-end curation pipeline: filters → exact dedup → near-dup
  * clustering → keep-best retention → split assignment, with stage
  * snapshots and byte-identical resume.
  */
class CurateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f =>
        Files.delete(f))

  // doc 1 == doc 0 (exact dup); docs 2/3 are near-dups of 0 with 3 the
  // longest; doc 4 is unrelated; doc 5 is too short for the token gate
  private val base =
    "the quick brown fox jumps over the lazy dog and then naps in the " +
      "warm afternoon sun beside the quiet river bank for an hour"
  private lazy val corpus = Seq(
    (0L, base),
    (1L, base),
    (2L, base + " again"),
    (3L, base + " until the evening"),
    (4L, "completely different text about spark engines exchanging " +
      "shuffle partitions across executor boundaries with careful salting"),
    (5L, "too short")
  ).toDF("doc_id", "text")

  test("curate keeps one best representative per cluster and splits the rest") {
    val work = Files.createTempDirectory("graft-curate").toString
    val in = s"$work/in.parquet"
    corpus.write.parquet(in)
    val io = CurateJob.run(spark, CurateJob.Args(
      work = s"$work/w", input = in, minTokens = 5))

    val curated = io.read(spark, "curated")
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    // 5 fails the token gate; 1 is an exact dup of 0; {0,2,3} cluster at
    // J>=0.7 and 3 (longest) survives; 4 is untouched
    assert(ids === Set(3L, 4L))
    // split column present and consistent with the deterministic fold
    val splits = curated.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = graft.ops.Sampling.hashSplit(corpus).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    splits.foreach { case (id, s) => assert(s === expected(id)) }
    // every stage committed a snapshot
    Seq("analyzed", "filtered", "exact_kept", "neardup_pairs", "clusters",
      "curated").foreach(t => assert(io.exists(t), s"missing stage $t"))
  }

  test("curate resume after losing downstream stages is byte-identical") {
    val work = Files.createTempDirectory("graft-curate-r").toString
    val in = s"$work/in.parquet"
    corpus.write.parquet(in)
    val args = CurateJob.Args(work = s"$work/w", input = in, minTokens = 5)
    val io = CurateJob.run(spark, args)
    val want = io.read(spark, "curated")
      .orderBy("doc_id").collect().map(_.toString).toSeq

    Seq("neardup_pairs", "clusters", "curated").foreach(t =>
      deleteRec(java.nio.file.Paths.get(s"$work/w", t)))
    val io2 = CurateJob.run(spark, args.copy(resume = true))
    val got = io2.read(spark, "curated")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(got === want)
  }

  test("curate decontamination drops eval-overlapping docs") {
    val work = Files.createTempDirectory("graft-curate-d").toString
    val in = s"$work/in.parquet"
    val ev = s"$work/eval.parquet"
    corpus.write.parquet(in)
    // benchmark doc embeds an 8-token span of `base` -> docs 0-3 (which
    // all contain base) are contaminated; 4 is clean; 5 fails min-tokens
    Seq((100L, "quiz says the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text").write.parquet(ev)

    val io = CurateJob.run(spark, CurateJob.Args(
      work = s"$work/w", input = in, minTokens = 5,
      decontamInput = Some(ev), decontamNgram = 8))
    assert(io.exists("decontam_kept"))
    val ids = io.read(spark, "curated")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(4L))
  }

  test("curate repetition gates and pii redaction") {
    val work = Files.createTempDirectory("graft-curate-p").toString
    val in = s"$work/in.parquet"
    val boiler = Seq.fill(6)("order now while stocks last").mkString("\n")
    Seq(
      (0L, base + " write to sales0@shop.example for a quote today"),
      (1L, boiler), // 6 identical lines -> dup_line_frac 1.0
      (2L, "completely different text about spark engines exchanging " +
        "shuffle partitions across executor boundaries with careful salting")
    ).toDF("doc_id", "text").write.parquet(in)

    val io = CurateJob.run(spark, CurateJob.Args(
      work = s"$work/w", input = in, minTokens = 3,
      maxDupLineFrac = Some(0.5), redactPii = true))

    val analyzed = io.read(spark, "analyzed")
      .select("doc_id", "dup_line_frac", "pii_count").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(analyzed(1L)._1 === 1.0)
    assert(analyzed(0L)._2 === 1 && analyzed(2L)._2 === 0)

    val curated = io.read(spark, "curated")
    val byId = curated.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 fails the dup-line gate; docs 0 and 2 survive, 0 redacted
    assert(byId.keySet === Set(0L, 2L))
    assert(byId(0L).contains("write to <EMAIL> for a quote"))
    assert(!byId(0L).contains("sales0@"))
  }

  test("curate --normalize collapses whitespace before any analysis") {
    val work = Files.createTempDirectory("graft-curate-n").toString
    val in = s"$work/in.parquet"
    Seq(
      (0L, "\t  " + base.replace(" ", "   ") + " \r\n"),
      (1L, base + " until the evening")
    ).toDF("doc_id", "text").write.parquet(in)

    val io = CurateJob.run(spark, CurateJob.Args(
      work = s"$work/w", input = in, minTokens = 3, normalize = true))

    val curated = io.read(spark, "curated").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 0 normalizes to exactly `base`, making it a true near-dup of
    // doc 1 — retention keeps the longer doc 1 only, proving the dedup
    // shingles saw the NORMALIZED text
    assert(curated.keySet === Set(1L))
    val analyzed = io.read(spark, "analyzed")
      .where(col("doc_id") === 0L).select("text").head().getString(0)
    assert(analyzed === base)
  }

  test("curate line-scrub stage strips boilerplate and source mix thins") {
    val docs = (0L until 40L).map { i =>
      val src = if (i < 30) "web" else "books"
      (i, s"shared cookie banner\nunique content line number $i with words",
        src)
    }.toDF("doc_id", "text", "source")
    val work = Files.createTempDirectory("graft-curate-ls").toString
    val in = s"$work/in.parquet"
    docs.write.parquet(in)
    val io = CurateJob.run(spark, CurateJob.Args(
      work = s"$work/w", input = in,
      dedupLines = Some(2),
      sourceMix = Some(CurateJob.parseMix(
        "web:0.25,books:0.25,default:0.0"))))

    assert(io.exists("line_scrubbed"))
    val curated = io.read(spark, "curated")
      .select("doc_id", "text", "source").collect()
    // the banner (40 docs) is gone from every surviving text
    assert(curated.forall(!_.getString(1).contains("cookie banner")))
    assert(curated.forall(_.getString(1).startsWith("unique content")))
    val bySource = curated.groupBy(_.getString(2)).view.mapValues(_.length)
    // books: frac = min(1, .25*40/10) = 1 -> all 10 kept
    assert(bySource("books") === 10)
    // web: frac = .25*40/30 = 1/3 of 30 ~ 10 (md5-uniform, wide tolerance)
    assert(bySource("web") >= 3 && bySource("web") <= 20, bySource.toString)
  }
}
