package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Events, TextAnalysis}

class EventsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions under a 1h gap (events 2min apart, then a 3h gap);
  // user 2: one single-event session
  private lazy val events = Seq(
    (0L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
    (1L, ts("2024-01-01 10:02:00"), 1L, "click", 2.0),
    (2L, ts("2024-01-01 13:30:00"), 1L, "purchase", 3.5),
    (3L, ts("2024-01-01 09:00:00"), 2L, "view", 4.25),
    (4L, ts("2024-01-02 09:00:00"), 2L, "purchase", 1.0),
    (5L, ts("2024-01-02 10:00:00"), 2L, "click", 1.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionize splits on the gap and rolls up per session") {
    val got = Events.sessionize(events, gapSec = 3600).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"),
          r.getAs[Double]("sum_value"))).toMap
    assert(got.size === 4)
    assert(got((1L, 1L)) === ((2L, 120L * 1000000L, 3.0)))
    assert(got((1L, 2L)) === ((1L, 0L, 3.5)))
    assert(got((2L, 1L)) === ((1L, 0L, 4.25)))
    assert(got((2L, 2L)) === ((2L, 3600L * 1000000L, 2.0)))
  }

  test("funnel enforces step order: purchase before click does not count") {
    val got = Events.funnel(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Int]("stage"), r.getAs[Long]("t_step3_us"))).toMap
    assert(got(1L)._1 === 3) // view -> click -> purchase in order
    assert(got(1L)._2 > 0)
    // user 2: view -> (purchase) -> click; the purchase precedes the
    // first in-order click, so the funnel completes view->click (stage 2)
    // but never purchase-after-click
    assert(got(2L) === ((2, -1L)))
  }

  test("retention cohorts users by first-event week") {
    // both users first appear in the same epoch week (2024-01-01 is a
    // Monday; epoch weeks start Thursday, but absolute-week math only
    // needs consistency, not calendar alignment)
    val rows = Events.retention(events).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("n_users")))
    assert(rows.map(_._3).sum === 2) // one active week per user here
    assert(rows.forall(_._2 === 0L))
  }

  test("normalizeText strips controls and collapses whitespace") {
    val docs = Seq((0L, "\t hello  world\r\n"),
      (1L, "already clean")).toDF("doc_id", "text")
    val got = TextAnalysis.normalizeText(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("norm_text"), r.getAs[Int]("n_norm_chars"))).toMap
    assert(got(0L) === (("hello world", 11)))
    assert(got(1L) === (("already clean", 13)))
  }

  test("tokenEntropy: uniform text maximal, repeated token lower") {
    val docs = Seq((0L, "a a b"), (1L, "a b c d"), (2L, "x x x x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("entropy_unats"))).toMap
    // H("a a b") = -(2/3 ln 2/3 + 1/3 ln 1/3) = 0.636514 nats
    assert(got(0L)._1 === 3L)
    assert(math.abs(got(0L)._2 - 636514L) <= 2L)
    assert(math.abs(got(1L)._2 - math.round(math.log(4) * 1e6)) <= 4L)
    assert(got(2L)._2 === 0L)
  }

  test("lnQ30: bit-equal to the DuckDB recursive-CTE transcription, " +
      "accurate to sub-µnat") {
    // golden values produced by RUNNING the q_entropy oracle's logtab CTEs
    // in DuckDB (2026-08-19) — this pins cross-engine bit-equality of the
    // integer spec, the whole point of the round-5 entropy rework
    val golden = Seq(1L -> 0L, 2L -> 744261118L, 3L -> 1179625962L,
      7L -> 2089405112L, 10L -> 2472381917L, 100L -> 4944763835L,
      12345L -> 10115728597L, 999983L -> 14834273252L)
    golden.foreach { case (k, v) =>
      assert(TextAnalysis.lnQ30(k) === v, s"lnQ30($k)")
    }
    // accuracy: |lnQ30(k)/2^30 - ln k| observed < 1e-9 nats; assert a
    // 10x slack bound so the metric's µnat honesty is enforced
    (1L to 20000L).foreach { k =>
      val err = math.abs(TextAnalysis.lnQ30(k).toDouble / (1L << 30)
        - math.log(k.toDouble))
      assert(err < 1e-8, s"lnQ30($k) off by $err nats")
    }
  }

  test("tokenEntropy: exact at a constructed float .5-boundary (c,n) pair") {
    // -(2426/3677)·ln(2426/3677)·1e6 = 274370.5000000525 — a 1-ulp-lower
    // libm log flips the OLD float round across the boundary (the
    // theoretical flake VERDICT r4 #5 asked to close). The integer spec
    // has no float anywhere: the per-term value is pinned exactly.
    val c = 2426; val n = 3677
    def h(cc: Long, nn: Long): Long = {
      val diu = (TextAnalysis.lnQ30(nn) - TextAnalysis.lnQ30(cc)) * 15625 /
        16777216L
      (2 * cc * diu + nn) / (2 * nn)
    }
    assert(h(c.toLong, n.toLong) === 274370L) // spec value, libm-free
    // drive the full Spark column path on a doc realizing (c, n): one term
    // repeated c times + (n-c) distinct fillers
    val text = (Seq.fill(c)("dup") ++ (0 until (n - c)).map(i => s"w$i"))
      .mkString(" ")
    val got = TextAnalysis.tokenEntropy(Seq((0L, text)).toDF("doc_id", "text"))
      .collect().head
    assert(got.getAs[Long]("n_tokens") === n.toLong)
    val expected = h(c.toLong, n.toLong) + (n - c) * h(1L, n.toLong)
    assert(got.getAs[Long]("entropy_unats") === expected)
    // and the integer total stays honest vs the float truth (≤2 µnats/term)
    val floatTruth = -(c.toDouble / n) * math.log(c.toDouble / n) * 1e6 +
      (n - c) * (-(1.0 / n) * math.log(1.0 / n) * 1e6)
    assert(math.abs(got.getAs[Long]("entropy_unats") - floatTruth) <=
      2.0 * (n - c + 1))
  }

  test("urlDomains lowercases hosts and counts distinct docs") {
    val docs = Seq(
      (0L, "see https://Example.COM/a and http://example.com/b"),
      (1L, "also https://example.com and https://other.org/x"),
      (2L, "no urls here")).toDF("doc_id", "text")
    val got = TextAnalysis.urlDomains(docs).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_urls"), r.getAs[Long]("n_docs"))).toMap
    assert(got("example.com") === ((3L, 2L)))
    assert(got("other.org") === ((1L, 1L)))
    assert(got.size === 2)
  }
}
