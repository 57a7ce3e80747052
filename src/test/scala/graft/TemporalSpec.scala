package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.temporal.Temporal
import graft.temporal.Temporal._

class TemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // versioned table: lineage a has v1 (superseded) + v2 (current); b has v1
  private lazy val versioned = Seq(
    ("a", 1, false, ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00")), "a-v1"),
    ("a", 2, true, ts("2024-02-01 00:00:00"), None, "a-v2"),
    ("b", 1, true, ts("2024-01-10 00:00:00"), None, "b-v1")
  ).toDF("lineage_id", "version", "is_current", "created_at", "superseded_at", "payload")

  test("versionsAtTime picks the live max version per lineage") {
    val jan15 = Temporal.versionsAtTime(versioned, ts("2024-01-15 00:00:00"))
      .collect().map(r => r.getAs[String]("lineage_id") -> r.getAs[String]("payload")).toMap
    assert(jan15 === Map("a" -> "a-v1", "b" -> "b-v1"))
    val feb15 = Temporal.versionsAtTime(versioned, ts("2024-02-15 00:00:00"))
      .collect().map(r => r.getAs[String]("lineage_id") -> r.getAs[String]("payload")).toMap
    assert(feb15 === Map("a" -> "a-v2", "b" -> "b-v1"))
  }

  test("createVersions supersedes the old head and mints version+1") {
    val newRows = Seq(("a", "a-v3"), ("c", "c-v1"))
      .toDF("lineage_id", "payload")
      .withColumn("version", lit(0)).withColumn("is_current", lit(false))
      .withColumn("created_at", lit(null).cast("timestamp"))
      .withColumn("superseded_at", lit(null).cast("timestamp"))
      .select("lineage_id", "version", "is_current", "created_at", "superseded_at", "payload")
    val at = ts("2024-03-01 00:00:00")
    val out = Temporal.createVersions(versioned, newRows, at).cache()
    assert(out.count() === 5)
    val heads = Temporal.currentVersions(out).collect()
      .map(r => r.getAs[String]("lineage_id") ->
        (r.getAs[Int]("version"), r.getAs[String]("payload"))).toMap
    assert(heads === Map("a" -> (3, "a-v3"), "b" -> (1, "b-v1"), "c" -> (1, "c-v1")))
    val oldA = out.where(col("lineage_id") === "a" && col("version") === 2).head()
    assert(!oldA.getAs[Boolean]("is_current"))
    assert(oldA.getAs[Timestamp]("superseded_at") === at)
    // untouched lineage b passes through byte-identical
    val b = out.where(col("lineage_id") === "b").head()
    assert(b.getAs[Boolean]("is_current") && b.getAs[Timestamp]("superseded_at") == null)
  }

  test("history, modifiedInRange and pruneOldVersions") {
    val h = Temporal.history(versioned, "a").collect().map(_.getAs[Int]("version"))
    assert(h.toSeq === Seq(2, 1))
    val m = Temporal.modifiedInRange(versioned,
      ts("2024-01-20 00:00:00"), ts("2024-02-10 00:00:00"))
      .collect().map(r => (r.getAs[String]("lineage_id"), r.getAs[Int]("version"))).toSet
    assert(m === Set(("a", 1), ("a", 2))) // v1 superseded + v2 created in range
    // reference semantics (versioning.py:224-262): keep = number of
    // SUPERSEDED predecessors retained, i.e. keep+1 rows per chain survive
    val pruned0 = Temporal.pruneOldVersions(versioned, keep = 0)
    assert(pruned0.count() === 2) // only the current heads
    assert(pruned0.where(col("lineage_id") === "a").head().getAs[Int]("version") === 2)
    val pruned1 = Temporal.pruneOldVersions(versioned, keep = 1)
    assert(pruned1.count() === 3) // a keeps v2 + one superseded (v1)
  }

  test("temporal predicates translate filter semantics exactly") {
    val chunks = Seq(
      (2023, "Q1", true), (2023, "Q3", true), (2024, "Q1", true),
      (2024, "Q2", false), (2025, "Q1", true)
    ).toDF("fiscal_year", "fiscal_quarter", "is_current")
    def rows(f: TemporalFilter) =
      chunks.where(Temporal.toPredicate(f)).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows(TemporalFilter(Latest)) ===
      Set((2023, "Q1"), (2023, "Q3"), (2024, "Q1"), (2025, "Q1")))
    assert(rows(TemporalFilter(History)) ===
      Set((2023, "Q1"), (2023, "Q3"), (2024, "Q1"), (2024, "Q2"), (2025, "Q1")))
    assert(rows(TemporalFilter(PointInTime, fiscalYear = Some(2024))) ===
      Set((2024, "Q1"))) // Q2 is superseded, excluded without includeSuperseded
    assert(rows(TemporalFilter(PointInTime, fiscalYear = Some(2024),
      includeSuperseded = true)) === Set((2024, "Q1"), (2024, "Q2")))
    assert(rows(TemporalFilter(TimeRange, startYear = Some(2023),
      endYear = Some(2024))) === Set((2023, "Q1"), (2023, "Q3"), (2024, "Q1")))
    // same-year range applies quarter bounds (models/temporal.py:179-183)
    assert(rows(TemporalFilter(TimeRange, startYear = Some(2023),
      endYear = Some(2023), startQuarter = Some("Q2"),
      endQuarter = Some("Q4"))) === Set((2023, "Q3")))
    // cross-year range ignores quarter bounds, as the reference does
    assert(rows(TemporalFilter(TimeRange, startYear = Some(2023),
      endYear = Some(2024), startQuarter = Some("Q2"),
      endQuarter = Some("Q1"))) === Set((2023, "Q1"), (2023, "Q3"), (2024, "Q1")))
  }

  test("datetime→fiscal conversion and query parse") {
    assert(Temporal.toFiscal(java.time.LocalDate.of(2024, 5, 17)) === (2024, "Q2"))
    import graft.retrieval.TemporalParse
    val p1 = TemporalParse.parse("What did Skechers report in Q3 2023?")
    assert(p1.filter === Some(TemporalFilter(PointInTime,
      fiscalYear = Some(2023), fiscalQuarter = Some("Q3"))))
    val p2 = TemporalParse.parse("revenue from 2021 to 2023")
    assert(p2.filter === Some(TemporalFilter(TimeRange,
      startYear = Some(2021), endYear = Some(2023))))
    val p3 = TemporalParse.parse("how has margin evolved over time")
    assert(p3.filter === Some(TemporalFilter(History)))
    val p4 = TemporalParse.parse("what is the latest guidance")
    assert(p4.filter === Some(TemporalFilter(Latest)))
    assert(!TemporalParse.parse("who is the CFO").hasTemporalReference)
  }
}
