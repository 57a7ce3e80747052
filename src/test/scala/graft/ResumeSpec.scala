package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.IngestJob

/** Resumability gate (BASELINE.md row 5): the pipeline restarts from the
  * snapshot at any stage boundary and produces byte-identical final output.
  */
class ResumeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f =>
        Files.delete(f))

  private def edgeSet(io: graft.core.TableIO): Set[String] =
    io.read(spark, "edges")
      .select("subj", "pred", "obj", "t_start", "t_end", "confidence",
        "description", "source_chunks")
      .collect().map(_.toString).toSet

  test("kill-after-stage-k resume reproduces byte-identical edges") {
    val base = Files.createTempDirectory("graft-resume").toString
    val argsFull = IngestJob.Args(work = s"$base/full", docs = 60, seed = 42)
    val ioFull = IngestJob.run(spark, argsFull)
    val want = edgeSet(ioFull)
    assert(want.nonEmpty)

    // simulate a crash after stage 3 (triples committed, nothing after):
    // run fully, then delete all downstream tables and the resume must
    // rebuild exactly
    val w2 = s"$base/killed"
    IngestJob.run(spark, IngestJob.Args(work = w2, docs = 60, seed = 42))
    Seq("entities", "dup_pairs", "components", "nodes", "edges",
      "mentions_final").foreach(t => deleteRec(java.nio.file.Paths.get(w2, t)))
    val ioResumed = IngestJob.run(spark,
      IngestJob.Args(work = w2, docs = 60, seed = 42, resume = true))
    assert(edgeSet(ioResumed) === want)

    // resume over a COMPLETE run must be a no-op and identical
    val snapBefore = ioFull.currentSnapshotId("edges")
    val ioNoop = IngestJob.run(spark,
      IngestJob.Args(work = s"$base/full", docs = 60, seed = 42, resume = true))
    assert(ioNoop.currentSnapshotId("edges") === snapBefore,
      "resume must not recommit completed stages")
    assert(edgeSet(ioNoop) === want)
    deleteRec(java.nio.file.Paths.get(base))
  }

  test("snapshot manifests carry per-partition lineage and metrics rows") {
    val base = Files.createTempDirectory("graft-manifest").toString
    val io = IngestJob.run(spark, IngestJob.Args(work = base, docs = 30, seed = 7))
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(base, "nodes", "_snapshots", "1.json")), "UTF-8")
    assert(manifest.contains("\"partitions\":["))
    assert(manifest.contains("\"entity_type\""))
    assert(manifest.contains("\"rows\":"))
    assert(manifest.contains("\"parent\":null"))
    // partition metrics must sum to the table row count
    val rows = io.read(spark, "nodes").count()
    val pattern = """"rows":(\d+)""".r
    val counts = pattern.findAllMatchIn(manifest).map(_.group(1).toLong).toSeq
    assert(counts.head === rows) // first "rows" is the table total
    assert(counts.tail.sum === rows)
    deleteRec(java.nio.file.Paths.get(base))
  }

  test("commit of a legitimately EMPTY partitioned table succeeds") {
    // a partitionBy write of zero rows emits only _SUCCESS; the manifest
    // read-back must supply the schema or inference fails and the stage —
    // and every --resume of it — dies (round-5 review finding)
    import spark.implicits._
    val base = Files.createTempDirectory("graft-empty").toString
    val io = new graft.core.TableIO(base)
    val empty = Seq.empty[(String, String, Long)]
      .toDF("src", "pred", "weight")
    val snap = io.commit("edges", empty, Seq("pred"), stage = "test")
    assert(snap.rows === 0L)
    assert(io.read(spark, "edges").count() === 0L)
    assert(io.read(spark, "edges").columns.toSet === Set("src", "pred", "weight"))
    // a later non-empty commit on the same table still works
    val snap2 = io.commit("edges",
      Seq(("a", "p", 1L)).toDF("src", "pred", "weight"), Seq("pred"), "test")
    assert(snap2.rows === 1L && io.read(spark, "edges").count() === 1L)
    deleteRec(java.nio.file.Paths.get(base))
  }
}
