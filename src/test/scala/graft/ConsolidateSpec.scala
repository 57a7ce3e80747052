package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.{ConsolidateJob, IngestJob}

/** The periodic consolidation entry point (reference
  * scripts/consolidate_graph.py, consolidation.py:60-178,430-457).
  */
class ConsolidateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f =>
        Files.delete(f))

  test("threshold gate skips small graphs (consolidate_periodically)") {
    val base = Files.createTempDirectory("graft-consol-skip").toString
    IngestJob.run(spark, IngestJob.Args(work = base, docs = 20, seed = 42))
    val ran = ConsolidateJob.run(spark,
      ConsolidateJob.Args(work = base, threshold = 1000000L))
    assert(!ran)
    val io = new graft.core.TableIO(base)
    assert(io.currentSnapshotId("nodes") === Some(1L)) // untouched
    deleteRec(java.nio.file.Paths.get(base))
  }

  test("consolidation over an already-canonical graph is idempotent " +
      "and commits new snapshots") {
    val base = Files.createTempDirectory("graft-consol").toString
    val io = IngestJob.run(spark, IngestJob.Args(work = base, docs = 60, seed = 42))
    val edgesBefore = io.read(spark, "edges")
      .select("subj", "pred", "obj").collect().map(_.toString).toSet
    val nodesBefore = io.read(spark, "nodes")
      .select("entity_id", "name", "mention_count").collect()
      .map(_.toString).toSet
    val lineageBefore = io.read(spark, "nodes")
      .agg(sum(size(col("merged_entity_ids")))).head().getLong(0)
    assert(lineageBefore > 0, "ingest must have produced merge lineage")

    val ran = ConsolidateJob.run(spark,
      ConsolidateJob.Args(work = base, threshold = 1L))
    assert(ran)
    assert(io.currentSnapshotId("nodes") === Some(2L))
    assert(io.currentSnapshotId("edges") === Some(2L))

    // ingest already canonicalized, so a re-consolidation must not change
    // the (subj, pred, obj) set or the node identities, and must carry the
    // accumulated merge lineage forward
    val edgesAfter = io.read(spark, "edges")
      .select("subj", "pred", "obj").collect().map(_.toString).toSet
    assert(edgesAfter === edgesBefore)
    val nodesAfter = io.read(spark, "nodes")
      .select("entity_id", "name", "mention_count").collect()
      .map(_.toString).toSet
    assert(nodesAfter === nodesBefore)
    val lineageAfter = io.read(spark, "nodes")
      .agg(sum(size(col("merged_entity_ids")))).head().getLong(0)
    assert(lineageAfter === lineageBefore)
    deleteRec(java.nio.file.Paths.get(base))
  }
}
