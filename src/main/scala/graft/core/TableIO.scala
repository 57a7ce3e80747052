package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style table layer: partitioned Parquet + a snapshot/manifest
  * metadata level.
  *
  * No Iceberg runtime jar exists in this offline sandbox (SURVEY §7.0), so
  * this thin layer provides the Iceberg semantics the north rule needs —
  * snapshot isolation (each commit writes a NEW data directory and flips a
  * current-pointer last), per-partition lineage + metrics rows in the
  * manifest, time-ordered snapshots with parent links, and
  * overwrite-by-commit — behind an API a real Iceberg catalog could
  * replace. Data layout:
  *
  *   root/<table>/data-<snapshotId>/...            partitioned parquet
  *   root/<table>/_snapshots/<snapshotId>.json     manifest
  *   root/<table>/_current                         pointer file (atomic move)
  */
final class TableIO(val root: String) {

  private def tableDir(table: String): Path = Paths.get(root, table)

  final case class PartitionMetric(values: Map[String, String], rows: Long)
  final case class Snapshot(
      table: String,
      snapshotId: Long,
      parent: Option[Long],
      stage: String,
      rows: Long,
      createdAtMs: Long,
      partitions: Seq[PartitionMetric])

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def snapshotJson(s: Snapshot): String = {
    val parts = s.partitions.map { p =>
      val vals = p.values.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${jsonEscape(k)}":"${jsonEscape(v)}"""" }
        .mkString("{", ",", "}")
      s"""{"values":$vals,"rows":${p.rows}}"""
    }.mkString("[", ",", "]")
    s"""{"table":"${jsonEscape(s.table)}","snapshot_id":${s.snapshotId},""" +
      s""""parent":${s.parent.map(_.toString).getOrElse("null")},""" +
      s""""stage":"${jsonEscape(s.stage)}","rows":${s.rows},""" +
      s""""created_at_ms":${s.createdAtMs},"partitions":$parts}"""
  }

  def currentSnapshotId(table: String): Option[Long] = {
    val cur = tableDir(table).resolve("_current")
    if (Files.exists(cur))
      Some(new String(Files.readAllBytes(cur), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  def currentStage(table: String): Option[String] =
    currentSnapshotId(table).flatMap { id =>
      val mf = tableDir(table).resolve("_snapshots").resolve(s"$id.json")
      if (!Files.exists(mf)) None
      else {
        val txt = new String(Files.readAllBytes(mf), StandardCharsets.UTF_8)
        """"stage":"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
      }
    }

  def exists(table: String): Boolean =
    currentSnapshotId(table).exists { id =>
      Files.exists(tableDir(table).resolve(s"data-$id"))
    }

  /** Commit a new snapshot: write data, write manifest with per-partition
    * metrics rows, then atomically flip the current pointer (crash before
    * the flip leaves the previous snapshot intact = stage-boundary
    * resumability).
    */
  def commit(table: String, df: DataFrame, partitionBy: Seq[String],
      stage: String): Snapshot = {
    val dir = tableDir(table)
    Files.createDirectories(dir.resolve("_snapshots"))
    val parent = currentSnapshotId(table)
    val snapId = parent.getOrElse(0L) + 1L
    val dataPath = dir.resolve(s"data-$snapId").toString

    val writer = if (partitionBy.nonEmpty)
      df.write.partitionBy(partitionBy: _*) else df.write
    writer.mode("overwrite").parquet(dataPath)

    // per-partition lineage/metrics rows (computed from the committed data
    // so the manifest describes exactly what landed). The explicit schema
    // matters for the EMPTY-table case: a partitionBy write of zero rows
    // emits only _SUCCESS, and a schemaless read-back then fails inference
    // ("Unable to infer schema for Parquet") — killing the stage and, on
    // --resume, killing it again, for a legitimately empty table (e.g. a
    // corpus whose patterns extract zero triples)
    val spark = df.sparkSession
    val written = spark.read.schema(df.schema).parquet(dataPath)
    val (partMetrics, totalRows) =
      if (partitionBy.nonEmpty) {
        val counts = written.groupBy(partitionBy.map(col): _*).count()
          .collect()
        val pm = counts.map { r =>
          PartitionMetric(
            partitionBy.zipWithIndex
              .map { case (c, i) => c -> String.valueOf(r.get(i)) }.toMap,
            r.getLong(partitionBy.length))
        }.toSeq
        (pm, pm.map(_.rows).sum)
      } else {
        val n = written.count()
        (Seq(PartitionMetric(Map.empty, n)), n)
      }

    val snap = Snapshot(table, snapId, parent, stage, totalRows,
      System.currentTimeMillis(), partMetrics)
    Files.write(dir.resolve("_snapshots").resolve(s"$snapId.json"),
      snapshotJson(snap).getBytes(StandardCharsets.UTF_8))
    // schema sidecar (the Iceberg manifests carry schemas for the same
    // reason): read() needs it to open a snapshot whose data dir has no
    // part files — a legitimately EMPTY partitioned commit
    Files.write(dir.resolve("_snapshots").resolve(s"$snapId.schema.json"),
      df.schema.json.getBytes(StandardCharsets.UTF_8))
    val tmp = dir.resolve("_current.tmp")
    Files.write(tmp, snapId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("_current"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  def read(spark: SparkSession, table: String): DataFrame = {
    val id = currentSnapshotId(table).getOrElse(
      sys.error(s"table $table has no committed snapshot under $root"))
    val path = tableDir(table).resolve(s"data-$id").toString
    try spark.read.parquet(path)
    catch {
      // an EMPTY partitioned snapshot has only _SUCCESS — no files to
      // infer from; fall back to the schema sidecar the commit wrote
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
        val sf = tableDir(table).resolve("_snapshots")
          .resolve(s"$id.schema.json")
        if (!Files.exists(sf)) throw e
        val st = org.apache.spark.sql.types.DataType.fromJson(
          new String(Files.readAllBytes(sf), StandardCharsets.UTF_8))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        spark.read.schema(st).parquet(path)
    }
  }

  def snapshots(table: String): Seq[Long] = {
    val d = tableDir(table).resolve("_snapshots")
    if (!Files.exists(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted
  }
}
