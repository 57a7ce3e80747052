package graft.temporal

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators (SURVEY §2.7): the reference's TemporalFilter /
  * VersionManager / TimeTraveler re-expressed as pure `Column` predicates
  * and DataFrame transforms — no Cypher string splicing
  * (models/temporal.py:138-192, temporal/versioning.py, temporal/time_travel.py).
  *
  * All operators are narrow filters or single-window transforms: at 100 TB
  * they ride on partition pruning (tables partitioned by fiscal_year) and
  * never shuffle except the per-lineage window, which shuffles once on the
  * lineage key.
  */
object Temporal {

  sealed trait QueryType
  case object PointInTime extends QueryType
  case object TimeRange extends QueryType
  case object Latest extends QueryType
  case object History extends QueryType

  /** The reference TemporalFilter (models/temporal.py:23-95) as a plain
    * case class; quarters are "Q1".."Q4".
    */
  final case class TemporalFilter(
      queryType: QueryType,
      fiscalYear: Option[Int] = None,
      fiscalQuarter: Option[String] = None,
      startYear: Option[Int] = None,
      startQuarter: Option[String] = None,
      endYear: Option[Int] = None,
      endQuarter: Option[String] = None,
      includeSuperseded: Boolean = false)

  private def quarterNum(q: String): Int = q.stripPrefix("Q").toInt

  /** datetime → fiscal (year, quarter) — models/temporal.py:97-111. */
  def toFiscal(t: java.time.LocalDate): (Int, String) =
    (t.getYear, s"Q${(t.getMonthValue - 1) / 3 + 1}")

  /** TemporalFilter → Column predicate over a table with columns
    * (fiscal_year:int, fiscal_quarter:string, is_current:boolean) — the
    * direct translation of to_cypher_where_clause (models/temporal.py:138-192):
    * LATEST → is_current; POINT_IN_TIME → year [+ quarter] [+ is_current];
    * TIME_RANGE → year bounds, quarter bounds only when same-year
    * (models/temporal.py:179-183); HISTORY → no filter.
    */
  def toPredicate(f: TemporalFilter): Column = f.queryType match {
    case Latest => col("is_current") === true
    case History => lit(true)
    case PointInTime =>
      val base = f.fiscalYear.map(col("fiscal_year") === _).getOrElse(lit(true))
      val withQ = f.fiscalQuarter
        .map(q => base && col("fiscal_quarter") === q).getOrElse(base)
      if (f.includeSuperseded) withQ else withQ && col("is_current") === true
    case TimeRange =>
      val lo = f.startYear.map(col("fiscal_year") >= _).getOrElse(lit(true))
      val hi = f.endYear.map(col("fiscal_year") <= _).getOrElse(lit(true))
      val sameYear = (for (s <- f.startYear; e <- f.endYear) yield s == e)
        .getOrElse(false)
      val q =
        if (!sameYear) lit(true)
        else {
          val qlo = f.startQuarter.map(q =>
            regexp_extract(col("fiscal_quarter"), "\\d", 0).cast("int")
              >= quarterNum(q)).getOrElse(lit(true))
          val qhi = f.endQuarter.map(q =>
            regexp_extract(col("fiscal_quarter"), "\\d", 0).cast("int")
              <= quarterNum(q)).getOrElse(lit(true))
          qlo && qhi
        }
      val all = lo && hi && q
      if (f.includeSuperseded) all else all && col("is_current") === true
  }

  // --------------------------------------------------------------------
  // VersionManager (temporal/versioning.py) over a versioned table with
  // columns (lineage_id, version:int, is_current:boolean,
  // created_at:timestamp, superseded_at:timestamp nullable).
  // --------------------------------------------------------------------

  /** Supersede current rows of `newRows.lineage_id`s and append the new
    * versions (versioning.py:26-74) — copy-on-write over the affected
    * lineages only: rows of untouched lineages pass through unchanged.
    * `newRows` must carry (lineage_id, payload columns); version /
    * is_current / created_at / superseded_at are minted here.
    */
  def createVersions(versioned: DataFrame, newRows: DataFrame,
      at: Timestamp): DataFrame = {
    val latest = versioned.where(col("is_current"))
      .groupBy(col("lineage_id").as("lid"))
      .agg(max(col("version")).as("cur_version"))
    val touched = newRows.select(col("lineage_id").as("lid")).distinct()
    val superseded = versioned
      .join(touched, versioned("lineage_id") === touched("lid"), "left_semi")
      .withColumn("superseded_at",
        when(col("is_current"), lit(at)).otherwise(col("superseded_at")))
      .withColumn("is_current", lit(false))
    val untouched = versioned
      .join(touched, versioned("lineage_id") === touched("lid"), "left_anti")
    val minted = newRows
      .join(latest, newRows("lineage_id") === latest("lid"), "left")
      .drop("lid")
      .withColumn("version", coalesce(col("cur_version"), lit(0)) + 1)
      .drop("cur_version")
      .withColumn("is_current", lit(true))
      .withColumn("created_at", lit(at))
      .withColumn("superseded_at", lit(null).cast("timestamp"))
    val cols = versioned.columns.map(col).toSeq
    untouched.select(cols: _*)
      .unionByName(superseded.select(cols: _*))
      .unionByName(minted.select(cols: _*))
  }

  /** Full version chain of a lineage, newest first (versioning.py:76-100). */
  def history(versioned: DataFrame, lineageId: String): DataFrame =
    versioned.where(col("lineage_id") === lineageId)
      .orderBy(col("version").desc)

  /** Head of each chain (versioning.py:102-118). */
  def currentVersions(versioned: DataFrame): DataFrame =
    versioned.where(col("is_current"))

  /** As-of: created_at <= t AND (superseded_at IS NULL OR superseded_at > t),
    * max version per lineage (versioning.py:120-161).
    */
  def versionsAtTime(versioned: DataFrame, t: Timestamp): DataFrame = {
    val live = versioned.where(col("created_at") <= lit(t) &&
      (col("superseded_at").isNull || col("superseded_at") > lit(t)))
    val w = Window.partitionBy(col("lineage_id")).orderBy(col("version").desc)
    live.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** created_at ∈ [s,e] OR superseded_at ∈ [s,e] (versioning.py:163-200). */
  def modifiedInRange(versioned: DataFrame, s: Timestamp, e: Timestamp): DataFrame =
    versioned.where(
      (col("created_at") >= lit(s) && col("created_at") <= lit(e)) ||
      (col("superseded_at") >= lit(s) && col("superseded_at") <= lit(e)))

  /** Delete versions beyond `keep` predecessors of the current head: the
    * reference deletes rows whose SUPERSEDES path length from the current
    * version exceeds `keep` (versioning.py:224-262), i.e. it KEEPS the
    * current version plus `keep` superseded ones — keep+1 rows per chain.
    */
  def pruneOldVersions(versioned: DataFrame, keep: Int): DataFrame = {
    val w = Window.partitionBy(col("lineage_id")).orderBy(col("version").desc)
    versioned.withColumn("rn", row_number().over(w))
      .where(col("rn") <= keep + 1).drop("rn")
  }

  // --------------------------------------------------------------------
  // TimeTraveler (temporal/time_travel.py)
  // --------------------------------------------------------------------

  /** Documents known at time t (time_travel.py:26-54). */
  def documentsAtTime(documents: DataFrame, t: Timestamp): DataFrame =
    documents.where(col("created_at") <= lit(t))

  /** As-of chunk view, optionally restricted to one document
    * (time_travel.py:56-98).
    */
  def chunksAtTime(versionedChunks: DataFrame, t: Timestamp,
      documentId: Option[String] = None): DataFrame = {
    val base = versionsAtTime(versionedChunks, t)
    documentId.map(d => base.where(col("doc_id") === d)).getOrElse(base)
  }

  /** Entity/chunk counts at t1 vs t2 with deltas (time_travel.py:100-136). */
  def comparePeriods(versionedChunks: DataFrame, t1: Timestamp,
      t2: Timestamp): DataFrame = {
    val c1 = versionsAtTime(versionedChunks, t1)
      .agg(count(lit(1)).as("n")).withColumn("at", lit("t1"))
    val c2 = versionsAtTime(versionedChunks, t2)
      .agg(count(lit(1)).as("n")).withColumn("at", lit("t2"))
    c1.unionByName(c2)
  }
}
