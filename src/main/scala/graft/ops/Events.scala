package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over an events table
  * (event_id, ts, user_id, event_type, value) — the behavioral-analytics
  * face of the engine (the reference's temporal model tracks versioned
  * chunks, `src/temporal_kg_rag/graph/versioning.py:102-200`; these ops
  * apply the same per-key time-ordered window machinery to raw event
  * streams, which is what a web-scale corpus's interaction logs look
  * like before they become training data).
  *
  * Scale posture: every op here shuffles once on `user_id` (the window /
  * groupBy key) and nothing else. Per-user event counts are small and
  * bounded in practice; a pathological hot user would be handled by AQE
  * skew splitting on the aggregation (the window ops would need a salted
  * two-phase rewrite, which sessionize's gap logic does not admit — at
  * 100 TB you would cap events-per-user upstream, which is also what the
  * training-data pipeline wants).
  */
object Events {

  /** Epoch micros for a ts column that may be TIMESTAMP or TIMESTAMP_NTZ
    * (parquet naive timestamps read as NTZ in Spark 4, and unix_micros
    * rejects NTZ). A naive timestamp carries no zone; the engine's
    * contract is that it means UTC — every engine entry point pins
    * spark.sql.session.timeZone=UTC, which makes the NTZ→TIMESTAMP cast
    * below exactly that interpretation (and a no-op for TIMESTAMP input).
    */
  private def epochUs(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapSec`. Returns one row per session
    * with span, size and value rollups. Deterministic: events are ordered
    * by (ts, event_id) within each user; timestamps are emitted as epoch
    * micros (bigint) so the oracle compare is exact.
    *
    * One shuffle on user_id; the window and the session aggregation share
    * the same partitioning, so the groupBy after the window is
    * exchange-free.
    */
  def sessionize(events: DataFrame, gapSec: Long = 4 * 3600): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val us = epochUs(col("ts"))
    val gapUs = gapSec * 1000000L
    val marked = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"))
      .withColumn("prev_us", lag(us, 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || us - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(us).as("t_start_us"),
        max(us).as("t_end_us"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum(col("value")), 4).as("sum_value"))
      .withColumn("duration_us", col("t_end_us") - col("t_start_us"))
  }

  /** Ordered-step funnel: for the step list (s1, s2, s3) compute, per
    * user, the first time of s1, the first s2 at-or-after that, the
    * first s3 at-or-after that, and the furthest stage reached (0-3).
    * Missing step times are emitted as -1 (bigint epoch micros) so the
    * output has no nulls.
    *
    * Shape: three filtered min-aggregations on user_id, each joined back
    * by user_id. The per-stage survivor tables have one row per user —
    * cardinality bounded by |users|, which is NOT broadcast-safe at the
    * 100 TB posture — so the joins carry no broadcast hint: AQE picks the
    * strategy from observed sizes (broadcast when a stage's survivors are
    * genuinely small, shuffle otherwise). The events scan is the only big
    * input and each stage reads a pushed-down event_type filter.
    */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase"))
  : DataFrame = {
    require(steps.size == 3, "funnel expects exactly 3 steps")
    val us = epochUs(col("ts"))
    val e = events.select(col("user_id"), col("event_type"), us.as("us"))
    val users = e.select(col("user_id")).distinct()
    val s1 = e.where(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val s2 = e.where(col("event_type") === steps(1))
      .join(s1, "user_id")
      .where(col("us") >= col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val s3 = e.where(col("event_type") === steps(2))
      .join(s2, "user_id")
      .where(col("us") >= col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    users
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(
        col("user_id"),
        coalesce(col("t1"), lit(-1L)).as("t_step1_us"),
        coalesce(col("t2"), lit(-1L)).as("t_step2_us"),
        coalesce(col("t3"), lit(-1L)).as("t_step3_us"),
        (when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0)).cast("int").as("stage"))
  }

  /** Weekly cohort retention: cohort = absolute week index (epoch-micros
    * div week) of the user's first event; for each (cohort_week,
    * week_offset) count the distinct users from that cohort active in
    * that week. Integer arithmetic end-to-end — exact under the oracle.
    *
    * Two shuffles: min-per-user (map-side combined), then the
    * (cohort, offset) count-distinct. The first-event table is one row
    * per user (unbounded), so its re-join carries no broadcast hint —
    * AQE decides from the observed size.
    */
  def retention(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // integer `div`, not float `/`: a double quotient's floor can land on
    // the wrong side within ~1 ulp of a week boundary
    val wk = expr(s"unix_micros(cast(ts as timestamp)) div ${weekUs}L")
    val e = events.select(col("user_id"), wk.as("week"))
    val first = e.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    e.join(first, "user_id")
      .select(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
