package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic backward as-of join — for every left row, attach the right row
  * with the greatest time ≤ the left row's time within the same key
  * (event attribution, slowly-changing-dimension lookup, trade/quote
  * alignment). Spark has no native as-of operator; the naive formulations
  * either explode (inequality theta-join) or double-shuffle (per-left-row
  * aggregation). This is the single-shuffle union algorithm:
  *
  *   1. tag left rows side=1 and right rows side=0, union them on
  *      (keys, t, side, payloads);
  *   2. one window per key ordered by (t, side) — right sorts first at
  *      equal t, so the match is inclusive (right_t ≤ left_t);
  *   3. `last(right_payload_struct, ignoreNulls)` over
  *      rows-unbounded-preceding carries the latest right payload
  *      forward; the payload travels as ONE struct so a legitimately
  *      null right column can never tear a row across matches;
  *   4. keep side=1 and unpack.
  *
  * Cost at scale: one hash-partition-by-key exchange + an in-partition
  * sort — the same price as a plain equi-join of the two inputs, with no
  * pair blow-up regardless of how many right rows precede a left row.
  * Hot keys skew the sort, not a join build side; AQE cannot split a
  * window partition, so pre-salt the key if one key dominates (same
  * remedy as any windowed op).
  *
  * Ties between right rows at identical (keys, t) are resolved
  * arbitrarily — pre-deduplicate the right side per (keys, t) when that
  * matters (the oracle-checked query keeps max event_id).
  */
object AsofJoin {

  /** Left columns pass through; right columns other than `keys` and
    * `rightTime` are appended (null when no right row is at or before the
    * left row's time). Right payload names must not collide with left
    * column names.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val lPay = left.columns.filterNot(keys.contains).toSeq
    val rPay = right.columns
      .filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val collisions = rPay.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload collides with left columns: $collisions")

    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        struct(lPay.map(col): _*).as("__l")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(l2.schema("__l").dataType).as("__l"),
        struct(rPay.map(col): _*).as("__r")): _*)
    val l3 = l2.withColumn("__r",
      lit(null).cast(r2.schema("__r").dataType))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l3.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(keys.map(col) ++ lPay.map(c => col(s"__l.$c").as(c)) ++
        rPay.map(c => col(s"__m.$c").as(c)): _*)
  }
}
