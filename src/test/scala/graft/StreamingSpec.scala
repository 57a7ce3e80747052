package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Schema.Span
import graft.ingest.SpanChunker
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.DocEvent

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def doc(id: String, text: String, at: String): DocEvent =
    DocEvent(id, Seq(Span("text", text, "", 0)), 2024, "Q1", ts(at))

  test("streaming chunk -> NER -> watermarked windowed counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val q = StreamingIngest.startWindowQuery(spark, input.toDS(),
      "stream_counts", SpanChunker.Config(200, 40))
    try {
      input.addData(
        doc("d1", "Skyline Systems opened offices in Austin.",
          "2024-01-01 10:01:00"),
        doc("d2", "Skyline Systems grew again.", "2024-01-01 10:02:00"))
      q.processAllAvailable()
      // the watermark tracks event times OBSERVED at the watermark node, so
      // flush docs must themselves yield mentions; and an advance is
      // APPLIED a batch later: batch 2 raises it past the first window,
      // batch 3 flushes the closed windows in append mode
      input.addData(doc("d3", "Dublin hosted the team.", "2024-01-01 11:00:00"))
      q.processAllAvailable()
      input.addData(doc("d4", "Dublin again.", "2024-01-01 11:01:00"))
      q.processAllAvailable()
      val rows = spark.table("stream_counts")
        .where(col("window.start") === ts("2024-01-01 10:00:00"))
        .select("entity_name", "mentions").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.get("Skyline Systems").contains(2L))
      assert(rows.get("Austin").contains(1L))
    } finally q.stop()
  }

  test("running entity totals via mapGroupsWithState accumulate across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val totals = StreamingIngest.runningEntityTotals(spark,
      StreamingIngest.mentionStream(spark,
        StreamingIngest.chunkStream(spark, input.toDS())))
    val q = totals.writeStream.format("memory").queryName("stream_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(doc("d1", "Skyline Systems grew.", "2024-01-01 10:00:00"))
      q.processAllAvailable()
      input.addData(doc("d2", "Skyline Systems grew again.", "2024-01-01 10:05:00"))
      q.processAllAvailable()
      val latest = spark.table("stream_totals")
        .where($"entity_name" === "Skyline Systems")
        .orderBy($"last_seen".desc).head()
      assert(latest.getAs[Long]("total_mentions") === 2L)
      assert(latest.getAs[Timestamp]("last_seen") === ts("2024-01-01 10:05:00"))
    } finally q.stop()
  }

  test("streaming exact dedup keeps first occurrence per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val deduped = StreamingIngest.dedupStream(spark, input.toDS(),
      lateness = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        doc("d1", "identical text", "2024-01-01 10:00:00"),
        doc("d2", "identical text", "2024-01-01 10:01:00"), // dup, same batch
        doc("d3", "different text", "2024-01-01 10:02:00"))
      q.processAllAvailable()
      input.addData( // dup across batches, inside the watermark horizon
        doc("d4", "identical text", "2024-01-01 10:03:00"))
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").select("doc_id").collect()
        .map(_.getString(0)).toSet
      assert(ids === Set("d1", "d3"))
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on gap and on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingIngest.UserEvent
    val input = MemoryStream[UserEvent]
    val sessions = StreamingIngest.sessionStream(spark, input.toDS(),
      gapSec = 60, lateness = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("stream_sess")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        UserEvent(1L, ts("2024-01-01 10:00:00"), "view", 1.0),
        UserEvent(1L, ts("2024-01-01 10:00:30"), "click", 2.0))
      q.processAllAvailable()
      // 270s > 60s gap: closes session 1 inline, opens session 2
      input.addData(UserEvent(1L, ts("2024-01-01 10:05:00"), "view", 5.0))
      q.processAllAvailable()
      // advance the watermark well past session 2's end + gap so the
      // EventTimeTimeout fires (watermark application lags one batch)
      input.addData(UserEvent(2L, ts("2024-01-01 10:30:00"), "view", 0.5))
      q.processAllAvailable()
      input.addData(UserEvent(2L, ts("2024-01-01 10:40:00"), "view", 0.5))
      q.processAllAvailable()
      val got = spark.table("stream_sess")
        .where($"user_id" === 1L).orderBy($"t_start_us")
        .collect()
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      assert(got.length === 2)
      assert(got(0) === ((2L, 3.0))) // gap-closed
      assert(got(1) === ((1L, 5.0))) // timeout-closed
    } finally q.stop()
  }

  test("stream sessionize matches batch sessionize, incl. a backward-extending late event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingIngest.UserEvent
    val input = MemoryStream[UserEvent]
    val sessions = StreamingIngest.sessionStream(spark, input.toDS(),
      gapSec = 120, lateness = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("stream_parity")
      .outputMode(OutputMode.Append()).start()
    val all = scala.collection.mutable.ArrayBuffer.empty[UserEvent]
    def add(evs: UserEvent*): Unit = {
      all ++= evs; input.addData(evs); q.processAllAvailable()
    }
    try {
      add(UserEvent(1L, ts("2024-01-01 10:10:00"), "view", 1.0))
      // LATE cross-batch event: 30s BEFORE the open session's start, well
      // inside the 10-minute lateness -> must merge AND extend t_start_us
      // backward (the round-3 bug kept the old start)
      add(UserEvent(1L, ts("2024-01-01 10:09:30"), "click", 2.0))
      // watermark pushers on another user, far enough ahead that user 1's
      // session times out (watermark application lags one batch)
      add(UserEvent(2L, ts("2024-01-01 10:40:00"), "view", 0.5))
      add(UserEvent(2L, ts("2024-01-01 10:50:00"), "view", 0.5))
      val streamed = spark.table("stream_parity")
        .select("user_id", "t_start_us", "t_end_us", "n_events", "sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      // batch ground truth over the SAME events (user 2's open tail
      // sessions are not yet emitted by the stream -> subset compare)
      val batch = graft.ops.Events.sessionize(
        all.toSeq.zipWithIndex.map { case (e, i) =>
          (i.toLong, e.event_ts, e.user_id, e.event_type, e.value)
        }.toDF("event_id", "ts", "user_id", "event_type", "value"),
        gapSec = 120)
        .select("user_id", "t_start_us", "t_end_us", "n_events", "sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch),
        s"stream emitted a session batch disagrees with:\n stream=$streamed\n batch=$batch")
      // and the late-event session specifically: starts at the LATE 10:09:30
      val u1 = streamed.filter(_._1 == 1L)
      assert(u1.size === 1)
      assert(u1.head._2 === ts("2024-01-01 10:09:30").getTime * 1000L)
      assert(u1.head._4 === 2L && u1.head._5 === 3.0)
    } finally q.stop()
  }
}
