package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.core.Schema._
import graft.ingest.{GazetteerNer, SpanChunker}

/** Structured-Streaming face of the construction pipeline.
  *
  * The reference is a batch system (SURVEY §2.11: no streams; incremental
  * ingest = per-document batch calls), but the engine's extraction kernels
  * are pure per-row functions, so the SAME chunker and NER run unchanged
  * under `readStream`: chunking and mention detection are narrow
  * (flatMap / mapPartitions — no state), and the only stateful operators
  * are the windowed mention aggregation behind a watermark and an
  * entity-total `mapGroupsWithState`. At scale this is the continuous
  * ingest path: a stream of interleaved docs appends to the same
  * bucketed mention/chunk tables the batch job writes.
  */
object StreamingIngest {

  /** One streaming input record: an interleaved doc + its event time. */
  final case class DocEvent(doc_id: String, spans: Seq[Span],
      fiscal_year: Int, fiscal_quarter: String, event_ts: Timestamp)

  final case class ChunkEvent(chunk: ChunkRow, event_ts: Timestamp)

  /** Streaming chunker: pure flatMap of the batch SpanChunker over each
    * incoming doc (no shuffle, no state).
    */
  def chunkStream(spark: SparkSession, docs: Dataset[DocEvent],
      cfg: SpanChunker.Config = SpanChunker.Config()): Dataset[ChunkEvent] = {
    import spark.implicits._
    docs.flatMap { d =>
      val meta = DocMeta(d.doc_id, "", "", "", d.fiscal_year,
        d.fiscal_quarter, "", 0)
      SpanChunker.chunkDoc(DocRow(d.doc_id, d.spans), meta, cfg)
        .map(ChunkEvent(_, d.event_ts))
    }
  }

  /** Streaming mention detection: the batch gazetteer automaton, pooled
    * per executor exactly as in the batch path.
    */
  def mentionStream(spark: SparkSession,
      chunks: Dataset[ChunkEvent]): DataFrame = {
    import spark.implicits._
    chunks.mapPartitions { it =>
      val _ = GazetteerNer.trie
      it.flatMap(c => GazetteerNer.mentionsOf(c.chunk).map(m => (m, c.event_ts)))
    }.toDF("mention", "event_ts")
      .select(col("mention.*"), col("event_ts"))
  }

  /** Windowed mention counts behind a watermark: late data beyond
    * `lateness` is dropped; output is append-mode-safe.
    */
  def windowedMentionCounts(mentions: DataFrame,
      windowLen: String = "5 minutes",
      lateness: String = "10 minutes"): DataFrame =
    mentions
      .withWatermark("event_ts", lateness)
      .groupBy(window(col("event_ts"), windowLen),
        col("entity_name"), col("entity_type"))
      .agg(sum(col("mention_count")).as("mentions"),
        // exact distinct is unsupported on streams; HLL sketch instead
        approx_count_distinct(col("chunk_id")).as("chunks"))

  final case class EntityTotal(
      entity_name: String, entity_type: String,
      total_mentions: Long, last_seen: Timestamp)

  /** Running per-entity totals via mapGroupsWithState — the streaming
    * equivalent of the batch entity aggregate (Linker.entities).
    */
  def runningEntityTotals(spark: SparkSession,
      mentions: DataFrame): Dataset[EntityTotal] = {
    import spark.implicits._
    def fold(key: (String, String),
        rows: Iterator[(String, String, Long, Timestamp)],
        state: GroupState[EntityTotal]): EntityTotal = {
      val batch = rows.toSeq
      val add = batch.map(_._3).sum
      val maxTs = batch.map(_._4.getTime).max
      val prev = state.getOption
        .getOrElse(EntityTotal(key._1, key._2, 0L, new Timestamp(0L)))
      val next = EntityTotal(key._1, key._2, prev.total_mentions + add,
        new Timestamp(math.max(prev.last_seen.getTime, maxTs)))
      state.update(next)
      next
    }
    mentions
      .select(col("entity_name"), col("entity_type"),
        col("mention_count").cast("long"), col("event_ts"))
      .as[(String, String, Long, Timestamp)]
      .groupByKey { case (n, t, _, _) => (n, t) }
      .mapGroupsWithState[EntityTotal, EntityTotal](
        GroupStateTimeout.NoTimeout)(fold _)
  }

  /** Streaming exact dedup: keep the FIRST occurrence of each content hash
    * within the watermark horizon — the streaming face of Dedup.exact.
    * `dropDuplicatesWithinWatermark` is the only state-bounded way to dedup
    * an unbounded stream: plain dropDuplicates would grow its state table
    * forever, while here rows older than `lateness` are evicted, so state
    * is O(distinct hashes per horizon) regardless of stream length.
    */
  def dedupStream(spark: SparkSession, docs: Dataset[DocEvent],
      lateness: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    docs.map(d => (d.doc_id,
        d.spans.filter(_.kind == "text").map(_.text).mkString(" "),
        d.event_ts))
      .toDF("doc_id", "text", "event_ts")
      .withColumn("content_md5", md5(col("text").cast("binary")))
      .withWatermark("event_ts", lateness)
      .dropDuplicatesWithinWatermark("content_md5")
  }

  final case class UserEvent(user_id: Long, event_ts: Timestamp,
      event_type: String, value: Double)

  /** Full-microsecond epoch for a Timestamp. `getTime` alone is
    * millisecond-truncated; the synthetic event streams carry genuine
    * sub-millisecond fractions, and the batch `Events.sessionize` emits
    * `unix_micros` — so the streaming face must use the same resolution
    * or its session endpoints diverge from the batch result on the
    * identical events (caught building the q_stream_sessionize driver
    * row: every endpoint was off by the sub-ms fraction).
    */
  private def epochUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  final case class SessionAcc(t_start_us: Long, t_end_us: Long,
      n_events: Long, sum_value: Double)

  final case class SessionOut(user_id: Long, t_start_us: Long,
      t_end_us: Long, n_events: Long, sum_value: Double)

  /** Streaming gap-based sessionization — the continuous face of
    * `graft.ops.Events.sessionize`: one open session per user lives in
    * `flatMapGroupsWithState` state; an event within `gapSec` of the
    * session end extends it, a later event closes-and-emits it, and an
    * EventTimeTimeout fires the final close once the watermark passes
    * end + gap (so state is O(active users), bounded by the horizon, and
    * every session is emitted exactly once in append mode).
    */
  def sessionStream(spark: SparkSession, events: Dataset[UserEvent],
      gapSec: Long = 4 * 3600,
      lateness: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapSec * 1000000L
    def fold(uid: Long, rows: Iterator[UserEvent],
        state: GroupState[SessionAcc]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(uid, s.t_start_us, s.t_end_us, s.n_events,
          s.sum_value))
      } else {
        val batch = rows.toArray.sortBy(e => epochUs(e.event_ts))
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        batch.foreach { e =>
          val t = epochUs(e.event_ts)
          cur = cur match {
            case Some(s) if t - s.t_end_us <= gapUs =>
              // a late cross-batch event admitted by the watermark can
              // PRECEDE the open session's start — extend both endpoints,
              // or the emitted start/duration diverges from the batch
              // Events.sessionize result on the same data
              Some(SessionAcc(math.min(s.t_start_us, t),
                math.max(s.t_end_us, t),
                s.n_events + 1, s.sum_value + e.value))
            case Some(s) =>
              closed ::= SessionOut(uid, s.t_start_us, s.t_end_us,
                s.n_events, s.sum_value)
              Some(SessionAcc(t, t, 1L, e.value))
            case None => Some(SessionAcc(t, t, 1L, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close once event time passes the gap horizon. Clamped above
          // the current watermark: when the configured lateness exceeds
          // gapSec, a late-but-admitted event can end a session so far
          // behind the watermark that end + gap is not past it — Spark
          // rejects a timeout at-or-below the watermark with an
          // IllegalStateException, killing the query. The clamp only
          // fires in that regime (the session is then closed at the next
          // possible instant, which is also when its gap has provably
          // expired in event time).
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(
            math.max(wm + 1L, s.t_end_us / 1000L + gapSec * 1000L))
        }
        closed.reverse.iterator
      }
    }
    events
      .withWatermark("event_ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(fold _)
  }

  /** Drive [[sessionStream]] over a bounded parquet events table as a REAL
    * file-source streaming query (Trigger.AvailableNow, memory sink) and
    * return the emitted sessions as a static DataFrame — the driver-gate
    * face of the streaming path, compared against the same DuckDB
    * gap-sessionization oracle as the batch `Events.sessionize`.
    *
    * Emission semantics on a bounded stream (what the oracle must mirror):
    * the whole table arrives as ONE microbatch (file source, no
    * maxFilesPerTrigger limit), so every intra-user gap-closed session is
    * emitted there; each user's LAST session stays in state with an
    * event-time timeout at t_end + gap, and is flushed by the trailing
    * no-data microbatch iff that timeout lies strictly BELOW the final
    * watermark (= max event time under lateness 0; Spark fires
    * `timeoutTimestamp < watermark`, both at ms resolution). Sessions
    * whose gap has not provably expired by end-of-input correctly remain
    * open — a later file could still extend them — so the oracle excludes
    * exactly those.
    *
    * The checkpoint dir is a throwaway temp dir: this entry verifies the
    * operator's semantics, not sink recovery (ResumeSpec covers resume).
    */
  def sessionizeBoundedRun(spark: SparkSession, eventsPath: String,
      gapSec: Long = 4 * 3600): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsPath).schema
    // the file streaming source lists a DIRECTORY; when handed a plain
    // parquet file (the testdata layout), expose it through a temp dir
    // symlink — zero copy, read-only source untouched
    val src = {
      val p = java.nio.file.Paths.get(eventsPath)
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("graft-stream-src-")
        java.nio.file.Files.createSymbolicLink(
          d.resolve(p.getFileName), p.toAbsolutePath)
        d.toString
      } else eventsPath
    }
    val events = spark.readStream.schema(schema).parquet(src)
      .select(col("user_id"), col("ts").cast("timestamp").as("event_ts"),
        col("event_type"), col("value"))
      .as[UserEvent]
    val table = "graft_stream_sessions_" +
      java.lang.Long.toHexString(System.nanoTime())
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-ckpt-").toString
    val q = sessionStream(spark, events, gapSec, lateness = "0 seconds")
      .writeStream.format("memory").queryName(table)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table)
      .select(col("user_id"), col("t_start_us"), col("t_end_us"),
        col("n_events"), round(col("sum_value"), 4).as("sum_value"))
  }

  /** Wire a memory-sink query for tests/demos: mention windows to an
    * in-memory table named `tableName`.
    */
  def startWindowQuery(spark: SparkSession, docs: Dataset[DocEvent],
      tableName: String, cfg: SpanChunker.Config = SpanChunker.Config()) = {
    val counts = windowedMentionCounts(
      mentionStream(spark, chunkStream(spark, docs, cfg)))
    counts.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(OutputMode.Append())
      .start()
  }
}
