package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming upgrade path (SURVEY §1.3 end: the reference is
  * bounded micro-batch everywhere — Kafka reads stop at the current
  * watermark, sources/kafka/__init__.py:2-5 — so batch parity is the
  * baseline and these are the continuous equivalents).
  *
  *  - `windowedCounts`: watermarked tumbling-window aggregation, the
  *    streaming analog of the GA/Matomo report recompute (§2.6);
  *  - `sessionize`: event-time sessions via flatMapGroupsWithState — the
  *    true continuous form of matomo's session-close filter
  *    (sources/matomo/helpers/data_processing.py:46-75: a visit closes
  *    after 30 min of inactivity).
  *
  * Both consume any streaming DataFrame with (ts TIMESTAMP, user_id LONG,
  * event_type STRING, value DOUBLE) — e.g. `spark.readStream.parquet` over
  * a landed events table, keeping one code path for batch and stream.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** Watermarked tumbling-window counts per event type. Late events beyond
    * the watermark are dropped (state is bounded — the property that keeps
    * this runnable forever at scale).
    */
  def windowedCounts(events: DataFrame, window: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long, totalValue: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
      n_events: Long, total_value: Double)

  /** Event-time sessionization: a session closes after `gapMs` of
    * inactivity; closed sessions are emitted, open ones ride in state.
    * State size = one small struct per active user — bounded by the
    * timeout, not by history.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastSeen), s.nEvents, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1, totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastSeen), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Continuous exact dedup: keep the FIRST arrival per key and drop every
    * later duplicate, with state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark` — duplicates are only meaningful
    * within the replay window of the upstream queue, so state ages out
    * instead of growing with history; the unbounded-state variant would
    * OOM a year-old stream). This is the streaming face of
    * `Dedup.exactDedup` and the msg-id dedup the queue reader does per
    * batch — one semantic, three execution shapes.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String], watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream interval join: right-side events attach to
    * left-side events with the same key when the right timestamp falls in
    * [left ts, left ts + within] — the enrich/attribution shape (purchase
    * within an hour of a view). Both sides carry watermarks, and the time
    * bound lets the engine evict join state once the watermark passes
    * leftTs + within — state stays proportional to the window, not the
    * stream history, which is what keeps this runnable forever at scale.
    * Column names must be disjoint (the usual stream self-join setup:
    * rename before joining).
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))
  }

  /** Bounded "AvailableNow-style" run into a memory sink: process
    * everything currently in the source, then stop — the reference's
    * batch-pull semantics expressed on the streaming engine.
    */
  def runAvailableNow(df: DataFrame, queryName: String, outputMode: String = "append"): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
