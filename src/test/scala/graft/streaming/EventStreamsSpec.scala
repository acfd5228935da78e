package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class EventStreamsSpec extends SparkTestBase {
  import EventStreams._
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("windowed counts aggregate per tumbling window and event type") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 2, "click", 2.0),
      Event(3, ts(7), 1, "view", 5.0),
    )
    val agg = windowedCounts(input.toDF(), window = "5 minutes", watermark = "10 minutes")
    runAvailableNow(agg, "win_counts", outputMode = "complete")
    val out = spark.table("win_counts")
      .select("event_type", "n", "total_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("streamingDedup keeps the first arrival per key within the watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 9.9), // duplicate event_id — dropped
      Event(2, ts(2), 2, "view", 2.0),
    )
    val deduped = streamingDedup(input.toDF(), Seq("event_id"), watermark = "10 minutes")
    runAvailableNow(deduped, "dedup_out")
    val out = spark.table("dedup_out").select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 1.0, 2L -> 2.0))
  }

  test("intervalJoin attaches right events inside [leftTs, leftTs+within] per key") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    views.addData(
      Event(10, ts(0), 1, "view", 0.0),
      Event(11, ts(50), 1, "view", 0.0),
      Event(12, ts(0), 2, "view", 0.0),
    )
    buys.addData(
      Event(20, ts(30), 1, "purchase", 5.0),  // within 1h of view 10, not view 11 (before it)
      Event(21, ts(70), 1, "purchase", 7.0),  // within 1h of both 10 (70m > 60m? no — outside) and 11 (20m — inside)
      Event(22, ts(200), 2, "purchase", 9.0), // outside any window
    )
    val l = views.toDF().select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val r = buys.toDF().select($"user_id".as("p_user"), $"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
    val joined = intervalJoin(l, r, "user_id", "p_user", "view_ts", "purchase_ts",
      watermark = "10 hours", within = "1 hour")
      .select("view_id", "purchase_id")
    runAvailableNow(joined, "ij_out")
    val out = spark.table("ij_out").collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(out == Set((10L, 20L), (11L, 21L)))
  }

  test("sessionize closes a session after the inactivity gap") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    // user 1: two events 5 min apart (one session), then 60 min silence,
    // then another event → first session closes in-batch
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(65), 1, "view", 4.0),
      Event(4, ts(2), 2, "click", 8.0),
    )
    val sessions = sessionize(input.toDS(), gapMs = 30 * 60 * 1000L)
    runAvailableNow(sessions.toDF(), "sessions_out")
    val out = spark.table("sessions_out")
      .select("user_id", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // only user 1's first session has closed (user 2 and the second
    // session are still open in state)
    assert(out == Set((1L, 2L, 3.0)))
  }
}
