package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("sessionize splits on the inactivity gap per key, 0-based ids") {
    val df = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(5)),   // session 0
      (3L, 10L, ts(60)),                    // gap 55 min → session 1
      (4L, 20L, ts(0)),                     // other user: own session 0
    ).toDF("event_id", "user_id", "ts")
    val got = Temporal.sessionize(df, "user_id", "ts", gapMs = 30 * 60000L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("asofJoin picks the latest right row at-or-before each left ts, null when none") {
    val left = Seq(
      (1L, 10L, ts(5)),   // after r@0 → v=100
      (2L, 10L, ts(10)),  // equal ts is INCLUSIVE → v=200
      (3L, 10L, ts(3000)),// far later → still v=200
      (4L, 20L, ts(1)),   // user 20 has no orders → null
      (5L, 30L, ts(0)),   // r@5 is AFTER → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(0), 100L), (10L, ts(10), 200L),
      (30L, ts(5), 900L),
    ).toDF("user_id", "rts", "v")
    val got = Temporal.asofJoin(left, right, "user_id", "ts", "rts", Seq("v"))
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> Some(200L), 4L -> None, 5L -> None))
  }

  test("asofJoin plan is one keyed shuffle, not a nested-loop join") {
    val left = (1L to 50L).map(i => (i, i % 5, ts(i.toInt))).toDF("event_id", "user_id", "ts")
    val right = (1L to 10L).map(i => (i % 5, ts(i.toInt), i)).toDF("user_id", "rts", "v")
    val df = Temporal.asofJoin(left, right, "user_id", "ts", "rts", Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("asofJoin refuses inputs that collide with its reserved internal names") {
    val left = Seq((1L, 10L, ts(0), "x")).toDF("event_id", "user_id", "ts", "__match")
    val right = Seq((10L, ts(0), 100L)).toDF("user_id", "rts", "v")
    val e = intercept[IllegalArgumentException](
      Temporal.asofJoin(left, right, "user_id", "ts", "rts", Seq("v")))
    assert(e.getMessage.contains("__match"))
    val right2 = Seq((10L, ts(0), 100L)).toDF("user_id", "rts", "__ts")
    val e2 = intercept[IllegalArgumentException](
      Temporal.asofJoin(left.drop("__match"), right2, "user_id", "ts", "rts", Seq("__ts")))
    assert(e2.getMessage.contains("__ts"))
  }

  test("latestPerKeyTs deduplicates ties deterministically by the tie column") {
    val df = Seq((10L, ts(0), 1L, "a"), (10L, ts(0), 3L, "c"), (10L, ts(1), 2L, "b"))
      .toDF("k", "t", "seq", "payload")
    val got = Temporal.latestPerKeyTs(df, "k", "t", "seq")
      .select("seq", "payload").as[(Long, String)].collect().toSet
    assert(got == Set((3L, "c"), (2L, "b")))
  }
}
