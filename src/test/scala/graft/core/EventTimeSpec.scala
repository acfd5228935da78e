package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.ops.Temporal

/** Pins the event-time encoding contract. Round-6 lesson: the testdata's
  * `events.ts` parquet encoding changed (TIMESTAMP(NANOS) → µs NTZ) and
  * five contract queries broke while the 284-green suite never noticed,
  * because no spec read a parquet fixture in either encoding. This spec
  * writes the SAME instants in three physical variants — nanos-as-long,
  * µs TIMESTAMP_NTZ, µs UTC-adjusted — and requires `EventTime` to make
  * them indistinguishable in batch, through the file-stream source, and
  * through batch sessionization. Hard-coding any single encoding again
  * (e.g. an unconditional `div 1000`) fails two of the three variants.
  */
class EventTimeSpec extends SparkTestBase {
  import spark.implicits._

  // µs-aligned instants: two sessions for user 7 (gap > 30 min at +3600 s)
  // and two for user 8 (+7200 s)
  private val baseUs = 1700000000000000L // 2023-11-14T22:13:20Z
  private val rows = Seq(
    (1L, baseUs, 7L, "view", 1.0, "{}"),
    (2L, baseUs + 120L * 1000000L, 7L, "view", 2.0, "{}"),
    (3L, baseUs + 3600L * 1000000L, 7L, "purchase", 3.0, "{}"),
    (4L, baseUs + 30L * 1000000L, 8L, "view", 4.0, "{}"),
    (5L, baseUs + 7200L * 1000000L, 8L, "view", 5.0, "{}"),
  )

  /** Write the fixture with ts in one of the three physical encodings the
    * events table has shipped with (ns-long is the post-`nanosAsLong`
    * read shape of parquet TIMESTAMP(NANOS), which Spark cannot write
    * directly).
    */
  private def writeVariant(kind: String): String = {
    val dir = tmpDir(s"graft_ts_$kind")
    val df = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val ts = kind match {
      case "ns_long" => col("ts_us") * 1000L
      case "us_ntz"  => timestamp_micros(col("ts_us")).cast(TimestampNTZType)
      case "us_utc"  => timestamp_micros(col("ts_us"))
    }
    df.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val variants: Seq[(String, String)] =
    Seq("ns_long", "us_ntz", "us_utc").map(k => k -> writeVariant(k))

  private val expectedUs: Set[(Long, Long)] =
    rows.map { case (id, us, _, _, _, _) => (id, us) }.toSet

  test("batch readTable normalizes all three ts encodings to the same TimestampType instants") {
    for ((kind, dir) <- variants) {
      val df = EventTime.readTable(spark, s"$dir/events.parquet")
      assert(df.schema("ts").dataType == TimestampType, s"variant $kind")
      val got = df.select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().toSet
      assert(got == expectedUs, s"variant $kind")
    }
  }

  test("file-stream streamTable yields the same instants for all three encodings") {
    for ((kind, dir) <- variants) {
      val sink = s"ts_enc_stream_$kind"
      val q = EventTime.streamTable(spark, dir, "events.parquet")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val got = spark.table(sink).as[(Long, Long)].collect().toSet
      assert(got == expectedUs, s"variant $kind")
    }
  }

  test("batch sessionization is encoding-invariant (and accepts raw NTZ input)") {
    def sessions(df: DataFrame): Set[(Long, Long, Long)] =
      Temporal.sessionize(df, "user_id", "ts", gapMs = 30 * 60 * 1000L)
        .select(col("user_id"), col("event_id"), col("session_id"))
        .as[(Long, Long, Long)].collect().toSet

    val expected = Set((7L, 1L, 0L), (7L, 2L, 0L), (7L, 3L, 1L),
      (8L, 4L, 0L), (8L, 5L, 1L))
    for ((kind, dir) <- variants) {
      assert(sessions(EventTime.readTable(spark, s"$dir/events.parquet")) == expected,
        s"variant $kind")
    }
    // the operator itself must also tolerate an unnormalized NTZ column —
    // unix_millis alone rejects TIMESTAMP_NTZ at analysis
    val ntzDir = variants.find(_._1 == "us_ntz").get._2
    val raw = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    assert(sessions(raw) == expected)
  }
}
