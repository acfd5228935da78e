package graft.connectors.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.core.StateStore
import org.apache.spark.sql.functions._

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def respRecord(i: Int): Array[Byte] =
    Warc.encodeRecord("response", s"http://site$i.example.com/p/$i",
      "2026-01-01T00:00:00Z", "application/http; msgtype=response",
      Warc.httpResponse(s"<html><body><p>doc $i</p></body></html>".getBytes(StandardCharsets.UTF_8)))

  private def infoRecord: Array[Byte] =
    Warc.encodeRecord("warcinfo", null, "2026-01-01T00:00:00Z",
      "application/warc-fields", "software: graft-test\r\n".getBytes(StandardCharsets.UTF_8))

  test("multi-member gzip and raw containers round-trip; one input partition per file") {
    val dir = tmpDir("warc_rt")
    Files.write(Paths.get(dir, "a.warc.gz"),
      Warc.encodeFile(infoRecord +: (0 until 3).map(respRecord)))
    Files.write(Paths.get(dir, "b.warc.gz"),
      Warc.encodeFile((3 until 5).map(respRecord)))
    Files.write(Paths.get(dir, "c.warc"),
      Warc.encodeFile((5 until 7).map(respRecord), gzipPerRecord = false))

    val df = Warc.read(spark, Seq(s"$dir/a.warc.gz", s"$dir/b.warc.gz", s"$dir/c.warc"))
    assert(df.rdd.getNumPartitions == 3, "one partition per file — gzip is unsplittable")
    assert(df.filter(col("error").isNotNull).count() == 0)
    assert(df.filter(col("warc_type") === "warcinfo").count() == 1)
    val resp = df.filter(col("warc_type") === "response")
    assert(resp.count() == 7)
    // payload bytes survive the round-trip: the HTTP body parses back out
    val bodies = resp.select(col("url"), Warc.httpBody(col("payload")).as("body"))
      .as[(String, String)].collect().toMap
    (0 until 7).foreach { i =>
      assert(bodies(s"http://site$i.example.com/p/$i") ==
        s"<html><body><p>doc $i</p></body></html>")
    }
    // rec_index is per-file framing order
    assert(df.filter(col("warc_file").endsWith("a.warc.gz"))
      .select("rec_index").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("a truncated final member quarantines the remainder and keeps every prior record") {
    val dir = tmpDir("warc_trunc")
    val whole = Warc.encodeFile((0 until 4).map(respRecord))
    val lastMember = Warc.gzipMember(respRecord(3))
    // cut the last member short mid-deflate: prior members intact
    val truncated = whole.dropRight(lastMember.length / 2)
    Files.write(Paths.get(dir, "t.warc.gz"), truncated)

    val df = Warc.read(spark, Seq(s"$dir/t.warc.gz")).cache()
    val good = df.filter(col("error").isNull)
    assert(good.count() == 3, "records before the truncated member must be kept")
    assert(good.select("url").as[String].collect().toSet ==
      (0 until 3).map(i => s"http://site$i.example.com/p/$i").toSet)
    val q = df.filter(col("error").isNotNull).collect()
    assert(q.length == 1, "exactly one quarantine row per faulted file")
    assert(q.head.getAs[String]("error") != null)
    df.unpersist()
  }

  test("a corrupt member mid-file quarantines from the fault on, never resyncing into garbage") {
    val dir = tmpDir("warc_corrupt")
    val m0 = Warc.gzipMember(respRecord(0))
    val bad = Warc.gzipMember(respRecord(1))
    // flip bytes in the deflate body (past the 10-byte gzip header)
    (12 until math.min(40, bad.length)).foreach(i => bad(i) = (bad(i) ^ 0x5a).toByte)
    val m2 = Warc.gzipMember(respRecord(2))
    Files.write(Paths.get(dir, "c.warc.gz"), m0 ++ bad ++ m2)

    val df = Warc.read(spark, Seq(s"$dir/c.warc.gz")).cache()
    assert(df.filter(col("error").isNull).select("url").as[String].collect().toSeq ==
      Seq("http://site0.example.com/p/0"))
    assert(df.filter(col("error").isNotNull).count() == 1)
    df.unpersist()
  }

  test("readNew reads only files outside the committed seen set") {
    val dir = tmpDir("warc_incr")
    val state = new StateStore(Paths.get(dir, "s.json"))
    Files.write(Paths.get(dir, "w1.warc.gz"), Warc.encodeFile((0 until 2).map(respRecord)))

    val (df1, all1) = Warc.readNew(spark, "crawl", dir, state)
    assert(df1.get.count() == 2)
    FilesystemSource.commitSeen(state, "crawl", all1)

    // nothing new: no frame, no re-read
    val (dfNone, _) = Warc.readNew(spark, "crawl", dir, state)
    assert(dfNone.isEmpty)

    Files.write(Paths.get(dir, "w2.warc.gz"), Warc.encodeFile((2 until 5).map(respRecord)))
    val (df2, all2) = Warc.readNew(spark, "crawl", dir, state)
    assert(df2.get.count() == 3, "only the NEW file's records")
    assert(df2.get.select("warc_file").distinct().as[String].collect().toSeq ==
      Seq(s"file:$dir/w2.warc.gz") ||
      df2.get.select("warc_file").distinct().as[String].collect().head.endsWith("w2.warc.gz"))
    FilesystemSource.commitSeen(state, "crawl", all2)
    assert(Warc.readNew(spark, "crawl", dir, state)._1.isEmpty)
  }

  test("httpBody strips the header block; WET-style bare text passes through whole") {
    val rows = Seq(
      Warc.httpResponse("body text".getBytes(StandardCharsets.UTF_8)),
      "bare conversion text".getBytes(StandardCharsets.UTF_8),
    ).toDF("payload")
    assert(rows.select(Warc.httpBody(col("payload"))).as[String].collect().toSeq ==
      Seq("body text", "bare conversion text"))
  }
}
