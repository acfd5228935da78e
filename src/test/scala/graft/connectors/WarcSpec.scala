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

  test("early-stop cleanup targets the WRAPPING stream: closing it ends the inflate chain") {
    // a consumer that stops early (limit/take) abandons the iterator; the
    // task-completion listener closes whatever parseStream registered via
    // onStream — which must be the wrapper, so Inflater.end() runs and the
    // raw fd closes through the chain (ADVICE r16: closing only the raw
    // stream left native zlib state to GC finalization)
    val bytes = Warc.encodeFile((0 until 3).map(respRecord))
    var rawClosed = false
    val raw = new java.io.ByteArrayInputStream(bytes) {
      override def close(): Unit = { rawClosed = true; super.close() }
    }
    var wrapper: java.io.InputStream = null
    val it = Warc.parseStream(raw, "f.warc.gz", gzipped = true, onStream = wrapper = _)
    assert(it.hasNext)
    it.next() // consume ONE record, then abandon mid-file
    assert(wrapper != null, "parseStream must register the wrapping stream")
    assert(!rawClosed, "mid-file: nothing closed yet")
    wrapper.close()
    assert(rawClosed, "closing the wrapper must chain through the gzip stream to the raw fd")
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

  test("trailing truncation SHORTER than a gzip header still quarantines (JDK swallows it)") {
    // the JDK GZIPInputStream failure mode: readTrailer peeks the next
    // member's header, catches the IOException on a short/garbage tail,
    // and reports clean EOF — the exact hole the hand-parsed framing closes
    val dir = tmpDir("warc_shorttail")
    val whole = Warc.encodeFile((0 until 3).map(respRecord))
    Files.write(Paths.get(dir, "s.warc.gz"), whole ++ Array[Byte](0x1f, 0x42, 7, 9))

    val df = Warc.read(spark, Seq(s"$dir/s.warc.gz")).cache()
    assert(df.filter(col("error").isNull).count() == 3, "complete members are all kept")
    val q = df.filter(col("error").isNotNull).collect()
    assert(q.length == 1, "the 4-byte garbage tail must quarantine, not read clean")
    assert(q.head.getAs[String]("error").contains("not a gzip member"))
    df.unpersist()
  }

  test("a flipped trailer CRC quarantines even though the deflate stream inflates") {
    val dir = tmpDir("warc_crc")
    val m0 = Warc.gzipMember(respRecord(0))
    val m1 = Warc.gzipMember(respRecord(1))
    m1(m1.length - 6) = (m1(m1.length - 6) ^ 0x7f).toByte // inside the 4-byte CRC32
    Files.write(Paths.get(dir, "crc.warc.gz"), m0 ++ m1)

    val df = Warc.read(spark, Seq(s"$dir/crc.warc.gz")).cache()
    assert(df.filter(col("error").isNull).count() == 1)
    val q = df.filter(col("error").isNotNull).collect()
    assert(q.length == 1 && q.head.getAs[String]("error").contains("CRC mismatch"))
    df.unpersist()
  }

  test("members with FNAME/FEXTRA/FCOMMENT header fields parse (CommonCrawl writers vary)") {
    // graft's encoder writes bare headers; other writers set optional
    // fields — synthesize one by patching FLG and splicing the fields in
    val plain = Warc.gzipMember(respRecord(0))
    val withFields = {
      val header = plain.take(10)
      header(3) = (4 | 8 | 16).toByte // FEXTRA | FNAME | FCOMMENT
      val fextra = Array[Byte](3, 0, 'x', 'y', 'z')
      val fname = "seg-00001.warc".getBytes(StandardCharsets.ISO_8859_1) :+ 0.toByte
      val fcomment = "written by test".getBytes(StandardCharsets.ISO_8859_1) :+ 0.toByte
      header ++ fextra ++ fname ++ fcomment ++ plain.drop(10)
    }
    val dir = tmpDir("warc_fields")
    Files.write(Paths.get(dir, "f.warc.gz"), withFields ++ Warc.gzipMember(respRecord(1)))

    val df = Warc.read(spark, Seq(s"$dir/f.warc.gz"))
    assert(df.filter(col("error").isNotNull).count() == 0)
    assert(df.select("url").as[String].collect().toSet ==
      Set("http://site0.example.com/p/0", "http://site1.example.com/p/1"))
  }

  test("early-stopping consumers (limit) return correct rows without draining the file") {
    val dir = tmpDir("warc_limit")
    Files.write(Paths.get(dir, "l.warc.gz"), Warc.encodeFile((0 until 50).map(respRecord)))
    // the task-completion listener closes the abandoned stream; the rows
    // that ARE consumed must be correct
    val first = Warc.read(spark, Seq(s"$dir/l.warc.gz"))
      .select("url").limit(3).as[String].collect()
    assert(first.toSeq == (0 until 3).map(i => s"http://site$i.example.com/p/$i"))
  }
}
