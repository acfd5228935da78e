package graft.core

import graft.SparkTestBase
import graft.connectors.rest.{RestEngine, StaticPagesTransport}
import org.apache.spark.sql.functions._

/** Boundary-condition hardening: empty batches, unicode state, type-cast
  * cursors, pagination caps — the inputs that show up in production long
  * before the happy path fails.
  */
class HardeningSpec extends SparkTestBase {
  import spark.implicits._

  test("merge with an empty update batch leaves the base untouched") {
    val base = Seq((1L, 1L, "a")).toDF("id", "v", "s")
    val empty = base.limit(0)
    val hints = TableHints("t", Disposition.Merge, primaryKey = Seq("id"), dedupSort = Some(("v", true)))
    val out = MergeEngine.mergePlan(Some(base), empty, hints)
    assert(out.collect().map(_.getString(2)).toSeq == Seq("a"))
  }

  test("dedupeBatch without keys is the identity") {
    val df = Seq((1L, "a"), (1L, "b")).toDF("id", "s")
    assert(MergeEngine.dedupeBatch(df, Nil, None).count() == 2)
  }

  test("state store round-trips unicode, newlines and control characters") {
    val dir = java.nio.file.Files.createTempDirectory("state-uni").toString
    val s = StateStore(dir, "p")
    val weird = "cursor \n \t \"quoted\" 🦆  väl"
    s.put("k", weird)
    s.putMap("m", Map("ключ" -> "значение", "emo🦆ji" -> "v"))
    s.commit()
    val back = StateStore(dir, "p")
    assert(back.getString("k").contains(weird))
    assert(back.getMap("m")("ключ") == "значение")
  }

  test("incremental cursor casts string state against timestamp columns") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-20 12:30:00")),
    ).toDF("id", "ts")
    val inc = Incremental(Seq("ts"))
    val out = inc.filterWith(df, Some("2024-01-10 00:00:00"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(2L))
    // the committed cursor string round-trips through filter again
    val cur = inc.nextCursor(out).get
    assert(inc.filterWith(df, Some(cur)).count() == 0)
  }

  test("pagination maxPages caps a paginator that never terminates") {
    // every page returns a full page with a cursor → only maxPages requests
    val pages = (0 to 10).map { i =>
      val key = if (i == 0) "loop?limit=1" else s"loop?cursor=c$i&limit=1"
      key -> s"""{"data":[{"n":$i}],"next":"c${i + 1}"}"""
    }.toMap
    val ep = RestEngine.EndpointConfig("loop", dataSelector = "data",
      paginator = RestEngine.Paginator.Cursor("next", "cursor", pageSize = 1),
      maxPages = 3)
    val items = RestEngine.fetchPages(
      RestEngine.ClientConfig("https://x.test"), ep, StaticPagesTransport(pages))
    assert(items.size == 3)
  }

  test("normalizer handles a frame that is entirely arrays and structs") {
    val df = Seq((Seq(1L, 2L), ("x", Seq("a", "b")))).toDF("nums", "inner")
      .withColumn("inner", expr("named_struct('tag', inner._1, 'items', inner._2)"))
    val tables = Normalize.normalize(df, TableHints("t"))
    assert(tables.keySet == Set("t", "t__nums", "t__inner__items"))
    assert(tables("t__nums").count() == 2)
    assert(tables("t__inner__items").count() == 2)
    assert(tables("t").columns.toSet == Set("inner__tag", Normalize.DltId))
  }
}
