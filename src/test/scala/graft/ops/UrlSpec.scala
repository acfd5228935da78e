package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlSpec extends SparkTestBase {
  import spark.implicits._

  test("canonicalize: scheme/www/host-case/fragment/trailing-slash/tracking/param-order all collapse") {
    val urls = Seq(
      "http://site3.example.com/p/3?a=1&b=2",
      "HTTPS://WWW.SITE3.EXAMPLE.COM/p/3?a=1&b=2",
      "https://site3.example.com/p/3/?b=2&a=1",
      "http://site3.example.com/p/3?a=1&utm_source=f&b=2&fbclid=X",
      "https://site3.example.com/p/3?a=1&b=2#frag",
    ).toDF("u")
    val canon = urls.select(Url.canonicalize(col("u")).as("c")).as[String].collect().toSet
    assert(canon == Set("site3.example.com/p/3?a=1&b=2"))
  }

  test("canonicalize edge shapes: bare host, query without path, path case preserved") {
    val cases = Seq(
      "https://Host.COM" -> "host.com",
      "http://host.com?b=2&a=1" -> "host.com?a=1&b=2",
      "host.com/A/B" -> "host.com/A/B", // schemeless input; path case is significant, kept
      "https://host.com/only/?utm_source=x" -> "host.com/only",
      "https://www.host.com#top" -> "host.com",
    )
    val got = cases.map(_._1).toDF("u")
      .select(Url.canonicalize(col("u")).as("c")).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("dedupByUrl keeps the min-id row per canonical group and counts the group") {
    val df = Seq(
      (10L, "http://a.com/x?p=1"),
      (11L, "https://WWW.A.com/x/?p=1#f"),
      (12L, "https://a.com/x?p=1&utm_source=s"),
      (20L, "https://b.com/y"),
    ).toDF("doc_id", "url")
    val out = Url.dedupByUrl(df, "doc_id", "url")
      .select("doc_id", "url_canon", "n_dups", "kept")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set(
      (10L, "a.com/x?p=1", 3L, 1L),
      (11L, "a.com/x?p=1", 3L, 0L),
      (12L, "a.com/x?p=1", 3L, 0L),
      (20L, "b.com/y", 1L, 1L)))
  }
}
