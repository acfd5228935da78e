package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** HTML extraction: block stripping, entity decode order, whitespace
  * collapse, link density.
  */
class HtmlSpec extends SparkTestBase {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(Html.stripTags(col("h"))).as[String].head()

  test("tags and script/style/comment CONTENT removed; text preserved") {
    assert(strip("<html><head><style>p { color: red }</style>" +
      "<script type='x'>var a = '<p>not text</p>';</script></head>" +
      "<body><p>Hello <b>world</b></p><!-- note --></body></html>") == "Hello world")
  }

  test("entities decode with amp last so double-encoding round-trips") {
    assert(strip("a &lt;tag&gt; &amp;&nbsp;b &quot;q&quot; &#39;s&#39;") ==
      "a <tag> & b \"q\" 's'")
    assert(strip("&amp;lt;") == "&lt;") // double-encoded stays encoded once
  }

  test("whitespace collapses across stripped structure") {
    assert(strip("<div>\n  one\n</div>\n<div>two</div>") == "one two")
  }

  test("link density separates nav boilerplate from body text") {
    val nav = "<ul><li><a href='/'>Home</a></li><li><a href='/x'>About us</a></li></ul>"
    val body = "<p>A long paragraph of body text with many words in it.</p>" +
      "<p>Another paragraph, also with <a href='/r'>one link</a> only.</p>"
    val dens = Seq((1L, nav), (2L, body)).toDF("id", "h")
      .select(col("id"), Html.linkDensity(col("h")).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(dens(1L) > 0.8 && dens(2L) < 0.2)
  }

  test("anchors inside script/comment blocks never count as anchor text") {
    val h = "<script>var x = '<a>aaaaaaaaaa</a>';</script><!-- <a>bbb</a> -->hi there"
    val d = Seq(h).toDF("h").select(Html.linkDensity(col("h"))).as[Double].head()
    assert(d == 0.0)
  }

  test("extract emits text, length and density per row") {
    val got = Html.extract(
      Seq((7L, "<p>Some text</p>")).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, String, Long, Double)].head()
    assert(got == ((7L, "Some text", 9L, 0.0)))
  }
}
