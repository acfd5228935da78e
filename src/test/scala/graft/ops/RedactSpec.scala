package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RedactSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String) = {
    val out = Redact.scrub(Seq((1L, text)).toDF("id", "text"), "id", "text").head()
    (out.getString(1), out.getLong(2), out.getLong(3), out.getLong(4), out.getLong(5))
  }

  test("each default pattern redacts its PII form and counts it once") {
    assert(one("mail me at bob.smith+x@corp.example.org today") ==
      ("mail me at <EMAIL> today", 1L, 0L, 0L, 0L))
    assert(one("card 4111 1111 1111 1111 on file") ==
      ("card <CARD> on file", 0L, 1L, 0L, 0L))
    assert(one("id 123-45-6789 please") == ("id <SSN> please", 0L, 0L, 1L, 0L))
    assert(one("from 192.168.0.1 and 10.0.0.7") ==
      ("from <IP> and <IP>", 0L, 0L, 0L, 2L))
  }

  test("ordering: a redacted card never re-counts as an IP or SSN") {
    // the dotted quad inside the card digits is consumed by the card
    // pass; nothing is left for the ip pass
    val (t, e, c, s, i) = one("pay 4111-1111-1111-1111 from 10.0.0.1")
    assert(t == "pay <CARD> from <IP>" && e == 0L && c == 1L && s == 0L && i == 1L)
    // 123-45-6789 is NOT a card (wrong group shape) but IS an SSN
    val (t2, _, c2, s2, _) = one("123-45-6789")
    assert(t2 == "<SSN>" && c2 == 0L && s2 == 1L)
  }

  test("clean text passes through byte-identical with zero counts") {
    val txt = "plain words only, no identifiers at all"
    assert(one(txt) == (txt, 0L, 0L, 0L, 0L))
  }

  test("scrub is a narrow scan-stage projection: no shuffle in the plan") {
    val df = (1L to 100L).map(i => (i, s"row $i")).toDF("id", "text")
    val plan = Redact.scrub(df, "id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrub must not shuffle:\n$plan")
  }

  test("scrubAndFilter drops PII-dense docs and keeps redacted survivors") {
    val df = Seq(
      (1L, "a@b.co c@d.co e@f.co g@h.co"),   // 4 hits
      (2L, "one a@b.co only"),
      (3L, "no pii here")).toDF("id", "text")
    val kept = Redact.scrubAndFilter(df, "id", "text", maxPerDoc = 2L)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("custom pattern lists restrict the scrub and the output columns") {
    val out = Redact.scrub(Seq((1L, "x@y.zz at 1.2.3.4")).toDF("id", "text"),
      "id", "text", patterns = Redact.defaultPatterns.filter(_.name == "ip"))
    assert(out.columns.toSeq == Seq("id", "text", "n_ip"))
    assert(out.head().getString(1) == "x@y.zz at <IP>")
  }
}
