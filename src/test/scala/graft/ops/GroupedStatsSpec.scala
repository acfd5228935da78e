package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Grouped quantiles and grouped HLL equal their per-group ungrouped
  * counterparts; grouped registers keep the merge identity.
  */
class GroupedStatsSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    ("en", 10L), ("en", 20L), ("en", 30L), ("en", 40L),
    ("de", 5L), ("de", 500L), ("de", 5L),
  ).toDF("lang", "v")

  test("exactQuantilesBy == exactQuantiles per group") {
    val got = Corpus.exactQuantilesBy(df, "lang", "v", Seq(0, 50, 100))
      .as[(String, Long, Long)].collect().toSet
    val expected = Seq("en", "de").flatMap { g =>
      Corpus.exactQuantiles(df.filter(col("lang") === g), "v", Seq(0, 50, 100))
        .as[(Long, Long)].collect().map { case (p, v) => (g, p, v) }
    }.toSet
    assert(got == expected)
    assert(got.contains(("de", 50L, 5L)) && got.contains(("en", 50L, 20L)))
  }

  private val docs = Seq(
    ("en", "alpha beta gamma delta"), ("en", "alpha epsilon"),
    ("de", "zeta eta theta"), ("de", "zeta zeta iota"),
  ).toDF("lang", "text")

  test("hllRegistersBy == hllRegisters per group, dense per group") {
    val got = Corpus.hllRegistersBy(docs, "lang", "text", p = 5)
      .as[(String, Long, Long)].collect().toSet
    val expected = Seq("en", "de").flatMap { g =>
      Corpus.hllRegisters(docs.filter(col("lang") === g), "text", p = 5)
        .as[(Long, Long)].collect().map { case (r, mr) => (g, r, mr) }
    }.toSet
    assert(got == expected)
    assert(got.size == 2 * 32)
  }

  test("keyed register tables merge with the same register-max identity") {
    val half1 = docs.filter(col("text").contains("alpha") || col("text").contains("zeta eta"))
    val half2 = docs.exceptAll(half1)
    val merged = Corpus.hllRegistersBy(half1, "lang", "text", 5)
      .unionByName(Corpus.hllRegistersBy(half2, "lang", "text", 5))
      .groupBy("lang", "register").agg(max("max_rho").as("max_rho"))
      .collect().map(_.toString).sorted.toSeq
    val direct = Corpus.hllRegistersBy(docs, "lang", "text", 5)
      .collect().map(_.toString).sorted.toSeq
    assert(merged == direct)
  }
}
