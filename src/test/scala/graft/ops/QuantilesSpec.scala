package graft.ops

import graft.SparkTestBase

/** Exact distributed quantiles: integer rank semantics, multiplicity,
  * bucketing invariance.
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  test("rank = ceil(pct*n/100): uniform 1..10") {
    val df = (1L to 10L).toDF("v")
    val q = Corpus.exactQuantiles(df, "v", Seq(10, 50, 99, 100))
      .as[(Long, Long)].collect().toMap
    assert(q == Map(10L -> 1L, 50L -> 5L, 99L -> 10L, 100L -> 10L))
  }

  test("multiplicity respected: heavy low value dominates the median") {
    val df = (Seq.fill(9)(1L) ++ Seq(100L)).toDF("v")
    val q = Corpus.exactQuantiles(df, "v", Seq(50, 90, 99))
      .as[(Long, Long)].collect().toMap
    assert(q == Map(50L -> 1L, 90L -> 1L, 99L -> 100L))
  }

  test("bucket count does not change results") {
    val df = ((1L to 1000L) ++ (1L to 100L)).toDF("v")
    val a = Corpus.exactQuantiles(df, "v", Seq(1, 25, 50, 75, 99), buckets = 2)
      .collect().map(_.toString).sorted.toSeq
    val b = Corpus.exactQuantiles(df, "v", Seq(1, 25, 50, 75, 99), buckets = 64)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
