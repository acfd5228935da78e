package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** DSIR importance weights: dense cost tables, integer quantization, and
  * target-like docs outranking raw-like docs.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("hashedBits is dense, integer, and floors unseen buckets at the smoothed cost") {
    val slice = Seq("x x x x").toDF("text") // N=4 tokens, one bucket hot
    val bits = Dsir.hashedBits(slice, "text", buckets = 8)
      .as[(Long, Long)].collect().toMap
    assert(bits.keySet == (0L until 8L).toSet)
    // hot bucket: c=4, m=ceil((4+8)/5)=3 -> 2 bits; unseen: m=12 -> 4 bits
    assert(bits.values.count(_ == 2L) == 1)
    assert(bits.values.count(_ == 4L) == 7)
  }

  test("target-like docs get higher weight; ties break by id; n_tokens exact") {
    val target = Seq.fill(5)("alpha beta").toDF("text")
    val docs = Seq(
      (1L, "alpha beta alpha beta"), // pure target tokens
      (2L, "zz yy ww vv"),           // pure raw-only tokens
      (3L, "alpha beta zz yy"),      // half and half
    ).toDF("doc_id", "text")
    val w = Dsir.importanceBits(docs, "doc_id", "text", target, buckets = 64)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(w.values.map(_._2).toSeq.sorted == Seq(4L, 4L, 4L))
    assert(w(1L)._1 > w(3L)._1 && w(3L)._1 > w(2L)._1)
    val top = Dsir.importanceSelect(docs, "doc_id", "text", target, 64, k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 3L))
  }

  test("weight replays as sum of per-bucket cost deltas") {
    val target = Seq("a a b").toDF("text")
    val docs = Seq((10L, "a b c")).toDF("doc_id", "text")
    val tb = Dsir.hashedBits(target, "text", 16).as[(Long, Long)].collect().toMap
    val rb = Dsir.hashedBits(docs, "text", 16).as[(Long, Long)].collect().toMap
    def bucket(t: String): Long =
      Seq(t).toDF("t").select(Dsir.bucketOf(col("t"), 16)).as[Long].head()
    val expected = Seq("a", "b", "c").map(t => rb(bucket(t)) - tb(bucket(t))).sum
    val got = Dsir.importanceBits(docs, "doc_id", "text", target, 16)
      .select("weight_bits").as[Long].head()
    assert(got == expected)
  }
}
