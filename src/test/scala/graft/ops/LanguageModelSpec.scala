package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Quantized bigram LM: hand-computed bit costs, smoothing fallbacks for
  * unseen bigrams/contexts, zero-bigram vacuous keeps, and the integer
  * filter arithmetic.
  */
class LanguageModelSpec extends SparkTestBase {
  import spark.implicits._

  // reference corpus: "a b" x3 and "a c" — vocab {a, b, c} (V=3),
  // c1(a)=4, c12(a,b)=3, c12(a,c)=1
  private lazy val lm = LanguageModel.trainBigramLm(
    Seq("a b", "a b", "a b", "a c").toDF("text"), "text")

  test("vocab and counts") {
    assert(lm.vocab == 3L)
    val big = lm.bigrams.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(big == Set(("a", "b", 3L, 4L), ("a", "c", 1L, 4L)))
  }

  test("hand-computed quantized bits") {
    // (a,b): a=4, b=4+3=7, m=ceil(7/4)=2, q=1  (p=4/7, -log2≈0.81 → 1)
    // (a,c): a=2, b=7, m=4, q=2                (p=2/7, -log2≈1.81 → 2)
    // (a,z) unseen bigram, seen context: a=1, b=7, m=7, q=3
    // (z,a) unseen context: a=1, b=0+3=3, m=3, q=2
    val docs = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "a z"), (4L, "z a"),
      (5L, "a b a c"), // bits 1+3+2: (a,b)=1, (b,a) unseen ctx b: c1(b)=3,b=6,m=6,q=3, (a,c)=2
      (6L, "solo"),    // zero bigrams
    ).toDF("doc_id", "text")
    val got = LanguageModel.perplexityBits(docs, "doc_id", "text", lm)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) == ((1L, 1L)))
    assert(got(2L) == ((2L, 1L)))
    assert(got(3L) == ((3L, 1L)))
    assert(got(4L) == ((2L, 1L)))
    assert(got(5L) == ((6L, 3L)))
    assert(got(6L) == ((0L, 0L)))
  }

  test("perplexityFilter keeps by integer bits-per-token bound; zero-bigram docs kept") {
    val docs = Seq(
      (1L, "a b"),   // 1 bit / 1 bigram -> kept at 2
      (3L, "a z"),   // 3 bits / 1 -> dropped at 2
      (6L, "solo"),  // vacuous keep
    ).toDF("doc_id", "text")
    val kept = LanguageModel.perplexityFilter(docs, "doc_id", "text", lm, bitsNum = 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L))
    // rational bound: 5/2 bits per bigram still drops the 3-bit doc
    val keptR = LanguageModel.perplexityFilter(docs, "doc_id", "text", lm,
      bitsNum = 5L, bitsDen = 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(keptR == Set(1L, 6L))
  }

  test("gated off broadcast returns identical scores") {
    val docs = Seq((1L, "a b a c"), (2L, "z z z")).toDF("doc_id", "text")
    val a = LanguageModel.perplexityBits(docs, "doc_id", "text", lm)
      .collect().map(_.toString).sorted.toSeq
    val b = LanguageModel.perplexityBits(docs, "doc_id", "text", lm, broadcastRowCap = 0L)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
