package graft.functions

import graft.SparkTestBase
import graft.ops.Dedup
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

class MinHashExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private def evalDirect(words: Seq[String], k: Int): Seq[Long] = {
    val lit = Literal.create(
      new GenericArrayData(words.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
    MinHashSignature(lit, k).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  test("interpreted eval and codegen path agree") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "wholly different words")).toDF("id", "text")
    val viaDf = docs
      .select($"id", MinHashSignature.minhashSignature(split($"text", " "), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaDf(1L) == evalDirect(Seq("the", "quick", "brown", "fox"), 8))
    assert(viaDf(2L) == evalDirect(Seq("wholly", "different", "words"), 8))
    assert(viaDf(1L) != viaDf(2L))
    assert(viaDf(1L).size == 8)
  }

  test("signature is a true minhash: word order and duplicates don't matter") {
    assert(evalDirect(Seq("a", "b", "c"), 16) == evalDirect(Seq("c", "a", "b", "a"), 16))
    // supersets can only lower lanes
    val s1 = evalDirect(Seq("a", "b"), 16)
    val s2 = evalDirect(Seq("a", "b", "zzz"), 16)
    assert(s1.zip(s2).forall { case (x, y) => y <= x })
  }

  test("native SimHash64 is bit-identical to the HOF simhash") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown wolf"),
      (3L, "completely different content"), (4L, ""),
    ).toDF("id", "text")
    val both = docs.select(
      $"id",
      SimHash64.simhash64(split($"text", " ")).as("native"),
      Dedup.simhash(split($"text", " ")).as("hof"),
    ).collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
  }

  test("fast LSH candidate groups cluster exact duplicates") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "completely different content here"),
    ).toDF("doc_id", "text")
    val cands = Dedup.lshCandidateGroupsFast(docs, "doc_id", "text", numHashes = 8, rowsPerBand = 4)
    assert(cands.where($"min_id" === 1 && $"max_id" >= 2).count() > 0)
  }
}
