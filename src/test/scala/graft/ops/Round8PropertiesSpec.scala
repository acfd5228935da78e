package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkTestBase

/** Property tests for the round-8 operators against brute-force models:
  * exact quantiles vs a sorted-array rank lookup, span removal
  * invariants vs a direct string model, HLL registers vs a per-token
  * recomputation, DSIR weights vs a naive per-token sum.
  */
class Round8PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(12)

  test("exactQuantiles == brute-force rank lookup on random multisets") {
    val gen = for {
      vals <- Gen.nonEmptyListOf(Gen.choose(-50L, 50L))
      pcts <- Gen.nonEmptyListOf(Gen.choose(0, 100)).map(_.distinct)
    } yield (vals, pcts)
    val prop = forAll(gen) { case (vals, pcts) =>
      val got = Corpus.exactQuantiles(vals.toDF("v"), "v", pcts, buckets = 4)
        .as[(Long, Long)].collect().toMap
      val sorted = vals.sorted
      val expected = pcts.map { p =>
        val rank = (p.toLong * vals.size + 99L) / 100L
        // smallest value whose cumulative count reaches rank (rank 0 -> min)
        p.toLong -> sorted(math.max(rank - 1, 0L).toInt)
      }.toMap
      got == expected
    }
    val r = org.scalacheck.Test.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("removeDuplicateSpans: kept text is an in-order subsequence; clean corpora untouched") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val gen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, docGen))
    val prop = forAll(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
        .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
      docs.forall { case (id, text) =>
        val (_, kept, nWords, nKept) = got(id)
        val orig = text.split(" ").toSeq
        val keptWords = if (kept.isEmpty) Seq.empty else kept.split(" ").toSeq
        // counts consistent and kept is a subsequence of the original
        nWords == orig.size && nKept == keptWords.size && nKept <= nWords &&
          isSubsequence(keptWords, orig)
      }
    }
    val r = org.scalacheck.Test.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  private def isSubsequence(sub: Seq[String], seq: Seq[String]): Boolean = {
    var i = 0
    seq.foreach { w => if (i < sub.size && sub(i) == w) i += 1 }
    i == sub.size
  }

  test("corpus with no duplicated k-gram passes through whole") {
    // all-distinct words => every k-gram unique
    val docs = Seq((1L, (0 until 20).map(i => s"w$i").mkString(" ")),
      (2L, (20 until 45).map(i => s"w$i").mkString(" ")))
    val got = Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 4)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got == docs.toMap)
  }

  test("hllRegisters == per-token reference model on random corpora") {
    val word = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    val gen = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word))
    val prop = forAll(gen) { words =>
      val p = 5
      val got = Corpus.hllRegisters(Seq(words.mkString(" ")).toDF("text"), "text", p)
        .as[(Long, Long)].collect().toMap
      val model = Array.fill(1 << p)(0L)
      words.foreach { w =>
        val h = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(w).take(15), 16)
        val reg = (h % (1 << p)).toInt
        val v = h >> p
        val rho = if (v == 0) (60 - p + 1).toLong else java.lang.Long.numberOfTrailingZeros(v) + 1L
        model(reg) = math.max(model(reg), rho)
      }
      (0 until (1 << p)).forall(r => got(r.toLong) == model(r))
    }
    val r = org.scalacheck.Test.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("DSIR weight == naive per-token cost-delta sum") {
    val word = Gen.oneOf("x", "y", "z", "w", "v", "u")
    val docGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val gen = for {
      target <- Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, docGen))
      pool <- Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, docGen))
    } yield (target, pool)
    val prop = forAll(gen) { case (target, pool) =>
      val b = 16
      val poolDf = pool.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dsir.importanceBits(poolDf, "doc_id", "text", target.toDF("text"), b)
        .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
      val tb = Dsir.hashedBits(target.toDF("text"), "text", b).as[(Long, Long)].collect().toMap
      val rb = Dsir.hashedBits(poolDf, "text", b).as[(Long, Long)].collect().toMap
      def bucket(tok: String): Long = {
        val h = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(tok).take(15), 16)
        h % b
      }
      pool.zipWithIndex.forall { case (text, i) =>
        val toks = text.split(" ").toSeq
        val w = toks.map(t => rb(bucket(t)) - tb(bucket(t))).sum
        got(i.toLong) == ((w, toks.size.toLong))
      }
    }
    val r = org.scalacheck.Test.check(params, prop)
    assert(r.passed, r.status.toString)
  }
}
