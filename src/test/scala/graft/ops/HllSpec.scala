package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** HLL register table: hand-checked register/rho derivation, density,
  * stream-vs-distinct invariance, and estimate accuracy near 1.04/sqrt(m).
  */
class HllSpec extends SparkTestBase {
  import spark.implicits._

  test("register table is dense, integer, and matches a hand-derived row") {
    val corpus = Seq("solo").toDF("text")
    val regs = Corpus.hllRegisters(corpus, "text", p = 4)
      .as[(Long, Long)].collect().toMap
    assert(regs.size == 16 && regs.keySet == (0L until 16L).toSet)
    // one token: exactly one register nonzero, at md5-derived position
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("solo").take(15), 16)
    val v = h >> 4
    val rho = if (v == 0) 57L else java.lang.Long.numberOfTrailingZeros(v) + 1L
    assert(regs(h % 16) == rho)
    assert(regs.values.count(_ != 0L) == 1)
  }

  test("registers depend on the distinct token set, not multiplicity") {
    val once = Seq("a b c d e").toDF("text")
    val thrice = Seq("a b c d e", "e d c b a", "a a b b c c d d e e").toDF("text")
    val r1 = Corpus.hllRegisters(once, "text", 6).collect().map(_.toString).sorted.toSeq
    val r2 = Corpus.hllRegisters(thrice, "text", 6).collect().map(_.toString).sorted.toSeq
    assert(r1 == r2)
  }

  test("estimate within 5 standard errors on 5000 distinct tokens") {
    val docs = (0 until 500).map(i =>
      (0 until 10).map(j => s"tok_${i * 10 + j}").mkString(" ")).toDF("text")
    val est = Corpus.hllEstimate(Corpus.hllRegisters(docs, "text", p = 10), p = 10)
    val se = 1.04 / math.sqrt(1024.0) // ~3.25%
    assert(math.abs(est - 5000.0) / 5000.0 < 5 * se, s"estimate $est too far from 5000")
  }
}
