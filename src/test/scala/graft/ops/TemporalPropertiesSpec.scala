package graft.ops

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import java.sql.Timestamp

/** Property tests pitting the single-shuffle window formulations against
  * brute-force per-row models on arbitrary inputs — the strongest evidence
  * the plan-shaped implementations compute the declared semantics.
  */
class TemporalPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(20)

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  test("asofJoin ≡ per-row argmax of prior right rows (property)") {
    val leftGen = Gen.listOfN(30, for {
      k <- Gen.choose(0L, 4L); m <- Gen.choose(0L, 50L)
    } yield (k, m))
    val rightGen = Gen.listOfN(12, for {
      k <- Gen.choose(0L, 5L); m <- Gen.choose(0L, 50L); v <- Gen.choose(0L, 999L)
    } yield (k, m, v))

    val prop = forAll(leftGen, rightGen) { (ls, rs0) =>
      // right side must be unique per (key, ts): keep max v (latestPerKeyTs rule)
      val rs = rs0.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      val left = ls.zipWithIndex.map { case ((k, m), i) => (i.toLong, k, ts(m)) }
        .toDF("event_id", "user_id", "ts")
      val right = rs.map { case (k, m, v) => (k, ts(m), v) }.toDF("user_id", "rts", "v")
      val got = Temporal.asofJoin(left, right, "user_id", "ts", "rts", Seq("v"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val model = ls.zipWithIndex.map { case ((k, m), i) =>
        val prior = rs.filter(r => r._1 == k && r._2 <= m)
        i.toLong -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)._3))
      }.toMap
      got == model
    }
    val r = org.scalacheck.Test.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("packSequences invariants: order-preserving bins, bounded overflow (property)") {
    val gen = Gen.listOfN(25, Gen.choose(1L, 3000L))
    val budget = 4096L
    val prop = forAll(gen) { toks =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "toks")
      val packed = Corpus.packSequences(df, "doc_id", "toks", budget)
        .orderBy("doc_id")
        .select("doc_id", "toks", "pack_id").as[(Long, Long, Long)].collect()
      // bins are monotone non-decreasing in doc order
      val monotone = packed.sliding(2).forall(w => w.length < 2 || w(0)._3 <= w(1)._3)
      // each bin's total ≤ budget + its last doc (overflow bounded by one doc)
      val bounded = packed.groupBy(_._3).values.forall { bin =>
        val tot = bin.map(_._2).sum
        tot <= budget + bin.maxBy(_._1)._2
      }
      // bin ids match the cumulative-offset definition exactly
      val cums = packed.scanLeft(0L)(_ + _._2)
      val exact = packed.zip(cums).forall { case ((_, _, b), before) => b == before / budget }
      monotone && bounded && exact
    }
    val r = org.scalacheck.Test.check(params, prop)
    assert(r.passed, r.status.toString)
  }
}
