package graft.ops

import graft.SparkTestBase

/** Second-stage rerank seam: Jaccard scorer semantics, the top-k ordering
  * contract, null-text quarantine, and client lifecycle alignment.
  */
class RerankSpec extends SparkTestBase {
  import spark.implicits._

  test("JaccardScorer: exact integer-ratio scores, empty-token convention") {
    import Rerank.{JaccardScorer, ScorePair}
    val s = JaccardScorer.score(Seq(
      ScorePair("a b c", "a b c"),     // identical -> 1.0
      ScorePair("a b c d", "c d e f"), // inter 2, union 6 -> 1/3
      ScorePair("a a a b", "a b"),     // token SETS: {a,b} vs {a,b} -> 1.0
      ScorePair("x y", "p q"),         // disjoint -> 0.0
    ))
    assert(s == Seq(1.0, 2.0 / 6.0, 1.0, 0.0))
  }

  test("rerankTopK keeps per-query top-k by score desc then candidate id asc; null texts quarantined") {
    val cand = Seq(
      (1L, "a b c d", 10L, "a b c d"),        // 1.0
      (1L, "a b c d", 11L, "a b x y"),        // 2/6
      (1L, "a b c d", 12L, "c d a b"),        // 1.0 — ties id 10 first
      (1L, "a b c d", 13L, null.asInstanceOf[String]), // quarantined
      (2L, "p q", 10L, "p q"),                // 1.0
      (2L, null.asInstanceOf[String], 11L, "p q"),     // quarantined
    ).toDF("q_id", "q_text", "n_id", "n_text")
    val out = Rerank.rerankTopK(cand, "q_id", "q_text", "n_id", "n_text", k = 2)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 10L), (1L, 2L, 12L), (2L, 1L, 10L)))
  }

  test("a batching client sees every pair exactly once across batch boundaries") {
    // accumulator, not a captured counter: the client closure is
    // serialized per task, so only an accumulator reports back
    val acc = spark.sparkContext.longAccumulator("rerank-pairs")
    object CountingScorer extends Rerank.RerankClient {
      def score(pairs: Seq[Rerank.ScorePair]): Seq[Double] = {
        acc.add(pairs.length); pairs.map(_ => 0.5)
      }
    }
    val cand = (1L to 150L).map(i => (1L, "q", i, s"c$i"))
      .toDF("q_id", "q_text", "n_id", "n_text").repartition(2)
    val n = Rerank.rerankTopK(cand, "q_id", "q_text", "n_id", "n_text",
      k = 3, client = CountingScorer, batchSize = 64).count()
    assert(n == 3)
    assert(acc.value == 150L)
  }
}
