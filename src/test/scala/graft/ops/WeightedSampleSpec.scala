package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Weighted Poisson sampling: model equivalence, expected size,
  * proportionality, determinism, always-keep for heavy rows.
  */
class WeightedSampleSpec extends SparkTestBase {
  import spark.implicits._

  private def md5u(salt: String, id: Long): Long = {
    val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$salt:$id").take(15)
    java.lang.Long.parseLong(h, 16) % (1L << 20)
  }

  test("keep decision matches the integer model row-for-row") {
    val rows = (0L until 2000L).map(i => (i, 1L + i % 50))
    val df = rows.toDF("id", "w")
    val total = rows.map(_._2).sum
    val k = 200L
    val kept = Corpus.weightedPoissonSample(df, "id", "w", k)
      .select("id").as[Long].collect().toSet
    val model = rows.filter { case (i, w) =>
      md5u("wps", i) * total < k * w * (1L << 20)
    }.map(_._1).toSet
    assert(kept == model)
  }

  test("expected size ~ k and inclusion scales with weight") {
    val rows = (0L until 10000L).map(i => (i, if (i % 100 == 0) 50L else 5L))
    val df = rows.toDF("id", "w")
    val k = 500L
    val kept = Corpus.weightedPoissonSample(df, "id", "w", k)
      .as[(Long, Long)].collect()
    val n = kept.length.toLong
    assert(n > 350 && n < 650, s"expected ~$k kept, got $n")
    // 10x-weight rows included ~10x more often
    val heavyRate = kept.count(_._2 == 50L).toDouble / rows.count(_._2 == 50L)
    val lightRate = kept.count(_._2 == 5L).toDouble / rows.count(_._2 == 5L)
    assert(heavyRate > 5 * lightRate, s"$heavyRate vs $lightRate")
  }

  test("rows with k*w >= W are kept deterministically (capped probability 1)") {
    val df = ((0L until 100L).map(i => (i, 1L)) :+ (500L, 1000L)).toDF("id", "w")
    val kept = Corpus.weightedPoissonSample(df, "id", "w", expectedK = 5)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(500L)) // 5*1000 >= 1100 = W
  }

  test("deterministic across runs; salt changes the draw") {
    val df = (0L until 1000L).map(i => (i, 10L)).toDF("id", "w")
    val a = Corpus.weightedPoissonSample(df, "id", "w", 100).select("id").as[Long].collect().toSet
    val b = Corpus.weightedPoissonSample(df, "id", "w", 100).select("id").as[Long].collect().toSet
    val c = Corpus.weightedPoissonSample(df, "id", "w", 100, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(a == b && a != c)
  }
}
