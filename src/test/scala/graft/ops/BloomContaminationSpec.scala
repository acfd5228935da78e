package graft.ops

import graft.SparkTestBase

/** Bloom-filter decontamination: the never-under-count guarantee, exact
  * agreement at low fill, saturation at tiny m, and short-doc edges.
  */
class BloomContaminationSpec extends SparkTestBase {
  import spark.implicits._

  // 3-gram fixtures: doc 10 shares "a b c d" with eval doc 97; doc 11 is
  // clean; doc 12 is shorter than n; doc 13 is the eval doc itself
  private val docs = Seq(
    (10L, "a b c d x y z"),
    (11L, "p q r s t u v"),
    (12L, "one two"),
  ).toDF("doc_id", "text")
  private val ev = Seq((97L, "a b c d")).toDF("doc_id", "text")

  private def run(mBits: Int, k: Int = 3): Map[Long, (Long, Long)] =
    Corpus.bloomContamination(docs, ev, "doc_id", "text", n = 3, mBits = mBits, k = k)
      .select("doc_id", "n_ngrams", "n_contaminated").as[(Long, Long, Long)]
      .collect().map { case (id, n, c) => id -> ((n, c)) }.toMap

  test("at high m the bloom count equals the exact count (zero false positives on this fixture)") {
    val exact = Corpus.contamination(docs, ev, "doc_id", "text", n = 3)
      .select("doc_id", "n_contaminated").as[(Long, Long)].collect().toMap
    val bloom = run(mBits = 1 << 20)
    assert(bloom(10L) == ((5L, 2L))) // "a b c","b c d" hit; "c d x","d x y","x y z" miss
    assert(bloom(11L) == ((5L, 0L)))
    assert(bloom(12L) == ((0L, 0L)))
    assert(bloom.forall { case (id, (_, c)) => c == exact(id) })
  }

  test("bloom never under-counts: every truly contaminated gram hits at any m") {
    for (m <- Seq(64, 1 << 10, 1 << 16)) {
      val bloom = run(mBits = m)
      assert(bloom(10L)._2 >= 2L, s"mBits=$m under-counted: ${bloom(10L)}")
    }
  }

  test("empty eval side yields an all-zero bitmap and zero hits") {
    val out = Corpus.bloomContamination(docs, ev.filter("doc_id < 0"), "doc_id", "text",
      n = 3, mBits = 1 << 16)
      .select("doc_id", "n_contaminated").as[(Long, Long)].collect().toMap
    assert(out.values.forall(_ == 0L))
  }
}
