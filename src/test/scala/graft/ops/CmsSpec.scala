package graft.ops

import graft.SparkTestBase

/** Count-Min-Sketch token frequencies: the never-under-count bound,
  * exactness at high width, multiplicity counting, and absent tokens.
  */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple apple apple banana"),
    (2L, "apple cherry cherry"),
    (3L, "banana date"),
  ).toDF("doc_id", "text")
  private val probe = Seq(
    (9L, "apple banana missing date"),
  ).toDF("doc_id", "text")

  private def run(width: Int): Map[String, (Long, Long)] =
    Corpus.cmsTokenCounts(corpus, probe, "text", width = width, depth = 3)
      .as[(String, Long, Long)].collect()
      .map { case (t, e, c) => t -> ((e, c)) }.toMap

  test("at high width the sketch is exact: est == true count, including multiplicity") {
    val m = run(1 << 20)
    assert(m("apple") == ((4L, 4L)))
    assert(m("banana") == ((2L, 2L)))
    assert(m("date") == ((1L, 1L)))
    assert(m("missing") == ((0L, 0L)))
  }

  test("the sketch never under-counts at any width") {
    for (w <- Seq(2, 16, 256)) {
      val m = run(w)
      assert(m("apple")._1 >= 4L && m("banana")._1 >= 2L && m("date")._1 >= 1L,
        s"width=$w under-counted: $m")
    }
  }

  test("at width 2 everything collides and the over-count is total-bounded") {
    val m = run(2)
    // 9 corpus tokens total: no estimate can exceed the full stream length
    assert(m.values.forall { case (e, _) => e <= 9L })
    assert(m.values.forall { case (e, c) => e >= c })
  }

  test("empty corpus yields zero estimates") {
    val m = Corpus.cmsTokenCounts(corpus.filter("doc_id < 0"), probe, "text",
      width = 64, depth = 3)
      .as[(String, Long, Long)].collect()
    assert(m.nonEmpty && m.forall { case (_, e, c) => e == 0L && c == 0L })
  }
}
