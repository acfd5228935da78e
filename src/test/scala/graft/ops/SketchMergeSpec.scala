package graft.ops

import graft.SparkTestBase

/** Sketch union algebra: merge(sketch(A), sketch(B)) must equal
  * sketch(A ∪ B) EXACTLY (same hash family, integer state) — the
  * property that lets per-source / per-day / per-partition sketches
  * compose across a fleet without ever seeing each other's data.
  */
class SketchMergeSpec extends SparkTestBase {
  import spark.implicits._

  private val a = Seq("alpha beta gamma", "alpha alpha delta").toDF("text")
  private val b = Seq("beta epsilon", "zeta zeta zeta eta").toDF("text")
  private val union = Seq(
    "alpha beta gamma", "alpha alpha delta", "beta epsilon", "zeta zeta zeta eta",
  ).toDF("text")

  test("cmsMerge(sketch(A), sketch(B)) == sketch(A ∪ B) cell-for-cell") {
    val merged = Corpus.cmsMerge(
      Corpus.cmsSketch(a, "text", width = 64, depth = 3),
      Corpus.cmsSketch(b, "text", width = 64, depth = 3))
      .as[Seq[Long]].head()
    val direct = Corpus.cmsSketch(union, "text", width = 64, depth = 3)
      .as[Seq[Long]].head()
    assert(merged == direct)
    assert(merged.sum == 3L * 12) // depth x total tokens: nothing lost
  }

  test("hllMerge(registers(A), registers(B)) == registers(A ∪ B) register-for-register") {
    val merged = Corpus.hllMerge(
      Corpus.hllRegisters(a, "text", p = 6),
      Corpus.hllRegisters(b, "text", p = 6))
      .collect().map(_.toString).sorted.toSeq
    val direct = Corpus.hllRegisters(union, "text", p = 6)
      .collect().map(_.toString).sorted.toSeq
    assert(merged == direct)
  }

  test("merge is idempotent for overlapping corpora (HLL) and order-independent (both)") {
    val selfMerge = Corpus.hllMerge(
      Corpus.hllRegisters(a, "text", 6), Corpus.hllRegisters(a, "text", 6))
      .collect().map(_.toString).sorted.toSeq
    assert(selfMerge == Corpus.hllRegisters(a, "text", 6).collect().map(_.toString).sorted.toSeq)
    val ab = Corpus.cmsMerge(Corpus.cmsSketch(a, "text", 64, 2), Corpus.cmsSketch(b, "text", 64, 2))
      .as[Seq[Long]].head()
    val ba = Corpus.cmsMerge(Corpus.cmsSketch(b, "text", 64, 2), Corpus.cmsSketch(a, "text", 64, 2))
      .as[Seq[Long]].head()
    assert(ab == ba)
  }
}
