package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Corpus-level exact-substring removal: first occurrence survives, every
  * later copy (cross-doc and within-doc) is cut, overlapping duplicated
  * windows merge into one cut region, short docs pass through whole.
  */
class SpanRemovalSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int, hashKeys: Boolean = false) =
    Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
      k = k, hashKeys = hashKeys)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

  test("cross-doc duplicate span cut from the later doc only") {
    val got = run(Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d e z"), // a..e duplicates doc 1's 5-token prefix run
    ), k = 3)
    assert(got(1L) == (("a b c d e f", 6L, 6L)))
    // windows (a b c),(b c d),(c d e) are dups -> positions 2..6 cut
    assert(got(2L) == (("x y z", 8L, 3L)))
  }

  test("within-doc self repeat: later copy cut, overlap merges") {
    val got = run(Seq((7L, "p q r s p q r s t")), k = 4)
    // window (p q r s) at pos 0 canonical; at pos 4 dup -> cut 4..7
    assert(got(7L) == (("p q r s t", 9L, 5L)))
  }

  test("short docs and unique docs untouched; empty-out doc reported as 0 kept") {
    val got = run(Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),  // entire doc duplicated -> all cut
      (3L, "u v"),      // < k words: no windows, whole
    ), k = 4)
    assert(got(1L) == (("a b c d", 4L, 4L)))
    assert(got(2L) == (("", 4L, 0L)))
    assert(got(3L) == (("u v", 2L, 2L)))
  }

  test("first occurrence is global min (id, pos), not per-pair") {
    // doc 5 holds the earliest copy; docs 6 and 9 both lose theirs
    val got = run(Seq(
      (5L, "m n o p q"),
      (6L, "z m n o p q"),
      (9L, "m n o p q w"),
    ), k = 5)
    assert(got(5L)._1 == "m n o p q")
    assert(got(6L)._1 == "z")
    assert(got(9L)._1 == "w")
  }

  test("removeEvalSpans cuts exactly the eval-overlapping spans from train docs") {
    import org.apache.spark.sql.functions.col
    val train = Seq(
      (1L, "keep this a b c d keep that"), // a b c d overlaps eval
      (2L, "nothing shared here at all"),
      (3L, "a b c d"),                      // entire doc is eval text
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "x a b c d y")).toDF("doc_id", "text")
    val got = Dedup.removeEvalSpans(train, eval, "doc_id", "text", k = 4)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._4))).toMap
    // windows of doc 1: (keep this a b), ... only (a b c d) occurs in eval
    assert(got(1L) == (("keep this keep that", 4L)))
    assert(got(2L) == (("nothing shared here at all", 5L)))
    assert(got(3L) == (("", 0L)))
    // off-broadcast path identical
    val offB = Dedup.removeEvalSpans(train, eval, "doc_id", "text", k = 4,
      broadcastRowCap = 0L)
      .as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._4))).toMap
    assert(offB == got)
  }

  test("hashKeys path is output-identical") {
    val docs = Seq(
      (1L, "a b c d e f g"), (2L, "c d e f g h i"), (3L, "a b c x y z a b c x y z"))
    assert(run(docs, 3) == run(docs, 3, hashKeys = true))
  }
}
