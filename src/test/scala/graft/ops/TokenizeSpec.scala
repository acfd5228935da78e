package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Tokenize.FixedBpeTokenizer

/** Greedy fixed-merge-table BPE: rank order decides which merge fires,
  * merges apply to ALL occurrences, and the DataFrame kernel counts
  * through the per-partition word cache.
  */
class TokenizeSpec extends SparkTestBase {
  import spark.implicits._

  test("greedy BPE follows global min-rank order") {
    // (a,n) rank 4 fires before (s,c) rank 42, then (sc,an) completes
    assert(FixedBpeTokenizer.tokenize("scan") == Seq("scan"))
    // (e,r) rank 6 seeds the mer-g-e chain
    assert(FixedBpeTokenizer.tokenize("merge") == Seq("merge"))
    // (a,l) rank 18 beats (v,a) rank 26, stranding the va-l-u-e chain
    assert(FixedBpeTokenizer.tokenize("value") == Seq("v", "al", "u", "e"))
    assert(FixedBpeTokenizer.tokenize("the") == Seq("the"))
  }

  test("merges apply to all occurrences per step") {
    assert(FixedBpeTokenizer.tokenize("thethe") == Seq("the", "the"))
  }

  test("untokenizable and degenerate words") {
    assert(FixedBpeTokenizer.tokenize("") == Nil)
    assert(FixedBpeTokenizer.tokenize("x") == Seq("x"))
    assert(FixedBpeTokenizer.tokenize("zzz") == Seq("z", "z", "z"))
  }

  test("tokenCounts sums per-word subword counts; null and empty text count 0") {
    val df = Seq(
      (1L, "the scan"),       // 1 + 1
      (2L, "value merge"),    // 4 + 1
      (3L, ""),               // split("") -> [""] -> 0
    ).toDF("doc_id", "text")
      .unionByName(Seq(4L).toDF("doc_id").withColumn("text", lit(null: String)))
    val got = Tokenize.tokenCounts(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 5L, 3L -> 0L, 4L -> 0L))
  }
}
