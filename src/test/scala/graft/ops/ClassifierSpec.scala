package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // hand corpus: class 1 speaks "good", class 0 speaks "bad"; "shared"
  // appears in both, "novel" in neither
  private def seed = Seq(
    (0L, "good good shared", 1L),
    (1L, "good shared", 1L),
    (2L, "bad bad shared", 0L),
  ).toDF("doc_id", "text", "y")

  test("trainNb computes whole-bit word costs by hand-checkable integer math") {
    val m = Classifier.trainNb(seed, "text", "y")
    // class totals: n1 = 5 tokens (good x3, shared x2), n0 = 3 (bad x2, shared x1)
    // wait: doc0 = good,good,shared (y=1), doc1 = good,shared (y=1), doc2 = bad,bad,shared (y=0)
    // c1: good=3, shared=2 -> n1 = 5; c0: bad=2, shared=1 -> n0 = 3; V = 3
    val rows = m.words.orderBy("w").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    // q_c = ceil(log2(ceil((n_c + V)/(c + 1))))
    // bad:   q0 = ceil(log2(ceil(6/3))) = 1,  q1 = ceil(log2(ceil(8/1))) = 3
    // good:  q0 = ceil(log2(6/1)=6) = 3,      q1 = ceil(log2(ceil(8/4)=2)) = 1
    // shared:q0 = ceil(log2(ceil(6/2)=3)) = 2, q1 = ceil(log2(ceil(8/3)=3)) = 2
    assert(rows.toSeq == Seq(("bad", 1L, 3L), ("good", 3L, 1L), ("shared", 2L, 2L)))
    // defaults: m = n_c + V -> q0d = ceil(log2 6) = 3, q1d = ceil(log2 8) = 3
    assert(m.q0Default == 3L && m.q1Default == 3L)
    // priors: d0 = 1, d1 = 2; p0 = ceil(log2(ceil(5/2)=3)) = 2, p1 = ceil(log2(ceil(5/3)=2)) = 1
    assert(m.prior0Bits == 2L && m.prior1Bits == 1L)
    assert(m.wordRowCount == 3L)
  }

  test("classifyNb is multinomial (repeats pay repeatedly), labels by cheaper class, ties to 0") {
    val m = Classifier.trainNb(seed, "text", "y")
    val docs = Seq(
      (10L, "good good"),      // bits0 = 2 + 3 + 3 = 8, bits1 = 1 + 1 + 1 = 3 -> label 1
      (11L, "bad"),            // bits0 = 2 + 1 = 3, bits1 = 1 + 3 = 4 -> label 0
      (12L, "novel"),          // unseen: bits0 = 2 + 3 = 5, bits1 = 1 + 3 = 4 -> label 1
      (13L, "shared bad good") // bits0 = 2+2+1+3 = 8, bits1 = 1+2+3+1 = 7 -> label 1
    ).toDF("doc_id", "text")
    val out = Classifier.classifyNb(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (10L, 8L, 3L, 2L, 1L),
      (11L, 3L, 4L, 1L, 0L),
      (12L, 5L, 4L, 1L, 1L),
      (13L, 8L, 7L, 3L, 1L)))
  }

  test("a bits0 == bits1 tie labels 0 but a margin-0 filter keeps it") {
    // craft a tie: symmetric classes
    val sym = Seq((0L, "x x", 0L), (1L, "y y", 1L)).toDF("doc_id", "text", "y")
    val m = Classifier.trainNb(sym, "text", "y")
    // doc "x y": q0(x)=? n0=2,n1=2,V=2; x: c0=2,c1=0 -> q0=ceil(log2(ceil(4/3)=2))=1, q1=ceil(log2(4))=2
    // y symmetric. priors equal. bits0 = p + 1 + 2, bits1 = p + 2 + 1 -> tie
    val doc = Seq((5L, "x y")).toDF("doc_id", "text")
    val out = Classifier.classifyNb(doc, "doc_id", "text", m).head()
    assert(out.getLong(1) == out.getLong(2))
    assert(out.getLong(4) == 0L)
    assert(Classifier.qualityFilter(doc, "doc_id", "text", m, marginBits = 0L).count() == 1L)
    assert(Classifier.qualityFilter(doc, "doc_id", "text", m, marginBits = 1L).count() == 0L)
  }

  test("zero-token docs score priors only and never crash the left join") {
    val m = Classifier.trainNb(seed, "text", "y")
    // split("", " ") yields [""], so a truly empty text still emits one
    // (unseen) token — the genuinely tokenless path is exercised via a
    // doc set where the left join finds no aggregate row (null text
    // docs are the caller's concern; empty string is the boundary)
    val out = Classifier.classifyNb(Seq((7L, "")).toDF("doc_id", "text"),
      "doc_id", "text", m).head()
    assert(out.getLong(3) == 1L) // the empty-string token
    assert(out.getLong(1) == m.prior0Bits + m.q0Default)
  }

  test("the model join is broadcast under the cap and shuffled-hash above it") {
    val m = Classifier.trainNb(seed, "text", "y")
    val docs = Seq((1L, "good bad")).toDF("doc_id", "text")
    // collect first: AQE only finalizes the executed plan on run
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      val cut = s.indexOf("== Initial Plan ==")
      if (cut >= 0) s.substring(0, cut) else s
    }
    // the assertion targets the WORD join: the final per-doc re-attach
    // join may legitimately broadcast its tiny aggregate either way
    val under = plan(Classifier.classifyNb(docs, "doc_id", "text", m))
    assert(under.contains("BroadcastHashJoin [w"))
    val over = plan(Classifier.classifyNb(docs, "doc_id", "text", m, broadcastRowCap = 0L))
    assert(!over.contains("BroadcastHashJoin [w") && over.contains("ShuffledHashJoin [w"))
  }

  test("qualityFilter keeps exactly the margin-satisfying docs with original columns") {
    val m = Classifier.trainNb(seed, "text", "y")
    val docs = Seq((10L, "good good"), (11L, "bad"), (12L, "novel")).toDF("doc_id", "text")
    // margins: 10 -> 8-3 = 5; 11 -> 3-4 = -1; 12 -> 5-4 = 1
    val kept = Classifier.qualityFilter(docs, "doc_id", "text", m, marginBits = 2L)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(10L))
    val kept1 = Classifier.qualityFilter(docs, "doc_id", "text", m, marginBits = 1L)
      .select("doc_id").as[Long].collect().sorted
    assert(kept1.toSeq == Seq(10L, 12L))
  }
}
