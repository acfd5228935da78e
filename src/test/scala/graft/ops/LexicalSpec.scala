package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** tf-idf lexical retrieval: quantized idf values, integer scoring with
  * query/corpus term multiplicity, bounded top-k order, Borda fusion.
  */
class LexicalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "apple cherry"),
    (3L, "banana cherry cherry"),
    (4L, "durian"),
  ).toDF("doc_id", "text")

  test("idfBits quantizes ceil(log2((N+1)/(df+1))) per term") {
    val idf = Lexical.idfBits(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    // N=4: df=2 -> m=ceil(5/3)=2 -> 1 bit; df=1 -> m=3 -> 2 bits
    assert(idf == Map("apple" -> 1L, "banana" -> 1L, "cherry" -> 1L, "durian" -> 2L))
  }

  test("topKDocs scores sum(qtf*tf*idf_bits), ranks by score desc then id") {
    val queries = Seq((100L, "apple cherry cherry")).toDF("q_id", "q_text")
    val got = Lexical.topKDocs(docs, "doc_id", "text", queries, "q_id", "q_text", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._2)
    // doc1: apple tf2*idf1*qtf1 = 2; doc2: 1*1*1 + 1*1*2(qtf) = 3; doc3: cherry 2*1*2 = 4
    assert(got == Seq((100L, 1L, 3L, 4L), (100L, 2L, 2L, 3L), (100L, 3L, 1L, 2L)))
  }

  test("query side off-broadcast is identical") {
    val queries = Seq((100L, "apple cherry cherry"), (200L, "banana")).toDF("q_id", "q_text")
    val a = Lexical.topKDocs(docs, "doc_id", "text", queries, "q_id", "q_text", 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Lexical.topKDocs(docs, "doc_id", "text", queries, "q_id", "q_text", 3,
      broadcastRowCap = 0L).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("champion lists: C >= postings is identical to exhaustive; truncation drops only tf-tail docs") {
    val queries = Seq((100L, "apple")).toDF("q_id", "q_text")
    val exhaustive = Lexical.topKDocs(docs, "doc_id", "text", queries, "q_id", "q_text", 3)
      .collect().map(_.toString).sorted.toSeq
    val bigC = Lexical.topKDocs(docs, "doc_id", "text", queries, "q_id", "q_text", 3,
      championSize = 100).collect().map(_.toString).sorted.toSeq
    assert(exhaustive == bigC)
    // apple postings: doc1 tf2, doc2 tf1 -> champion list of 1 keeps doc1 only
    val c1 = Lexical.topKDocs(docs, "doc_id", "text", queries, "q_id", "q_text", 3,
      championSize = 1).select("doc_id").as[Long].collect().toSet
    assert(c1 == Set(1L))
  }

  test("champion truncation preserves the exhaustive top-k on a Zipfian corpus") {
    // the driver testdata has a 31-word vocabulary (every term in ~78% of
    // docs — all stopwords, no lexical signal), so champion recall there
    // measures corpus degeneracy, not the method. On a corpus with rare
    // discriminative terms — the shape real text has — the rare-term
    // postings fit entirely inside the champion lists and the truncated
    // ranking IS the exhaustive ranking.
    val corpus = (0L until 2000L).map { i =>
      val filler = Seq.fill(6)(s"common${i % 3}").mkString(" ")
      (i, s"marker${i / 5} $filler") // each marker shared by exactly 5 docs
    }.toDF("doc_id", "text")
    val queries = Seq((9001L, "marker7 marker123"), (9002L, "marker300 common1"))
      .toDF("q_id", "q_text")
    val ex = Lexical.topKDocs(corpus, "doc_id", "text", queries, "q_id", "q_text", 10)
      .collect().map(_.toString).sorted.toSeq
    val ch = Lexical.topKDocs(corpus, "doc_id", "text", queries, "q_id", "q_text", 10,
      championSize = 32).collect().map(_.toString).sorted.toSeq
    assert(ex == ch)
  }

  test("topKDocs releases its corpus-sized postings cache (no session-lifetime pin)") {
    // the operator persists the corpus-sized postings frame internally;
    // it must unpersist it before returning (the k x queries result is
    // eagerly materialized first). Leftover persistent RDDs after the
    // call may only be the SMALL localCheckpoints (query terms, result)
    // — never a corpus-scale block set that accumulates per call.
    val corpus = (0L until 400L)
      .map(i => (i, s"w${i % 7} w${i % 11} w${i % 13} filler$i common"))
      .toDF("doc_id", "text")
    val queries = Seq((1L, "w3 common"), (2L, "w5 w7")).toDF("q_id", "q_text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Lexical.topKDocs(corpus, "doc_id", "text", queries, "q_id", "q_text", 5)
      .collect()
    assert(got.nonEmpty)
    val fresh = spark.sparkContext.getPersistentRDDs.filterNot { case (id, _) => before(id) }
    // ~2000 postings rows would remain cached if the persist leaked;
    // everything legitimately left behind is tiny
    fresh.values.foreach { rdd =>
      assert(rdd.count() <= 50L,
        s"a corpus-scale cached RDD survived topKDocs: ${rdd.count()} rows (${rdd.name})")
    }
  }

  test("bordaFuse awards k-rank+1 per list and breaks point ties by doc id") {
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L)).toDF("q_id", "doc_id", "rank")
    val ann = Seq((1L, 20L, 1L), (1L, 40L, 2L), (1L, 10L, 3L)).toDF("q_id", "doc_id", "rank")
    val got = Lexical.bordaFuse(Seq(lex, ann), "q_id", "doc_id", "rank", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._2)
    // points: d10 = 3+1 = 4, d20 = 2+3 = 5, d30 = 1, d40 = 2; tie-free here
    assert(got == Seq((1L, 1L, 20L, 5L), (1L, 2L, 10L, 4L), (1L, 3L, 40L, 2L)))
  }
}
