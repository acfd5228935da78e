package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Persisted inverted index: build+search equals the direct champion
  * retrieval, appended docs are retrievable immediately, and optimize
  * makes the index identical to a fresh build over the union corpus.
  */
class LexicalIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = (0L until 500L).map { i =>
    val filler = Seq.fill(6)(s"common${i % 3}").mkString(" ")
    (i, s"marker${i / 5} $filler")
  }.toDF("doc_id", "text")

  private val queries = Seq((9001L, "marker7 common1"), (9002L, "marker60 marker61"))
    .toDF("q_id", "q_text")

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("build + search == direct champion-list retrieval") {
    val path = s"${tmpDir("graft_lexidx")}/idx"
    Lexical.Index.build(corpus, "doc_id", "text", path, championSize = 16)
    val viaIndex = sorted(
      Lexical.Index.search(spark, path, queries, "q_id", "q_text", k = 10)
        .withColumnRenamed("id", "doc_id"))
    val direct = sorted(
      Lexical.topKDocs(corpus, "doc_id", "text", queries, "q_id", "q_text", 10,
        championSize = 16))
    assert(viaIndex == direct)
  }

  test("appended docs are retrievable immediately with union-corpus idf") {
    val path = s"${tmpDir("graft_lexidx_app")}/idx"
    Lexical.Index.build(corpus, "doc_id", "text", path, championSize = 16)
    val batch = Seq((9000L, "freshterm freshterm common1 common2 common0")).toDF("doc_id", "text")
    Lexical.Index.append(batch, "doc_id", "text", path, appendId = 0L)
    val hits = Lexical.Index.search(spark,
      path, Seq((1L, "freshterm")).toDF("q_id", "q_text"), "q_id", "q_text", 5)
    assert(hits.select("id").as[Long].collect().toSeq == Seq(9000L))
    // the df deltas sum to the union: common1 count grew by one
    val df1 = spark.read.parquet(Lexical.Index.subDir(spark, path, "idf")).filter(col("term") === "common1")
      .agg(sum("df")).as[Long].head()
    val base1 = corpus.filter(col("text").contains("common1")).count()
    assert(df1 == base1 + 1)
  }

  test("a retried append (same appendId) overwrites itself — no duplicate postings or df") {
    val path = s"${tmpDir("graft_lexidx_retry")}/idx"
    Lexical.Index.build(corpus, "doc_id", "text", path, championSize = 16)
    val batch = Seq((9000L, "freshterm common1")).toDF("doc_id", "text")
    Lexical.Index.append(batch, "doc_id", "text", path, appendId = 5L)
    val postings1 = spark.read.parquet(Lexical.Index.subDir(spark, path, "postings")).count()
    val df1 = spark.read.parquet(Lexical.Index.subDir(spark, path, "idf")).agg(sum("df")).as[Long].head()
    val n1 = spark.read.parquet(Lexical.Index.subDir(spark, path, "meta")).agg(sum("n_docs")).as[Long].head()
    // crash-before-checkpoint => the same batch is delivered again
    Lexical.Index.append(batch, "doc_id", "text", path, appendId = 5L)
    assert(spark.read.parquet(Lexical.Index.subDir(spark, path, "postings")).count() == postings1)
    assert(spark.read.parquet(Lexical.Index.subDir(spark, path, "idf")).agg(sum("df")).as[Long].head() == df1)
    assert(spark.read.parquet(Lexical.Index.subDir(spark, path, "meta")).agg(sum("n_docs")).as[Long].head() == n1)
    val hits = Lexical.Index.search(spark,
      path, Seq((1L, "freshterm")).toDF("q_id", "q_text"), "q_id", "q_text", 5)
    assert(hits.select("id").as[Long].collect().toSeq == Seq(9000L))
  }

  test("append queues behind a held index lease and loses nothing (optimize interleave)") {
    val path = s"${tmpDir("graft_lexidx_lock")}/idx"
    Lexical.Index.build(corpus, "doc_id", "text", path, championSize = 16)
    // simulate an in-flight optimize holding the index lease
    val lease = graft.core.TableLock.acquire(spark, path, owner = "spec-optimize")
    val batch = Seq((9000L, "freshterm common1")).toDF("doc_id", "text")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val append = Future(Lexical.Index.append(batch, "doc_id", "text", path, appendId = 0L))
    Thread.sleep(1000) // the append must still be waiting on the lease
    assert(!append.isCompleted, "append must not proceed while the lease is held")
    lease.release()
    Await.result(append, 90.seconds)
    // nothing lost: the appended doc is retrievable, deltas are complete
    val hits = Lexical.Index.search(spark,
      path, Seq((1L, "freshterm")).toDF("q_id", "q_text"), "q_id", "q_text", 5)
    assert(hits.select("id").as[Long].collect().toSeq == Seq(9000L))
    assert(spark.read.parquet(Lexical.Index.subDir(spark, path, "meta")).agg(sum("n_docs")).as[Long].head() == 501L)
  }

  test("unleased searches during concurrent optimizes never fail and stay correct") {
    // the generation-pointer contract: search resolves a committed
    // generation whose directories an optimize never rewrites; the flip
    // is one atomic marker create and GC keeps a one-generation grace —
    // so a reader loop racing repeated optimizes sees zero transient
    // FileNotFound/missing-dir failures and always-valid results
    val path = s"${tmpDir("graft_lexidx_race")}/idx"
    Lexical.Index.build(corpus, "doc_id", "text", path, championSize = 16)
    val expected = sorted(
      Lexical.Index.search(spark, path, queries, "q_id", "q_text", k = 10)
        .withColumnRenamed("id", "doc_id"))
    @volatile var searching = true
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var reads = 0
    val reader = new Thread(() => {
      while (searching) {
        try {
          val got = sorted(
            Lexical.Index.search(spark, path, queries, "q_id", "q_text", k = 10)
              .withColumnRenamed("id", "doc_id"))
          assert(got == expected, "mid-optimize search returned different results")
          reads += 1
        } catch { case t: Throwable => failures.add(t); searching = false }
      }
    })
    reader.start()
    try {
      // three optimizes (no content change: same corpus re-ranked) while
      // searches loop — generations 1, 2, 3
      (1 to 3).foreach(_ => Lexical.Index.optimize(spark, path, championSize = 16))
    } finally {
      searching = false
      reader.join(60000)
    }
    assert(failures.isEmpty, s"reader failed during optimize: ${failures.peek()}")
    assert(reads > 0, "the reader loop must have completed at least one search")
    // after the dust settles: still the same answers, old generations GC'd
    assert(sorted(Lexical.Index.search(spark, path, queries, "q_id", "q_text", k = 10)
      .withColumnRenamed("id", "doc_id")) == expected)
    assert(graft.core.Generations.current(spark, path).contains(3L))
  }

  test("append + optimize == fresh build over the union corpus") {
    val dir = tmpDir("graft_lexidx_opt")
    val incPath = s"$dir/inc"; val fullPath = s"$dir/full"
    val batch = (500L until 550L).map(i => (i, s"marker${i / 5} common1 common1 common2"))
      .toDF("doc_id", "text")
    Lexical.Index.build(corpus, "doc_id", "text", incPath, championSize = 16)
    Lexical.Index.append(batch, "doc_id", "text", incPath, appendId = 0L)
    Lexical.Index.optimize(spark, incPath, championSize = 16)
    Lexical.Index.build(corpus.unionByName(batch), "doc_id", "text", fullPath,
      championSize = 16)
    assert(sorted(spark.read.parquet(Lexical.Index.subDir(spark, incPath, "postings"))) ==
      sorted(spark.read.parquet(Lexical.Index.subDir(spark, fullPath, "postings"))))
    val q = Seq((1L, "marker100 common1 common2")).toDF("q_id", "q_text")
    assert(sorted(Lexical.Index.search(spark, incPath, q, "q_id", "q_text", 10)) ==
      sorted(Lexical.Index.search(spark, fullPath, q, "q_id", "q_text", 10)))
  }
}
