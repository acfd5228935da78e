package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.{Embedding, Lexical, Similarity}
import graft.streaming.StreamingRetrieval

/** Chaos spec for the generation-pointer contract (Generations.scala):
  * UNLEASED readers probing an index in a tight loop while a writer
  * commits optimize generations must see zero FileNotFound and only
  * old-complete or new-complete results — the one-generation GC grace is
  * the claim, proven here under real contention the way TableLockSpec
  * proves the lease arbitration.
  *
  * Timing envelope: a reader resolves the pointer once per probe and
  * collects immediately (the documented usage). An optimize cycle is
  * several Spark jobs + two FS commits; a probe is a handful of tiny
  * jobs — a probe would have to straddle TWO full optimize cycles to
  * outlive the grace, which the prompt-collect discipline precludes.
  */
class GenerationChaosSpec extends SparkTestBase {
  import spark.implicits._

  private def race[T](reader: () => T)(writer: => Unit): (Seq[T], Int) = {
    @volatile var writerErr: Option[Throwable] = None
    val w = new Thread(() => try writer catch { case t: Throwable => writerErr = Some(t) })
    w.start()
    val seen = scala.collection.mutable.ArrayBuffer.empty[T]
    while (w.isAlive) seen += reader() // any reader throw fails the spec
    w.join()
    writerErr.foreach(t => fail(s"writer failed: $t", t))
    seen += reader() // one read against the final committed generation
    (seen.toSeq, seen.size)
  }

  test("Lexical.Index.search under concurrent optimize commits: zero FileNotFound, stable results") {
    val path = s"${tmpDir("gen_chaos_lex")}/idx"
    val docs = (1L to 150L)
      .map(i => (i, s"alpha tok${i % 7} tok${i % 13} beta" + (" gamma" * (i % 3).toInt)))
      .toDF("id", "text")
    Lexical.Index.build(docs, "id", "text", path, championSize = 4)
    val queries = Seq((1L, "alpha gamma tok3"), (2L, "beta tok5 tok12")).toDF("qid", "qtext")

    def probe(): Seq[(Long, Long, Long, Long)] =
      Lexical.Index.search(spark, path, queries, "qid", "qtext", k = 5)
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq

    val baseline = probe()
    assert(baseline.nonEmpty)
    // the corpus never changes, so EVERY generation scores identically:
    // any probe result other than the baseline is a torn read
    val (seen, n) = race(probe) {
      (1 to 3).foreach(_ => Lexical.Index.optimize(spark, path, championSize = 4))
    }
    assert(n >= 2, "expected at least one probe to overlap the optimize loop")
    seen.zipWithIndex.foreach { case (got, i) =>
      assert(got == baseline, s"probe $i returned a torn result")
    }
  }

  test("growing IVF index probes under concurrent optimizeIndex: vectors and centroids pair within one generation") {
    val path = s"${tmpDir("gen_chaos_ivf")}/idx"
    val corpus = Embedding.embedDocuments(
      (1L to 120L).map(i => (i, s"tok${i % 11} alpha tok${i % 5}")).toDF("doc_id", "text"),
      "doc_id", "text", dim = 4)
      .select(col("doc_id").as("n_id"), col("embedding").as("n_vec"))
    val cents = Seq(0 -> Array(1.0, 0.0, 0.0, 0.0), 1 -> Array(0.0, 1.0, 0.0, 0.0))
    StreamingRetrieval.bootstrapIndex(Similarity.ivfAssign(corpus, "n_vec", cents), cents, path)

    // an unleased reader resolves the pointer ONCE and reads vectors and
    // meta at that generation — the marker commits them together, so the
    // invariants below hold for ANY committed generation: the full vector
    // set is present, and every assigned cell has its centroid
    def probe(): (Long, Boolean) = {
      val gen = Generations.currentOrFail(spark, path)
      val vecs = spark.read.parquet(Generations.dir(path, "vectors", gen))
      val meta = spark.read.parquet(Generations.dir(path, "meta", gen))
      val centCells = meta.select("cell").as[Int].collect().toSet
      val vecCells = vecs.select("__cell").distinct().as[Int].collect().toSet
      (vecs.count(), vecCells.subsetOf(centCells))
    }

    val (seen, n) = race(probe) {
      (1 to 3).foreach(_ => StreamingRetrieval.optimizeIndex(spark, path, k = 3, maxIter = 2))
    }
    assert(n >= 2)
    seen.zipWithIndex.foreach { case ((count, paired), i) =>
      assert(count == 120L, s"probe $i saw a partial vectors dir: $count rows")
      assert(paired, s"probe $i paired vectors with another generation's centroids")
    }
  }
}
