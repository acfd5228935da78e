package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Dedup

/** Continuous substring dedup: the landed stream result equals the batch
  * span-removal over the whole corpus when ids arrive in order, and
  * later waves lose spans already published by earlier ones.
  */
class StreamingSpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "x y z a b c d e w v"),      // shares a 5-token run with doc 1
    (3L, "p q r s t u p q r s t u"),  // self-repeat
    (10L, "a b c d e f g h"),         // exact copy of doc 1, later wave
    (11L, "fresh words only here now"),
  )

  test("streamed waves land exactly the batch span-removal result") {
    val dir = tmpDir("graft_sspan")
    // two waves as separate files, ascending ids
    docs.filter(_._1 < 10).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    docs.filter(_._1 >= 10).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = StreamingSpanDedup.start(stream, "doc_id", "text", k = 5,
      s"$dir/out", s"$dir/idx", s"$dir/ckpt")
    q.processAllAvailable(); q.stop()

    val landed = spark.read.parquet(s"$dir/out")
      .select("doc_id", "text", "n_words", "n_kept")
      .collect().map(_.toString).sorted.toSeq
    val batch = Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", k = 5, hashKeys = true)
      .collect().map(_.toString).sorted.toSeq
    assert(landed == batch)
    // the copy in wave 2 lost everything; the fresh doc survived whole
    val byId = spark.read.parquet(s"$dir/out")
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toMap
    assert(byId(10L) == 0L && byId(11L) == 5L)
  }

  test("re-delivered batch replays bit-identically: results AND index unchanged") {
    val dir = tmpDir("graft_sspan_idem")
    val w0 = docs.take(3).toDF("doc_id", "text")
    StreamingSpanDedup.landBatch(w0, 0L, "doc_id", "text", 5, s"$dir/out", s"$dir/idx")
    val once = spark.read.parquet(s"$dir/out").collect().map(_.toString).sorted.toSeq
    val idxOnce = spark.read.parquet(StreamingSpanDedup.subDir(spark, s"$dir/idx")).collect().map(_.toString).sorted.toSeq
    // crash-and-replay: the batch re-runs with its own delta already landed
    StreamingSpanDedup.landBatch(w0, 0L, "doc_id", "text", 5, s"$dir/out", s"$dir/idx")
    assert(spark.read.parquet(s"$dir/out").collect().map(_.toString).sorted.toSeq == once)
    assert(spark.read.parquet(StreamingSpanDedup.subDir(spark, s"$dir/idx")).collect().map(_.toString).sorted.toSeq == idxOnce)
  }

  private def landWaves(dir: String, maintain: Long => Unit): Seq[String] = {
    val waves = Seq(
      Seq((1L, "a b c d e f g h"), (2L, "x y z a b c d e w v")),
      Seq((3L, "p q r s t u p q r s t u"), (4L, "a b c d e only once more")),
      Seq((10L, "a b c d e f g h"), (11L, "fresh words only here now")),
      Seq((12L, "x y z a b c d e tail bits")))
    waves.zipWithIndex.foreach { case (w, i) =>
      StreamingSpanDedup.landBatch(w.toDF("doc_id", "text"), i.toLong,
        "doc_id", "text", 5, s"$dir/out", s"$dir/idx")
      maintain(i.toLong)
    }
    spark.read.parquet(s"$dir/out")
      .select("doc_id", "text", "n_words", "n_kept")
      .collect().map(_.toString).sorted.toSeq
  }

  test("optimizeIndex merges committed gram deltas; later batches land identically") {
    val dir = tmpDir("graft_sspan_opt")
    val plain = landWaves(s"$dir/plain", _ => ())
    // optimize after every committed batch: merge everything below it
    val opt = landWaves(s"$dir/opt", { i =>
      StreamingSpanDedup.optimizeIndex(spark, s"$dir/opt/idx", upToBatch = i + 1)
    })
    assert(opt == plain)
    // gram MEMBERSHIP is preserved while cross-batch duplicates collapse
    val plainGrams = spark.read.parquet(StreamingSpanDedup.subDir(spark, s"$dir/plain/idx"))
      .select("__g").distinct().as[Long].collect().toSet
    val optIdx = spark.read.parquet(StreamingSpanDedup.subDir(spark, s"$dir/opt/idx"))
    assert(optIdx.select("__g").distinct().as[Long].collect().toSet == plainGrams)
    assert(optIdx.count() == plainGrams.size.toLong) // fully deduped
    assert(optIdx.select("batch_id").distinct().as[Long].collect().toSeq == Seq(-1L))
  }

  test("compactPartitioned on the gram index: fewer files, identical later batches") {
    val dir = tmpDir("graft_sspan_compact")
    val plain = landWaves(s"$dir/plain", _ => ())
    val compacted = landWaves(s"$dir/cpt", { i =>
      // tiny threshold so the per-batch part files qualify as small
      graft.core.TableMaintenance.compactPartitioned(spark, s"$dir/cpt/idx",
        targetBytes = 1L << 20, minFileBytes = 1L << 20)
      ()
    })
    assert(compacted == plain)
    assert(spark.read.parquet(StreamingSpanDedup.subDir(spark, s"$dir/cpt/idx")).collect().map(_.toString).sorted.toSeq ==
      spark.read.parquet(StreamingSpanDedup.subDir(spark, s"$dir/plain/idx")).collect().map(_.toString).sorted.toSeq)
  }

  test("gram-index lease excludes a concurrent optimize") {
    val dir = tmpDir("graft_sspan_lock")
    StreamingSpanDedup.landBatch(docs.take(2).toDF("doc_id", "text"), 0L,
      "doc_id", "text", 5, s"$dir/out", s"$dir/idx")
    val lease = graft.core.TableLock.acquire(spark, s"$dir/idx", owner = "spec-holder")
    try intercept[graft.core.TableLock.LockHeldException] {
      StreamingSpanDedup.optimizeIndex(spark, s"$dir/idx", upToBatch = 1L)
    } finally lease.release()
    StreamingSpanDedup.optimizeIndex(spark, s"$dir/idx", upToBatch = 1L)
    assert(spark.read.parquet(StreamingSpanDedup.subDir(spark, s"$dir/idx"))
      .select("batch_id").distinct().as[Long].collect().toSeq == Seq(-1L))
  }
}
