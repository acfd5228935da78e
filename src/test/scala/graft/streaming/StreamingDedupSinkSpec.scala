package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def corpusIds(path: String): Set[Long] =
    spark.read.parquet(path).select("doc_id").as[Long].collect().toSet

  test("stream dedups each micro-batch against the growing corpus+index across restarts") {
    implicit val sq = spark.sqlContext
    val root = tmpDir("sdedup")
    val (corpusPath, indexPath, ckpt) = (s"$root/corpus", s"$root/index", s"$root/ckpt")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    // wave 1 bootstraps: batch-internal dup collapses
    input.addData((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"))
    val q1 = StreamingDedupSink.start(stream, corpusPath, indexPath,
      "doc_id", "text", ckpt, threshold = 0.9)
    q1.processAllAvailable(); q1.stop()
    assert(corpusIds(corpusPath) == Set(1L, 3L))

    // wave 2 through a RESTARTED query (same checkpoint): corpus dup
    // dropped, fresh doc kept, batch-internal dup collapsed
    input.addData((10L, "a b c d"), (11L, "p q r s"), (12L, "p q r s"))
    val q2 = StreamingDedupSink.start(stream, corpusPath, indexPath,
      "doc_id", "text", ckpt, threshold = 0.9)
    q2.processAllAvailable(); q2.stop()
    assert(corpusIds(corpusPath) == Set(1L, 3L, 11L))

    // wave 3: a re-send of wave-2 content is now a corpus dup
    input.addData((20L, "p q r s"))
    val q3 = StreamingDedupSink.start(stream, corpusPath, indexPath,
      "doc_id", "text", ckpt, threshold = 0.9)
    q3.processAllAvailable(); q3.stop()
    assert(corpusIds(corpusPath) == Set(1L, 3L, 11L))

    // index rows track exactly the surviving docs
    val indexIds = spark.read.parquet(indexPath).select("id").as[Long].collect().toSet
    assert(indexIds == Set(1L, 3L, 11L))
  }

  test("a lost index is rebuilt from the corpus before the next batch dedups") {
    implicit val sq = spark.sqlContext
    val root = tmpDir("sdedup_heal")
    val (corpusPath, indexPath, ckpt) = (s"$root/corpus", s"$root/index", s"$root/ckpt")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    input.addData((1L, "a b c d"), (2L, "x y z w"))
    val q1 = StreamingDedupSink.start(stream, corpusPath, indexPath,
      "doc_id", "text", ckpt, threshold = 0.9)
    q1.processAllAvailable(); q1.stop()

    // simulate a crash that landed the corpus but never the index
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(indexPath), true)

    // next batch: a dup of corpus doc 1 must STILL be caught (index
    // rebuilt from the corpus), fresh doc kept
    input.addData((10L, "a b c d"), (11L, "p q r s"))
    val q2 = StreamingDedupSink.start(stream, corpusPath, indexPath,
      "doc_id", "text", ckpt, threshold = 0.9)
    q2.processAllAvailable(); q2.stop()
    assert(corpusIds(corpusPath) == Set(1L, 2L, 11L))
    val indexIds = spark.read.parquet(indexPath).select("id").as[Long].collect().toSet
    assert(indexIds == Set(1L, 2L, 11L))
  }
}
