package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.{Classifier, LanguageModel, TextAnalysis}

/** Streaming quality gate: multi-batch streaming run lands exactly the
  * batch composition's accepted set; per-batch landing is idempotent.
  */
class StreamingQualityGateSpec extends SparkTestBase {
  import spark.implicits._

  // docs that pass the Gopher gate need >= 50 words, mean word length in
  // [3, 10], >= 2 canonical stopwords, >= 80% alphabetic words
  private def goodText(seed: Int): String =
    (0 until 60).map(i => Seq("the", "and", "have", "with", s"word${(seed + i) % 7}")(i % 5))
      .mkString(" ")

  private val docs = (
    (0L until 40L).map(i => (i, goodText(i.toInt))) ++
      Seq((100L, "too short"), (101L, "x y z w v u t s r q p o n m l k j i h g"))
  ).toSeq

  test("streaming gate over multiple micro-batches == batch gopher+perplexity composition") {
    val dir = tmpDir("graft_squal")
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    // several input files -> several micro-batches with maxFilesPerTrigger
    docs.grouped(11).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    }
    val lm = LanguageModel.trainBigramLm(
      docs.toDF("doc_id", "text").filter(col("doc_id") % 3 === 0), "text")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = StreamingQualityGate.start(stream, lm, "doc_id", "text", out, ckpt,
      bitsNum = 6L, bitsDen = 1L)
    q.processAllAvailable(); q.stop()

    val landed = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    val batchDf = docs.toDF("doc_id", "text")
    val expected = LanguageModel.perplexityFilter(
      TextAnalysis.gopherFilter(batchDf, "text").filter(col("pass") === 1)
        .select("doc_id", "text"),
      "doc_id", "text", lm, bitsNum = 6L)
      .select("doc_id").as[Long].collect().toSet
    assert(landed == expected)
    assert(landed.nonEmpty && !landed.contains(100L) && !landed.contains(101L))
    // multiple batch partitions actually ran (the equality is not vacuous)
    assert(spark.read.parquet(out).select("batch_id").distinct().count() > 1)
  }

  test("NB-margin stage: streamed landing == batch gopher+LM+classifier, any batching") {
    val dir = tmpDir("graft_squal_nb")
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    // give the classes real signal: even docs carry "alpha" markers,
    // odd docs "beta", and labels follow parity — so the margin cut
    // genuinely splits the corpus instead of riding a prior tie
    val nbDocs = docs.map { case (id, t) =>
      (id, t + " " + Seq.fill(6)(if (id % 2 == 0) "alpha" else "beta").mkString(" "))
    }
    nbDocs.grouped(7).foreach { chunk =>
      chunk.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    }
    val batchDf = nbDocs.toDF("doc_id", "text")
    val lm = LanguageModel.trainBigramLm(batchDf.filter(col("doc_id") % 3 === 0), "text")
    val nb = Classifier.trainNb(
      batchDf.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("text"),
          (col("doc_id") % 2).cast("long").as("y")), "text", "y")
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingQualityGate.start(stream, lm, "doc_id", "text", out, ckpt,
      bitsNum = 6L, bitsDen = 1L, nb = Some(nb), nbMarginBits = 0L)
    q.processAllAvailable(); q.stop()

    val landed = spark.read.parquet(out)
      .select("doc_id", "bits0", "bits1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lmKept = LanguageModel.perplexityFilter(
      TextAnalysis.gopherFilter(batchDf, "text").filter(col("pass") === 1)
        .select("doc_id", "text"),
      "doc_id", "text", lm, bitsNum = 6L)
    val expected = Classifier.classifyNb(lmKept, "doc_id", "text", nb)
      .filter(col("bits0") - col("bits1") >= 0L)
      .select("doc_id", "bits0", "bits1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(landed == expected)
    assert(landed.nonEmpty, "the margin cut must keep something")
    assert(landed.size < lmKept.count(), "the margin cut must drop something")
  }

  test("landBatch is idempotent: re-delivering a batch rewrites its partition") {
    val dir = tmpDir("graft_squal_idem")
    val lm = LanguageModel.trainBigramLm(Seq(goodText(0)).toDF("text"), "text")
    val batch = docs.take(10).toDF("doc_id", "text")
    StreamingQualityGate.landBatch(batch, 7L, lm, "doc_id", "text", 99L, 1L, s"$dir/out")
    val once = spark.read.parquet(s"$dir/out").count()
    StreamingQualityGate.landBatch(batch, 7L, lm, "doc_id", "text", 99L, 1L, s"$dir/out")
    assert(spark.read.parquet(s"$dir/out").count() == once)
  }
}
