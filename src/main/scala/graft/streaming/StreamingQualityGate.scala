package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.{Classifier, LanguageModel, TextAnalysis}

/** Continuous quality gating: a document stream is filtered per
  * micro-batch by the Gopher heuristic gate, a STATIC perplexity LM
  * (trained ONCE on a trusted reference slice, its count tables eagerly
  * checkpointed and broadcast into every batch) and, optionally, a
  * static Naive-Bayes quality margin ([[Classifier]]) — the streaming
  * form of the batch curation DAG's model-gate stages, i.e.
  * "quality-gate the crawl as it lands" (reference analog: the
  * quality-scoring seams in sources/unstructured_data that route
  * documents before load).
  *
  * Per micro-batch the work is O(batch) and STATELESS: the Gopher flags
  * are one narrow codegen pass, LM scoring is explode + two count-gated
  * broadcast joins against the fixed model — no streaming state store,
  * no watermark, so any batching of the same documents lands the same
  * accepted set (batch-boundary independence, pinned by the contract
  * query's oracle being a pure batch computation).
  *
  * Idempotent landing, same discipline as [[StreamingRetrieval]]: each
  * batch writes its own `batch_id=N` partition with dynamic partition
  * overwrite, so a batch re-delivered after a failure between write and
  * checkpoint commit rewrites itself instead of duplicating.
  */
object StreamingQualityGate {

  /** Gate one micro-batch: Gopher pass + perplexity keep — and, when
    * `nb` is set, a third stage filtering on the static Naive-Bayes
    * quality margin (bits0 - bits1 >= nbMarginBits, [[Classifier]]) —
    * landed into `outPath/batch_id=<id>/` as (id, text, bits,
    * n_bigrams[, bits0, bits1]). The NB stage, like the LM, is a
    * per-doc STATELESS score against a fixed broadcast-gated cost
    * table, so batch-boundary independence is preserved.
    */
  def landBatch(
      batch: DataFrame,
      batchId: Long,
      lm: LanguageModel.BigramLm,
      idCol: String,
      textCol: String,
      bitsNum: Long,
      bitsDen: Long,
      outPath: String,
      nb: Option[Classifier.NbModel] = None,
      nbMarginBits: Long = 0L,
  ): Unit = {
    val gated = TextAnalysis.gopherFilter(batch, textCol)
      .filter(col("pass") === 1)
      .select(col(idCol), col(textCol))
    val scored = LanguageModel.perplexityBits(gated, idCol, textCol, lm)
      .filter(LanguageModel.keptFlag(bitsNum, bitsDen) === 1L)
    val lmKept = gated.join(scored, Seq(idCol))
    val result = nb match {
      case None => lmKept
      case Some(model) =>
        lmKept.join(
          Classifier.classifyNb(lmKept, idCol, textCol, model)
            .filter(col("bits0") - col("bits1") >= nbMarginBits)
            .select(col(idCol), col("bits0"), col("bits1")),
          Seq(idCol))
    }
    result
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outPath)
  }

  /** Start the gate on a streaming document frame. The LM is trained by
    * the caller (once, batch-side) and closed over — per-batch cost
    * never includes model training.
    */
  def start(
      docs: DataFrame,
      lm: LanguageModel.BigramLm,
      idCol: String,
      textCol: String,
      outPath: String,
      checkpoint: String,
      bitsNum: Long,
      bitsDen: Long = 1L,
      nb: Option[Classifier.NbModel] = None,
      nbMarginBits: Long = 0L,
  ): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, batchId, lm, idCol, textCol, bitsNum, bitsDen, outPath,
          nb, nbMarginBits)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
