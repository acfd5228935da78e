package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.{LanguageModel, TextAnalysis}

/** Continuous quality gating: a document stream is filtered per
  * micro-batch by the Gopher heuristic gate and a STATIC perplexity LM
  * (trained ONCE on a trusted reference slice, its count tables eagerly
  * checkpointed and broadcast into every batch) — the streaming form of
  * the batch curation DAG's first two stages, i.e. "quality-gate the
  * crawl as it lands" (reference analog: the quality-scoring seams in
  * sources/unstructured_data that route documents before load).
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

  /** Gate one micro-batch: Gopher pass + perplexity keep, landed into
    * `outPath/batch_id=<id>/` as (id, text, bits, n_bigrams).
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
  ): Unit = {
    val gated = TextAnalysis.gopherFilter(batch, textCol)
      .filter(col("pass") === 1)
      .select(col(idCol), col(textCol))
    val scored = LanguageModel.perplexityBits(gated, idCol, textCol, lm)
      .filter(LanguageModel.keptFlag(bitsNum, bitsDen) === 1L)
    gated.join(scored, Seq(idCol))
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
  ): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, batchId, lm, idCol, textCol, bitsNum, bitsDen, outPath)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
