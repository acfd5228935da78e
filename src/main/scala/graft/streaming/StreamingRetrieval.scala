package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.{Embedding, Similarity}

/** Continuous retrieval: a document stream is embedded through the
  * `EmbeddingClient` seam and probed against a STATIC pre-assigned IVF
  * index, landing per-document top-k matches as they arrive — the
  * streaming form of the reference's parse → embed → index → query flow
  * (sources/unstructured_data/__init__.py:19-103), i.e. "match every new
  * crawl document against the curated corpus online".
  *
  * Per micro-batch the work is O(batch): the embed kernel is a narrow
  * mapPartitions over the batch, cell probing broadcasts only the batch's
  * (tiny) query side into an equi join against the index cells, and the
  * reduction is the map-side-bounded BoundedTopK. The index is assigned
  * ONCE by the caller (`Similarity.ivfAssign`, checkpointed/persisted) —
  * no per-batch index recompute, which is what lets a 100 TB corpus serve
  * an indefinite stream. foreachBatch + append sink: re-delivered batches
  * under the streaming checkpoint rewrite the same deterministic rows.
  *
  * Results are per-query deterministic and independent of micro-batch
  * boundaries: each query row's top-k depends only on the static index,
  * so any arrival-order/batching replays to the same landed set.
  */
object StreamingRetrieval {

  def start(
      docs: DataFrame, // streaming (idCol, textCol)
      assignedIndex: DataFrame, // static ivfAssign output: (n_id, n_vec, __cell)
      idCol: String,
      textCol: String,
      centroids: Seq[(Int, Array[Double])],
      dim: Int,
      nProbe: Int,
      k: Int,
      outPath: String,
      checkpoint: String,
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val queries = Embedding.embedDocuments(batch, idCol, textCol, dim)
          .filter(col("embedding").isNotNull)
          .select(col(idCol).as("q_id"), col("embedding").as("q_vec"))
        Similarity.ivfTopKPreAssigned(assignedIndex, queries,
          "n_id", "n_vec", "q_id", "q_vec", centroids, nProbe, k)
          .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
