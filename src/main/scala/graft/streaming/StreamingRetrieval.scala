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
  * mapPartitions over the batch, cell probing joins the batch's query
  * side into an equi join against the index cells — broadcast while the
  * batch is small, degrading to a shuffled hash join above
  * `broadcastRowCap` rows (a backlogged stream's first trigger can carry
  * the whole backlog; same count-gate discipline as the incremental
  * dedup path) — and the reduction is the map-side-bounded BoundedTopK.
  * The index is assigned ONCE by the caller (`Similarity.ivfAssign`,
  * checkpointed/persisted) — no per-batch index recompute, which is what
  * lets a 100 TB corpus serve an indefinite stream.
  *
  * Exactly-once landing: each micro-batch writes to its own
  * `batch_id=N` partition with dynamic partition overwrite, so a batch
  * re-delivered after a failure between the write and the streaming
  * checkpoint commit OVERWRITES its own partition instead of appending a
  * duplicate copy. Results are per-query deterministic and independent
  * of micro-batch boundaries: each query row's top-k depends only on the
  * static index, so any arrival-order/batching replays to the same
  * landed set.
  */
object StreamingRetrieval {

  /** Land one micro-batch of documents into `outPath/batch_id=<id>/`.
    * Idempotent per batchId: a replay overwrites its own partition
    * (dynamic partition overwrite — untouched batch partitions survive).
    */
  def landBatch(
      batch: DataFrame,
      batchId: Long,
      assignedIndex: DataFrame,
      idCol: String,
      textCol: String,
      centroids: Seq[(Int, Array[Double])],
      dim: Int,
      nProbe: Int,
      k: Int,
      outPath: String,
      broadcastRowCap: Long = 4000000L,
  ): Unit = {
    // localCheckpoint: the embed kernel runs once; both the count-gate
    // and the probe join read the materialized batch.
    val queries = Embedding.embedDocuments(batch, idCol, textCol, dim)
      .filter(col("embedding").isNotNull)
      .select(col(idCol).as("q_id"), col("embedding").as("q_vec"))
      .localCheckpoint(true)
    Similarity.ivfTopKPreAssigned(assignedIndex, queries,
      "n_id", "n_vec", "q_id", "q_vec", centroids, nProbe, k,
      broadcastQueries = queries.count() <= broadcastRowCap)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outPath)
  }

  /** Bootstrap a GROWING index table: the base corpus's `ivfAssign`
    * output lands as the `batch_id=-1` seed partition; each later stream
    * batch appends its own delta partition (`landAndIndexBatch`).
    */
  def bootstrapIndex(assigned: DataFrame, indexPath: String): Unit =
    assigned.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("batch_id").parquet(indexPath)

  /** One micro-batch of the crawl → probe → index loop (the reference's
    * unstructured_data ingest-then-query flow made continuous): embed the
    * batch, probe the index AS OF PRIOR BATCHES (strictly `batch_id <
    * batchId` — probe-then-append, so results are a deterministic
    * function of batch membership), land per-doc top-k, then append the
    * batch's own assigned vectors as the index's `batch_id=<id>` delta
    * partition. Later batches retrieve THIS batch's documents.
    *
    * Both writes are dynamic-partition overwrites keyed by batchId, so a
    * re-delivered batch rewrites its results AND its index delta in
    * place — no duplicate result rows, no duplicate index entries — and
    * the `batch_id < batchId` probe filter keeps the replay's probe
    * space identical even when the crashed attempt had already landed
    * its delta. Per-batch work is O(batch): the index grows but is only
    * ever equi-joined on cell (partition-pruned parquet scan), never
    * recomputed.
    */
  def landAndIndexBatch(
      batch: DataFrame,
      batchId: Long,
      indexPath: String,
      idCol: String,
      textCol: String,
      centroids: Seq[(Int, Array[Double])],
      dim: Int,
      nProbe: Int,
      k: Int,
      outPath: String,
      broadcastRowCap: Long = 4000000L,
  ): Unit = {
    val s = batch.sparkSession
    val emb = Embedding.embedDocuments(batch, idCol, textCol, dim)
      .filter(col("embedding").isNotNull)
      .localCheckpoint(true)
    val queries = emb.select(col(idCol).as("q_id"), col("embedding").as("q_vec"))
    val index = s.read.parquet(indexPath)
      .filter(col("batch_id") < batchId)
      .select("n_id", "n_vec", "__cell")
    Similarity.ivfTopKPreAssigned(index, queries,
      "n_id", "n_vec", "q_id", "q_vec", centroids, nProbe, k,
      broadcastQueries = queries.count() <= broadcastRowCap)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outPath)
    Similarity.ivfAssign(
      emb.select(col(idCol).as("n_id"), col("embedding").as("n_vec")), "n_vec", centroids)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(indexPath)
  }

  /** Index OPTIMIZE — the IVF lifecycle's third verb next to bootstrap
    * and per-batch append, mirroring `Lexical.Index.optimize` and the
    * z-order table pass: re-train centroids on the CURRENT contents
    * (deterministic k-means: id-ordered init, fixed iterations),
    * re-assign every vector, and compact all delta partitions into one
    * fresh `batch_id=-1` seed via the staged swap. Run it when stream
    * growth has drifted the cell balance (hot cells degrade probe
    * pruning exactly like an unbalanced LSH bucket); after it, probes
    * scan one balanced partition set and the next stream batch appends
    * from `batch_id=0` semantics again. Returns the new centroids —
    * the caller must probe with THESE from now on.
    */
  def optimizeIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      k: Int,
      maxIter: Int = 5,
  ): Seq[(Int, Array[Double])] = {
    val all = spark.read.parquet(indexPath).select("n_id", "n_vec")
      .localCheckpoint(true) // read fully BEFORE the swap overwrites the dir
    val cents = Similarity.kmeansCentroids(all, "n_id", "n_vec", k, maxIter)
    val reassigned = Similarity.ivfAssign(all, "n_vec", cents)
      .withColumn("batch_id", lit(-1L))
    graft.core.TableWriter.stagedOverwriteWith(
      spark, reassigned.write.partitionBy("batch_id"), indexPath)
    cents
  }

  /** Continuous retrieval over a GROWING index: each micro-batch probes
    * the corpus plus every earlier stream batch, then joins the index
    * itself. `bootstrapIndex` must have seeded `indexPath`.
    */
  def startIndexed(
      docs: DataFrame, // streaming (idCol, textCol)
      indexPath: String, // bootstrapped growing index table
      idCol: String,
      textCol: String,
      centroids: Seq[(Int, Array[Double])],
      dim: Int,
      nProbe: Int,
      k: Int,
      outPath: String,
      checkpoint: String,
      broadcastRowCap: Long = 4000000L,
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landAndIndexBatch(batch, batchId, indexPath, idCol, textCol, centroids,
          dim, nProbe, k, outPath, broadcastRowCap)
      }
      .start()

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
      broadcastRowCap: Long = 4000000L,
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, batchId, assignedIndex, idCol, textCol, centroids,
          dim, nProbe, k, outPath, broadcastRowCap)
      }
      .start()
}
