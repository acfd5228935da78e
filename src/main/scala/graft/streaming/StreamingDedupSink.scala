package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Dedup

/** Continuously-deduplicating corpus sink: each micro-batch runs the full
  * incremental-dedup cycle against the PERSISTED corpus + LSH index
  * (`Dedup.incrementalDedup`) — drop docs near-duplicating the published
  * corpus, collapse batch-internal duplicates, append the survivors to the
  * corpus table and their band rows to the index table. Work per batch is
  * O(batch) signatures + one broadcast pass over the index, never a
  * corpus recompute: the property that lets a crawl stream dedup into a
  * 100 TB corpus indefinitely.
  *
  * First batch bootstraps both tables. foreachBatch gives exactly-once
  * table updates under the streaming checkpoint (re-delivered batches
  * re-run the same idempotent cycle: their docs now match the corpus and
  * drop out).
  */
object StreamingDedupSink {

  def start(
      stream: DataFrame,
      corpusPath: String,
      indexPath: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      numHashes: Int = 4,
      rowsPerBand: Int = 2,
      threshold: Double = 0.9,
      maxBucketSize: Int = 1000,
      availableNow: Boolean = true,
      triggerIntervalMs: Long = 10000,
  ): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val fs = new org.apache.hadoop.fs.Path(corpusPath)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          def hasData(path: String): Boolean = {
            val p = new org.apache.hadoop.fs.Path(path)
            fs.exists(p) && fs.listStatus(p).exists(st =>
              st.isFile && st.getPath.getName.endsWith(".parquet"))
          }
          val bootstrapped = hasData(corpusPath)
          // crash-heal: a death between the corpus append and the index
          // append leaves corpus rows with no band rows — every restart
          // would then fail reading the absent/short index, or worse let
          // re-sent dups through. Rebuild the index FROM the corpus (the
          // corpus is the source of truth; O(corpus) but only ever paid
          // on this recovery path) before taking the incremental branch.
          if (bootstrapped && !hasData(indexPath))
            Dedup.lshIndexRows(s.read.parquet(corpusPath), idCol, textCol,
              numHashes, rowsPerBand)
              .write.mode(SaveMode.Overwrite).parquet(indexPath)
          else if (bootstrapped) {
            // same crash one batch later: corpus append committed, index
            // delta didn't. Detect by row count (parquet footer metadata —
            // no data scan) and re-index only the missing docs. UNDER-count
            // only: duplicate index rows (re-run after both appends) are
            // semantically harmless — candidates go through distinct().
            val numBands = numHashes / rowsPerBand
            val corpusCount = s.read.parquet(corpusPath).count()
            val indexCount = s.read.parquet(indexPath).count()
            if (indexCount < corpusCount * numBands) {
              val missing = s.read.parquet(corpusPath).join(
                s.read.parquet(indexPath).select(org.apache.spark.sql.functions.col("id").as(idCol)).distinct(),
                Seq(idCol), "left_anti")
              Dedup.lshIndexRows(missing, idCol, textCol, numHashes, rowsPerBand)
                .write.mode(SaveMode.Append).parquet(indexPath)
            }
          }
          // the batch feeds two jobs (vs-corpus probe + internal dedup) —
          // pin it so the streaming source isn't re-pulled per job
          val pinned = batch.localCheckpoint(true)
          val survivors =
            if (bootstrapped) {
              val corpus = s.read.parquet(corpusPath)
              val index = s.read.parquet(indexPath)
              Dedup.incrementalDedup(pinned, corpus, index, idCol, textCol,
                numHashes, rowsPerBand, threshold, maxBucketSize)._1
            } else {
              // bootstrap: the first batch only dedups against itself
              val inner = Dedup.nearDupPairs(pinned, idCol, textCol,
                numHashes, rowsPerBand, threshold, maxBucketSize)
              Dedup.dedupByClusters(pinned, idCol, Dedup.clusterPairs(inner))
            }
          // pin the survivor set so the corpus append and the index-delta
          // append land the SAME rows; append survivors first — a crash
          // between the appends leaves docs un-indexed (re-sent dups could
          // slip in once) rather than index rows pointing at absent docs
          // (verification would silently drop those matches forever)
          val pinnedSurv = survivors.localCheckpoint(true)
          pinnedSurv.write.mode(SaveMode.Append).parquet(corpusPath)
          Dedup.lshIndexRows(pinnedSurv, idCol, textCol, numHashes, rowsPerBand)
            .write.mode(SaveMode.Append).parquet(indexPath)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime(triggerIntervalMs)))
      .start()
  }
}
