package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured extraction from unstructured documents: the model-client
  * seam for "ask an LLM a set of questions about each document and get a
  * typed column per answer".
  *
  * Mirrors the reference's unstructured-data flow
  * (sources/unstructured_data/helpers.py:20-91: per file, a dict of
  * field -> query answered by an index/model, returned as a structured
  * record) re-expressed for Spark scale: the extractor is a Serializable
  * strategy invoked from a `mapPartitions` batch kernel, so a production
  * impl holds an HTTP/gRPC client per partition (open/close lifecycle),
  * batches `batchSize` docs per request, and the answers land as columns
  * — no driver round trips, no per-row connections, blobs/texts never
  * shuffled. This container has no egress, so the shipped impl is a
  * deterministic rule-based client (`CannedExtractor`); swapping in a
  * real endpoint is implementing one method.
  */
object Extraction {

  final case class ExtractDoc(id: Long, content: String)

  /** The model-client seam. `extract` answers every query for a BATCH of
    * documents — one result map per input doc, aligned by position — so
    * an implementation can amortize a remote call over the batch.
    * `open`/`close` run once per partition around the batches: connection
    * setup/teardown lives there, never per row.
    */
  trait DocFeatureExtractor extends Serializable {
    def open(): Unit = ()
    def extract(docs: Seq[ExtractDoc], queries: Map[String, String]): Seq[Map[String, String]]
    def close(): Unit = ()
  }

  /** Deterministic stand-in for a model client (no egress in this
    * container): answers each question from the document text with a
    * fixed rule keyed by the question. Deterministic and SQL-replicable,
    * so the whole mapPartitions plumbing — id alignment, batching,
    * schema — hard-gates against the DuckDB oracle.
    */
  object CannedExtractor extends DocFeatureExtractor {
    def extract(docs: Seq[ExtractDoc], queries: Map[String, String]): Seq[Map[String, String]] =
      docs.map { d =>
        queries.map { case (field, q) =>
          val ans =
            if (q.contains("summar")) d.content.split(" ").take(5).mkString(" ")
            else if (q.contains("count")) d.content.split(" ").count(_.nonEmpty).toString
            else d.content.take(24)
          field -> ans
        }
      }
  }

  /** Extraction stage: (id, text) rows → (id, one string column per
    * query field, fields in sorted order). Batches `batchSize` docs per
    * extractor call inside each partition; the extractor opens once per
    * partition and closes when the partition drains.
    */
  def extractStructured(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queries: Map[String, String],
      extractor: DocFeatureExtractor = CannedExtractor,
      batchSize: Int = 32,
  ): DataFrame = {
    val fields = queries.keys.toSeq.sorted
    val schema = StructType(
      StructField(idCol, LongType) +: fields.map(f => StructField(f, StringType)))
    df.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { it: Iterator[Row] =>
        extractor.open()
        // a limit/take downstream can drop the iterator before it drains —
        // the task-completion hook guarantees the client still closes
        val closeOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
        def closeClient(): Unit = if (closeOnce.compareAndSet(false, true)) extractor.close()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeClient()))
        val rows = it.grouped(batchSize).flatMap { batch =>
          // null documents never reach the extractor: they yield all-null
          // answer columns (a corpus-scale batch must not die on one bad
          // row — same contract as decodeAny's quarantine)
          val (nullDocs, realDocs) = batch.partition(_.isNullAt(1))
          val docs = realDocs.map(r => ExtractDoc(r.getLong(0), r.getString(1)))
          val answers = if (docs.isEmpty) Nil else extractor.extract(docs, queries)
          require(answers.length == docs.length,
            s"extractor returned ${answers.length} results for ${docs.length} docs")
          docs.lazyZip(answers).map { (d, m) =>
            Row.fromSeq(d.id +: fields.map(f => m.getOrElse(f, null)))
          } ++ nullDocs.map(r => Row.fromSeq(r.getLong(0) +: fields.map(_ => null)))
        }
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = rows.hasNext
            if (!h) closeClient()
            h
          }
          def next(): Row = rows.next()
        }
      }(Encoders.row(schema))
  }
}
