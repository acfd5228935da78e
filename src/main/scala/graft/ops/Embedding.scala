package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text → embedding: the model-client seam that turns raw documents into
  * vectors inside the engine, making text → embed → ANN a single
  * end-to-end pipeline instead of assuming a pre-computed embeddings
  * table.
  *
  * Mirrors the reference's document-to-vectorstore flow
  * (sources/unstructured_data/helpers.py:20-91: files are parsed and fed
  * to an embedding index, queries then run against the vectors)
  * re-expressed for Spark scale: the embedder is a Serializable strategy
  * invoked from a `mapPartitions` batch kernel — a production impl holds
  * an HTTP/gRPC client per partition (open/close lifecycle) and batches
  * `batchSize` docs per request, so a 100 TB corpus embeds as a single
  * narrow map with no driver round trips and no per-row connections.
  * This container has no egress, so the shipped impl is a deterministic
  * hashed bag-of-words projector (`HashedBowEmbedder`), chosen to be
  * SQL-replicable so the whole kernel plumbing hard-gates against the
  * DuckDB oracle; swapping in a real model endpoint is implementing one
  * method — the same seam contract as `Extraction.DocFeatureExtractor`.
  */
object Embedding {

  final case class EmbedDoc(id: Long, text: String)

  /** The model-client seam. `embed` returns one vector per input doc,
    * aligned by position, so an implementation can amortize a remote
    * call over the batch. `open`/`close` run once per partition around
    * the batches: connection setup/teardown lives there, never per row.
    */
  trait EmbeddingClient extends Serializable {
    def open(): Unit = ()
    def embed(docs: Seq[EmbedDoc], dim: Int): Seq[Array[Double]]
    def close(): Unit = ()
  }

  /** Deterministic stand-in for an embedding model (no egress in this
    * container): signed hashed bag-of-words. Each token hashes (md5, low
    * 60 bits) to a dimension `(h / 2) mod dim` and a sign `h mod 2`; the
    * vector is the per-dimension signed count. Counts are exact integers,
    * so every arithmetic step — and therefore downstream cosine ranking —
    * is bit-reproducible in SQL, which is what lets the contract query
    * gate the kernel end-to-end. (Feature hashing itself is the standard
    * public "hashing trick"; the vectors are unnormalized because cosine
    * is scale-invariant and integer components keep the oracle exact.)
    */
  object HashedBowEmbedder extends EmbeddingClient {
    /** The value of `parseLong(md5hex(s).take(15), 16)`: the first 15 hex
      * chars are digest bytes 0-6 plus the high nibble of byte 7 —
      * extracted directly so the hot path never formats a hex string.
      * (The hex-string definition is the SQL-replicable contract:
      * DuckDB CAST('0x' || substr(md5(w), 1, 15) AS BIGINT).)
      */
    private def md5Low60(md: java.security.MessageDigest, s: String): Long = {
      val dig = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
      (h << 4) | ((dig(7) >> 4) & 0xfL)
    }

    def embed(docs: Seq[EmbedDoc], dim: Int): Seq[Array[Double]] = {
      // digest + token-hash cache are per-call: the singleton is shared
      // across executor threads, locals are not
      val md = java.security.MessageDigest.getInstance("MD5")
      val seen = new java.util.HashMap[String, java.lang.Long]()
      docs.map { d =>
        val v = new Array[Double](dim)
        // split(" ", -1) keeps trailing empties — DuckDB string_split parity
        d.text.split(" ", -1).foreach { w =>
          var boxed = seen.get(w)
          if (boxed == null) { boxed = java.lang.Long.valueOf(md5Low60(md, w)); seen.put(w, boxed) }
          val h = boxed.longValue()
          val idx = ((h >>> 1) % dim).toInt
          v(idx) += (if ((h & 1L) == 0L) 1.0 else -1.0)
        }
        v
      }
    }
  }

  /** Embedding stage: (id, text) rows → (id, embedding array<double>).
    * Batches `batchSize` docs per client call inside each partition; the
    * client opens once per partition and closes when the partition drains
    * (or is dropped early by a downstream limit — task-completion hook).
    * Null documents never reach the client: they yield a null embedding
    * instead of killing a corpus-scale batch.
    */
  def embedDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int,
      client: EmbeddingClient = HashedBowEmbedder,
      batchSize: Int = 64,
  ): DataFrame = {
    require(dim > 0, "dim must be positive")
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("embedding", ArrayType(DoubleType), nullable = true)))
    df.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { it: Iterator[Row] =>
        client.open()
        val closeOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
        def closeClient(): Unit = if (closeOnce.compareAndSet(false, true)) client.close()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeClient()))
        val rows = it.grouped(batchSize).flatMap { batch =>
          val (nullDocs, realDocs) = batch.partition(_.isNullAt(1))
          val docs = realDocs.map(r => EmbedDoc(r.getLong(0), r.getString(1)))
          val vecs = if (docs.isEmpty) Nil else client.embed(docs, dim)
          require(vecs.length == docs.length,
            s"embedder returned ${vecs.length} vectors for ${docs.length} docs")
          docs.lazyZip(vecs).map { (d, v) =>
            require(v.length == dim, s"embedder returned dim ${v.length}, expected $dim")
            Row(d.id, v.toSeq)
          } ++ nullDocs.map(r => Row(r.getLong(0), null))
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
