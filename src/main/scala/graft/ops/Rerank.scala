package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second-stage reranking: the cross-encoder seam of a two-stage
  * retrieval pipeline (cheap index recall → expensive pairwise scoring of
  * the short candidate list). The reference's vectorstore query flow
  * (sources/unstructured_data/helpers.py:73-91) stops at index ranking;
  * production retrieval and training-data curation both add this stage,
  * and at 100 TB it is exactly where a per-pair model call is affordable:
  * the candidate set is already bounded to k₁ × queries rows, so the
  * kernel cost never scales with the corpus.
  *
  * Same seam contract as `Embedding.EmbeddingClient` /
  * `Extraction.DocFeatureExtractor`: a Serializable strategy invoked from
  * a `mapPartitions` batch kernel — open/close once per partition,
  * `batchSize` pairs per call, null texts quarantined (null score) rather
  * than killing the job. The shipped client is deterministic token-set
  * Jaccard — integer intersection/union counts whose ratio and ordering
  * replay bit-for-bit in a SQL oracle; a real cross-encoder endpoint
  * swaps in by implementing one method.
  */
object Rerank {

  final case class ScorePair(queryText: String, candText: String)

  /** The pairwise-scorer seam. `score` returns one score per input pair,
    * aligned by position, so an implementation can batch a remote model
    * call. Higher = more relevant.
    */
  trait RerankClient extends Serializable {
    def open(): Unit = ()
    def score(pairs: Seq[ScorePair]): Seq[Double]
    def close(): Unit = ()
  }

  /** Deterministic stand-in for a cross-encoder (no egress in this
    * container): token-set Jaccard similarity. |A∩B| and |A∪B| are exact
    * integers, so the double ratio — and every rank comparison downstream
    * — is bit-identical to the DuckDB replay. Empty-token-set pairs score
    * 0.0 (Jaccard's 0/0 convention here: nothing shared).
    */
  object JaccardScorer extends RerankClient {
    def score(pairs: Seq[ScorePair]): Seq[Double] = pairs.map { p =>
      // split(" ", -1) keeps trailing empties — DuckDB string_split parity
      val a: Set[String] = p.queryText.split(" ", -1).toSet
      val b: Set[String] = p.candText.split(" ", -1).toSet
      val union = a.union(b).size
      if (union == 0) 0.0 else a.intersect(b).size.toDouble / union
    }
  }

  /** Rerank a bounded candidate list: rows of (query id, query text,
    * candidate id, candidate text) → per-query top `k` by client score
    * (ties by candidate id asc). The scoring pass is one narrow
    * mapPartitions over the candidate rows — no shuffle added beyond the
    * final BoundedTopK reduction, which ships at most k rows per (query,
    * map task). Rows where either text is null skip the client and score
    * null — excluded from the ranking, never fatal.
    */
  def rerankTopK(
      candidates: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      candIdCol: String,
      candTextCol: String,
      k: Int,
      client: RerankClient = JaccardScorer,
      batchSize: Int = 64,
  ): DataFrame = {
    val schema = StructType(Seq(
      StructField(queryIdCol, LongType),
      StructField(candIdCol, LongType),
      StructField("score", DoubleType, nullable = true)))
    val scored = candidates
      .select(col(queryIdCol).cast(LongType), col(candIdCol).cast(LongType),
        col(queryTextCol), col(candTextCol))
      .mapPartitions { it: Iterator[Row] =>
        client.open()
        val closeOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
        def closeClient(): Unit = if (closeOnce.compareAndSet(false, true)) client.close()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeClient()))
        val rows = it.grouped(batchSize).flatMap { batch =>
          val (nullTexts, real) = batch.partition(r => r.isNullAt(2) || r.isNullAt(3))
          val pairs = real.map(r => ScorePair(r.getString(2), r.getString(3)))
          val scores = if (pairs.isEmpty) Nil else client.score(pairs)
          require(scores.length == pairs.length,
            s"reranker returned ${scores.length} scores for ${pairs.length} pairs")
          real.lazyZip(scores).map { (r, s) => Row(r.getLong(0), r.getLong(1), s) } ++
            nullTexts.map(r => Row(r.getLong(0), r.getLong(1), null))
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
      .filter(col("score").isNotNull)
    scored
      .groupBy(col(queryIdCol))
      .agg(graft.functions.BoundedTopK.topK(col("score"), col(candIdCol), k).as("__top"))
      .select(col(queryIdCol), posexplode(col("__top")))
      .select(col(queryIdCol), (col("pos") + 1).cast("long").as("rank"),
        col("col.i").as(candIdCol), col("col.s").as("score"))
  }
}
