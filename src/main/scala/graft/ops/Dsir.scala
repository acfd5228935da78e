package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw-pool document by the hashed-n-gram
  * importance weight log(p_target/p_raw) of a small trusted target slice
  * versus the raw pool, and keep the top-weighted documents — the
  * pretraining-mix selection step that upgrades heuristic gates to
  * distribution matching. Reference analog: the sources' quality-routing
  * seams that score documents before load (sources/unstructured_data).
  *
  * Spark-first shape: both "models" are B-row bucket tables (B fixed,
  * e.g. 512–65536) built by one map-side-combined groupBy over each
  * slice's token stream, then broadcast — like the CMS/Bloom sketches,
  * the only structures that ship at constant size regardless of corpus
  * scale. Scoring is explode → bucket hash → two broadcast joins → one
  * keyed sum; selection is a TakeOrdered top-k, never a global window.
  *
  * Exactness: the same whole-bit quantization as [[LanguageModel]] —
  * with p(b) = (c(b)+1)/(N+B) add-one smoothed, cost(b) =
  * ceil(-log2 p(b)) computed as the bit length of m-1 for
  * m = ceil((N+B)/(c+1)), all integer. The importance weight is then
  * sum(bits_raw - bits_target) over the document's tokens (-bits ≈
  * log2 p, so higher = more target-like), and the whole pipeline —
  * bucket hash (md5), counts, quantization, ranking — replays
  * bit-for-bit in a SQL oracle.
  */
object Dsir {

  /** Hashed-unigram bucket: md5 is the cross-engine hash (DuckDB replays
    * `('0x' || substr(md5(t),1,15))::BIGINT % B`); 15 hex chars < 2^60
    * keep the value positive and exact in a long.
    */
  def bucketOf(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast("long"), lit(buckets.toLong))

  /** Dense (bucket, bits) cost table of a slice's hashed-unigram
    * distribution: one row for EVERY bucket 0..B-1 (unseen buckets get
    * the smoothed-floor cost), so scoring joins are total functions.
    */
  def hashedBits(slice: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val counts = slice
      .select(explode(split(col(textCol), " ")).as("__t"))
      .select(bucketOf(col("__t"), buckets).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // <= B rows; N below reads it, not the slice
    val n = counts.agg(coalesce(sum("__c"), lit(0L))).head.getLong(0)
    slice.sparkSession.range(buckets).select(col("id").as("__b"))
      .join(counts, Seq("__b"), "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .withColumn("__m", expr(s"(${n + buckets}L + __c) div (__c + 1L)"))
      .select(col("__b"),
        when(col("__m") <= 1L, lit(0L))
          .otherwise(length(bin(col("__m") - 1)).cast("long")).as("bits"))
  }

  /** Per-doc importance weight: (id, weight_bits, n_tokens) with
    * weight_bits = sum over tokens of (bits_raw(b) - bits_target(b)).
    * Both cost tables are B rows and broadcast unconditionally — they
    * are fixed-size by construction, not data-sized.
    */
  def importanceBits(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      buckets: Int,
  ): DataFrame = {
    val tb = hashedBits(target, textCol, buckets).withColumnRenamed("bits", "__tb")
    val rb = hashedBits(docs, textCol, buckets).withColumnRenamed("bits", "__rb")
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("__t"))
      .select(col(idCol), bucketOf(col("__t"), buckets).as("__b"))
      .join(broadcast(tb), Seq("__b"))
      .join(broadcast(rb), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__rb") - col("__tb")).as("weight_bits"),
        count(lit(1)).as("n_tokens"))
  }

  /** The selection: top-k raw documents by (weight desc, id asc) —
    * TakeOrdered (per-partition bounded heaps + driver merge of k), no
    * global sort or window.
    */
  def importanceSelect(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      buckets: Int,
      k: Int,
  ): DataFrame =
    importanceBits(docs, idCol, textCol, target, buckets)
      .orderBy(col("weight_bits").desc, col(idCol))
      .limit(k)
}
