package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perplexity-based quality filtering, CCNet-style (Wenzek et al. 2020,
  * arXiv:1911.00359: score web documents by the perplexity of a language
  * model trained on a trusted reference corpus; drop the worst tail) —
  * the classic curation stage between heuristic gates (Gopher) and
  * semantic dedup. Reference analog: the connectors' quality seams score
  * and route documents before load (sources/unstructured_data).
  *
  * Spark-first shape: the "model" is a DataFrame — a bigram count table
  * trained by two map-side-combined groupBys over the reference corpus —
  * and scoring is a narrow explode + two equi joins against it
  * (broadcast while the model is small, count-gated to a shuffled hash
  * join above the cap). Nothing here is per-row driver work, so a 100 TB
  * corpus scores in one pass and the model trains in two shuffles.
  *
  * Exactness: probabilities are QUANTIZED to whole bits. For a doc
  * bigram (w1, w2) with add-one-smoothed probability
  * p = (c12 + 1) / (c1 + V), the cost is q = ceil(-log2 p) — computed
  * entirely in integer arithmetic as q = ceil(log2(m)) where
  * m = ceil((c1 + V) / (c12 + 1)), via the bit length of m - 1 (the
  * `bin` string both engines expose). No floating-point log ever runs,
  * so the score replays bit-for-bit in a SQL oracle — the same
  * trade the hashed-BoW embedder makes: sub-bit precision for exact
  * distributed replay; ranking fidelity is within 1 bit/token of the
  * real cross-entropy, which is far inside the tail-vs-head margin the
  * filter exists to separate.
  */
object LanguageModel {

  /** (id, w1, w2) bigram rows: consecutive word pairs per document.
    * Documents with fewer than two words emit nothing (their score is
    * vacuously 0 bits over 0 bigrams — never dropped).
    */
  private def bigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol),
        explode(arrays_zip(
          slice(col("__w"), lit(1), size(col("__w")) - 1),
          slice(col("__w"), lit(2), size(col("__w")) - 1))).as("__p"))
      .select(col(idCol),
        col("__p").getField("0").as("w1"), col("__p").getField("1").as("w2"))

  /** Trained model: bigram table (w1, w2, c12, c1) + vocabulary size.
    * Two shuffles (unigram and bigram groupBy, both map-side combined);
    * c1 is denormalized onto the bigram rows so scoring's smoothed-
    * probability numerator and denominator come from ONE join when the
    * bigram is present. The unigram table rides along for the
    * unseen-bigram fallback. Row counts are computed ONCE here, where
    * the tables are freshly checkpointed, so scoring a static model
    * per micro-batch never pays count jobs on the hot path.
    */
  final case class BigramLm(bigrams: DataFrame, unigrams: DataFrame, vocab: Long,
      bigramRowCount: Long, unigramRowCount: Long)

  def trainBigramLm(ref: DataFrame, textCol: String): BigramLm = {
    val words = ref.select(explode(split(col(textCol), " ")).as("w"))
    val uni = words.groupBy("w").agg(count(lit(1)).as("c1")).localCheckpoint(true)
    val vocab = uni.count()
    val big = bigramRows(ref.select(lit(0L).as("__id"), col(textCol)), "__id", textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .join(uni.select(col("w").as("w1"), col("c1")), Seq("w1"))
      .localCheckpoint(true)
    BigramLm(big, uni.select(col("w").as("w1"), col("c1")), vocab, big.count(), vocab)
  }

  /** Per-doc quantized cross-entropy: (idCol, bits, n_bigrams) for EVERY
    * input doc (zero-bigram docs score 0/0). `broadcastRowCap` gates the
    * model joins: broadcast below, shuffled hash join above — a
    * reference LM from a big corpus must not die on the broadcast limit.
    */
  def perplexityBits(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lm: BigramLm,
      broadcastRowCap: Long = 4000000L,
  ): DataFrame = {
    def gated(df: DataFrame, rows: Long): DataFrame =
      Dedup.gated(df, rows, broadcastRowCap)
    val pairs = bigramRows(docs, idCol, textCol)
      .join(gated(lm.bigrams, lm.bigramRowCount), Seq("w1", "w2"), "left")
      .join(gated(lm.unigrams.withColumnRenamed("c1", "__uc1"), lm.unigramRowCount),
        Seq("w1"), "left")
    // a = c12 + 1, b = c1 + V; m = ceil(b / a); q = ceil(log2 m).
    // `div` (integral), never `/`: b can exceed a double's exact range
    // on a real corpus and ceil-of-float would mis-quantize near powers
    val scored = pairs
      .withColumn("__a", coalesce(col("c12"), lit(0L)) + lit(1L))
      .withColumn("__b",
        coalesce(coalesce(col("c1"), col("__uc1")), lit(0L)) + lit(lm.vocab))
      .withColumn("__m", expr("(__b + __a - 1) div __a"))
      .withColumn("__q",
        when(col("__m") <= 1L, lit(0L)).otherwise(length(bin(col("__m") - 1)).cast("long")))
      .groupBy(col(idCol))
      .agg(sum(col("__q")).as("bits"), count(lit(1)).as("n_bigrams"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("bits"), lit(0L)).as("bits"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }

  /** The filter: keep docs whose mean cost is at most `bitsNum/bitsDen`
    * bits per bigram (integer cross-multiplication — no division, no
    * floats; the rational bound matters because whole-bit quantization
    * packs a corpus's scores into a narrow band an integer cutoff can't
    * split). Zero-bigram docs are vacuously kept, mirroring CCNet's
    * behavior of only scoring scoreable text.
    */
  def keptFlag(bitsNum: Long, bitsDen: Long = 1L): Column =
    (col("bits") * lit(bitsDen) <= lit(bitsNum) * col("n_bigrams") ||
      col("n_bigrams") === 0L).cast("long")

  def perplexityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lm: BigramLm,
      bitsNum: Long,
      bitsDen: Long = 1L,
      broadcastRowCap: Long = 4000000L,
  ): DataFrame =
    docs.join(
      perplexityBits(docs, idCol, textCol, lm, broadcastRowCap)
        .filter(keptFlag(bitsNum, bitsDen) === 1L)
        .select(col(idCol)),
      Seq(idCol))
}
