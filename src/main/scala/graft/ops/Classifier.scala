package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality classification — the curation stage the big
  * web-corpus pipelines run between heuristic gates and dedup: train a
  * cheap linear text classifier on a labeled seed (CCNet's fastText
  * wiki-vs-crawl filter, arXiv:1911.00359 §4.4; GPT-3's LR quality
  * filter, arXiv:2005.14165 appendix A) and score every document.
  * Reference analog: the unstructured/quality seams that score and
  * route documents before load (sources/unstructured_data,
  * sources/filesystem helpers).
  *
  * Spark-first shape: the "model" is a DataFrame of per-word integer
  * bit costs — trained by one map-side-combined groupBy over the seed
  * corpus — and scoring is a narrow explode + ONE equi join against it
  * (broadcast under a row cap, shuffled hash join above), then a
  * per-doc integer sum. Nothing is per-row driver work: a 100 TB corpus
  * scores in one pass and training is one shuffle over the (much
  * smaller) labeled seed.
  *
  * Exactness: multinomial Naive Bayes with add-one smoothing, all
  * probabilities QUANTIZED to whole bits exactly like
  * [[LanguageModel]]: for word w in class c the cost is
  * q_c(w) = ceil(-log2 p) = ceil(log2 ceil((n_c + V) / (c_wc + 1)))
  * computed purely in integer arithmetic via the bit length of m - 1.
  * No floating-point log ever runs, so scores, labels and the margin
  * filter replay bit-for-bit in a SQL oracle. Ranking fidelity is
  * within 1 bit/token of real NB — far inside the head-vs-tail margin
  * a quality filter needs (and the same trade the perplexity LM makes).
  */
object Classifier {

  /** Trained model. `words` is (w, q0, q1): per-word whole-bit costs
    * under class 0 / class 1. Words unseen in training cost the
    * class-constant `q0Default`/`q1Default` (c_wc = 0 ⇒ m = n_c + V).
    * `prior0Bits`/`prior1Bits` are the quantized class priors
    * ceil(log2 ceil((N0 + N1 + 2) / (N_c + 1))). `wordRowCount` is
    * counted once at train time so per-batch scoring never pays a
    * count job for the broadcast gate.
    */
  final case class NbModel(words: DataFrame, q0Default: Long, q1Default: Long,
      prior0Bits: Long, prior1Bits: Long, wordRowCount: Long)

  /** ceil(log2 m) for m >= 1 as integer bit arithmetic. */
  private def ceilLog2(m: Long): Long =
    if (m <= 1L) 0L else 64L - java.lang.Long.numberOfLeadingZeros(m - 1L)


  /** Train on a labeled seed: `labelCol` must be 0/1 (castable to long).
    * One explode + one groupBy (map-side combined) over the seed; the
    * scalar totals come from one driver aggregate of the k-row word
    * table plus one label-column-only count of the seed (a pruned scan
    * that never rereads the text).
    */
  def trainNb(labeled: DataFrame, textCol: String, labelCol: String): NbModel = {
    val counts = labeled
      .select(col(labelCol).cast("long").as("__y"),
        explode(split(col(textCol), " ")).as("w"))
      .groupBy("w")
      .agg(sum(when(col("__y") === 0L, 1L).otherwise(0L)).as("c0"),
        sum(when(col("__y") === 1L, 1L).otherwise(0L)).as("c1"))
      .localCheckpoint(true)
    // class token totals + vocab from the word table (k rows, 1 job)
    val Array(n0, n1, v) = counts
      .agg(sum("c0"), sum("c1"), count(lit(1))).head().toSeq
      .map(x => x.asInstanceOf[Long]).toArray
    val Array(d0, d1) = labeled
      .agg(sum(when(col(labelCol).cast("long") === 0L, 1L).otherwise(0L)),
        sum(when(col(labelCol).cast("long") === 1L, 1L).otherwise(0L))).head().toSeq
      .map(x => x.asInstanceOf[Long]).toArray
    // `div` (integral), never `/`: n_c + V can exceed a double's exact
    // range on a real corpus and ceil-of-float would mis-quantize near
    // powers of two (the same guard LanguageModel documents)
    def q(cCol: String, nTotal: Long) = {
      val m = expr(s"(${nTotal + v} + $cCol) div ($cCol + 1)")
      when(m <= 1L, lit(0L)).otherwise(length(bin(m - 1)).cast("long"))
    }
    val words = counts
      .select(col("w"), q("c0", n0).as("q0"), q("c1", n1).as("q1"))
      .localCheckpoint(true)
    NbModel(words,
      q0Default = ceilLog2(n0 + v), q1Default = ceilLog2(n1 + v),
      prior0Bits = ceilLog2(ceilDivL(d0 + d1 + 2L, d0 + 1L)),
      prior1Bits = ceilLog2(ceilDivL(d0 + d1 + 2L, d1 + 1L)),
      wordRowCount = words.count())
  }

  private def ceilDivL(a: Long, b: Long): Long = (a + b - 1L) / b

  /** Score every doc: (idCol, bits0, bits1, n_tokens, label). bits_c =
    * prior_c + Σ per-occurrence word costs (multinomial — repeated
    * words pay repeatedly). label = 1 iff bits1 < bits0 (the cheaper
    * encoding wins; ties go to class 0 — deterministic). Docs with no
    * tokens score priors only. One explode, one gated join, one
    * integer-sum groupBy.
    */
  def classifyNb(docs: DataFrame, idCol: String, textCol: String, model: NbModel,
      broadcastRowCap: Long = 4000000L): DataFrame = {
    val toks = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
    val scored = toks
      .join(Dedup.gated(model.words, model.wordRowCount, broadcastRowCap), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("q0"), lit(model.q0Default))).as("__s0"),
        sum(coalesce(col("q1"), lit(model.q1Default))).as("__s1"),
        count(lit(1)).as("n_tokens"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("__s0"), lit(0L)) + lit(model.prior0Bits)).as("bits0"),
        (coalesce(col("__s1"), lit(0L)) + lit(model.prior1Bits)).as("bits1"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(coalesce(col("__s1"), lit(0L)) + lit(model.prior1Bits) <
          coalesce(col("__s0"), lit(0L)) + lit(model.prior0Bits), lit(1L))
          .otherwise(lit(0L)).as("label"))
  }

  /** The filter: keep docs the classifier puts in class 1 with at least
    * `marginBits` of headroom — bits0 - bits1 >= margin (integer; a
    * margin of 0 keeps everything labeled 1 plus exact ties). The
    * margin is the quality knob: raising it keeps only docs the model
    * is confident look like the positive seed, CCNet's
    * head/middle/tail split in integer form.
    */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String, model: NbModel,
      marginBits: Long, broadcastRowCap: Long = 4000000L): DataFrame =
    docs.join(
      classifyNb(docs, idCol, textCol, model, broadcastRowCap)
        .filter(col("bits0") - col("bits1") >= marginBits)
        .select(col(idCol)),
      Seq(idCol))
}
