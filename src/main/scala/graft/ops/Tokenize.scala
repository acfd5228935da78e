package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subword tokenization: the tokenizer-model seam that turns documents
  * into TRAINING-TOKEN counts inside the engine, so token budgeting,
  * packing and chunking size corpora the way the downstream trainer
  * will — whitespace word counts systematically mis-size real training
  * mixes (a 12-char identifier is one "word" but many subwords).
  *
  * Same seam contract as `Embedding.EmbeddingClient` /
  * `Extraction.DocFeatureExtractor`: the tokenizer is a Serializable
  * strategy invoked from a narrow mapPartitions kernel — a production
  * impl wraps a real BPE/unigram vocab (sentencepiece-style, loaded once
  * per partition in `open()`); the shipped impl is a deterministic
  * fixed-merge-table byte-pair encoder (Sennrich et al. 2016,
  * arXiv:1508.07909) whose every merge decision replays bit-for-bit in a
  * SQL oracle, which is what lets the contract query hard-gate the whole
  * kernel. Reference analog: the unstructured/document flows tokenize
  * text before sizing model calls (sources/unstructured_data).
  */
object Tokenize {

  /** The tokenizer seam. `tokenize` maps one whitespace-split word to
    * its subword tokens; `open`/`close` run once per partition (vocab /
    * merge-table load lives there, never per row).
    */
  trait TokenizerClient extends Serializable {
    def open(): Unit = ()
    def tokenize(word: String): Seq[String]
    def close(): Unit = ()
  }

  /** Deterministic greedy BPE over a FIXED merge table: start from
    * characters; each step merges ALL occurrences of the lowest-rank
    * adjacent pair present anywhere in the word, until no table pair
    * remains — exactly the standard BPE apply phase (the table is what a
    * real train phase would produce; a production client loads it from a
    * model artifact instead of a literal).
    *
    * Every rule has left != right, which makes occurrences of a pair
    * non-overlapping, so merge-all-at-once equals left-to-right merging
    * and the step is expressible as one parallel list rewrite — the
    * property the SQL oracle's recursive replay relies on.
    */
  object FixedBpeTokenizer extends TokenizerClient {
    /** (left, right) in rank order — common English letter merges plus
      * whole-word chains for frequent corpus words.
      */
    val merges: Vector[(String, String)] = Vector(
      ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
      ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
      ("e", "n"), ("o", "r"), ("e", "s"), ("s", "t"), ("a", "r"),
      ("o", "u"), ("l", "e"), ("i", "s"), ("a", "l"), ("e", "d"),
      ("c", "h"), ("r", "o"), ("b", "l"), ("bl", "e"), ("k", "e"),
      ("ke", "y"), ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
      ("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k"), ("h", "a"),
      ("ha", "s"), ("has", "h"), ("w", "i"), ("wi", "n"), ("win", "d"),
      ("wind", "o"), ("windo", "w"), ("s", "c"), ("sc", "an"),
      ("m", "er"), ("mer", "g"), ("merg", "e"), ("b", "at"),
      ("bat", "ch"), ("f", "a"), ("fa", "st"), ("s", "l"), ("sl", "o"),
      ("slo", "w"), ("t", "a"), ("ta", "ble"), ("ro", "w"),
      ("a", "g"), ("ag", "g"), ("l", "i"), ("li", "n"), ("lin", "e"),
      ("s", "o"), ("so", "r"), ("sor", "t"), ("p", "ar"), ("par", "t"))
    require(merges.forall { case (a, b) => a != b },
      "self-pairs overlap; merge-all-at-once would be ambiguous")
    require(merges.distinct.length == merges.length, "duplicate merge rule")

    private val rank: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

    def tokenize(word: String): Seq[String] = {
      if (word.isEmpty) return Nil
      var syms: Array[String] = {
        // split by code point (SQL substr parity for non-BMP text)
        val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
        var i = 0
        while (i < word.length) {
          val n = Character.charCount(word.codePointAt(i))
          out += word.substring(i, i + n)
          i += n
        }
        out.toArray
      }
      var done = syms.length < 2
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = merges(best)
          val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              buf += a + b; j += 2
            } else { buf += syms(j); j += 1 }
          }
          syms = buf.toArray
          done = syms.length < 2
        }
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(syms)
    }
  }

  /** (id, text) → (id, n_tokens): per-doc subword token count through
    * the client seam. One narrow pass, zero shuffle: words repeat
    * heavily (Zipf), so each partition memoizes word → count in a
    * bounded map instead of paying a corpus-wide distinct-words shuffle;
    * above `cacheCap` distinct words the kernel degrades to computing
    * (never evicting mid-partition — lookups stay O(1) and the hot head
    * of the distribution is already cached).
    */
  def tokenCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      client: TokenizerClient = FixedBpeTokenizer,
      cacheCap: Int = 1 << 20,
  ): DataFrame = {
    // reject non-numeric ids at ANALYSIS time: a silent cast of a string
    // id yields nulls and the kernel would die with an opaque executor
    // NPE instead of this message
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tokenCounts needs a numeric id column ('$idCol' is " +
        s"${df.schema(idCol).dataType.simpleString})")
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_tokens", LongType)))
    df.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { it: Iterator[Row] =>
        client.open()
        val closeOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
        def closeClient(): Unit = if (closeOnce.compareAndSet(false, true)) client.close()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeClient()))
        val cache = new java.util.HashMap[String, java.lang.Long]()
        val rows = it.map { r =>
          val n =
            if (r.isNullAt(1)) 0L
            else r.getString(1).split(" ", -1).foldLeft(0L) { (acc, w) =>
              var c = cache.get(w)
              if (c == null) {
                c = java.lang.Long.valueOf(client.tokenize(w).length.toLong)
                if (cache.size < cacheCap) cache.put(w, c)
              }
              acc + c.longValue()
            }
          // same opaque-executor-NPE hazard the analysis-time type
          // require guards against, but per-row: a null id must name
          // the column, not die inside getLong
          if (r.isNullAt(0))
            throw new IllegalArgumentException(
              s"tokenCounts: null id in column '$idCol' — filter null ids before tokenizing")
          Row(r.getLong(0), n)
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
