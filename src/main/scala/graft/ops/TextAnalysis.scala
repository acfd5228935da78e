package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting.
  * All are single-pass narrow transformations built from codegen'd
  * `functions._` expressions — no UDFs, no shuffles; they scale linearly
  * with input splits. Pattern source: the reference's per-document
  * enrichment step (sources/unstructured_data/helpers.py:20-91) re-expressed
  * as columnar expressions.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space split — matches the synthetic corpus
    * and the oracle's `string_split`).
    */
  def words(text: Column): Column = split(text, " ")

  def wordCount(text: Column): Column = size(words(text))

  /** BPE-ish token estimate: runs of letters, runs of digits, or single
    * other non-space chars.
    */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))

  /** Quality-score feature columns (length / punctuation / stopword
    * ratios) — the standard pre-training quality filters.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val w = words(text)
    val nw = size(w)
    Seq(
      "n_chars" -> length(text),
      "n_words" -> nw,
      "avg_word_len" -> (length(text) - (nw - lit(1))).cast("double") / nw.cast("double"),
      "stopword_ratio" ->
        size(filter(w, t => t.isin("the", "a", "of", "and"))).cast("double") / nw.cast("double"),
      "punct_count" -> regexp_count(text, lit("[\\.,;:!\\?]")),
      // repetition: 1 − |distinct words| / |words| — high values flag
      // boilerplate/spam documents in pre-training quality filters
      "repetition_ratio" ->
        (lit(1.0) - size(array_distinct(w)).cast("double") / nw.cast("double")),
    )
  }

  /** Gopher document-quality rules (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", §A1.1.2
    * — the public heuristic gate most large-corpus pipelines start from):
    * word-count bounds, mean-word-length bounds, symbol-to-word ratios
    * (# and ellipsis), bullet-line / ellipsis-line fractions, the
    * alphabetic-word fraction, and minimum stop-word presence. Returns
    * one named boolean flag per rule plus the conjunction — keep the
    * flags, not just the verdict, so a curation run can report WHY
    * documents fell (the reference's enrichment step reports per-check
    * fields the same way). All flags are codegen'd column expressions:
    * a single narrow pass, no UDFs, no shuffle.
    */
  def gopherFlags(text: Column): Seq[(String, Column)] = {
    val w = words(text)
    val nw = size(w)
    val meanLen = (length(text) - (nw - lit(1))).cast("double") / nw.cast("double")
    val lines = split(text, "\n", -1)
    val nl = size(lines)
    val bulletLines = size(filter(lines, l => substring(l, 1, 1).isin("-", "*")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    val alphaWords = size(filter(w, t => t.rlike("[A-Za-z]")))
    val stopHits = size(filter(w,
      t => t.isin("the", "be", "to", "of", "and", "that", "have", "with")))
    Seq(
      "ok_word_count" -> (nw >= 50 && nw <= 100000),
      "ok_mean_word_len" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "ok_hash_ratio" ->
        (regexp_count(text, lit("#")).cast("double") / nw.cast("double") <= 0.1),
      "ok_ellipsis_ratio" ->
        (regexp_count(text, lit("\\.\\.\\.")).cast("double") / nw.cast("double") <= 0.1),
      "ok_bullet_lines" -> (bulletLines.cast("double") / nl.cast("double") <= 0.9),
      "ok_ellipsis_lines" -> (ellipsisLines.cast("double") / nl.cast("double") <= 0.3),
      "ok_alpha_words" -> (alphaWords.cast("double") / nw.cast("double") >= 0.8),
      "ok_stopwords" -> (stopHits >= 2),
    )
  }

  /** The Gopher gate as 0/1 flag columns plus the overall `pass`. */
  def gopherFilter(df: DataFrame, textCol: String): DataFrame = {
    val flags = gopherFlags(col(textCol))
    val flagged = flags.foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(n, c.cast("long"))
    }
    flagged.withColumn("pass",
      flags.map { case (n, _) => col(n) === 1L }.reduce(_ && _).cast("long"))
  }

  /** Marker-word language-ID: score each language by marker hits, pick argmax
    * (first language wins ties). A real system swaps the marker table for
    * char-n-gram profiles; the operator shape (broadcast marker map,
    * argmax over per-language scores) is what matters at scale.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "fr" -> Seq("le", "la", "vite"),
    "de" -> Seq("der", "die", "das"),
    "es" -> Seq("el", "la", "rapido"),
    "zh" -> Seq("kuai", "man", "biao"),
  )

  def langScores(text: Column): Seq[(String, Column)] = {
    val w = words(text)
    langMarkers.map { case (lang, markers) =>
      s"score_$lang" -> size(filter(w, t => t.isin(markers: _*)))
    }
  }

  /** argmax over language scores with first-wins tie-break. */
  def predictLang(text: Column): Column = {
    val w = words(text)
    val scored = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(w, t => t.isin(markers: _*)))
    }
    val best = greatest(scored.map(_._2): _*)
    scored.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Char-n-gram profile scoring — the real language-ID shape (marker
    * words above are the demo form): each language carries a small profile
    * of weighted character n-grams; a document's score per language is
    * Σ weight × occurrences. Profiles are broadcast literals; scoring is
    * regexp_count per n-gram, fully codegen'd.
    */
  def charNgramScores(text: Column, profiles: Map[String, Seq[(String, Double)]]): Seq[(String, Column)] =
    profiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      val score = grams.map { case (g, w) =>
        regexp_count(text, lit(java.util.regex.Pattern.quote(g))).cast("double") * lit(w)
      }.reduce(_ + _)
      s"score_$lang" -> score
    }

  /** argmax over profile scores, ties to the lexicographically first
    * language, zero-score documents → "und".
    */
  def predictLangByProfile(text: Column, profiles: Map[String, Seq[(String, Double)]]): Column = {
    val scored = charNgramScores(text, profiles)
    val best = greatest(scored.map(_._2): _*)
    scored.foldRight(lit("und")) { case ((name, s), acc) =>
      when(s === best && best > 0, name.stripPrefix("score_")).otherwise(acc)
    }
  }

  /** Document fingerprint: hash of the normalized head of the document —
    * cheap near-duplicate prefilter (rolling-hash analog as a single md5
    * over the first 64 normalized chars).
    */
  def fingerprint(text: Column): Column = md5(substring(lower(text), 1, 64))

  // ------------------------------------------------------- PII redaction

  /** Training-corpus PII scrubbing: codegen'd regexp passes, no UDF. The
    * patterns are RE2-compatible (no backrefs/lookaround) so an external
    * engine can replay them byte-identically. These are the fixed
    * column-expression primitives; [[Redact.scrub]] is the
    * pipeline-level op (configurable ordered patterns, progressive
    * counts, density filter).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b555-[0-9]{4}\\b"
  val ipRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Replace emails, then phone numbers, then IPs (the order is part of
    * the contract: earlier placeholders must not re-match later passes).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")

  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(emailRe)).cast(LongType),
    "n_phones" -> regexp_count(text, lit(phoneRe)).cast(LongType),
    "n_ips"    -> regexp_count(text, lit(ipRe)).cast(LongType),
  )

  // -------------------------------------------------- repetition signals

  /** Gopher-style intra-document repetition: duplicate-word and
    * duplicate-3-gram counts, all as exact integers from pure HOFs (one
    * narrow pass per document, no shuffle, no UDF).
    */
  def repetitionStats(text: Column): Seq[(String, Column)] = {
    val ws = words(text)
    val n = size(ws)
    val n3 = greatest(n - 2, lit(0))
    // 3-grams via transform over positions; sequence(1, 0) would run
    // BACKWARDS (Spark picks step -1), hence the n >= 3 guard
    val grams = when(n >= 3,
      transform(sequence(lit(1), n3), i => concat_ws(" ", slice(ws, i, lit(3)))))
      .otherwise(array())
    Seq(
      "n_words" -> n.cast(LongType),
      "n_dup_words" -> (n - size(array_distinct(ws))).cast(LongType),
      "n_3grams" -> n3.cast(LongType),
      "n_dup_3grams" -> (n3 - size(array_distinct(grams))).cast(LongType),
    )
  }

  /** Corpus-level n-gram novelty (CCNet-family quality/near-dup signal):
    * per document, the fraction of its DISTINCT word n-grams that appear
    * in no other document. Boilerplate-heavy docs (headers, templates,
    * near-copies) score low; genuinely novel text scores high — a cheap
    * pre-filter before the expensive near-dup machinery.
    *
    * Plan shape at 100 TB: one explode → per-doc-distinct grams, one
    * keyed groupBy on the gram (map-side combined — only (gram, count)
    * partials shuffle), one join back, one per-doc aggregate. Everything
    * is integer counts until the single final division, so the result is
    * bit-stable across partitionings and engines (oracle-replicable).
    * For corpora where raw gram strings dominate shuffle bytes, hash the
    * gram to 8 bytes first (`xxhash64`) the way `lineDedup(hashKeys)`
    * does — same plan, 64-bit keys.
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val ws = words(col(textCol))
    val nGrams = greatest(size(ws) - (n - 1), lit(0))
    val grams = when(size(ws) >= n,
      transform(sequence(lit(1), nGrams), i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array())
    // distinct per doc BEFORE the explode: intra-doc repeats must not
    // inflate document frequency
    val docGrams = df
      .select(col(idCol), explode(array_distinct(grams)).as("__gram"))
    val gramDf = docGrams
      .groupBy(col("__gram"))
      .agg(count(lit(1)).as("__df"))
    val perDoc = docGrams
      .join(gramDf, "__gram")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        count(when(col("__df") === 1, lit(1))).as("novel_grams"))
    // left join: docs too short for any n-gram keep a row (0, 0, null)
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"),
        when(col("n_grams").isNotNull,
          col("novel_grams").cast("double") / col("n_grams")).as("novelty"))
  }

  // ------------------------------------------------- C4 line-level rules

  /** C4-style line cleaning (Raffel et al. 2020, arXiv:1910.10683 §2.2):
    * keep only lines that end in terminal punctuation, have at least
    * `minWordsPerLine` words, and carry none of the boilerplate
    * `policyPhrases` (case-insensitive); drop the whole document when
    * fewer than `minKeptLines` lines survive. The complement of the
    * doc-level Gopher gates ([[gopherFilter]]): Gopher judges the
    * document, C4 repairs it line by line.
    *
    * One narrow pass — split, HOF filter, rejoin — per document: no
    * shuffle, no UDF, so it composes at scan speed like every other
    * quality gate here. C4 additionally drops brace-containing docs
    * wholesale (code); here `{` is a line-level policy phrase by
    * default, which is strictly gentler and keeps the op line-scoped.
    *
    * Returns (idCol, textCol = kept lines rejoined, n_lines, n_kept)
    * for surviving documents.
    */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 3,
      policyPhrases: Seq[String] = Seq("javascript", "cookie", "lorem ipsum", "{"),
      minKeptLines: Int = 1): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keep = (l: Column) => {
      val terminal = l.substr(length(l), lit(1)).isin(".", "!", "?", "\"")
      val longEnough = size(split(l, " ")) >= minWordsPerLine
      val clean = policyPhrases
        .map(p => !lower(l).contains(p.toLowerCase(java.util.Locale.ROOT)))
        .reduce(_ && _)
      terminal && longEnough && clean
    }
    df
      .withColumn("__lines", lines)
      .withColumn("__kept", filter(col("__lines"), keep))
      .filter(size(col("__kept")) >= minKeptLines)
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn(textCol, array_join(col("__kept"), "\n"))
      .drop("__lines", "__kept")
  }
}
