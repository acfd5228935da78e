package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction, the WET-extraction stage in front of every
  * crawl-corpus pipeline (reference analog: the unstructured-data
  * source's parse step, sources/unstructured_data/__init__.py:19-103 —
  * raw fetched payloads become scoreable text before any curation op
  * runs). Pure codegen'd column expressions — regexp passes + entity
  * decode + whitespace collapse — so extraction happens in the scan
  * stage at 100 TB: no UDF, no shuffle, and only extracted text flows
  * downstream.
  *
  * The regex subset is chosen for cross-engine parity (Java regex on
  * the Spark side, RE2 in the DuckDB oracle): `(?is)` flags, lazy
  * quantifiers, character classes — no backreferences or lookaround,
  * which RE2 lacks.
  */
object Html {

  /** Markup stripped to text: script/style/comment blocks first (their
    * CONTENT is not text), then every remaining tag; the five
    * fundamental entities plus nbsp decoded; whitespace collapsed and
    * trimmed.
    */
  /** Markup with script/style/comment BLOCKS removed (content and all) —
    * the text-bearing markup both [[stripTags]] and [[linkDensity]]
    * derive from, so an anchor inside a commented-out nav or a script
    * string never counts as anchor text.
    */
  private def withoutBlocks(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  def stripTags(html: Column): Column = {
    val noTags = regexp_replace(withoutBlocks(html), "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&", // amp LAST: && round-trips
    ).foldLeft(noTags) { case (c, (from, to)) => regexp_replace(c, from, to) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Fraction of the ORIGINAL markup's visible text that sits inside
    * anchor tags — the classic boilerplate signal (nav bars and footers
    * are link-dense; body text is not). Computed on markup lengths, so
    * it stays one narrow pass.
    */
  def linkDensity(html: Column): Column = {
    val anchorText = stripTags(concat_ws(" ",
      regexp_extract_all(withoutBlocks(html), lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))))
    val allText = stripTags(html)
    when(length(allText) === 0, lit(0.0))
      .otherwise(length(anchorText).cast("double") / length(allText))
  }

  /** The extraction row op: (id, text, n_chars, link_density) from raw
    * markup, with link-dense documents flagged rather than dropped (the
    * caller picks the threshold — boilerplate pages are still evidence
    * for dedup even when excluded from training text).
    */
  def extract(df: org.apache.spark.sql.DataFrame, idCol: String, htmlCol: String)
      : org.apache.spark.sql.DataFrame =
    df.select(
      col(idCol),
      stripTags(col(htmlCol)).as("text"),
      length(stripTags(col(htmlCol))).cast("long").as("n_chars"),
      linkDensity(col(htmlCol)).as("link_density"))
}
