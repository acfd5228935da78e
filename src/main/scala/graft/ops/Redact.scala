package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII redaction — the scrub pass every public-web training corpus runs
  * before release (emails, IPs, government ids, card numbers; the
  * C4/RefinedWeb pipelines and the reference's anonymization seams in
  * its sources' transform hooks). Reference analog: per-resource
  * `add_map` scrubbing (e.g. sources' pseudonymize/anonymize transform
  * examples in the core docs).
  *
  * Spark-first shape: a fixed sequence of `regexp_replace`/
  * `regexp_count` column expressions — scan-stage, whole-stage
  * codegen, zero shuffles, zero UDFs. At 100 TB this runs at parquet
  * scan speed as a narrow map; counts ride along for audit metrics.
  *
  * Relation to [[TextAnalysis.redactPii]]: that is the fixed
  * column-expression primitive (email/phone/IP, counts on the original
  * text) used by the q_text_quality family; this op is the
  * pipeline-level surface — configurable ordered pattern lists,
  * counts on the progressive scrub state, and a density filter.
  *
  * Patterns are applied IN ORDER, and each pattern's count is taken on
  * the text state produced by the previous replacements (so a card
  * number already collapsed to `<CARD>` can't re-count as a phone).
  * Patterns stick to RE2-compatible syntax — character classes,
  * bounded repeats, alternation, `\b` — so an external SQL oracle
  * replays the exact same matches (Java and RE2 agree on this
  * subset; no lookaround, no backreferences).
  */
object Redact {

  /** One scrub rule: `name` labels the count column (`n_<name>`),
    * `regex` matches the PII span, `token` replaces it.
    */
  final case class PiiPattern(name: String, regex: String, token: String)

  /** The standard web-corpus scrub set. Card before IP: a dotted quad
    * inside a longer digit run must not pre-empt the card match.
    */
  val defaultPatterns: Seq[PiiPattern] = Seq(
    PiiPattern("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    PiiPattern("card", "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b|\\b\\d{16}\\b", "<CARD>"),
    PiiPattern("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    PiiPattern("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Scrub `textCol` in place and append one `n_<name>` long count per
    * pattern: (idCol, textCol redacted, n_email, n_card, ...). Pure
    * narrow projection — composes anywhere in a pipeline without
    * disturbing partitioning.
    */
  def scrub(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[PiiPattern] = defaultPatterns): DataFrame = {
    val start = df.select(col(idCol), col(textCol).as("__t"))
    val scrubbed = patterns.foldLeft(start) { (acc, p) =>
      acc
        .withColumn(s"n_${p.name}", regexp_count(col("__t"), lit(p.regex)).cast("long"))
        .withColumn("__t", regexp_replace(col("__t"), p.regex, p.token))
    }
    scrubbed.select(
      col(idCol) +: col("__t").as(textCol) +:
        patterns.map(p => col(s"n_${p.name}")): _*)
  }

  /** Drop documents whose total PII density crosses `maxPerDoc` —
    * pages that are mostly contact dumps or leaked tables are usually
    * list-like boilerplate a corpus doesn't want even redacted.
    */
  def scrubAndFilter(df: DataFrame, idCol: String, textCol: String, maxPerDoc: Long,
      patterns: Seq[PiiPattern] = defaultPatterns): DataFrame = {
    val s = scrub(df, idCol, textCol, patterns)
    val total = patterns.map(p => col(s"n_${p.name}")).reduce(_ + _)
    s.filter(total <= maxPerDoc)
  }
}
