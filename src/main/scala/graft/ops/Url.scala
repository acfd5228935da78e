package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level exact dedup — the FIRST stage of the
  * web-corpus pipelines (RefinedWeb arXiv:2306.01116 §3.1 runs URL
  * dedup before any content filter; CCNet and C4 dedup by URL within
  * snapshots), and the cheapest: two crawls of the same page differ by
  * scheme, www, tracking params, param order, fragments, and trailing
  * slashes long before their HTML differs. Reference analog: the
  * filesystem/REST sources key incremental state on normalized resource
  * identity the same way.
  *
  * Spark-first shape: canonicalization is ONE narrow codegen'd column
  * expression (regexp + split/filter/sort/join — no UDF, no shuffle);
  * dedup is one hash aggregate on the canonical string. At 100 TB this
  * is a map + one combine-enabled shuffle of (canon, id) pairs — the
  * right first cut before any per-byte content work.
  *
  * Canonical form (fixed rule order, chosen to stay bit-replayable in
  * an external SQL engine):
  *  1. drop the fragment (`#...`);
  *  2. drop the scheme (`http://` / `https://`, case-insensitive);
  *  3. split host at the first `/` or `?`; lowercase the HOST segment
  *     ONLY (paths are case-sensitive by spec) and strip one leading
  *     `www.` — "host segment" means everything before the first `/` or
  *     `?`, so an embedded port (`host:8080`) or userinfo
  *     (`user:pass@host`) is preserved in place and lowercased with it;
  *  4. strip one trailing `/` from the path;
  *  5. drop tracking params ([[TrackingParamRe]]), sort the survivors
  *     byte-wise, re-join with `&`.
  */
object Url {

  /** Params dropped during canonicalization: the cross-site tracking
    * families (utm_*, fbclid, gclid, msclkid) plus bare `ref`.
    */
  val TrackingParamRe = "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)="

  /** The canonical form as one composed column expression. */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "(?i)^https?://", "")
    // host ends at the first '/' or '?' (query-without-path URLs exist)
    val iSlash = instr(noScheme, "/")
    val iQ = instr(noScheme, "?")
    val cut = when(iSlash > 0 && (iQ === 0 || iSlash < iQ), iSlash)
      .when(iQ > 0, iQ)
      .otherwise(lit(0))
    val host0 = when(cut > 0, noScheme.substr(lit(1), cut - 1)).otherwise(noScheme)
    val rest = when(cut > 0, noScheme.substr(cut, length(noScheme))).otherwise(lit(""))
    val host = regexp_replace(lower(host0), "^www\\.", "")
    val qPos = instr(rest, "?")
    val path0 = when(qPos > 0, rest.substr(lit(1), qPos - 1)).otherwise(rest)
    val path = regexp_replace(path0, "/$", "")
    val query0 = when(qPos > 0, rest.substr(qPos + 1, length(rest))).otherwise(lit(""))
    val params = array_sort(filter(split(query0, "&"),
      x => !x.rlike(TrackingParamRe) && x =!= ""))
    val query = array_join(params, "&")
    concat(host, path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Canonicalize `urlCol` and mark URL-level duplicates: appends
    * `url_canon`, `n_dups` (rows sharing the canonical URL) and `kept`
    * (1 for the smallest `idCol` of each canonical group — the
    * deterministic survivor, 0 for the rest). Filter `kept = 1` for the
    * deduped corpus, or keep all rows for audit.
    *
    * Shape: ONE shuffle — both group aggregates ride a single
    * unordered window over `url_canon`, so the canonical expression is
    * evaluated exactly once per row (the aggregate-then-join-back
    * alternative evaluates it on three operator sides and, because the
    * param-filter lambda keeps the expression out of whole-stage
    * codegen, measured 23× slower at sf0.1: 5.1 s vs 0.22 s
    * steady-state). Per-key window state is one duplicate family —
    * bounded by the corpus's worst URL fan-in, the same hot-key hazard
    * any groupBy on the canonical string has.
    *
    * `idCol` must be unique (a document/crawl id): `kept` marks the rows
    * whose id equals the group minimum, so duplicated ids would mark
    * several survivors per canonical group. The three appended columns
    * must not already exist on the input — silently overwriting a user
    * column is worse than failing, so collisions throw.
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val clash = Seq("url_canon", "n_dups", "kept").filter(df.columns.contains)
    require(clash.isEmpty,
      s"dedupByUrl appends url_canon/n_dups/kept; input already has ${clash.mkString(", ")} — rename or drop before deduping")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("url_canon")
    df.withColumn("url_canon", canonicalize(col(urlCol)))
      .withColumn("n_dups", count(lit(1)).over(w))
      .withColumn("kept", (col(idCol) === min(col(idCol)).over(w)).cast("long"))
  }
}
