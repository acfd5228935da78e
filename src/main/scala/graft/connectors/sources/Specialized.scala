package graft.connectors.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Connector-specific planning/typing logic that is NOT expressible as
  * generic REST config (SURVEY §2.1 rows 12-15, §2.2, §2.9) — pure
  * functions (driver-side request planning) and Column expressions
  * (executor-side typing), mirroring the reference per-connector helpers.
  */
object Specialized {

  // ----------------------------------------------------------- salesforce

  /** SOQL generation — field-list build with compound-field pruning and
    * cursor WHERE/ORDER BY pushdown
    * (sources/salesforce/helpers/records.py:55-134: field list 69-87,
    * cursor predicate 89-94). The generated query IS the pushdown: the
    * remote engine scans, we stream results.
    */
  object Soql {
    /** Compound types the Bulk API cannot fetch — pruned like records.py:76-82. */
    val compoundTypes = Set("address", "location")

    def fieldList(fields: Seq[(String, String)]): Seq[String] =
      fields.collect { case (name, tpe) if !compoundTypes(tpe.toLowerCase) => name }

    def query(
        sobject: String,
        fields: Seq[(String, String)],
        cursorField: Option[String],
        lastValue: Option[String],
    ): String = {
      val cols = fieldList(fields).mkString(", ")
      val where = (for (cf <- cursorField; lv <- lastValue)
        yield s" WHERE $cf > $lv").getOrElse("")
      val order = cursorField.map(cf => s" ORDER BY $cf ASC").getOrElse("")
      s"SELECT $cols FROM $sobject$where$order"
    }

    /** Bulk-API date normalization: bulk returns epoch millis for
      * datetime fields, REST returns ISO strings — unify to timestamp
      * (sources/salesforce/helpers/records.py:16-52).
      */
    def normalizeDatetime(c: Column): Column =
      when(c.rlike("^[0-9]+$"), timestamp_millis(c.cast("long")))
        .otherwise(to_timestamp(c))
  }

  // -------------------------------------------------------- google sheets

  /** Sheets data processing (sources/google_sheets/helpers/data_processing.py):
    * A1-notation range arithmetic (21-77), Lotus serial-date conversion
    * (180-230), header mapping with positional fallback (129-177).
    */
  object Sheets {
    /** Serial number → date: days since the Lotus epoch 1899-12-30
      * (data_processing.py:19,208-230).
      */
    def serialToDate(c: Column): Column =
      date_add(lit("1899-12-30").cast(DateType), c.cast(IntegerType))

    /** Fractional serial → timestamp (days.fraction-of-day). */
    def serialToTimestamp(c: Column): Column =
      timestamp_micros(
        ((c.cast(DoubleType) - lit(25569.0)) * lit(86400000000.0)).cast(LongType))

    private val A1 = "^([A-Z]+)([0-9]+)$".r

    /** Parse an A1 cell ref to (colIndex 1-based, rowIndex). */
    def parseA1(cell: String): (Int, Int) = cell match {
      case A1(colS, rowS) =>
        val col = colS.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1))
        (col, rowS.toInt)
      case _ => throw new IllegalArgumentException(s"bad A1 ref: $cell")
    }

    /** (colIndex 1-based, rowIndex) → A1 ref (range shifting,
      * data_processing.py:51-77).
      */
    def toA1(col: Int, row: Int): String = {
      var c = col
      val sb = new StringBuilder
      while (c > 0) { val r = (c - 1) % 26; sb.insert(0, ('A' + r).toChar); c = (c - 1) / 26 }
      sb.append(row).toString
    }

    /** Header names for a sheet row: non-empty trimmed headers win, empty
      * positions fall back to col_N (warning-on-collision behavior in
      * data_processing.py:163-175 resolved by suffixing).
      */
    def headerNames(headers: Seq[String]): Seq[String] = {
      val seen = scala.collection.mutable.Map.empty[String, Int]
      headers.zipWithIndex.map { case (h, i) =>
        val base = if (h == null || h.trim.isEmpty) s"col_${i + 1}" else graft.core.Naming.normalize(h)
        seen.get(base) match {
          case Some(n) => seen(base) = n + 1; s"${base}_$n"
          case None    => seen(base) = 1; base
        }
      }
    }
  }

  // ------------------------------------------------------------ hubspot

  /** HubSpot dynamic property discovery → column hints: the remote
    * property catalog's types map to engine types
    * (HS_TO_DLT_TYPE, sources/hubspot/settings.py:124-130; hints computed
    * at sources/hubspot/__init__.py:128-141, helpers.py:241-251), and
    * requested property lists are validated against the catalog with
    * custom properties unioned in (__init__.py:442-481).
    */
  object Hubspot {
    import graft.core.{ColumnHint, DltType}

    def propertyTypeToHint(hsType: String): ColumnHint = ColumnHint(dltType = Some(hsType match {
      case "number"              => DltType.TDouble
      case "bool" | "boolean"    => DltType.TBool
      case "datetime"            => DltType.TTimestamp
      case "date"                => DltType.TDate
      case "enumeration"         => DltType.TText
      case _                     => DltType.TText
    }))

    /** Column hints for a discovered property catalog (name → hs type).
      * `prefix` targets the flattened column names the normalizer produces
      * (objects carry properties under a `properties` struct →
      * `properties__<name>` after flattening).
      */
    def hintsFor(catalog: Map[String, String], prefix: String = ""): Map[String, ColumnHint] =
      catalog.map { case (name, t) =>
        graft.core.Naming.normalize(prefix + name) -> propertyTypeToHint(t)
      }

    /** Fetch the property catalog (name → hs type) from the live
      * properties endpoint `/crm/v3/properties/{plural}`
      * (helpers.py:203-226 _get_property_names_types) — the runtime
      * discovery step that makes custom properties and their types appear
      * without config.
      */
    def discoverProperties(
        client: graft.connectors.rest.RestEngine.ClientConfig,
        objectPlural: String,
        transport: graft.connectors.rest.HttpTransport,
    ): Map[String, String] = {
      import graft.connectors.rest.{Json, RestEngine}
      RestEngine.fetchPages(client,
        RestEngine.EndpointConfig(s"crm/v3/properties/$objectPlural",
          dataSelector = "results",
          paginator = RestEngine.Paginator.NextUrl("paging.next.link")), transport)
        .map(Json.parse)
        .flatMap(n => Json.selectString(n, "name")
          .map(_ -> Json.selectString(n, "type").getOrElse("string")))
        .toMap
    }

    /** Validate requested props against the catalog; unknown props raise,
      * custom props (catalog entries beyond the default set) are unioned
      * in when `includeCustom`.
      */
    def selectProperties(
        requested: Seq[String],
        catalog: Map[String, String],
        defaults: Set[String],
        includeCustom: Boolean,
    ): Seq[String] = {
      val unknown = requested.filterNot(catalog.contains)
      require(unknown.isEmpty, s"unknown properties: ${unknown.mkString(", ")}")
      val custom = if (includeCustom) catalog.keys.filterNot(defaults).toSeq else Nil
      (requested ++ custom).distinct
    }
  }

  // ----------------------------------------------------------- facebook

  /** Insights request planning (sources/facebook_ads/__init__.py:120-220,
    * helpers.py:33-61): the incremental start is rewritten back by the
    * attribution window (conversions attribute late), and the range fans
    * out into per-day report jobs whose results union.
    */
  object Facebook {
    import java.time.LocalDate

    /** Start date minus attribution lag — re-reads the attribution window
      * every run; merge-on-pk dedups the overlap (helpers.py:33-61).
      */
    def attributionWindowStart(lastValue: LocalDate, attributionWindowDays: Int): LocalDate =
      lastValue.minusDays(attributionWindowDays.toLong)

    /** Inclusive day range → per-day job specs. */
    def dayRange(start: LocalDate, endExclusive: LocalDate): Seq[LocalDate] =
      Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.isBefore(endExclusive)).toSeq

    /** Fan out day jobs and union results — each job is an async report
      * awaited via AsyncJobPoller by the caller; the union keeps per-day
      * frames independent (a failed day retries alone).
      */
    def unionDays(frames: Seq[org.apache.spark.sql.DataFrame]): Option[org.apache.spark.sql.DataFrame] =
      frames.reduceOption(_.unionByName(_, allowMissingColumns = true))
  }

  // -------------------------------------------------------------- chess

  /** Month-archive planning (sources/chess/__init__.py:95-126): the games
    * feed is one URL per (player, month); a run plans the month range,
    * drops already-fetched archives via the seen-set, and fetches only the
    * remainder (completed months never change, so the current month is the
    * only re-fetch).
    */
  object Chess {
    /** Inclusive yyyy/MM month range. */
    def monthRange(startYm: String, endYm: String): Seq[String] = {
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy/MM")
      val start = java.time.YearMonth.parse(startYm, fmt)
      val end = java.time.YearMonth.parse(endYm, fmt)
      Iterator.iterate(start)(_.plusMonths(1)).takeWhile(!_.isAfter(end))
        .map(_.format(fmt)).toSeq
    }

    /** Archives to fetch this run: the planned range minus the seen set,
      * with the current (incomplete) month always retried.
      */
    def plan(range: Seq[String], seen: Set[String], currentYm: String): Seq[String] =
      range.filter(m => m == currentYm || !seen.contains(m))
  }

  // ------------------------------------------------------------- matomo

  /** Live-visits session-close filter (sources/matomo/helpers/
    * data_processing.py:46-75; params sources/matomo/__init__.py:101-102):
    * drop visits still considered active — last action within
    * `visitTimeoutSeconds` of now AND total duration under
    * `visitMaxDurationSeconds`.
    */
  object Matomo {
    def removeActiveVisits(
        df: DataFrame,
        lastActionCol: String,
        firstActionCol: String,
        nowEpochS: Long,
        visitTimeoutSeconds: Long = 1800,
        visitMaxDurationSeconds: Long = 3600,
    ): DataFrame = {
      val lastS = unix_timestamp(col(lastActionCol))
      val firstS = unix_timestamp(col(firstActionCol))
      df.filter(!(
        lastS > lit(nowEpochS - visitTimeoutSeconds) &&
          (lastS - firstS) < lit(visitMaxDurationSeconds)
      ))
    }
  }

  // ----------------------------------------------------- google analytics

  /** GA4 report value typing: metric type → Spark cast
    * (sources/google_analytics/helpers/data_processing.py:139-158) and the
    * dimension-format parsers incl. ISO-week and yyyyMMdd dates (161-189).
    */
  object GA {
    def metricColumn(c: Column, metricType: String): Column = metricType match {
      case "TYPE_INTEGER"                  => c.cast(LongType)
      case "TYPE_FLOAT" | "TYPE_CURRENCY" |
           "TYPE_SECONDS" | "TYPE_MILLISECONDS" => c.cast(DoubleType)
      case _                               => c.cast(StringType)
    }

    def dimensionColumn(c: Column, dimensionName: String): Column = dimensionName match {
      case "date"          => to_date(c, "yyyyMMdd")
      case "dateHour"      => to_timestamp(c, "yyyyMMddHH")
      case "dateHourMinute" => to_timestamp(c, "yyyyMMddHHmm")
      case "isoYearIsoWeek" =>
        // yyyyww ISO week → monday of that week
        to_date(concat(substring(c, 1, 4), lit("-W"), substring(c, 5, 2), lit("-1")), "YYYY-'W'ww-u")
      case _ => c
    }
  }
}
