package graft.connectors.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's real row-shape operators (SURVEY §2.6), each as a pure
  * DataFrame transform built from codegen'd primitives — no UDFs, single
  * narrow pass unless the semantics force a shuffle.
  */
object RowShapes {

  /** hubspot `pivot_stages_properties` (sources/hubspot/__init__.py:186-219):
    * wide `date_entered_<stage>` columns melt into (id, stage, entered_at)
    * rows, null stages dropped.
    */
  def pivotStages(df: DataFrame, idCol: String, prefix: String): DataFrame = {
    val stageCols = df.columns.filter(_.startsWith(prefix))
    require(stageCols.nonEmpty, s"no columns with prefix $prefix")
    df.unpivot(
      Array(col(idCol)),
      stageCols.map(col),
      "stage", "entered_at",
    ).filter(col("entered_at").isNotNull)
      .withColumn("stage", expr(s"substring(stage, ${prefix.length + 1})"))
  }

  /** zendesk `process_ticket` custom-field pivot
    * (sources/zendesk/helpers/api_helpers.py:20-79): long array of
    * {id, value} structs → one named column per wanted field id.
    */
  def pivotCustomFields(df: DataFrame, fieldsCol: String, idToName: Map[String, String]): DataFrame = {
    val asMap = map_from_entries(
      transform(col(fieldsCol), f => struct(f.getField("id").cast("string"), f.getField("value"))))
    idToName.foldLeft(df.withColumn("__cf", asMap)) { case (acc, (id, name)) =>
      acc.withColumn(name, element_at(col("__cf"), id))
    }.drop("__cf", fieldsCol)
  }

  /** hubspot `extract_property_history` (sources/hubspot/helpers.py:71-81):
    * map<property → array<entry-struct>> explodes to
    * (object_id, property_name, entry fields...) rows.
    */
  def explodePropertyHistory(df: DataFrame, idCol: String, historyCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("object_id"), explode(col(historyCol)).as(Seq("property_name", "entries")))
    exploded.select(col("object_id"), col("property_name"), explode(col("entries")).as("entry"))
      .select(col("object_id"), col("property_name"), col("entry.*"))
  }

  /** pipedrive `group_deal_flows` (sources/pipedrive/helpers/__init__.py:11-20):
    * heterogeneous flow events routed by `object` type with flattened
    * data + timestamp. Returns the routing-ready frame (one `_table` value
    * per object type, SURVEY §2.8).
    */
  def groupDealFlows(df: DataFrame, objectCol: String, dataCol: String, tsCol: String): DataFrame =
    df.select(
      concat(lit("deals_flow_"), col(objectCol)).as("_table"),
      col(s"$dataCol.*"),
      col(tsCol).as("timestamp"),
    )

  /** matomo report dict→rows with date injection
    * (sources/matomo/helpers/data_processing.py:12-43): map<date → rows>
    * explodes into rows carrying their date.
    */
  def explodeDatedReport(df: DataFrame, reportCol: String): DataFrame =
    df.select(explode(col(reportCol)).as(Seq("date", "rows")))
      .select(col("date"), explode(col("rows")).as("row"))
      .select(col("date"), col("row.*"))

  /** personio report-attribute unpivot (sources/personio/__init__.py:250-310):
    * array of {attribute_id, value} structs → named typed columns.
    */
  def attributesToColumns(df: DataFrame, attrsCol: String, wanted: Seq[String]): DataFrame = {
    val asMap = map_from_entries(
      transform(col(attrsCol), a => struct(a.getField("attribute_id").cast("string"), a.getField("value"))))
    wanted.foldLeft(df.withColumn("__attrs", asMap)) { (acc, name) =>
      acc.withColumn(name, element_at(col("__attrs"), name))
    }.drop("__attrs", attrsCol)
  }

  /** pipedrive recents unwrap (sources/pipedrive/helpers/pages.py:79-96):
    * `data` may be one struct or an array of them — normalize to rows.
    */
  def unwrapSingleOrList(df: DataFrame, dataCol: String): DataFrame = {
    df.schema(dataCol).dataType match {
      case _: org.apache.spark.sql.types.ArrayType =>
        df.select(explode(col(dataCol)).as("data")).select(col("data.*"))
      case _ => df.select(col(s"$dataCol.*"))
    }
  }

  /** hubspot association dedup (sources/hubspot/helpers.py:186-193). */
  def dedupAssociations(df: DataFrame, fromCol: String, toCol: String): DataFrame =
    df.select(col(fromCol), col(toCol)).dropDuplicates(fromCol, toCol)

  /** Property-list chunking under a URL-length budget
    * (sources/hubspot/__init__.py:240-252, MAX_PROPS_LENGTH
    * settings.py:122) — request planning, driver-side.
    */
  def chunkByLength(props: Seq[String], maxChars: Int): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = 0
    props.foreach { p =>
      if (len + p.length + 1 > maxChars && cur.nonEmpty) {
        out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty; len = 0
      }
      cur += p; len += p.length + 1
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }
}
