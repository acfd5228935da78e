package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational normalizer: nested rows → flat parent table + child tables,
  * re-expressing dlt-core's normalize step that every reference connector
  * relies on (nesting capped via `max_table_nesting=2` at
  * sources/zendesk/__init__.py:29, sources/slack/__init__.py:20).
  *
  * Rules (all pure DataFrame transforms, executed lazily on executors):
  *   - struct columns flatten into `parent__child` columns (recursively);
  *   - array columns become child tables named `<table>__<column>` with
  *     `_dlt_parent_id`, `_dlt_list_idx`, and for struct elements the
  *     flattened element fields (scalar elements land in `value`);
  *   - every table gets a deterministic `_dlt_id` (xxhash64 of the pk when
  *     hinted, else of the whole row) — the reference uses random ids, we
  *     choose deterministic ones so reruns are idempotent under merge;
  *   - columns hinted `json` are kept as raw JSON strings, not recursed
  *     (sources/zendesk/__init__.py:284-288);
  *   - nesting beyond `maxTableNesting` is serialized to JSON instead of
  *     producing deeper child tables.
  */
object Normalize {

  val DltId = "_dlt_id"
  val DltParentId = "_dlt_parent_id"
  val DltListIdx = "_dlt_list_idx"

  /** Normalize one resource DataFrame into its relational table set.
    * Keys of the result map are normalized table names; the hinted table
    * is always present.
    */
  def normalize(df: DataFrame, hints: TableHints): Map[String, DataFrame] = {
    val rootName = Naming.normalize(hints.tableName)
    val withId = addDltId(df, hints)
    expand(withId, rootName, hints, depth = 0)
  }

  /** Deterministic row id: hash of pk columns when present, else of the
    * JSON-serialized row.
    */
  private def addDltId(df: DataFrame, hints: TableHints): DataFrame = {
    if (df.columns.contains(DltId)) df
    else {
      val idCol =
        if (hints.keyColumns.nonEmpty)
          xxhash64(hints.keyColumns.map(c => col(c).cast(StringType)): _*)
        else
          xxhash64(to_json(struct(df.columns.map(col).toSeq: _*)))
      df.withColumn(DltId, idCol)
    }
  }

  private def isJsonHinted(hints: TableHints, colName: String): Boolean =
    hints.columns.get(colName).exists(_.dltType.contains(DltType.TJson))

  /** One level: flatten structs in place, split arrays off into child tables,
    * recurse into children.
    */
  private def expand(
      df: DataFrame,
      tableName: String,
      hints: TableHints,
      depth: Int,
  ): Map[String, DataFrame] = {
    val flat = flattenStructs(df, hints)
    val arrayCols = flat.schema.fields.filter(_.dataType.isInstanceOf[ArrayType])
    val overCap = depth >= hints.maxTableNesting

    val parent = applyColumnHints(
      arrayCols.foldLeft(flat) { (acc, f) =>
        if (isJsonHinted(hints, f.name) || overCap)
          acc.withColumn(f.name, to_json(col(f.name)))
        else acc.drop(f.name)
      }, hints)

    val children: Seq[(String, DataFrame)] =
      if (overCap) Nil
      else
        arrayCols.toSeq.filterNot(f => isJsonHinted(hints, f.name)).flatMap { f =>
          val childName = Naming.normalize(s"${tableName}__${Naming.snakeCase(f.name)}")
          val elemType = f.dataType.asInstanceOf[ArrayType].elementType
          val exploded = flat
            .select(col(DltId).as(DltParentId), posexplode(col(f.name)).as(Seq(DltListIdx, "value")))
            .withColumn(DltId, xxhash64(col(DltParentId), col(DltListIdx)))
          val childFlat = elemType match {
            case st: StructType =>
              val cols =
                Seq(col(DltId), col(DltParentId), col(DltListIdx)) ++
                  st.fields.toSeq.map(sf => col(s"value.${sf.name}").as(Naming.normalize(sf.name)))
              exploded.select(cols: _*)
            case _ => exploded.select(col(DltId), col(DltParentId), col(DltListIdx), col("value"))
          }
          expand(childFlat, childName, hints.copy(primaryKey = Seq(DltId)), depth + 1).toSeq
        }

    Map(tableName -> parent) ++ children
  }

  /** Hint-driven scalar coercion: a column hinted with a concrete dlt type
    * is cast to it. This is how property-catalog metadata becomes schema —
    * APIs like HubSpot return numbers/datetimes as JSON strings and the
    * catalog's type, not inference, is the source of truth
    * (sources/hubspot/__init__.py:128-141). `json`-hinted columns keep
    * their raw string; matching types pass through untouched.
    */
  def applyColumnHints(df: DataFrame, hints: TableHints): DataFrame = {
    val casts: Map[String, DataType] = df.schema.fields.flatMap { f =>
      hints.columns.get(f.name).flatMap(_.dltType) match {
        case Some(DltType.TJson)                        => None
        case Some(t) if t.sparkType != f.dataType       => Some(f.name -> t.sparkType)
        case _                                          => None
      }
    }.toMap
    if (casts.isEmpty) df
    else df.select(df.schema.fieldNames.toSeq.map(n =>
      casts.get(n).map(t => col(s"`$n`").cast(t).as(n)).getOrElse(col(s"`$n`"))): _*)
  }

  /** Dynamic schema inference for a JSON-string column (SURVEY §1.2:
    * "schema is dynamic + inferred, refined by hints"): sample the column,
    * infer a struct schema, parse in place. The parsed struct then flows
    * through `normalize` like any nested payload; hints still win where
    * declared (a `json` hint keeps the raw string instead).
    */
  def parseJsonColumn(df: DataFrame, colName: String, sampleLimit: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(colName)).filter(col(colName).isNotNull)
      .limit(sampleLimit).as[String]
    val inferred = spark.read.json(sample).schema
    if (inferred.isEmpty) df
    else df.withColumn(colName, from_json(col(colName), inferred))
  }

  /** Flatten all struct columns into `parent__child` leaves (iterates until
    * no struct columns remain; arrays inside structs surface for the child
    * pass above). JSON-hinted structs serialize instead.
    */
  def flattenStructs(df: DataFrame, hints: TableHints): DataFrame = {
    var cur = df
    var changed = true
    while (changed) {
      val structs = cur.schema.fields.filter(_.dataType.isInstanceOf[StructType])
      changed = structs.nonEmpty
      if (changed) {
        val cols: Seq[Column] = cur.schema.fields.toSeq.flatMap { f =>
          f.dataType match {
            case _ if isJsonHinted(hints, f.name) =>
              Seq(to_json(col(f.name)).as(f.name))
            case st: StructType =>
              st.fields.toSeq.map { sf =>
                col(s"`${f.name}`.`${sf.name}`")
                  .as(Naming.normalize(s"${f.name}__${Naming.snakeCase(sf.name)}"))
              }
            case _ => Seq(col(s"`${f.name}`"))
          }
        }
        cur = cur.select(cols: _*)
      }
    }
    cur
  }
}
