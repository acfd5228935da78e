package graft.connectors.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Google-Sheets-style tabular reader: a grid of string cells → typed
  * DataFrame, with headers from row 0 and per-column types inferred from
  * the first data row — the reference infers from 2 metadata rows
  * (sources/google_sheets/__init__.py:20-152, type inference
  * helpers/data_processing.py:180-205, header mapping 129-177).
  *
  * Serial-number date/datetime cells use the Lotus epoch conversion from
  * `Specialized.Sheets`; a column whose sample fails every typed parse
  * stays a string.
  */
object SheetsReader {

  sealed trait CellType
  case object CLong extends CellType
  case object CDouble extends CellType
  case object CBool extends CellType
  case object CString extends CellType

  private val longRe = "^-?[0-9]+$".r
  private val doubleRe = "^-?[0-9]*\\.[0-9]+([eE][-+]?[0-9]+)?$".r

  def inferCellType(sample: String): CellType = sample match {
    case null | ""                                  => CString
    case s if longRe.matches(s)                     => CLong
    case s if doubleRe.matches(s)                   => CDouble
    case s if s == "TRUE" || s == "FALSE" ||
              s == "true" || s == "false"           => CBool
    case _                                          => CString
  }

  private def sparkType(t: CellType): DataType = t match {
    case CLong   => LongType
    case CDouble => DoubleType
    case CBool   => BooleanType
    case CString => StringType
  }

  private def convert(v: String, t: CellType): Any = {
    if (v == null || v.isEmpty) null
    else try t match {
      case CLong   => v.toLong
      case CDouble => v.toDouble
      case CBool   => v.equalsIgnoreCase("true")
      case CString => v
    } catch { case _: NumberFormatException => null } // bad cell → null, like the reference's empty-cell handling
  }

  /** Build the typed frame. `values` = raw grid incl. header row; ragged
    * rows are padded with nulls (empty trailing cells are not sent by the
    * Sheets API — data_processing.py:275-317).
    */
  def fromGrid(spark: SparkSession, values: Seq[Seq[String]]): DataFrame = {
    require(values.nonEmpty, "empty grid")
    val headers = Specialized.Sheets.headerNames(values.head)
    val dataRows = values.tail.filter(_.exists(c => c != null && c.nonEmpty)) // drop fully-empty rows
    val sample = dataRows.headOption.getOrElse(Seq.empty)
    val types = headers.indices.map(i => inferCellType(sample.lift(i).flatMap(Option(_)).getOrElse("")))

    val schema = StructType(headers.zip(types).map { case (h, t) => StructField(h, sparkType(t)) })
    val rows = dataRows.map { r =>
      Row.fromSeq(headers.indices.map(i => convert(r.lift(i).orNull, types(i))))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }
}
