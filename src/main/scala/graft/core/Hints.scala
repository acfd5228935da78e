package graft.core

import org.apache.spark.sql.types._

/** Write dispositions — the three load semantics every reference connector
  * programs against (reference: sources/zendesk/__init__.py:257 append,
  * sources/facebook_ads/__init__.py:83 replace,
  * sources/hubspot/__init__.py:298 merge).
  */
sealed trait Disposition
object Disposition {
  case object Append extends Disposition
  case object Replace extends Disposition
  case object Merge extends Disposition
  /** Full-snapshot SCD2: validity-windowed history (dlt-core merge
    * strategy "scd2"); see MergeEngine.scd2Apply.
    */
  case object Scd2 extends Disposition
}

/** dlt scalar type system (reference: tests/pg_replication/cases.py:43-100,
  * sources/pg_replication/schema_types.py:15-27) mapped onto Spark types.
  */
sealed abstract class DltType(val sparkType: DataType)
object DltType {
  case object TBigInt extends DltType(LongType)
  case object TDouble extends DltType(DoubleType)
  case object TBool extends DltType(BooleanType)
  case object TTimestamp extends DltType(TimestampType)
  case object TTimestampNtz extends DltType(TimestampNTZType)
  case object TText extends DltType(StringType)
  final case class TDecimal(p: Int, s: Int) extends DltType(DecimalType(p, s))
  case object TBinary extends DltType(BinaryType)
  /** nested dict/list kept as one column; carried as JSON string */
  case object TJson extends DltType(StringType)
  case object TDate extends DltType(DateType)
  /** Spark has no TimeType; micros-since-midnight */
  case object TTime extends DltType(LongType)
  /** wei: 2^56-scale ints (schema_types.py:26) */
  case object TWei extends DltType(DecimalType(38, 0))

  def fromSpark(dt: DataType): DltType = dt match {
    case LongType | IntegerType | ShortType | ByteType => TBigInt
    case DoubleType | FloatType                        => TDouble
    case BooleanType                                   => TBool
    case TimestampType                                 => TTimestamp
    case TimestampNTZType                              => TTimestampNtz
    case d: DecimalType                                => TDecimal(d.precision, d.scale)
    case BinaryType                                    => TBinary
    case DateType                                      => TDate
    case _: StructType | _: ArrayType | _: MapType     => TJson
    case _                                             => TText
  }
}

/** Per-column hint: partial schema refinement over inference
  * (reference: sources/chess/__init__.py:38-44 timestamp hints,
  * sources/zendesk/__init__.py:284-288 json hints).
  */
final case class ColumnHint(
    dltType: Option[DltType] = None,
    nullable: Boolean = true,
    precision: Option[Int] = None,
)

/** Table hints attached to a resource (reference: @dlt.resource kwargs,
  * e.g. sources/kinesis/__init__.py:14-18, sources/bing_webmaster/__init__.py:38-43).
  *
  * @param dedupSort     (column, descending) — pick one row per pk by this order
  *                      (sources/pg_replication/helpers.py:765-767 `dedup_sort: desc`)
  * @param hardDeleteCol rows with non-null value here are deletes on merge
  *                      (sources/pg_replication/helpers.py:768-773)
  */
final case class TableHints(
    tableName: String,
    disposition: Disposition = Disposition.Append,
    primaryKey: Seq[String] = Nil,
    mergeKey: Seq[String] = Nil,
    dedupSort: Option[(String, Boolean)] = None,
    hardDeleteCol: Option[String] = None,
    columns: Map[String, ColumnHint] = Map.empty,
    maxTableNesting: Int = Int.MaxValue,
    /** When set, merge tables use the hash-bucketed layout (BucketedMerge):
      * only buckets touched by a batch are rewritten — the 100 TB merge
      * path. None = whole-table staged overwrite (small tables).
      */
    bucketCount: Option[Int] = None,
    /** Load timestamp stamped on SCD2 validity edges; None = wall clock at
      * write time (set it for reproducible loads/backfills).
      */
    scd2LoadTs: Option[java.sql.Timestamp] = None,
) {
  def keyColumns: Seq[String] = if (primaryKey.nonEmpty) primaryKey else mergeKey
}

/** Identifier normalization: snake_case + length cap with a stable hash tag,
  * mirroring the reference's NamingConvention(63)
  * (sources/pg_replication/helpers.py:409-413,
  * sources/pipedrive/helpers/custom_fields_munger.py:78-81).
  */
object Naming {
  val MaxLength = 63

  def snakeCase(name: String): String = {
    val s1 = name
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
    val s2 = s1.map(c => if (c.isLetterOrDigit) c.toLower else '_')
    // runs of 3+ underscores collapse to the 2-underscore path separator;
    // single and double INTERIOR underscores are preserved (`__` separates
    // nesting levels, mirroring dlt's naming convention). Edge underscores
    // strip entirely — removing only one per pass would make normalization
    // non-idempotent ("__b" → "_b" → "b").
    val s3 = s2.replaceAll("_{3,}", "__").replaceAll("^_+|_+$", "")
    val s4 = if (s3.isEmpty) "_" else s3
    if (s4.head.isDigit) "_" + s4 else s4
  }

  /** Deterministic shortening: keep prefix, append 8-hex tag of the full name. */
  def normalize(name: String, maxLen: Int = MaxLength): String = {
    val s = snakeCase(name)
    if (s.length <= maxLen) s
    else {
      val tag = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(s))
      s.take(maxLen - tag.length - 1) + "_" + tag
    }
  }
}
