package graft.connectors.db

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 face of the document scan (SURVEY §7.3: "custom DSv2
  * TableProviders ... with filter+column pushdown") — the operator-level
  * integration that lets Catalyst drive a remote store the way the
  * reference drives Mongo (filters sources/mongodb/helpers.py:97-120,
  * projection 122-157, parallel skip/limit splits 215-227):
  *
  *   spark.read.format("graft-docs")
  *     .schema(...)                       // external metadata
  *     .option("store", <registry name>)
  *     .option("collection", c)
  *     .option("chunkSize", n)
  *     .load()
  *     .where($"seq" >= 20 && $"name" === "x")  // → pushed to the store
  *     .select("name")                          // → pruned at the store
  *
  * Pushdown: =, >, >=, <, <= on top-level columns become store filter
  * entries (`field.gte` etc. — the cursor-range grammar DocumentSource
  * already speaks); everything else stays a Spark-side Filter. Pruning:
  * only required columns are requested. Parallelism: one InputPartition
  * per skip/limit chunk, planned from a store count.
  *
  * Value decoding covers the document scalar set (long/double/bool/string);
  * nested values surface as JSON strings (the normalizer takes it from
  * there, mirroring the engine's json-hint path).
  */
class DocumentSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-docs requires an explicit .schema(...) (external metadata)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    DocTable(schema, properties.asScala.toMap)
}

/** Store registry: named stores for option-based lookup. Local-mode
  * convenience — a production client constructs itself from serializable
  * options instead.
  */
object DocumentStores {
  private val stores = new java.util.concurrent.ConcurrentHashMap[String, DocumentSource.DocumentStore]()
  def register(name: String, store: DocumentSource.DocumentStore): Unit = stores.put(name, store)
  def get(name: String): DocumentSource.DocumentStore =
    Option(stores.get(name)).getOrElse(throw new IllegalArgumentException(s"no store '$name' registered"))
}

final case class DocTable(tableSchema: StructType, props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-docs:${props.getOrElse("collection", "?")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocScanBuilder(tableSchema, props ++ options.asScala)
}

final class DocScanBuilder(fullSchema: StructType, props: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var storeFilter: Map[String, String] = Map.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rejected) = filters.partition(translate(_).isDefined)
    pushed = supported
    storeFilter = supported.flatMap(translate).toMap
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def translate(f: Filter): Option[(String, String)] = f match {
    case EqualTo(a, v) if isTop(a)            => Some(s"$a.eq" -> v.toString)
    case GreaterThan(a, v) if isTop(a)        => Some(s"$a.gt" -> v.toString)
    case GreaterThanOrEqual(a, v) if isTop(a) => Some(s"$a.gte" -> v.toString)
    case LessThan(a, v) if isTop(a)           => Some(s"$a.lt" -> v.toString)
    case LessThanOrEqual(a, v) if isTop(a)    => Some(s"$a.lte" -> v.toString)
    case _                                    => None
  }
  private def isTop(attr: String): Boolean = !attr.contains(".")

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = DocScan(required, props, storeFilter)
}

final case class DocScan(readSchema: StructType, props: Map[String, String],
    storeFilter: Map[String, String]) extends Scan with Batch {

  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docs pushed=[${storeFilter.keys.toSeq.sorted.mkString(",")}] cols=[${readSchema.fieldNames.mkString(",")}]"

  private def store = DocumentStores.get(props.getOrElse("store", "default"))
  private def collection = props.getOrElse("collection", "default")
  private def chunkSize = props.getOrElse("chunkSize", "10000").toLong

  override def planInputPartitions(): Array[InputPartition] = {
    val total = store.count(collection, storeFilter)
    (0L until total by chunkSize)
      .map(skip => DocInputPartition(skip, math.min(chunkSize, total - skip)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    DocReaderFactory(readSchema, props.getOrElse("store", "default"), collection, storeFilter)
}

final case class DocInputPartition(skip: Long, limit: Long) extends InputPartition

final case class DocReaderFactory(schema: StructType, storeName: String,
    collection: String, filter: Map[String, String]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocInputPartition]
    val store = DocumentStores.get(storeName)
    val docs = store.scan(collection, filter, p.skip, p.limit, schema.fieldNames.toSeq)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!docs.hasNext) return false
        current = parse(docs.next())
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }

  private def parse(json: String): InternalRow = {
    val node = graft.connectors.rest.Json.parse(json)
    val values: Array[Any] = schema.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case LongType    => java.lang.Long.valueOf(v.asLong())
        case IntegerType => java.lang.Integer.valueOf(v.asInt())
        case DoubleType  => java.lang.Double.valueOf(v.asDouble())
        case BooleanType => java.lang.Boolean.valueOf(v.asBoolean())
        case StringType  =>
          UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
        case other => throw new IllegalArgumentException(s"graft-docs: unsupported type $other for ${f.name}")
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
}
