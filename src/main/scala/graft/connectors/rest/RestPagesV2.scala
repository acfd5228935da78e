package graft.connectors.rest

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import RestEngine.{ClientConfig, EndpointConfig, Paginator}

/** Partition-parallel root-resource page fetch (DSv2).
  *
  * The driver-side page loop in [[RestEngine.fetchPages]] is inherently
  * sequential for cursor/next-url chains, but for Offset/PageNumber
  * paginators whose response carries a TOTAL (`Paginator.Offset.totalPath`),
  * every page's request parameters are computable up front — pages are
  * independent, exactly like the reference's parallel Mongo skip/limit
  * splits (sources/mongodb/helpers.py:215-227) and its thread-pooled
  * deferred fetches (sources/chess/__init__.py:54-60 `dlt.defer`). This
  * source plans ONE INPUT PARTITION PER PAGE (the [[graft.connectors.db.DocumentSourceV2]]
  * treatment), so a 10k-page backfill rides 32 executor threads instead of
  * one driver loop — the ingest-side bottleneck a 100× user hits first.
  *
  * Planning probes page 0 once on the driver (items + total); page 0's
  * items travel INSIDE its InputPartition so every page is requested
  * exactly once. All remaining pages fetch executor-side with one transport
  * per partition and per-request auth (incl. the OAuth2 401 re-mint retry).
  * If the probe yields no total — or the paginator is a chain — the scan
  * degrades to a single partition running the serial loop, so callers can
  * use this source unconditionally for root resources.
  *
  * Consistency: like any skip/limit split, concurrent inserts between probe
  * and fetch can shift page boundaries; the reference accepts the same for
  * Mongo parallel scans. Incremental runs bound the window via the cursor
  * params, which ride in `PlannedPages.extraParams`.
  *
  * Rows surface as a single `item` string column (one JSON object per
  * item); [[RestEngine.jsonToDf]] takes it from there so schema inference
  * stays distributed.
  */
object RestPagesV2 {
  val ItemSchema: StructType = StructType(Seq(StructField("item", StringType, nullable = false)))

  /** Everything a partition needs, serializable — shipped inside the
    * reader factory, NOT looked up through a registry on executors, so the
    * plan is cluster-correct (the registry below is only the driver-side
    * handoff from typed config to DSv2 string options).
    */
  final case class PlannedPages(
      client: ClientConfig,
      endpoint: EndpointConfig,
      extraParams: Map[String, String],
      transportFactory: () => HttpTransport,
  )

  /** Registry entry: the typed config plus its memoized page plan. Spark
    * re-invokes `planInputPartitions` on every query execution of the same
    * DataFrame (getNumPartitions, collect, …); re-probing page 0 each time
    * would both double-fetch and let a moving total change the plan
    * mid-query. One registered read = one probe = one stable plan.
    *
    * An entry holds a SEQUENCE of endpoints: a single-endpoint read plans
    * per-page partitions when the total is known, a multi-endpoint read
    * ([[readMany]]) plans one partition per endpoint — each an
    * independent cursor chain walked executor-side.
    */
  private final class Entry(val endpoints: Seq[PlannedPages]) {
    var plan: Array[InputPartition] = _
  }

  /** Bound on retained registrations. Entries used to live forever (every
    * read registered a fresh key, nothing evicted), which leaked page-0 item
    * strings, transport closures, and partition arrays for the driver's
    * lifetime in long-running pipelines. The registry is now LRU-bounded:
    * the most recent `MaxRegistered` reads stay resolvable (each access
    * refreshes recency), older ones are dropped. A DataFrame re-executed
    * after 1024+ NEWER RestPagesV2 reads fails with "no planned REST
    * endpoint … evicted" — call `read` again for a fresh scan in that
    * (pathological) case. Executors are unaffected: the PlannedPages
    * travels inside the reader factory, never through this driver-side map.
    *
    * The bound is tunable per deployment via the Spark conf
    * `spark.graft.restPages.maxRegistered` (read at registration time from
    * the active session — a driver holding more than 1024 concurrently
    * live REST scans should raise it).
    */
  @volatile private var maxRegistered = 1024
  private[rest] val MaxRegisteredConfKey = "spark.graft.restPages.maxRegistered"

  /** Driver-side registry keyed by the `endpoint` DSv2 option, access-order
    * LRU. All access goes through `synchronized` on the map itself — entry
    * plan memoization included, so a plan computes exactly once per key.
    */
  private val registry =
    new java.util.LinkedHashMap[String, Entry](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean =
        size() > maxRegistered
    }
  private val keyCounter = new java.util.concurrent.atomic.AtomicLong()

  private def entryFor(key: String): Entry = registry.synchronized {
    Option(registry.get(key)).getOrElse {
      // Keys are generated sequentially, so a well-formed key at or below
      // the counter WAS registered once — tell the caller it aged out of
      // the LRU (and how to widen it) instead of the never-registered text.
      val evicted = key match {
        case s if s.startsWith("rest_") =>
          // counter starts at 1, so rest_0 was never issued — don't
          // misreport it as evicted
          s.stripPrefix("rest_").toLongOption.exists(n => n >= 1 && n <= keyCounter.get())
        case _ => false
      }
      if (evicted)
        throw new IllegalArgumentException(
          s"planned REST endpoint '$key' was registered but evicted after $maxRegistered newer " +
            s"registrations — re-run the read for a fresh scan, or raise $MaxRegisteredConfKey")
      else
        throw new IllegalArgumentException(s"no planned REST endpoint '$key' registered")
    }
  }

  private[rest] def planFor(key: String)(compute: => Array[InputPartition]): Array[InputPartition] = {
    val e = entryFor(key)
    // memoize on the entry, not the map: compute probes the live endpoint,
    // so it must not run under the registry lock (other reads would stall
    // behind a slow HTTP probe)
    e.synchronized {
      if (e.plan == null) e.plan = compute
      e.plan
    }
  }

  def register(pages: PlannedPages): String = registerMany(Seq(pages))

  def registerMany(endpoints: Seq[PlannedPages]): String = {
    require(endpoints.nonEmpty, "registerMany needs at least one endpoint")
    org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(s => s.conf.getOption(MaxRegisteredConfKey))
      .flatMap(_.toIntOption).filter(_ > 0)
      .foreach(maxRegistered = _)
    val key = s"rest_${keyCounter.incrementAndGet()}"
    registry.synchronized {
      // removeEldestEntry only evicts one entry per insert, so a
      // conf-driven bound DECREASE would otherwise leave the registry
      // above the live bound indefinitely — trim eagerly here.
      val it = registry.entrySet().iterator()
      while (registry.size() >= maxRegistered && it.hasNext) { it.next(); it.remove() }
      registry.put(key, new Entry(endpoints))
    }
    key
  }
  private[rest] def get(key: String): Seq[PlannedPages] = entryFor(key).endpoints
  /** Registered entries currently retained (test hook for the LRU bound). */
  private[rest] def registeredCount: Int = registry.synchronized { registry.size() }

  /** Read a registered endpoint: one `item` string column, one partition
    * per page when the total is known.
    */
  def read(spark: SparkSession, pages: PlannedPages): DataFrame =
    spark.read.format("graft-rest").option("endpoint", register(pages)).load()

  /** Read MANY endpoints as one scan: one input partition per endpoint,
    * each walking its own page loop (cursor chains included — a chain is
    * serial within itself but independent of its siblings) executor-side
    * with its own transport. This is the fan-out shape of an async-report
    * harvest (reference: facebook_ads' per-day insights jobs,
    * sources/facebook_ads/helpers.py:142-167 — submit jobs, then fetch
    * each completed report) — N completed report refs ride N partitions
    * instead of a driver loop paying Σ(report chains).
    */
  def readMany(spark: SparkSession, endpoints: Seq[PlannedPages]): DataFrame =
    spark.read.format("graft-rest").option("endpoint", registerMany(endpoints)).load()

  private[rest] def rootUrl(client: ClientConfig, endpoint: EndpointConfig): String =
    client.baseUrl.stripSuffix("/") + "/" + endpoint.path.stripPrefix("/")

  /** Params for page `i` (0-based), mirroring fetchPages' seeding so the
    * serial and parallel reads issue byte-identical requests.
    */
  private[rest] def pageParams(endpoint: EndpointConfig, extra: Map[String, String], i: Long): Map[String, String] = {
    val base = endpoint.params ++ extra
    endpoint.paginator match {
      case p: Paginator.Offset =>
        base + (p.offsetParam -> (i * p.pageSize).toString) + (p.limitParam -> p.pageSize.toString)
      case p: Paginator.PageNumber =>
        // the serial loop omits the page param on its FIRST request (the
        // server defaults to page 1); mirror it so both paths issue
        // byte-identical requests
        if (i == 0L) base + (p.sizeParam -> p.pageSize.toString)
        else base + (p.pageParam -> (i + 1).toString) + (p.sizeParam -> p.pageSize.toString)
      case other => throw new IllegalArgumentException(s"not page-splittable: $other")
    }
  }

  /** One authed GET with the OAuth2 expired-token retry — the per-request
    * half of fetchPages, shared by the planning probe and the executor-side
    * page readers.
    */
  private[rest] def fetchBody(client: ClientConfig, transport: HttpTransport, url: String,
      params: Map[String, String]): String = {
    def authed: (Map[String, String], Map[String, String]) =
      client.auth.map(_.applyTo(params, client.headers)).getOrElse((params, client.headers))
    val first = { val (rp, rh) = authed; transport.get(url, rp, rh) }
    val resp = client.auth match {
      case Some(o: Auth.OAuth2) if first.status == 401 =>
        // expired-early or revoked access token: re-mint once, like fetchPages
        o.invalidate()
        val (rp, rh) = authed
        transport.get(url, rp, rh)
      case _ => first
    }
    if (resp.status < 200 || resp.status >= 300)
      throw new RuntimeException(s"GET $url -> HTTP ${resp.status}: ${resp.body.take(500)}")
    resp.body
  }
}

class RestPagesSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RestPagesV2.ItemSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    RestPagesTable(properties.asScala.toMap)
}

final case class RestPagesTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-rest:${props.getOrElse("endpoint", "?")}"
  override def schema(): StructType = RestPagesV2.ItemSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder { override def build(): Scan = RestPagesScan(merged("endpoint")) }
  }
}

final case class RestPagesScan(key: String) extends Scan with Batch {
  override def readSchema(): StructType = RestPagesV2.ItemSchema
  override def toBatch: Batch = this
  override def description(): String = s"graft-rest endpoint=$key"

  override def planInputPartitions(): Array[InputPartition] = RestPagesV2.planFor(key) {
    val endpoints = RestPagesV2.get(key)
    if (endpoints.size > 1) {
      // multi-endpoint scan: one partition per endpoint, each an
      // independent page loop — no probe, nothing driver-side
      endpoints.indices.map(i => RestEndpointPartition(i): InputPartition).toArray
    } else planSingle(endpoints.head)
  }

  private def planSingle(p: RestPagesV2.PlannedPages): Array[InputPartition] = {
    val totalPath = p.endpoint.paginator match {
      case o: Paginator.Offset     => o.totalPath
      case n: Paginator.PageNumber => n.totalPath
      case _                       => None
    }
    totalPath match {
      case None => Array(RestSerialPartition)
      case Some(tp) =>
        // probe page 0 once, driver-side: its items ride inside partition 0
        // so each page is requested exactly once across the whole scan
        val transport = p.transportFactory()
        val url = RestPagesV2.rootUrl(p.client, p.endpoint)
        val body = RestPagesV2.fetchBody(p.client, transport, url,
          RestPagesV2.pageParams(p.endpoint, p.extraParams, 0L))
        val root = Json.parse(body)
        val page0 = RestEngine.ProcessingStep.run(p.endpoint.processingSteps,
          Json.items(root, p.endpoint.dataSelector)).map(_.toString)
        Json.selectString(root, tp).flatMap(_.toLongOption) match {
          case None => // no total in the body after all: finish serially
            Array(RestSerialPartition)
          case Some(total) =>
            val pageSize = p.endpoint.paginator match {
              case o: Paginator.Offset     => o.pageSize
              case n: Paginator.PageNumber => n.pageSize
              case _                       => 1
            }
            val numPages = math.min(
              math.max(1L, (total + pageSize - 1) / pageSize),
              p.endpoint.maxPages.toLong)
            (RestPage0Partition(page0) +:
              (1L until numPages).map(i => RestPageRangePartition(i): InputPartition)).toArray
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    RestPagesReaderFactory(RestPagesV2.get(key))
}

/** Fallback: the whole serial page loop as one partition. */
case object RestSerialPartition extends InputPartition
/** Page 0, pre-fetched at planning time. */
final case class RestPage0Partition(items: Seq[String]) extends InputPartition
/** An independent page index (0-based), fetched executor-side. */
final case class RestPageRangePartition(page: Long) extends InputPartition
/** One endpoint of a multi-endpoint scan: its full page loop, fetched
  * executor-side (readMany fan-out).
  */
final case class RestEndpointPartition(idx: Int) extends InputPartition

final case class RestPagesReaderFactory(endpoints: Seq[RestPagesV2.PlannedPages])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val planned = endpoints.head
    val items: Iterator[String] = partition match {
      case RestPage0Partition(page0) => page0.iterator
      case RestPageRangePartition(i) =>
        val transport = planned.transportFactory()
        val url = RestPagesV2.rootUrl(planned.client, planned.endpoint)
        val body = RestPagesV2.fetchBody(planned.client, transport, url,
          RestPagesV2.pageParams(planned.endpoint, planned.extraParams, i))
        RestEngine.ProcessingStep.run(planned.endpoint.processingSteps,
          Json.items(Json.parse(body), planned.endpoint.dataSelector)).map(_.toString).iterator
      case RestSerialPartition =>
        RestEngine.fetchPages(planned.client, planned.endpoint, planned.transportFactory(),
          planned.extraParams).iterator
      case RestEndpointPartition(i) =>
        val p = endpoints(i)
        RestEngine.fetchPages(p.client, p.endpoint, p.transportFactory(),
          p.extraParams).iterator
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!items.hasNext) return false
        current = InternalRow(UTF8String.fromString(items.next()))
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
