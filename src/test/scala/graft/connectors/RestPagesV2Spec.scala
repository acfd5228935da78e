package graft.connectors.rest

import graft.SparkTestBase
import RestEngine._

/** JVM-static call log: executor tasks deserialize their own transport
  * copies even in local mode, so per-instance counters never aggregate —
  * statics are per-JVM and local[n] shares one.
  */
object RestCallLog {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = calls.clear()
  def keys: Seq[String] = { import scala.jdk.CollectionConverters._; calls.asScala.toSeq }
}

/** Canned transport that records every request key into [[RestCallLog]]. */
class LoggingTransport(pages: Map[String, String]) extends HttpTransport {
  override def get(url: String, params: Map[String, String], headers: Map[String, String]): HttpResponse = {
    val path = url.replaceFirst("^https?://[^/]+/", "")
    val key = path + "?" + params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
    RestCallLog.calls.add(key)
    pages.get(key) match {
      case Some(body) => HttpResponse(200, body)
      case None       => HttpResponse(404, s"""{"error":"no fixture for $key"}""")
    }
  }
}

class RestPagesV2Spec extends SparkTestBase {

  private val client = ClientConfig("https://api.example.test")

  /** 10 items across 4 offset pages of 3, each page body carrying the total. */
  private def offsetFixture: Map[String, String] = {
    def page(off: Int, ids: Seq[Int]) =
      s"items?limit=3&offset=$off" ->
        s"""{"data":[${ids.map(i => s"""{"id":$i}""").mkString(",")}],"meta":{"total":10}}"""
    Map(page(0, Seq(1, 2, 3)), page(3, Seq(4, 5, 6)), page(6, Seq(7, 8, 9)), page(9, Seq(10)))
  }

  test("known total plans one input partition per page; each page fetched exactly once") {
    RestCallLog.reset()
    val fixture = offsetFixture
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 3, totalPath = Some("meta.total")))
    val df = RestPagesV2.read(spark,
      RestPagesV2.PlannedPages(client, ep, Map.empty, () => new LoggingTransport(fixture)))
    assert(df.rdd.getNumPartitions == 4, s"ceil(10/3) pages, got ${df.rdd.getNumPartitions}")
    val ids = df.select("item").collect().map(r =>
      Json.parse(r.getString(0)).get("id").asInt()).toSet
    assert(ids == (1 to 10).toSet)
    // the probe's page 0 rides inside its partition — exactly one request
    // per page across the whole scan, no page fetched twice
    val byKey = RestCallLog.keys.groupBy(identity).view.mapValues(_.size).toMap
    assert(byKey == fixture.keys.map(_ -> 1).toMap, s"calls: $byKey")
  }

  test("parallel read returns exactly the serial loop's item set") {
    val fixture = offsetFixture // local val: the lambda must not capture the spec
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 3, totalPath = Some("meta.total")))
    val serial = fetchPages(client, ep, new LoggingTransport(fixture)).toSet
    val parallel = RestPagesV2.read(spark,
      RestPagesV2.PlannedPages(client, ep, Map.empty, () => new LoggingTransport(fixture)))
      .collect().map(_.getString(0)).toSet
    assert(parallel == serial)
  }

  test("page-number paginator splits by page; first request omits the page param like the serial loop") {
    RestCallLog.reset()
    val fixture = Map(
      "posts?per_page=2" -> """{"items":[{"id":1},{"id":2}],"total_count":5}""",
      "posts?page=2&per_page=2" -> """{"items":[{"id":3},{"id":4}],"total_count":5}""",
      "posts?page=3&per_page=2" -> """{"items":[{"id":5}],"total_count":5}""",
    )
    val ep = EndpointConfig("posts", dataSelector = "items",
      paginator = Paginator.PageNumber(pageSize = 2, totalPath = Some("total_count")))
    val df = RestPagesV2.read(spark,
      RestPagesV2.PlannedPages(client, ep, Map.empty, () => new LoggingTransport(fixture)))
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 5)
    assert(RestCallLog.keys.sorted == fixture.keys.toSeq.sorted)
  }

  test("no totalPath degrades to a single serial partition with the same rows") {
    val fixture = Map(
      "items?limit=3&offset=0" -> """{"data":[{"id":1},{"id":2},{"id":3}]}""",
      "items?limit=3&offset=3" -> """{"data":[{"id":4}]}""",
    )
    val ep = EndpointConfig("items", dataSelector = "data", paginator = Paginator.Offset(pageSize = 3))
    val df = RestPagesV2.read(spark,
      RestPagesV2.PlannedPages(client, ep, Map.empty, () => new LoggingTransport(fixture)))
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 4)
  }

  test("readResourceParallel binds the incremental start param and re-filters engine-side") {
    import graft.core.{Disposition, TableHints}
    // API is start-INCLUSIVE (echoes id=5 back); the engine filter enforces
    // the strict bound, exactly like the serial readResource
    val fixture = Map(
      "items?limit=3&offset=0&since=5" ->
        """{"data":[{"id":5},{"id":6},{"id":7}],"meta":{"total":4}}""",
      "items?limit=3&offset=3&since=5" ->
        """{"data":[{"id":8}],"meta":{"total":4}}""",
    )
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 3, totalPath = Some("meta.total")),
      incremental = Some(IncrementalBinding(cursorPath = "id", startParam = "since",
        initialValue = Some("5"))))
    val src = RestSource("s", client,
      Seq(RestResource("items", ep, TableHints("items", Disposition.Append))))
    val df = RestEngine.readResourceParallel(spark, src, src.resources.head,
      () => new LoggingTransport(fixture))
    assert(df.select("id").collect().map(_.getLong(0)).toSet == Set(6L, 7L, 8L))
  }

  test("readResourceParallel fetches each page exactly once across inference and repeated actions") {
    import graft.core.{Disposition, TableHints}
    RestCallLog.reset()
    val fixture = offsetFixture
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 3, totalPath = Some("meta.total")))
    val src = RestSource("s", client,
      Seq(RestResource("items", ep, TableHints("items", Disposition.Append))))
    val df = RestEngine.readResourceParallel(spark, src, src.resources.head,
      () => new LoggingTransport(fixture))
    // json schema inference is an eager job and each action re-executes the
    // plan — without the checkpoint inside readResourceParallel, pages 1-3
    // would be fetched once for inference + once per action (3× here)
    assert(df.count() == 10)
    assert(df.select("id").collect().map(_.getLong(0)).toSet == (1L to 10L).toSet)
    val byKey = RestCallLog.keys.groupBy(identity).view.mapValues(_.size).toMap
    assert(byKey == fixture.keys.map(_ -> 1).toMap, s"calls: $byKey")
  }

  test("driver registry is LRU-bounded; stale keys evict, recent keys stay resolvable") {
    val fixture = offsetFixture
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 3, totalPath = Some("meta.total")))
    def pages = RestPagesV2.PlannedPages(client, ep, Map.empty, () => new LoggingTransport(fixture))
    val first = RestPagesV2.register(pages)
    // flood past the bound: the unbounded-growth leak would retain all of
    // these (page-0 strings + transport closures) for the JVM's lifetime
    val keys = (1 to 1100).map(_ => RestPagesV2.register(pages))
    assert(RestPagesV2.registeredCount <= 1024, s"count=${RestPagesV2.registeredCount}")
    RestPagesV2.get(keys.last) // most recent resolves
    // the eldest evicted: the error must SAY evicted (and how to widen the
    // bound), not claim the key was never registered — the two failures
    // have different fixes
    val e = intercept[IllegalArgumentException] { RestPagesV2.get(first) }
    assert(e.getMessage.contains("evicted") &&
      e.getMessage.contains(RestPagesV2.MaxRegisteredConfKey), e.getMessage)
    val e2 = intercept[IllegalArgumentException] { RestPagesV2.get("bogus_key") }
    assert(!e2.getMessage.contains("evicted"), e2.getMessage)
  }

  test("registry bound is tunable via spark.graft.restPages.maxRegistered") {
    val fixture = offsetFixture
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 3, totalPath = Some("meta.total")))
    def pages = RestPagesV2.PlannedPages(client, ep, Map.empty, () => new LoggingTransport(fixture))
    spark.conf.set(RestPagesV2.MaxRegisteredConfKey, "2000")
    try {
      (1 to 1500).foreach(_ => RestPagesV2.register(pages))
      assert(RestPagesV2.registeredCount > 1024 && RestPagesV2.registeredCount <= 2000,
        s"count=${RestPagesV2.registeredCount}")
    } finally {
      // restore the stock bound for any suite after this one (the next
      // register trims the registry to the restored bound eagerly)
      spark.conf.set(RestPagesV2.MaxRegisteredConfKey, "1024")
      RestPagesV2.register(pages)
      spark.conf.unset(RestPagesV2.MaxRegisteredConfKey)
    }
  }

  test("a bound DECREASE trims the registry eagerly; rest_0 never misreports as evicted") {
    val fixture = offsetFixture
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 3, totalPath = Some("meta.total")))
    def pages = RestPagesV2.PlannedPages(client, ep, Map.empty, () => new LoggingTransport(fixture))
    try {
      spark.conf.set(RestPagesV2.MaxRegisteredConfKey, "512")
      (1 to 600).foreach(_ => RestPagesV2.register(pages))
      assert(RestPagesV2.registeredCount <= 512)
      // lower the bound: removeEldestEntry alone would leave ~512 entries
      // sitting above the new bound indefinitely (one eviction per insert);
      // the register path must trim the whole overhang at once
      spark.conf.set(RestPagesV2.MaxRegisteredConfKey, "64")
      RestPagesV2.register(pages)
      assert(RestPagesV2.registeredCount <= 64,
        s"registry must trim to the lowered bound eagerly, got ${RestPagesV2.registeredCount}")
      // rest_0 was never issued (the counter starts at 1): the error must
      // say unregistered, not evicted — the two failures have different fixes
      val e = intercept[IllegalArgumentException] { RestPagesV2.get("rest_0") }
      assert(!e.getMessage.contains("evicted"), e.getMessage)
    } finally {
      spark.conf.set(RestPagesV2.MaxRegisteredConfKey, "1024")
      RestPagesV2.register(pages)
      spark.conf.unset(RestPagesV2.MaxRegisteredConfKey)
    }
  }

  test("newest-first incremental endpoints fall back to the serial loop (page-stop needs the chain)") {
    import graft.core.{Disposition, TableHints}
    val fixture = Map(
      "items?limit=2&offset=0" -> """{"data":[{"id":9},{"id":8}],"meta":{"total":6}}""",
      "items?limit=2&offset=2" -> """{"data":[{"id":7},{"id":6}],"meta":{"total":6}}""",
      "items?limit=2&offset=4" -> """{"data":[{"id":5},{"id":4}],"meta":{"total":6}}""",
      "items?limit=2&offset=6" -> """{"data":[],"meta":{"total":6}}""",
    )
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 2, totalPath = Some("meta.total")),
      incremental = Some(IncrementalBinding(cursorPath = "id", startParam = "since",
        newestFirst = true)))
    val src = RestSource("s", client,
      Seq(RestResource("items", ep, TableHints("items", Disposition.Append))))
    val df = RestEngine.readResourceParallel(spark, src, src.resources.head,
      () => new LoggingTransport(fixture))
    // no committed cursor: full scan, but through readResource's serial path
    assert(df.count() == 6)
  }

  test("readMany plans one partition per endpoint; each cursor chain walks exactly once, executor-side") {
    RestCallLog.reset()
    // 3 independent cursor-chained endpoints (reports), 2 pages each —
    // a chain is serial within itself but independent of its siblings
    def report(r: Int): Map[String, String] = Map(
      s"reports/$r/items?limit=2" ->
        s"""{"data":[{"id":${r * 10 + 1}},{"id":${r * 10 + 2}}],"paging":{"cursors":{"after":"c$r"}}}""",
      s"reports/$r/items?after=c$r&limit=2" ->
        s"""{"data":[{"id":${r * 10 + 3}}]}""",
    )
    val fixture = (1 to 3).flatMap(report).toMap
    val endpoints = (1 to 3).map { r =>
      RestPagesV2.PlannedPages(client,
        EndpointConfig(s"reports/$r/items", dataSelector = "data",
          paginator = Paginator.Cursor("paging.cursors.after", "after", pageSize = 2)),
        Map.empty, () => new LoggingTransport(fixture))
    }
    val df = RestPagesV2.readMany(spark, endpoints)
    assert(df.rdd.getNumPartitions == 3,
      s"one partition per endpoint expected, got ${df.rdd.getNumPartitions}")
    val ids = df.collect().map(r => Json.parse(r.getString(0)).get("id").asInt()).toSet
    assert(ids == Set(11, 12, 13, 21, 22, 23, 31, 32, 33))
    // every page of every chain requested exactly once across the scan
    val byKey = RestCallLog.keys.groupBy(identity).view.mapValues(_.size).toMap
    assert(byKey == fixture.keys.map(_ -> 1).toMap, s"calls: $byKey")
  }
}
