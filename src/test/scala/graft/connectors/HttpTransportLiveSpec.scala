package graft.connectors.rest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase
import graft.core.{Disposition, TableHints}
import RestEngine._

/** Server-side hit counters: JVM-static so executor-side fetches (local
  * mode shares the JVM) and the driver-side assertions see one ledger.
  */
object LiveHits {
  val byPath = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
  def inc(key: String): Int = byPath.computeIfAbsent(key, _ => new AtomicInteger).incrementAndGet()
  def get(key: String): Int = Option(byPath.get(key)).map(_.get).getOrElse(0)
  def reset(): Unit = byPath.clear()
}

/** The REAL transport ([[UrlConnectionTransport]]) against a live loopback
  * `com.sun.net.httpserver.HttpServer` — the production code path every
  * fleet connector runs, which the canned-transport specs never touch:
  * socket I/O, URL encoding, redirects, chunked transfer, gzip
  * negotiation, live retry/backoff, the OAuth2 401 re-mint round trip,
  * NextUrl absolute links with query-param credential dedup, and one
  * fleet-shaped config end-to-end (parallel root pages + parent-child
  * fan-out) with executor-side transports over real sockets. The
  * reference's tests hit live HTTP services (tests/utils.py:35-37); this
  * is the zero-egress equivalent, the same way q_jdbc_scan proves JDBC on
  * embedded Derby.
  */
class HttpTransportLiveSpec extends SparkTestBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // a real pool: executor-side partition fetches arrive concurrently
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def respond(ex: HttpExchange, status: Int, body: String,
      gzip: Boolean = false, chunked: Boolean = false,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes =
      if (gzip) {
        ex.getResponseHeaders.set("Content-Encoding", "gzip")
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(body.getBytes(StandardCharsets.UTF_8)); gz.close()
        bos.toByteArray
      } else body.getBytes(StandardCharsets.UTF_8)
    // contentLength 0 = chunked transfer encoding in HttpServer
    ex.sendResponseHeaders(status, if (chunked) 0 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("GET sends URL-encoded params + auth headers; chunked responses decode") {
    server.createContext("/t1", (ex: HttpExchange) => {
      val ok = ex.getRequestHeaders.getFirst("X-Api-Key") == "k1" &&
        params(ex) == Map("q" -> "a b&c", "n" -> "2")
      if (ok) respond(ex, 200, """{"items":[{"id":1}]}""", chunked = true)
      else respond(ex, 400, s"""{"err":"got ${params(ex)}"}""")
    })
    val t = new UrlConnectionTransport()
    val r = t.get(s"$base/t1", Map("q" -> "a b&c", "n" -> "2"), Map("X-Api-Key" -> "k1"))
    assert(r.status == 200, r.body)
    assert(r.body == """{"items":[{"id":1}]}""")
  }

  test("gzip negotiation: transport advertises gzip and inflates the response") {
    server.createContext("/gz", (ex: HttpExchange) => {
      val ae = Option(ex.getRequestHeaders.getFirst("Accept-Encoding")).getOrElse("")
      if (ae.contains("gzip")) respond(ex, 200, """{"ok":true,"pad":"aaaaaaaaaaaaaaaa"}""", gzip = true)
      else respond(ex, 400, """{"err":"no gzip advertised"}""")
    })
    val r = new UrlConnectionTransport().get(s"$base/gz", Map.empty, Map.empty)
    assert(r.status == 200, r.body)
    assert(r.body == """{"ok":true,"pad":"aaaaaaaaaaaaaaaa"}""")
  }

  test("3xx redirects follow to the final body") {
    server.createContext("/old", (ex: HttpExchange) =>
      respond(ex, 302, "", headers = Map("Location" -> s"$base/new")))
    server.createContext("/new", (ex: HttpExchange) => respond(ex, 200, """{"moved":true}"""))
    val r = new UrlConnectionTransport().get(s"$base/old", Map.empty, Map.empty)
    assert(r.status == 200)
    assert(r.body == """{"moved":true}""")
  }

  test("RetryingTransport rides out live 503/429 and succeeds on the third attempt") {
    server.createContext("/flaky", (ex: HttpExchange) => LiveHits.inc("flaky") match {
      case 1 => respond(ex, 503, """{"err":"down"}""")
      case 2 => respond(ex, 429, """{"err":"throttled"}""")
      case _ => respond(ex, 200, """{"items":[{"id":7}]}""")
    })
    val t = new RetryingTransport(new UrlConnectionTransport(), sleeper = _ => ())
    val r = t.get(s"$base/flaky", Map.empty, Map.empty)
    assert(r.status == 200, r.body)
    assert(LiveHits.get("flaky") == 3)
  }

  test("OAuth2 over live sockets: mint, 401 revocation, one re-mint, retry succeeds") {
    server.createContext("/token", (ex: HttpExchange) => {
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (!form.contains("grant_type=client_credentials") || !form.contains("client_id=cid"))
        respond(ex, 400, s"""{"err":"bad grant form: $form"}""")
      else {
        val n = LiveHits.inc("token")
        respond(ex, 200, s"""{"access_token":"tok$n","expires_in":3600}""")
      }
    })
    server.createContext("/secured", (ex: HttpExchange) => {
      LiveHits.inc("secured")
      // tok1 is "revoked": only the re-minted tok2 passes
      if (ex.getRequestHeaders.getFirst("Authorization") == "Bearer tok2")
        respond(ex, 200, """{"data":[{"id":1},{"id":2}]}""")
      else respond(ex, 401, """{"err":"revoked"}""")
    })
    val live = new UrlConnectionTransport()
    val client = ClientConfig(base,
      auth = Some(new Auth.OAuth2(s"$base/token", "cid", "secret", transport = live)))
    val items = fetchPages(client,
      EndpointConfig("secured", dataSelector = "data"), live)
    assert(items.map(Json.parse(_).get("id").asInt()).toSet == Set(1, 2))
    assert(LiveHits.get("token") == 2, "exactly one re-mint after the 401")
    assert(LiveHits.get("secured") == 2, "one rejected + one retried request")
  }

  test("NextUrl absolute links over live sockets; query-param credential not duplicated") {
    server.createContext("/chain", (ex: HttpExchange) => {
      val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      // the engine must not re-append the credential the link already carries
      if (raw.split('&').count(_.startsWith("key=")) != 1 ||
          params(ex).get("key") != Some("s3cr3t"))
        respond(ex, 400, s"""{"err":"bad credential in: $raw"}""")
      else params(ex).get("p") match {
        case None =>
          respond(ex, 200, s"""{"items":[{"id":1}],"next":"$base/chain?p=2&key=s3cr3t"}""")
        case Some("2") =>
          respond(ex, 200, s"""{"items":[{"id":2}],"next":"$base/chain?p=3&key=s3cr3t"}""")
        case _ => respond(ex, 200, """{"items":[{"id":3}]}""")
      }
    })
    val client = ClientConfig(base, auth = Some(Auth.QueryParam("key", "s3cr3t")))
    val items = fetchPages(client,
      EndpointConfig("chain", dataSelector = "items", paginator = Paginator.NextUrl("next")),
      new UrlConnectionTransport())
    assert(items.map(Json.parse(_).get("id").asInt()) == Seq(1, 2, 3))
  }

  test("header_link pagination over live sockets: RFC 5988 Link rel=next followed to exhaustion") {
    // GitHub's actual protocol: page links live in the Link RESPONSE
    // header, not the body — exercises the transport's header surfacing
    // (lowercased names) and the engine's HeaderLink follow end-to-end
    server.createContext("/linked", (ex: HttpExchange) => {
      LiveHits.inc("linked")
      val page = params(ex).getOrElse("page", "1").toInt
      val items = ((page - 1) * 2 + 1 to math.min(page * 2, 5))
        .map(i => s"""{"id":$i}""").mkString(",")
      val hs =
        if (page < 3) Map("Link" ->
          s"""<$base/linked?page=${page + 1}>; rel="next", <$base/linked?page=3>; rel="last"""")
        else Map.empty[String, String]
      respond(ex, 200, s"[$items]", headers = hs)
    })
    val live = new UrlConnectionTransport()
    // transport surfaces headers with lowercase names
    val probe = live.get(s"$base/linked", Map.empty, Map.empty)
    assert(probe.header("link").exists(_.contains("rel=\"next\"")), probe.headers)
    LiveHits.reset()
    val items = fetchPages(ClientConfig(base),
      EndpointConfig("linked", paginator = Paginator.HeaderLink()), live)
    assert(items.map(Json.parse(_).get("id").asInt()) == Seq(1, 2, 3, 4, 5))
    assert(LiveHits.get("linked") == 3, "exactly one request per page")
  }

  test("pipeline lifecycle over live HTTP: extract -> merge -> cursor commit; second run loads only the delta") {
    import graft.pipeline.{Pipeline, ResourceDef, SourceDef}
    import graft.core.{Incremental, StateStore}
    // a growing dataset behind a `since`-filtered endpoint (START-INCLUSIVE,
    // like real APIs — the engine's strict re-filter must drop the echo)
    @volatile var visible = 5
    server.createContext("/grow", (ex: HttpExchange) => {
      LiveHits.inc("grow")
      val since = params(ex).get("since").map(_.toLong).getOrElse(0L)
      val items = (1L to visible.toLong).filter(_ >= since)
        .map(i => s"""{"id":$i,"day":"2024-01-${"%02d".format(i)}"}""")
      respond(ex, 200, s"""{"data":[${items.mkString(",")}]}""")
    })
    val src = RestSource("live", ClientConfig(base), Seq(RestResource("grow",
      EndpointConfig("grow", dataSelector = "data",
        incremental = Some(IncrementalBinding(cursorPath = "id", startParam = "since"))),
      graft.core.TableHints("grow", graft.core.Disposition.Merge, primaryKey = Seq("id")))))
    val dest = tmpDir("live-pipe-dest"); val stateDir = tmpDir("live-pipe-state")
    val pipe = new Pipeline(spark, "p", dest, stateDir)
    def resources = Seq(ResourceDef(
      name = "grow",
      hints = src.resources.head.hints,
      build = ctx => RestEngine.readResource(ctx.spark, src, src.resources.head,
        new UrlConnectionTransport(), Some(ctx.state)),
      incremental = Some((Incremental(Seq("id")), "id")),
    ))

    val r1 = pipe.run(SourceDef("live", resources))
    assert(r1.map(_.rows) == Seq(5L))
    assert(StateStore(stateDir, "p.live").getString("live.grow.cursor").contains("5"))

    // three new rows appear server-side; the committed cursor rides out as
    // ?since=5, the engine strict-filters the echoed id=5, merge lands 8
    visible = 8
    val r2 = pipe.run(SourceDef("live", resources))
    assert(r2.map(_.rows) == Seq(8L))
    assert(StateStore(stateDir, "p.live").getString("live.grow.cursor").contains("8"))
    val landed = spark.read.parquet(s"$dest/grow")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(landed == (1L to 8L).toSet)
    assert(LiveHits.get("grow") == 2, "one live request per run")
  }

  test("fleet config end-to-end over real sockets: parallel root pages + child fan-out on executors") {
    LiveHits.reset()
    // one context dispatching on the URI path: /deals is the root (7 deals
    // across 3 offset pages with a total -> RestPagesV2 plans one partition
    // per page; pages 1-2 fetch EXECUTOR-side with their own live
    // transports); /deals/{id}/parts is the child, fetched per parent key
    // in mapPartitions. Handler misbehavior answers 400 (an assert in a
    // server thread would hang the client instead of failing the test).
    val basicU = "Basic " +
      java.util.Base64.getEncoder.encodeToString("u:pw".getBytes("UTF-8"))
    val childPath = "^/deals/(\\d+)/parts$".r
    server.createContext("/deals", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      if (ex.getRequestHeaders.getFirst("Authorization") != basicU)
        respond(ex, 400, """{"err":"bad auth"}""")
      else path match {
        case childPath(dStr) =>
          val d = dStr.toInt
          LiveHits.inc(s"parts@$d")
          val rows = (0 to d % 2).map(j => s"""{"part":"p${d}_$j"}""")
          respond(ex, 200, s"""{"data":[${rows.mkString(",")}]}""")
        case "/deals" =>
          val off = params(ex).getOrElse("offset", "0").toInt
          LiveHits.inc(s"deals@$off")
          val ids = (off until math.min(off + 3, 7)).map(i => s"""{"deal_id":$i}""")
          respond(ex, 200, s"""{"data":[${ids.mkString(",")}],"meta":{"total":7}}""")
        case other => respond(ex, 404, s"""{"err":"$other"}""")
      }
    })
    val client = ClientConfig(base, auth = Some(Auth.Basic("u", "pw")))
    val deals = RestResource("deals",
      EndpointConfig("deals", dataSelector = "data",
        paginator = Paginator.Offset(pageSize = 3, totalPath = Some("meta.total"))),
      TableHints("deals", Disposition.Append))
    val parts = RestResource("parts",
      EndpointConfig("deals/{deal_id}/parts", dataSelector = "data",
        parent = Some(ParentBinding("deals", Seq("deal_id")))),
      TableHints("parts", Disposition.Append))
    val src = RestSource("crm", client, Seq(deals, parts))
    val tf = () => (new UrlConnectionTransport(): HttpTransport)

    val dealsDf = RestEngine.readResourceParallel(spark, src, deals, tf)
    assert(dealsDf.rdd.getNumPartitions == 3, "one partition per page")
    assert(dealsDf.select("deal_id").collect().map(_.getLong(0)).toSet == (0L to 6L).toSet)
    // exactly-once per page across inference + both actions above
    assert((0 to 6 by 3).map(o => LiveHits.get(s"deals@$o")) == Seq(1, 1, 1))

    val partsDf = RestEngine.readChildResource(spark, src, parts, dealsDf, tf)
    val got = partsDf.select("part").collect().map(_.getString(0)).toSet
    val want = (0 to 6).flatMap(d => (0 to d % 2).map(j => s"p${d}_$j")).toSet
    assert(got == want)
    assert((0 to 6).map(d => LiveHits.get(s"parts@$d")) == Seq.fill(7)(1),
      "each child endpoint fetched exactly once")
  }

  // ------------------------------------------------- failure shapes
  // The error paths a 100x fleet fan-out exercises in production: every
  // one must fail LOUD (or retry) — never hand a partial/garbage body to
  // the JSON layer, never spin forever, never buffer without bound.

  test("empty gzip-flagged body reads as empty; truncated gzip errors loud and retries to success") {
    server.createContext("/gz204", (ex: HttpExchange) => {
      // gzip-flagged but zero-length: the shape 204/304 and some error
      // handlers produce — must be "", not an EOFException
      ex.getResponseHeaders.set("Content-Encoding", "gzip")
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    val t = new UrlConnectionTransport()
    val r = t.get(s"$base/gz204", Map.empty, Map.empty)
    assert(r.status == 200 && r.body == "")

    val whole = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(("""{"items":[""" + Seq.fill(200)("""{"id":1}""").mkString(",") + "]}")
        .getBytes(StandardCharsets.UTF_8))
      gz.close(); bos.toByteArray
    }
    server.createContext("/gztrunc", (ex: HttpExchange) => {
      ex.getResponseHeaders.set("Content-Encoding", "gzip")
      if (LiveHits.inc("gztrunc") <= 2) { // first two hits: half the gzip stream
        val cut = whole.length / 2
        ex.sendResponseHeaders(200, cut)
        ex.getResponseBody.write(whole, 0, cut)
      } else {
        ex.sendResponseHeaders(200, whole.length)
        ex.getResponseBody.write(whole)
      }
      ex.close()
    })
    // direct: a named error, never a silent partial body
    val e = intercept[java.io.IOException](t.get(s"$base/gztrunc", Map.empty, Map.empty))
    assert(e.getMessage.contains("truncated or corrupt"))
    // through the retry layer: truncation is transient, attempt 2 serves whole
    val rt = new RetryingTransport(t, sleeper = _ => ())
    val r2 = rt.get(s"$base/gztrunc", Map.empty, Map.empty)
    assert(r2.status == 200 && r2.body.startsWith("""{"items":["""), r2.body.take(80))
    assert(LiveHits.get("gztrunc") == 3)
  }

  test("mid-stream connection reset is retryable; a redirect loop terminates bounded") {
    server.createContext("/reset", (ex: HttpExchange) => {
      if (LiveHits.inc("reset") == 1) {
        // promise 1000 bytes, deliver 7, slam the connection: the client
        // must see a premature EOF, not a short 200 body
        ex.sendResponseHeaders(200, 1000)
        ex.getResponseBody.write("partial".getBytes(StandardCharsets.UTF_8))
        ex.close()
      } else respond(ex, 200, """{"ok":true}""")
    })
    val rt = new RetryingTransport(new UrlConnectionTransport(), sleeper = _ => ())
    val r = rt.get(s"$base/reset", Map.empty, Map.empty)
    assert(r.status == 200 && r.body == """{"ok":true}""")
    assert(LiveHits.get("reset") == 2)

    server.createContext("/loopA", (ex: HttpExchange) => {
      LiveHits.inc("loop")
      respond(ex, 302, "", headers = Map("Location" -> s"$base/loopB"))
    })
    server.createContext("/loopB", (ex: HttpExchange) => {
      LiveHits.inc("loop")
      respond(ex, 302, "", headers = Map("Location" -> s"$base/loopA"))
    })
    // the JDK caps the follow chain (~20 hops) and raises ProtocolException
    intercept[java.io.IOException](
      new UrlConnectionTransport().get(s"$base/loopA", Map.empty, Map.empty))
    assert(LiveHits.get("loop") > 0 && LiveHits.get("loop") <= 40,
      s"redirect loop not bounded: ${LiveHits.get("loop")} hops")
  }

  test("oversized responses fail loud at the cap, raw and gzip-bombed alike") {
    server.createContext("/huge", (ex: HttpExchange) =>
      respond(ex, 200, "x" * 100000))
    server.createContext("/bomb", (ex: HttpExchange) =>
      respond(ex, 200, "y" * 100000, gzip = true)) // ~100 KB inflated from ~200 bytes
    val tiny = new UrlConnectionTransport(maxBodyBytes = 10000)
    val e1 = intercept[java.io.IOException](tiny.get(s"$base/huge", Map.empty, Map.empty))
    assert(e1.getMessage.contains("maxBodyBytes"))
    // the cap measures POST-inflate size, so a tiny compressed bomb trips it too
    val e2 = intercept[java.io.IOException](tiny.get(s"$base/bomb", Map.empty, Map.empty))
    assert(e2.getMessage.contains("maxBodyBytes") || e2.getMessage.contains("truncated or corrupt"),
      e2.getMessage)
  }
}
