package graft.connectors.rest

import graft.SparkTestBase
import graft.core.{Disposition, StateStore, TableHints}
import RestEngine._

/** Canned-response transport: routes on path suffix + selected params.
  * Serializable so parent-child fan-out can run it on executors.
  */
class FakeTransport(pages: Map[String, String]) extends HttpTransport {
  var calls: List[(String, Map[String, String])] = Nil
  override def get(url: String, params: Map[String, String], headers: Map[String, String]): HttpResponse = {
    calls = (url, params) :: calls
    val path = url.replaceFirst("^https?://[^/]+/", "")
    val keyWithParams = path + "?" + params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
    pages.get(keyWithParams).orElse(pages.get(path)) match {
      case Some(body) => HttpResponse(200, body)
      case None       => HttpResponse(404, s"""{"error":"no fixture for $keyWithParams"}""")
    }
  }
}

class RestEngineSpec extends SparkTestBase {

  private val client = ClientConfig("https://api.example.test")

  test("Json.select navigates dot paths and [*]") {
    val n = Json.parse("""{"a":{"b":[{"x":1},{"x":2}]},"next":"tok"}""")
    assert(Json.selectString(n, "next").contains("tok"))
    assert(Json.select(n, "$.a.b[*].x").map(_.asInt()) == Seq(1, 2))
    assert(Json.items(n, "a.b").size == 2)
    assert(Json.selectString(n, "missing.deep").isEmpty)
  }

  test("Json.select supports indexes and python-style slices (stripe last-id cursor)") {
    val n = Json.parse("""{"data":[{"id":"a"},{"id":"b"},{"id":"c"}],"has_more":true}""")
    assert(Json.selectString(n, "data[-1:].id").contains("c"))
    assert(Json.selectString(n, "data[0].id").contains("a"))
    assert(Json.selectString(n, "data[-1].id").contains("c"))
    assert(Json.select(n, "data[1:3].id").map(_.asText()) == Seq("b", "c"))
    assert(Json.select(n, "data[5].id").isEmpty)
    assert(Json.select(n, "data[3:].id").isEmpty)
  }

  test("offset pagination stops on short page") {
    // the limit/offset params are sent on the FIRST request too — a server
    // whose default page size differs must not break the short-page check
    val t = new FakeTransport(Map(
      "items?limit=2&offset=0" -> """{"data":[{"id":1},{"id":2}]}""",
      "items?limit=2&offset=2" -> """{"data":[{"id":3}]}""",
    ))
    val ep = EndpointConfig("items", dataSelector = "data", paginator = Paginator.Offset(pageSize = 2))
    val items = fetchPages(client, ep, t)
    assert(items.size == 3)
  }

  test("cursor pagination follows body cursor until absent") {
    val t = new FakeTransport(Map(
      "items?limit=100" -> """{"data":[{"id":1}],"meta":{"next":"c2"}}""",
      "items?cursor=c2&limit=100" -> """{"data":[{"id":2}],"meta":{"next":null}}""",
    ))
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Cursor(cursorPath = "meta.next", cursorParam = "cursor"))
    assert(fetchPages(client, ep, t).size == 2)
  }

  test("next-url pagination follows absolute links") {
    val t = new FakeTransport(Map(
      "items?" -> """{"data":[{"id":1}],"links":{"next":"https://api.example.test/items2"}}""",
      "items2?" -> """{"data":[{"id":2}],"links":{"next":null}}""",
    ))
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.NextUrl("links.next"))
    assert(fetchPages(client, ep, t).size == 2)
  }

  test("next-url hop does not duplicate a query-param credential the link already carries") {
    // APIs that echo the full original query in the next link would
    // receive the credential twice if auth re-applied it as a param
    val t = new FakeTransport(Map(
      "items?api_key=k" -> """{"data":[{"id":1}],"links":{"next":"https://api.example.test/items2?api_key=k&page=2"}}""",
      "items2?api_key=k&page=2" -> """{"data":[{"id":2}],"links":{"next":null}}""",
    ))
    val authed = client.copy(auth = Some(Auth.QueryParam("api_key", "k")))
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.NextUrl("links.next"))
    assert(fetchPages(authed, ep, t).size == 2)
    val Some((hopUrl, hopParams)) = t.calls.find(_._1.contains("items2"))
    assert(hopUrl.contains("api_key=k"), "the link itself carries the credential")
    assert(!hopParams.contains("api_key"),
      s"credential must not be re-applied as a param on a link that carries it: $hopParams")
  }

  test("next-url hop still applies query-param auth when the link omits the credential") {
    val t = new FakeTransport(Map(
      "items?api_key=k" -> """{"data":[{"id":1}],"links":{"next":"https://api.example.test/items2?page=2"}}""",
      "items2?page=2?api_key=k" -> """{"data":[{"id":2}],"links":{"next":null}}""",
    ))
    val authed = client.copy(auth = Some(Auth.QueryParam("api_key", "k")))
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.NextUrl("links.next"))
    assert(fetchPages(authed, ep, t).size == 2)
    val Some((_, hopParams)) = t.calls.find(_._1.contains("items2"))
    assert(hopParams.get("api_key").contains("k"),
      "a link WITHOUT the credential must still get auth applied")
  }

  test("single-object data selector unwraps to one item") {
    val t = new FakeTransport(Map("me?" -> """{"profile":{"id":7,"name":"x"}}"""))
    val items = fetchPages(client, EndpointConfig("me", dataSelector = "profile"), t)
    assert(items == Seq("""{"id":7,"name":"x"}"""))
  }

  test("incremental binding sends start param and filters strictly") {
    val t = new FakeTransport(Map(
      "events?since=5" -> """{"data":[{"id":5,"seq":5},{"id":6,"seq":6}]}""",
    ))
    val res = RestResource("events",
      EndpointConfig("events", dataSelector = "data",
        incremental = Some(IncrementalBinding(cursorPath = "seq", startParam = "since", initialValue = Some("5")))),
      TableHints("events", Disposition.Append))
    val src = RestSource("s", client, Seq(res))
    val df = readResource(spark, src, res, t)
    // API is start-inclusive; engine re-filters to strict >
    assert(df.select("id").collect().map(_.getLong(0)).toSeq == Seq(6L))
  }

  test("incremental binding reads last value from state") {
    val dir = tmpDir("rest-state")
    val state = StateStore(dir, "p")
    state.put("s.events.cursor", "8"); state.commit()
    val t = new FakeTransport(Map(
      "events?since=8" -> """{"data":[{"id":9,"seq":9}]}""",
    ))
    val res = RestResource("events",
      EndpointConfig("events", dataSelector = "data",
        incremental = Some(IncrementalBinding("seq", "since", initialValue = Some("0")))),
      TableHints("events", Disposition.Append))
    val df = readResource(spark, RestSource("s", client, Seq(res)), res, t, Some(state))
    assert(df.count() == 1)
  }

  test("parent-child fan-out interpolates path per parent key on executors") {
    import spark.implicits._
    val t = new FakeTransport(Map(
      "deals/1/participants?" -> """{"data":[{"pid":10},{"pid":11}]}""",
      "deals/2/participants?" -> """{"data":[{"pid":20}]}""",
    ))
    val parents = Seq((1L, "d1"), (2L, "d2")).toDF("id", "title")
    val res = RestResource("participants",
      EndpointConfig("deals/{id}/participants", dataSelector = "data",
        parent = Some(ParentBinding("deals", Seq("id")))),
      TableHints("participants", Disposition.Append))
    val df = readChildResource(spark, RestSource("s", client, Seq(res)), res, parents, () => t)
    assert(df.count() == 3)
    assert(df.columns.contains("_parent_id"))
    assert(df.where($"_parent_id" === "1").count() == 2)
  }

  test("include_from_parent carries parent fields into child rows as _<parent>_<field>") {
    import spark.implicits._
    val t = new FakeTransport(Map(
      "deals/1/followers?" -> """{"data":[{"user_id":10},{"user_id":11}]}""",
      "deals/2/followers?" -> """{"data":[{"user_id":20}]}""",
    ))
    // "id" is both the interpolation key AND an include (the pipedrive
    // shape, settings.py:100); "title" is a genuinely extra carried field
    val parents = Seq((1L, "d1"), (2L, "d2"), (2L, "d2")).toDF("id", "title")
    val res = RestResource("deal_followers",
      EndpointConfig("deals/{id}/followers", dataSelector = "data",
        parent = Some(ParentBinding("deals", Seq("id"), Seq("id", "title")))),
      TableHints("deal_followers", Disposition.Append))
    val df = readChildResource(spark, RestSource("s", client, Seq(res)), res, parents, () => t)
    assert(df.count() == 3, "duplicate parent rows must not duplicate fetches")
    assert(df.columns.toSet.intersect(Set("_parent_id", "_deals_id", "_deals_title")) ==
      Set("_parent_id", "_deals_id", "_deals_title"))
    assert(df.where($"_deals_id" === "2").select("_deals_title")
      .collect().map(_.getString(0)).toSeq == Seq("d2"))
    assert(df.where($"_deals_id" === "1").count() == 2)
  }

  test("parseLinkHeader: multi-value, quoted/bare rel, rel lists, relative targets") {
    assert(parseLinkHeader("""<https://x/p?page=2>; rel="next"""") ==
      Map("next" -> "https://x/p?page=2"))
    assert(parseLinkHeader(
      """<https://x/p?page=2>; rel="next", <https://x/p?page=9>; rel="last"""") ==
      Map("next" -> "https://x/p?page=2", "last" -> "https://x/p?page=9"))
    // bare rel, extra params, relative URL, and a space-separated rel list
    assert(parseLinkHeader("""</p?page=3>; title=pg; rel=next""") == Map("next" -> "/p?page=3"))
    assert(parseLinkHeader("""<https://x/a>; rel="next last"""") ==
      Map("next" -> "https://x/a", "last" -> "https://x/a"))
    // first link per rel wins; no rel param means no entry
    assert(parseLinkHeader("""<https://x/1>; rel="next", <https://x/2>; rel="next"""") ==
      Map("next" -> "https://x/1"))
    assert(parseLinkHeader("""<https://x/1>""") == Map.empty)
  }

  test("header_link paginator follows Link rel=next across pages and stops without it") {
    val pages = Map(
      "issues?per_page=2" -> """[{"id":1},{"id":2}]""",
      "issues?page=2&per_page=2" -> """[{"id":3},{"id":4}]""",
      "issues?page=3&per_page=2" -> """[{"id":5}]""",
    )
    val headers = Map(
      "issues?per_page=2" ->
        Map("link" -> """<https://api.example.test/issues?page=2&per_page=2>; rel="next""""),
      "issues?page=2&per_page=2" ->
        // relative target: must resolve against the current request URL
        Map("link" -> """</issues?page=3&per_page=2>; rel="next", <https://api.example.test/issues?page=3&per_page=2>; rel="last""""),
    )
    val t = StaticPagesTransport(pages, headers)
    val items = fetchPages(client,
      EndpointConfig("issues", params = Map("per_page" -> "2"),
        paginator = Paginator.HeaderLink()), t)
    assert(items.map(Json.parse(_).get("id").asInt()) == Seq(1, 2, 3, 4, 5))
  }

  test("start-time/stream protocol follows next start until end_of_stream") {
    val t = new FakeTransport(Map(
      "exports?" -> """{"data":[{"id":1}],"end_time":"1000","end_of_stream":false}""",
      "exports?start_time=1000" -> """{"data":[{"id":2}],"end_time":"2000","end_of_stream":true}""",
    ))
    val ep = EndpointConfig("exports", dataSelector = "data",
      paginator = Paginator.StartTime(nextStartPath = "end_time", startParam = "start_time"))
    assert(fetchPages(client, ep, t).size == 2)
  }

  test("newest-first early stop: page loop halts once cursor dips under last value") {
    val t = new FakeTransport(Map(
      "feed?limit=2&since=50" -> """{"data":[{"id":9,"seq":90},{"id":8,"seq":80}],"meta":{"next":"p2"}}""",
      "feed?cursor=p2&limit=2&since=50" -> """{"data":[{"id":7,"seq":60},{"id":6,"seq":40}],"meta":{"next":"p3"}}""",
      // p3 must never be requested: page 2 dipped to 40 <= 50
    ))
    val res = RestResource("feed",
      EndpointConfig("feed", dataSelector = "data",
        paginator = Paginator.Cursor("meta.next", "cursor", pageSize = 2),
        incremental = Some(IncrementalBinding("seq", "since", initialValue = Some("50"), newestFirst = true))),
      TableHints("feed", Disposition.Append))
    val df = readResource(spark, RestSource("s", client, Seq(res)), res, t)
    // page 2 was kept but loop stopped; engine-side filter then drops 40
    assert(df.select("id").collect().map(_.getLong(0)).toSet == Set(9L, 8L, 7L))
    assert(!t.calls.exists(_._2.get("cursor").contains("p3")))
  }

  test("attribution-window lag rewinds the start param and re-emits the window") {
    val dir = tmpDir("rest-lag")
    val state = StateStore(dir, "p")
    state.put("s.reports.cursor", "2024-01-10"); state.commit()
    val t = new FakeTransport(Map(
      // the request must carry the REWOUND date, and the returned window
      // (including the boundary day) must all come through
      "reports?since=2024-01-07" ->
        """{"data":[{"day":"2024-01-07","clicks":1},{"day":"2024-01-09","clicks":2},{"day":"2024-01-11","clicks":3}]}""",
    ))
    val res = RestResource("reports",
      EndpointConfig("reports", dataSelector = "data",
        incremental = Some(IncrementalBinding("day", "since", lagDays = 3))),
      TableHints("reports", Disposition.Merge, primaryKey = Seq("day")))
    val df = readResource(spark, RestSource("s", client, Seq(res)), res, t, Some(state))
    assert(df.select("day").collect().map(_.getString(0)).toSet ==
      Set("2024-01-07", "2024-01-09", "2024-01-11"))
  }

  test("rewindDays handles dates, datetimes, instants, and non-temporal cursors") {
    import graft.core.Incremental.rewindDays
    assert(rewindDays("2024-01-10", 3) == "2024-01-07")
    assert(rewindDays("2024-01-10 12:30:00", 3) == "2024-01-07 12:30:00")
    assert(rewindDays("2024-01-10T12:30:00", 3) == "2024-01-07T12:30:00")
    assert(rewindDays("2024-01-10T12:30:00Z", 3) == "2024-01-07T12:30:00Z")
    assert(rewindDays("opaque-cursor", 3) == "opaque-cursor")
    assert(rewindDays("2024-01-10", 0) == "2024-01-10")
  }

  test("newest-first early stop compares numeric cursors numerically, not as strings") {
    // lexicographically "100" <= "50", so a string compare would stop after
    // page 1 and silently skip seq=70; numeric compare must keep paging
    val t = new FakeTransport(Map(
      "feed?limit=2&since=50" -> """{"data":[{"id":3,"seq":100},{"id":2,"seq":90}],"meta":{"next":"p2"}}""",
      "feed?cursor=p2&limit=2&since=50" -> """{"data":[{"id":1,"seq":70},{"id":0,"seq":30}],"meta":{"next":null}}""",
    ))
    val res = RestResource("feed",
      EndpointConfig("feed", dataSelector = "data",
        paginator = Paginator.Cursor("meta.next", "cursor", pageSize = 2),
        incremental = Some(IncrementalBinding("seq", "since", initialValue = Some("50"), newestFirst = true))),
      TableHints("feed", Disposition.Append))
    val df = readResource(spark, RestSource("s", client, Seq(res)), res, t)
    assert(df.select("id").collect().map(_.getLong(0)).toSet == Set(3L, 2L, 1L))
  }

  test("retrying transport backs off on 5xx then succeeds") {
    var n = 0
    val flaky = new HttpTransport {
      override def get(u: String, p: Map[String, String], h: Map[String, String]) = {
        n += 1
        if (n < 3) HttpResponse(503, "busy") else HttpResponse(200, """{"ok":true}""")
      }
    }
    var slept = List.empty[Long]
    val t = new RetryingTransport(flaky, maxRetries = 5, initialBackoffMs = 10, sleeper = ms => slept ::= ms)
    val resp = t.get("x", Map.empty, Map.empty)
    assert(resp.status == 200 && n == 3)
    assert(slept.reverse == List(10L, 20L))
  }

  test("auth strategies land in headers or params") {
    val (p1, h1) = Auth.Bearer("tok").applyTo(Map.empty, Map.empty)
    assert(h1("Authorization") == "Bearer tok" && p1.isEmpty)
    val (p2, _) = Auth.QueryParam("api_key", "k").applyTo(Map.empty, Map.empty)
    assert(p2("api_key") == "k")
    val (_, h3) = Auth.Basic("u", "p").applyTo(Map.empty, Map.empty)
    assert(h3("Authorization").startsWith("Basic "))
  }

  /** Canned OAuth2 server + API: mints sequential tokens on the token
    * endpoint, serves pages only to the CURRENT token (a superseded or
    * revoked token gets 401 — the refresh trigger under test).
    */
  private class OAuthTransport(pageBody: String) extends HttpTransport {
    var mints = 0
    var grants: List[Map[String, String]] = Nil
    var revoked = false
    var gets = 0
    override def post(url: String, body: String, headers: Map[String, String]): HttpResponse = {
      assert(url.endsWith("/token"), url)
      assert(headers("Content-Type") == "application/x-www-form-urlencoded")
      grants ::= body.split("&").map(_.split("=", 2)).map {
        case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      mints += 1
      revoked = false
      HttpResponse(200, s"""{"access_token":"tok$mints","expires_in":100,"token_type":"Bearer"}""")
    }
    override def get(url: String, params: Map[String, String], headers: Map[String, String]): HttpResponse = {
      gets += 1
      val ok = headers.get("Authorization").contains(s"Bearer tok$mints") && !revoked
      if (!ok) HttpResponse(401, """{"error":"invalid_token"}""")
      else HttpResponse(200, pageBody)
    }
  }

  test("OAuth2 client-credentials: one mint serves many requests until expiry, then re-mints") {
    var clock = 1000000L
    val t = new OAuthTransport("""{"items":[{"id":1}]}""")
    val auth = new Auth.OAuth2("https://auth.example.test/token", "cid", "csecret",
      transport = t, expirySkewMs = 10000L, now = () => clock)
    val cfg = ClientConfig("https://api.example.test", Some(auth))
    val ep = EndpointConfig("things", dataSelector = "items")
    (1 to 3).foreach(_ => assert(fetchPages(cfg, ep, t).size == 1))
    assert(t.mints == 1, "a cached unexpired token must be reused across requests")
    assert(t.grants.head("grant_type") == "client_credentials")
    assert(t.grants.head("client_id") == "cid" && t.grants.head("client_secret") == "csecret")
    // cross the expiry (100 s ttl, 10 s skew): next request re-mints
    clock += 95000L
    assert(fetchPages(cfg, ep, t).size == 1)
    assert(t.mints == 2, "an expired (within skew) token must be re-minted, not sent")
  }

  test("OAuth2 refresh-token grant posts the refresh token; 401 forces re-mint and one retry") {
    val t = new OAuthTransport("""{"items":[{"id":1}]}""")
    val auth = new Auth.OAuth2("https://auth.example.test/token", "cid", "csecret",
      refreshToken = Some("rt-123"), transport = t)
    val cfg = ClientConfig("https://api.example.test", Some(auth))
    val ep = EndpointConfig("things", dataSelector = "items")
    assert(fetchPages(cfg, ep, t).size == 1)
    assert(t.grants.head("grant_type") == "refresh_token")
    assert(t.grants.head("refresh_token") == "rt-123")
    // server-side revocation (token invalidated before its expiry):
    // the engine must refresh on the 401 and retry once, transparently
    t.revoked = true
    assert(fetchPages(cfg, ep, t).size == 1)
    assert(t.mints == 2, "a 401 must trigger exactly one re-mint")
  }

  test("OAuth2 token minting failures and missing tokens are loud") {
    val bad = new HttpTransport {
      override def post(url: String, body: String, headers: Map[String, String]) =
        HttpResponse(500, """{"error":"down"}""")
      override def get(u: String, p: Map[String, String], h: Map[String, String]) =
        HttpResponse(200, "{}")
    }
    val e1 = intercept[RuntimeException] {
      new Auth.OAuth2("https://auth.example.test/token", "c", "s", transport = bad)
        .applyTo(Map.empty, Map.empty)
    }
    assert(e1.getMessage.contains("HTTP 500"))
    val noToken = new HttpTransport {
      override def post(url: String, body: String, headers: Map[String, String]) =
        HttpResponse(200, """{"token_type":"Bearer"}""")
      override def get(u: String, p: Map[String, String], h: Map[String, String]) =
        HttpResponse(200, "{}")
    }
    val e2 = intercept[RuntimeException] {
      new Auth.OAuth2("https://auth.example.test/token", "c", "s", transport = noToken)
        .applyTo(Map.empty, Map.empty)
    }
    assert(e2.getMessage.contains("access_token"))
  }

  test("personio fleet config models the reference token exchange (data.token)") {
    // reference: client credentials POSTed to /auth, bearer from the
    // response's data.token (sources/personio/helpers.py:24-37)
    val t = new HttpTransport {
      var minted = 0
      override def post(url: String, body: String, headers: Map[String, String]) = {
        assert(url == "https://api.personio.de/v1/auth", url)
        minted += 1
        HttpResponse(200, """{"success":true,"data":{"token":"ptok"}}""")
      }
      override def get(url: String, params: Map[String, String], headers: Map[String, String]) = {
        assert(headers.get("Authorization").contains("Bearer ptok"))
        HttpResponse(200, """{"data":[]}""")
      }
    }
    val src = graft.connectors.sources.Fleet.personio("id", "secret", authTransport = t)
    val employees = src.resources.find(_.name == "employees").get
    assert(fetchPages(src.client, employees.endpoint, t).isEmpty) // empty page, auth exercised
  }

  // ----------------------------------------------------- auto detection

  test("auto: a body next-link resolves to json_link and the chain is followed") {
    val t = new FakeTransport(Map(
      "items" -> """{"data":[{"id":1}],"next":"https://api.example.test/items2"}""",
      "items2" -> """{"data":[{"id":2}],"next":null}""",
    ))
    val ep = EndpointConfig("items", dataSelector = "data", paginator = Paginator.Auto)
    assert(fetchPages(client, ep, t).map(Json.parse(_).get("id").asInt()) == Seq(1, 2))
  }

  test("auto: a Link rel=next header resolves to header_link (and natural-cased fixture keys work)") {
    // fixture headers keyed "Link" in NATURAL casing — StaticPagesTransport
    // must lowercase them, or detection (and pagination) silently misses
    val pages = Map(
      "items" -> """[{"id":1},{"id":2}]""",
      "items?page=2" -> """[{"id":3}]""",
    )
    val headers = Map(
      "items" -> Map("Link" -> """<https://api.example.test/items?page=2>; rel="next""""))
    val ep = EndpointConfig("items", paginator = Paginator.Auto)
    val items = fetchPages(client, ep, StaticPagesTransport(pages, headers))
    assert(items.map(Json.parse(_).get("id").asInt()) == Seq(1, 2, 3))
  }

  test("auto: a numeric total count resolves to offset strided by the OBSERVED page size") {
    // server pages at 2 regardless of what a config default would claim;
    // detection must stride by the observed 2, not a configured 100
    val t = new FakeTransport(Map(
      "items" -> """{"data":[{"id":1},{"id":2}],"total":5}""",
      "items?limit=2&offset=2" -> """{"data":[{"id":3},{"id":4}],"total":5}""",
      "items?limit=2&offset=4" -> """{"data":[{"id":5}],"total":5}""",
    ))
    val ep = EndpointConfig("items", dataSelector = "data", paginator = Paginator.Auto)
    assert(fetchPages(client, ep, t).map(Json.parse(_).get("id").asInt()) == Seq(1, 2, 3, 4, 5))
  }

  test("auto: a plain body (and a non-URL cursor under 'next') resolve to single page") {
    val t = new FakeTransport(Map("items" -> """{"data":[{"id":1}]}"""))
    val ep = EndpointConfig("items", dataSelector = "data", paginator = Paginator.Auto)
    assert(fetchPages(client, ep, t).size == 1)
    assert(t.calls.size == 1) // exactly one request — no probing beyond page one
    // a bare cursor token under 'next' must NOT be fetched as a URL
    val t2 = new FakeTransport(Map(
      "items" -> """{"data":[{"id":1}],"next":"b64cursorXYZ","total":"not-a-number"}"""))
    assert(fetchPages(client, ep, t2).size == 1)
    assert(t2.calls.size == 1)
  }

  test("header_link continues past an empty MIDDLE page that still carries rel=next") {
    // sparse shards legally emit empty pages mid-chain; rel=next absence —
    // not emptiness — is the terminator (RFC 5988)
    val pages = Map(
      "items" -> """[{"id":1}]""",
      "items?page=2" -> """[]""",
      "items?page=3" -> """[{"id":2}]""",
    )
    val headers = Map(
      "items" -> Map("link" -> """<https://api.example.test/items?page=2>; rel="next""""),
      "items?page=2" -> Map("link" -> """<https://api.example.test/items?page=3>; rel="next""""),
    )
    val ep = EndpointConfig("items", paginator = Paginator.HeaderLink())
    val items = fetchPages(client, ep, StaticPagesTransport(pages, headers))
    assert(items.map(Json.parse(_).get("id").asInt()) == Seq(1, 2))
  }

  test("response_actions: a declared ignore ends the chain quietly, unmatched errors stay loud") {
    val ignore404 = Seq(ResponseAction(statusCode = Some(404)))
    // mid-chain 404 with a declared ignore: keep the pages already read
    val t = new FakeTransport(Map(
      "items" -> """{"data":[{"id":1}],"next":"https://api.example.test/items2"}"""))
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.NextUrl("next"), responseActions = ignore404)
    assert(fetchPages(client, ep, t).size == 1) // items2 404s -> clean stop
    // without the rule the same 404 is an error
    val epLoud = ep.copy(responseActions = Nil)
    val e = intercept[RuntimeException](fetchPages(client, epLoud, t))
    assert(e.getMessage.contains("404"), e.getMessage)
    // content matching composes with status (AND): both must hit
    val t2 = new FakeTransport(Map.empty) // everything 404s with a body naming the key
    val epBoth = EndpointConfig("missing", dataSelector = "data",
      responseActions = Seq(ResponseAction(Some(404), Some("no fixture"))))
    assert(fetchPages(client, epBoth, t2).isEmpty)
    val epMismatch = EndpointConfig("missing", dataSelector = "data",
      responseActions = Seq(ResponseAction(Some(404), Some("some other body"))))
    intercept[RuntimeException](fetchPages(client, epMismatch, t2))
    // the classic shape: per-parent child endpoints where some parents 404
    val t3 = new FakeTransport(Map(
      "deals/1/files" -> """{"data":[{"f":"a"},{"f":"b"}]}""",
      "deals/3/files" -> """{"data":[{"f":"c"}]}"""))
    val child = EndpointConfig("deals/{id}/files", dataSelector = "data",
      responseActions = ignore404)
    val rows = Seq("1", "2", "3").flatMap(id =>
      fetchPages(client, child, t3, pathVars = Map("id" -> id)))
    assert(rows.size == 3) // deal 2's 404 yields nothing instead of failing the run
  }

  test("header_link names the offending Link value when the target cannot resolve") {
    val pages = Map("items" -> """[{"id":1}]""")
    val headers = Map(
      "items" -> Map("link" -> """</items?q=a b|c>; rel="next"""")) // unencoded space and '|'
    val ep = EndpointConfig("items", paginator = Paginator.HeaderLink())
    val e = intercept[RuntimeException](
      fetchPages(client, ep, StaticPagesTransport(pages, headers)))
    assert(e.getMessage.contains("header_link"), e.getMessage)
    assert(e.getMessage.contains("/items?q=a b|c"), e.getMessage)
    assert(e.getMessage.contains("URL-encoded"), e.getMessage)
  }

  test("offset with a total stops at the total without requesting a trailing empty page") {
    // the fixture has NO offset=4 page: requesting it would 404 and throw,
    // so a green run proves the bound ended the chain
    val t = new FakeTransport(Map(
      "items?limit=2&offset=0" -> """{"data":[{"id":1},{"id":2}],"total":4}""",
      "items?limit=2&offset=2" -> """{"data":[{"id":3},{"id":4}],"total":4}""",
    ))
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 2, totalPath = Some("total")))
    assert(fetchPages(client, ep, t).size == 4)
    assert(t.calls.size == 2)
  }

  test("auto-detected offset is bounded by the total that selected it (offset-ignoring server)") {
    // a server that ignores offset/limit returns the identical full page
    // forever — never short. Detection picked offset BECAUSE a total was
    // present; that same total must bound the chain (2 requests for
    // total=4 at observed size 2), not maxPages' 10000 duplicate pages.
    val page = """{"data":[{"id":1},{"id":2}],"total":4}"""
    val t = new FakeTransport(Map(
      "items" -> page,
      "items?limit=2&offset=2" -> page, // same body: offset ignored
    ))
    val ep = EndpointConfig("items", dataSelector = "data", paginator = Paginator.Auto)
    val items = fetchPages(client, ep, t)
    assert(t.calls.size == 2, t.calls)
    assert(items.size == 4) // what the server actually returned for its claimed total
  }

  test("json_link resolves a RELATIVE body next-link against the current request URL") {
    val t = new FakeTransport(Map(
      "v2/items" -> """{"data":[{"id":1}],"next":"/v2/items?page=2"}""",
      "v2/items?page=2" -> """{"data":[{"id":2}],"next":null}""",
    ))
    val ep = EndpointConfig("v2/items", dataSelector = "data",
      paginator = Paginator.NextUrl("next"))
    assert(fetchPages(client, ep, t).map(Json.parse(_).get("id").asInt()) == Seq(1, 2))
    // auto detection accepts rooted next-links too — same resolution path
    val t2 = new FakeTransport(Map(
      "v2/items" -> """{"data":[{"id":1}],"next":"/v2/items?page=2"}""",
      "v2/items?page=2" -> """{"data":[{"id":2}],"next":null}""",
    ))
    val epAuto = EndpointConfig("v2/items", dataSelector = "data", paginator = Paginator.Auto)
    assert(fetchPages(client, epAuto, t2).map(Json.parse(_).get("id").asInt()) == Seq(1, 2))
  }

  test("json_link names the offending body link when the target cannot resolve") {
    val t = new FakeTransport(Map(
      "items" -> """{"data":[{"id":1}],"next":"/items?q=a b|c"}"""))
    val ep = EndpointConfig("items", dataSelector = "data", paginator = Paginator.NextUrl("next"))
    val e = intercept[RuntimeException](fetchPages(client, ep, t))
    assert(e.getMessage.contains("json_link"), e.getMessage)
    assert(e.getMessage.contains("/items?q=a b|c"), e.getMessage)
  }

  test("POST endpoint: cursor advances in the json body, params stay in the query") {
    val posts = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val t = new HttpTransport {
      override def get(url: String, params: Map[String, String],
          headers: Map[String, String]): HttpResponse =
        HttpResponse(500, "POST endpoint must not issue GETs")
      override def post(url: String, body: String, headers: Map[String, String]): HttpResponse = {
        posts += (url -> body)
        val path = url.replaceFirst("^https?://[^/]+/", "")
        (path, body) match {
          case ("search?version=2", """{"query":"docs","limit":2}""") =>
            HttpResponse(200, """{"data":[{"id":1},{"id":2}],"meta":{"next":"c2"}}""")
          case ("search?version=2", """{"query":"docs","limit":2,"cursor":"c2"}""") =>
            HttpResponse(200, """{"data":[{"id":3}],"meta":{"next":null}}""")
          case _ => HttpResponse(404, s"""{"error":"no fixture for POST $path body=$body"}""")
        }
      }
    }
    val ep = EndpointConfig("search", params = Map("version" -> "2"),
      dataSelector = "data", method = "POST",
      jsonBody = Some("""{"query":"docs","limit":2}"""),
      paginator = Paginator.Cursor(cursorPath = "meta.next", cursorParam = "cursor"))
    val items = fetchPages(client, ep, t)
    assert(items.map(Json.parse(_).get("id").asInt()) == Seq(1, 2, 3))
    assert(posts.size == 2)
    // page 1 sends the body template verbatim; page 2 merges ONLY the cursor
    assert(posts.head._2 == """{"query":"docs","limit":2}""")
    assert(posts.last._2 == """{"query":"docs","limit":2,"cursor":"c2"}""")
    // query params rode the URL on both requests
    assert(posts.forall(_._1.endsWith("search?version=2")), posts)
  }

  test("a json body on a GET endpoint is rejected at construction") {
    val e = intercept[IllegalArgumentException](
      EndpointConfig("items", jsonBody = Some("""{"a":1}""")))
    assert(e.getMessage.contains("POST"), e.getMessage)
  }

  test("processing_steps filter and drop items without disturbing pagination") {
    // page 2's items ALL fail the filter — the chain must still advance to
    // page 3 (pagination sees the server's items, steps shape only output)
    val t = new FakeTransport(Map(
      "items?limit=2&offset=0" -> """{"data":[{"id":1,"s":"keep","x":9},{"id":2,"s":"drop","x":8}]}""",
      "items?limit=2&offset=2" -> """{"data":[{"id":3,"s":"drop","x":7},{"id":4,"s":"drop","x":6}]}""",
      "items?limit=2&offset=4" -> """{"data":[{"id":5,"s":"keep","x":5}]}""",
    ))
    val ep = EndpointConfig("items", dataSelector = "data",
      paginator = Paginator.Offset(pageSize = 2),
      processingSteps = Seq(
        ProcessingStep.Filter("s", "eq", Some("keep")),
        ProcessingStep.DropFields(Seq("x"))))
    val items = fetchPages(client, ep, t)
    assert(items.map(Json.parse(_).get("id").asInt()) == Seq(1, 5))
    assert(items.forall(!_.contains("\"x\"")), items)
  }

  test("processing_steps predicates: numeric compare, contains, not_null, missing fails") {
    import ProcessingStep._
    def item(s: String) = Json.parse(s)
    assert(keeps(Filter("n", "gt", Some("9")), item("""{"n":10}""")))
    assert(!keeps(Filter("n", "gt", Some("9")), item("""{"n":"10"}"""))) // "10" < "9" as strings
    assert(keeps(Filter("n", "le", Some("10")), item("""{"n":10}""")))
    assert(keeps(Filter("s", "contains", Some("bc")), item("""{"s":"abcd"}""")))
    assert(keeps(Filter("a.b", "eq", Some("x")), item("""{"a":{"b":"x"}}""")))
    assert(keeps(Filter("s", "not_null", None), item("""{"s":""}""")))
    assert(!keeps(Filter("s", "not_null", None), item("""{"s":null}""")))
    assert(!keeps(Filter("missing", "ne", Some("v")), item("""{"s":1}"""))) // missing fails every op
  }
}
