package graft.connectors.rest

import graft.SparkTestBase
import graft.connectors.sources.Fleet
import graft.core.Disposition
import RestEngine._

/** Config-as-data loader: a JSON document shaped like the reference's
  * RESTAPIConfig (sources/pipedrive/rest_v2/__init__.py:96-168) must parse
  * to the SAME RestSource a hand-built Fleet config produces — structural
  * equality here, hash-identical landed tables in q_fleet_config.
  */
class RestConfigSpec extends SparkTestBase {

  test("github config document parses structurally equal to Fleet.github") {
    val cfg = """
      {
        "name": "github",
        "client": {
          "base_url": "https://api.github.com",
          "headers": {"Accept": "application/vnd.github+json"}
        },
        "resources": [
          {"name": "repo_events",
           "endpoint": {"path": "repos/octo/repo/events",
                        "paginator": {"type": "page_number", "page_param": "page",
                                      "size_param": "per_page", "page_size": 100}},
           "table_name": "issues_events",
           "write_disposition": "append"},
          {"name": "issues",
           "endpoint": {"path": "repos/octo/repo/issues",
                        "params": {"state": "all", "sort": "updated", "direction": "asc",
                                   "since": "{incremental.start_value}"},
                        "paginator": {"type": "page_number", "size_param": "per_page", "page_size": 100},
                        "incremental": {"cursor_path": "updated_at"}},
           "primary_key": "id",
           "write_disposition": "merge"},
          {"name": "stargazers",
           "endpoint": {"path": "repos/octo/repo/stargazers",
                        "paginator": {"type": "page_number", "size_param": "per_page", "page_size": 100}},
           "write_disposition": "replace"}
        ]
      }"""
    assert(RestConfig.fromJson(cfg) == Fleet.github("octo", "repo", None))
  }

  test("bearer-auth github config matches Fleet.github with a token") {
    val cfg = """
      {"name": "github",
       "client": {"base_url": "https://api.github.com",
                  "headers": {"Accept": "application/vnd.github+json"},
                  "auth": {"type": "bearer", "token": "tok123"}},
       "resources": [
         {"name": "repo_events",
          "endpoint": {"path": "repos/o/r/events",
                       "paginator": {"type": "page_number", "size_param": "per_page", "page_size": 100}},
          "table_name": "issues_events", "write_disposition": "append"},
         {"name": "issues",
          "endpoint": {"path": "repos/o/r/issues",
                       "params": {"state": "all", "sort": "updated", "direction": "asc"},
                       "paginator": {"type": "page_number", "size_param": "per_page", "page_size": 100},
                       "incremental": {"cursor_path": "updated_at", "start_param": "since"}},
          "primary_key": "id", "write_disposition": "merge"},
         {"name": "stargazers",
          "endpoint": {"path": "repos/o/r/stargazers",
                       "paginator": {"type": "page_number", "size_param": "per_page", "page_size": 100}},
          "write_disposition": "replace"}
       ]}"""
    assert(RestConfig.fromJson(cfg) == Fleet.github("o", "r", Some("tok123")))
  }

  test("pipedrive-shaped config: defaults, api_key query auth, string resources, parent refs") {
    // mirrors the reference document at sources/pipedrive/rest_v2/__init__.py:138-168
    val cfg = """
      {
        "name": "pipedrive",
        "client": {
          "base_url": "https://acme.pipedrive.com/api/v2/",
          "auth": {"type": "api_key", "name": "api_token", "api_key": "k1", "location": "query"}
        },
        "resource_defaults": {
          "primary_key": "id",
          "write_disposition": "merge",
          "endpoint": {
            "params": {"limit": 500, "sort_by": "update_time", "sort_direction": "desc"},
            "data_selector": "data",
            "paginator": {"type": "cursor", "cursor_path": "additional_data.next_cursor",
                          "cursor_param": "cursor"}
          }
        },
        "resources": [
          "deals",
          {"name": "deals_flow",
           "endpoint": {"path": "deals/{resources.deals.id}/flow",
                        "params": {"limit": 100}}}
        ]
      }"""
    val src = RestConfig.fromJson(cfg)
    assert(src.name == "pipedrive")
    assert(src.client.auth.contains(Auth.QueryParam("api_token", "k1")))

    val deals = src.resources.find(_.name == "deals").get
    assert(deals.endpoint.path == "deals")
    assert(deals.endpoint.params == Map("limit" -> "500", "sort_by" -> "update_time", "sort_direction" -> "desc"))
    assert(deals.endpoint.dataSelector == "data")
    assert(deals.endpoint.paginator ==
      Paginator.Cursor("additional_data.next_cursor", "cursor", 100, "limit"))
    assert(deals.hints.disposition == Disposition.Merge)
    assert(deals.hints.primaryKey == Seq("id"))

    val flow = src.resources.find(_.name == "deals_flow").get
    assert(flow.endpoint.path == "deals/{id}/flow")
    assert(flow.endpoint.parent.contains(ParentBinding("deals", Seq("id"))))
    // resource params override the defaults key-wise, other defaults survive
    assert(flow.endpoint.params("limit") == "100")
    assert(flow.endpoint.params("sort_by") == "update_time")
  }

  test("every paginator family parses; unknown types are rejected") {
    def pag(j: String): Paginator = RestConfig.parsePaginator(Json.parse(j))
    assert(pag("""{"type":"offset","limit":50,"total_path":"meta.total"}""") ==
      Paginator.Offset("offset", "limit", 50, Some("meta.total")))
    assert(pag("""{"type":"page_number","page_param":"p","size_param":"n","page_size":25}""") ==
      Paginator.PageNumber("p", "n", 25, None))
    assert(pag("""{"type":"cursor","cursor_path":"next_cursor","cursor_param":"cursor"}""") ==
      Paginator.Cursor("next_cursor", "cursor", 100, "limit"))
    assert(pag("""{"type":"json_link","next_url_path":"paging.next.link"}""") ==
      Paginator.NextUrl("paging.next.link"))
    assert(pag("""{"type":"json_response"}""") == Paginator.NextUrl("next"))
    assert(pag("""{"type":"header_link"}""") == Paginator.HeaderLink("next"))
    assert(pag("""{"type":"header_link","links_next_key":"nextpage"}""") ==
      Paginator.HeaderLink("nextpage"))
    assert(pag("\"header_link\"") == Paginator.HeaderLink())
    assert(pag("""{"type":"start_time","next_start_path":"end_time","start_param":"start_time"}""") ==
      Paginator.StartTime("end_time", "start_time", "end_of_stream"))
    assert(pag("\"single_page\"") == Paginator.Single)
    assert(pag("\"offset\"") == Paginator.Offset())
    assert(pag("""{"type":"auto"}""") == Paginator.Auto)
    assert(pag("\"auto\"") == Paginator.Auto)
    intercept[IllegalArgumentException](pag("""{"type":"zigzag"}"""))
    // auto takes no other keys — a stray param is a config error, not a hint
    intercept[IllegalArgumentException](pag("""{"type":"auto","page_size":5}"""))
  }

  test("paginator precedence: endpoint > resource_defaults > client > Auto") {
    def src(cfg: String) = RestConfig.fromJson(cfg)
    // all levels silent -> runtime detection, dlt's own default
    val silent = src("""{"client": {"base_url": "https://x"},
                         "resources": [{"name": "r", "endpoint": {"path": "r"}}]}""")
    assert(silent.resources.head.endpoint.paginator == Paginator.Auto)
    // client-level default applies source-wide
    val clientLvl = src("""{"client": {"base_url": "https://x",
                            "paginator": {"type": "page_number", "page_size": 7}},
                            "resources": ["a", {"name": "b", "endpoint": {"path": "b"}}]}""")
    assert(clientLvl.resources.map(_.endpoint.paginator).distinct ==
      Seq(Paginator.PageNumber(pageSize = 7)))
    // endpoint overrides client
    val epWins = src("""{"client": {"base_url": "https://x", "paginator": "single_page"},
                         "resources": [{"name": "r", "endpoint": {"path": "r",
                           "paginator": {"type": "offset", "limit": 9}}}]}""")
    assert(epWins.resources.head.endpoint.paginator == Paginator.Offset(pageSize = 9))
    // resource_defaults overrides client too
    val defWins = src("""{"client": {"base_url": "https://x", "paginator": "single_page"},
                          "resource_defaults": {"endpoint": {"paginator": "header_link"}},
                          "resources": [{"name": "r", "endpoint": {"path": "r"}}]}""")
    assert(defWins.resources.head.endpoint.paginator == Paginator.HeaderLink())
  }

  test("selected: false excludes a resource but still validates it; parallelized is a no-op") {
    val cfg = """{"client": {"base_url": "https://x"},
                  "resources": [
                    {"name": "on", "endpoint": {"path": "on"}, "parallelized": true},
                    {"name": "off", "endpoint": {"path": "off"}, "selected": false}]}"""
    assert(RestConfig.fromJson(cfg).resources.map(_.name) == Seq("on"))
    // a typo inside a DESELECTED resource still fails loudly — deselection
    // is an opt-out from loading, not from validation
    val typo = """{"client": {"base_url": "https://x"},
                   "resources": [{"name": "off", "selected": false,
                     "endpoint": {"path": "off", "paginater": "single_page"}}]}"""
    val e = intercept[IllegalArgumentException](RestConfig.fromJson(typo))
    assert(e.getMessage.contains("paginater"))
    // a non-boolean `selected` fails loudly: "false" the STRING would
    // otherwise silently load a resource the user believed deselected
    val strSel = """{"client": {"base_url": "https://x"},
                     "resources": [{"name": "off", "endpoint": {"path": "off"},
                       "selected": "false"}]}"""
    val se = intercept[IllegalArgumentException](RestConfig.fromJson(strSel))
    assert(se.getMessage.contains("'selected' must be a JSON boolean"), se.getMessage)
  }

  test("method POST + json body parse; other verbs and contradictions fail pointedly") {
    def err(cfg: String): String =
      intercept[IllegalArgumentException](RestConfig.fromJson(cfg)).getMessage
    // explicit GET (the default spelled out) is accepted
    assert(RestConfig.fromJson("""{"client": {"base_url": "https://x"},
      "resources": [{"name": "r", "endpoint": {"path": "r", "method": "GET"}}]}""")
      .resources.head.endpoint.method == "GET")
    // POST with a json body template parses; the body keeps raw JSON
    // (nested values and numbers stay typed, not string-coerced)
    val post = RestConfig.fromJson("""{"client": {"base_url": "https://x"},
      "resources": [{"name": "r", "endpoint": {"path": "search", "method": "post",
        "json": {"query": {"kind": "doc"}, "limit": 50},
        "paginator": {"type": "cursor", "cursor_path": "meta.next", "cursor_param": "cursor"}}}]}""")
    val ep = post.resources.head.endpoint
    assert(ep.method == "POST")
    assert(ep.jsonBody.contains("""{"query":{"kind":"doc"},"limit":50}"""))
    // other verbs fail with a pointed message
    val m = err("""{"client": {"base_url": "https://x"},
                    "resources": [{"name": "r", "endpoint": {"path": "r", "method": "DELETE"}}]}""")
    assert(m.contains("method 'DELETE'") && m.contains("GET or POST"), m)
    // a json body on a GET endpoint is a contradiction, not a request
    val g = err("""{"client": {"base_url": "https://x"},
                    "resources": [{"name": "r", "endpoint": {"path": "r", "json": {"a": 1}}}]}""")
    assert(g.contains("require 'method': 'POST'"), g)
    // `data` (form bodies) stays recognized-but-unsupported with a reason
    val d = err("""{"client": {"base_url": "https://x"},
                    "resources": [{"name": "r", "endpoint": {"path": "r", "data": {"a": 1}}}]}""")
    assert(d.contains("data") && d.contains("form-encoded"), d)
    // alien typo still fails naming the key
    val mix = err("""{"client": {"base_url": "https://x"},
                      "resources": [{"name": "r",
                        "endpoint": {"path": "r", "pth": "x"}}]}""")
    assert(mix.contains("pth"), mix)
  }

  test("processing_steps: declarative filter/drop parse; callable-only shapes fail loudly") {
    def err(cfg: String): String =
      intercept[IllegalArgumentException](RestConfig.fromJson(cfg)).getMessage
    val src = RestConfig.fromJson("""{"client": {"base_url": "https://x"},
      "resources": [{"name": "r", "endpoint": {"path": "r"},
        "processing_steps": [
          {"filter": {"field": "status", "eq": "active"}},
          {"filter": {"field": "meta.score", "gt": 10}},
          {"filter": {"field": "id", "not_null": true}},
          {"map": {"drop_fields": ["secret", "internal"]}}]}]}""")
    assert(src.resources.head.endpoint.processingSteps == Seq(
      ProcessingStep.Filter("status", "eq", Some("active")),
      ProcessingStep.Filter("meta.score", "gt", Some("10")),
      ProcessingStep.Filter("id", "not_null", None),
      ProcessingStep.DropFields(Seq("secret", "internal"))))
    // resource_defaults carry steps source-wide
    val viaDefaults = RestConfig.fromJson("""{"client": {"base_url": "https://x"},
      "resource_defaults": {"processing_steps": [{"filter": {"field": "ok", "eq": true}}]},
      "resources": ["a"]}""")
    assert(viaDefaults.resources.head.endpoint.processingSteps ==
      Seq(ProcessingStep.Filter("ok", "eq", Some("true"))))
    // a filter with zero or two ops is ambiguous, not guessable
    assert(err("""{"client": {"base_url": "https://x"},
      "resources": [{"name": "r", "endpoint": {"path": "r"},
        "processing_steps": [{"filter": {"field": "x"}}]}]}""").contains("exactly one op"))
    assert(err("""{"client": {"base_url": "https://x"},
      "resources": [{"name": "r", "endpoint": {"path": "r"},
        "processing_steps": [{"filter": {"field": "x", "eq": 1, "gt": 2}}]}]}""")
      .contains("multiple ops"))
    // map shapes beyond drop_fields are dlt callables — loud reject
    assert(err("""{"client": {"base_url": "https://x"},
      "resources": [{"name": "r", "endpoint": {"path": "r"},
        "processing_steps": [{"map": {"rename": {"a": "b"}}}]}]}""").contains("drop_fields"))
    // unknown step kinds name themselves
    assert(err("""{"client": {"base_url": "https://x"},
      "resources": [{"name": "r", "endpoint": {"path": "r"},
        "processing_steps": [{"yield": "x"}]}]}""").contains("'yield'"))
  }

  test("response_actions parse: ignore rules, strict keys, non-ignore actions rejected") {
    val src = RestConfig.fromJson("""
      {"client": {"base_url": "https://x"},
       "resources": [{"name": "r", "endpoint": {"path": "r",
         "response_actions": [
           {"status_code": 404, "action": "ignore"},
           {"status_code": 410, "content": "Gone", "action": "ignore"},
           {"content": "no access"}]}}]}""")
    assert(src.resources.head.endpoint.responseActions == Seq(
      ResponseAction(Some(404), None),
      ResponseAction(Some(410), Some("Gone")),
      ResponseAction(None, Some("no access"))))
    def bad(cfg: String): String =
      intercept[IllegalArgumentException](RestConfig.fromJson(cfg)).getMessage
    // dlt's callable actions cannot ride a config document
    assert(bad("""{"client": {"base_url": "https://x"},
                   "resources": [{"name": "r", "endpoint": {"path": "r",
                     "response_actions": [{"status_code": 404, "action": "retry"}]}}]}""")
      .contains("only 'ignore'"))
    // a rule with nothing to match on is a config error, not match-all
    assert(bad("""{"client": {"base_url": "https://x"},
                   "resources": [{"name": "r", "endpoint": {"path": "r",
                     "response_actions": [{"action": "ignore"}]}}]}""")
      .contains("status_code or a content"))
    // strict keys inside the action dicts too
    assert(bad("""{"client": {"base_url": "https://x"},
                   "resources": [{"name": "r", "endpoint": {"path": "r",
                     "response_actions": [{"statuscode": 404}]}}]}""")
      .contains("statuscode"))
  }

  test("strict keys: a typo at any level fails loudly naming the key and its location") {
    def bad(cfg: String, mustName: String*): Unit = {
      val e = intercept[IllegalArgumentException](RestConfig.fromJson(cfg))
      mustName.foreach(s => assert(e.getMessage.contains(s), s"'$s' not in: ${e.getMessage}"))
    }
    // typo'd paginator key: previously silently yielded Paginator.Single
    bad("""{"client": {"base_url": "https://x"},
           "resources": [{"name": "r", "endpoint": {"path": "r", "paginater": {"type": "offset"}}}]}""",
      "paginater", "resource 'r' endpoint")
    // misplaced incremental (resource level, not endpoint): previously silently non-incremental
    bad("""{"client": {"base_url": "https://x"},
           "resources": [{"name": "r", "endpoint": {"path": "r"},
                          "incremental": {"cursor_path": "u", "start_param": "since"}}]}""",
      "incremental", "resource 'r'")
    bad("""{"client": {"base_url": "https://x", "bse_url": "oops"}, "resources": []}""",
      "bse_url", "client")
    bad("""{"client": {"base_url": "https://x"}, "resorces": []}""", "resorces", "config root")
    bad("""{"client": {"base_url": "https://x", "auth": {"type": "bearer", "tokn": "t"}},
           "resources": []}""", "tokn", "bearer auth")
    bad("""{"client": {"base_url": "https://x"}, "resource_defaults": {"primary_key": "id",
           "endpoint": {"paginator": {"type": "cursor", "cursor_path": "c", "cursor_parm": "x"}}},
           "resources": []}""", "cursor_parm", "cursor paginator")
    bad("""{"client": {"base_url": "https://x"},
           "resources": [{"name": "r", "endpoint": {"path": "r",
             "incremental": {"cursor_path": "u", "start_param": "s", "initialvalue": "0"}}}]}""",
      "initialvalue", "resource 'r' incremental")
    bad("""{"client": {"base_url": "https://x"},
           "resources": [{"name": "r", "endpoint": "r",
             "write_disposition": {"disposition": "merge", "stragety": "scd2"}}]}""",
      "stragety", "write_disposition")
    // container-valued param: Jackson's asText() would render "" silently
    bad("""{"client": {"base_url": "https://x"},
           "resources": [{"name": "r", "endpoint": {"path": "r",
             "params": {"filter": {"op": "gt"}}}}]}""", "params.filter", "scalar")
    bad("""{"client": {"base_url": "https://x", "headers": {"X-List": ["a","b"]}},
           "resources": []}""", "headers.X-List", "scalar")
  }

  test("include_from_parent carries parent fields; orphan include is rejected") {
    // the pipedrive deal_followers shape (sources/pipedrive/settings.py:96-101):
    // composite key on user_id + the carried _deals_id column
    val cfg = """
      {"client": {"base_url": "https://acme.pipedrive.com/api/v2/"},
       "resources": [
         {"name": "deal_followers",
          "endpoint": {"path": "deals/{resources.deals.id}/followers"},
          "primary_key": ["user_id", "_deals_id"],
          "include_from_parent": ["id", "title"]}
       ]}"""
    val r = RestConfig.fromJson(cfg).resources.head
    assert(r.endpoint.parent.contains(
      ParentBinding("deals", Seq("id"), Seq("id", "title"))))
    assert(r.hints.primaryKey == Seq("user_id", "_deals_id"))

    val orphan = """
      {"client": {"base_url": "https://x"},
       "resources": [
         {"name": "r", "endpoint": {"path": "r"}, "include_from_parent": ["id"]}
       ]}"""
    val e = intercept[IllegalArgumentException](RestConfig.fromJson(orphan))
    assert(e.getMessage.contains("include_from_parent"))
  }

  test("auth dialects: bearer, api_key header/query, http_basic, oauth2") {
    def auth(j: String): Auth = RestConfig.parseAuth(Json.parse(j))
    assert(auth("""{"type":"bearer","token":"t"}""") == Auth.Bearer("t"))
    assert(auth("""{"type":"api_key","name":"X-Key","api_key":"k"}""") == Auth.Header("X-Key", "k"))
    assert(auth("""{"type":"api_key","name":"key","api_key":"k","location":"query"}""") ==
      Auth.QueryParam("key", "k"))
    assert(auth("""{"type":"http_basic","username":"u","password":"p"}""") == Auth.Basic("u", "p"))
    // OAuth2 is a class (mutable token cache) — assert it parses and applies
    val o = auth("""{"type":"oauth2_client_credentials","access_token_url":"https://x/token",
                     "client_id":"c","client_secret":"s","scopes":["a","b"]}""")
    assert(o.isInstanceOf[Auth.OAuth2])
    intercept[IllegalArgumentException](auth("""{"type":"jwt"}"""))
    intercept[IllegalArgumentException](auth("""{"type":"api_key","name":"k","api_key":"v","location":"body"}"""))
  }

  test("incremental placeholders bind start and end params and drop the literals") {
    val cfg = """
      {"client": {"base_url": "https://x"},
       "resources": [
         {"name": "r",
          "endpoint": {"path": "r",
                       "params": {"since": "{incremental.start_value}",
                                  "until": "{incremental.end_value}",
                                  "static": "1"},
                       "incremental": {"cursor_path": "updated", "initial_value": "2024-01-01",
                                       "end_value": "2024-06-01", "newest_first": true, "lag_days": 3}}}
       ]}"""
    val r = RestConfig.fromJson(cfg).resources.head
    assert(r.endpoint.params == Map("static" -> "1"))
    assert(r.endpoint.incremental.contains(IncrementalBinding(
      "updated", "since", Some("2024-01-01"), Some("until"), Some("2024-06-01"),
      newestFirst = true, lagDays = 3)))
  }

  test("parent refs in param values bind too; multiple parents are rejected") {
    val cfg = """
      {"client": {"base_url": "https://x"},
       "resources": [
         {"name": "child",
          "endpoint": {"path": "items", "params": {"owner_id": "{resources.owners.id}"}}}
       ]}"""
    val r = RestConfig.fromJson(cfg).resources.head
    assert(r.endpoint.parent.contains(ParentBinding("owners", Seq("id"))))
    assert(r.endpoint.params == Map("owner_id" -> "{id}"))

    val bad = """
      {"client": {"base_url": "https://x"},
       "resources": [
         {"name": "c", "endpoint": {"path": "a/{resources.p1.id}/b/{resources.p2.id}"}}
       ]}"""
    intercept[IllegalArgumentException](RestConfig.fromJson(bad))
  }

  test("write_disposition dict with scd2 strategy; missing fields fail loud") {
    val cfg = """
      {"client": {"base_url": "https://x"},
       "resources": [
         {"name": "dim",
          "endpoint": "dim",
          "primary_key": ["k1", "k2"],
          "write_disposition": {"disposition": "merge", "strategy": "scd2"}}
       ]}"""
    val r = RestConfig.fromJson(cfg).resources.head
    assert(r.hints.disposition == Disposition.Scd2)
    assert(r.hints.primaryKey == Seq("k1", "k2"))
    assert(r.endpoint.path == "dim") // endpoint string shorthand

    intercept[IllegalArgumentException](RestConfig.fromJson("""{"resources": []}"""))
    intercept[IllegalArgumentException](
      RestConfig.fromJson("""{"client": {"base_url": "https://x"}}"""))
    intercept[IllegalArgumentException](RestConfig.fromJson(
      """{"client": {"base_url": "https://x"},
          "resources": [{"name": "r", "endpoint": {"path": "r",
            "incremental": {"cursor_path": "u"}}}]}""")) // no start_param, no placeholder
  }

  test("parsed config drives the engine identically to the hand-built config") {
    // one cursor-paginated endpoint, read via both sources over the same
    // canned transport: same requests, same rows
    val pages = Map(
      "things?limit=2" -> """{"data":[{"id":1},{"id":2}],"meta":{"next":"c2"}}""",
      "things?cursor=c2&limit=2" -> """{"data":[{"id":3}],"meta":{}}""",
    )
    val byHand = RestSource("s", ClientConfig("https://api.test"), Seq(
      RestResource("things",
        EndpointConfig("things", dataSelector = "data",
          paginator = Paginator.Cursor("meta.next", "cursor", 2)),
        graft.core.TableHints("things"))))
    val fromCfg = RestConfig.fromJson("""
      {"name": "s",
       "client": {"base_url": "https://api.test"},
       "resources": [
         {"name": "things",
          "endpoint": {"path": "things", "data_selector": "data",
                       "paginator": {"type": "cursor", "cursor_path": "meta.next",
                                     "cursor_param": "cursor", "page_size": 2}}}
       ]}""")
    assert(fromCfg == byHand)
    val a = RestEngine.readResource(spark, byHand, byHand.resources.head, new FakeTransport(pages))
    val b = RestEngine.readResource(spark, fromCfg, fromCfg.resources.head, new FakeTransport(pages))
    assert(a.collect().toSeq.map(_.toString).sorted == b.collect().toSeq.map(_.toString).sorted)
    assert(b.count() == 3)
  }
}
