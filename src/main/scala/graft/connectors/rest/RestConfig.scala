package graft.connectors.rest

import com.fasterxml.jackson.databind.JsonNode
import graft.connectors.rest.RestEngine._
import graft.core.{Disposition, TableHints}

import scala.jdk.CollectionConverters._

/** Config-as-data for the REST keystone: parse a JSON document shaped like
  * the reference's `RESTAPIConfig` (sources/pipedrive/rest_v2/__init__.py:96-168
  * — `client` 138-145, `resource_defaults` 147-164, `resources` list 166,
  * cursor paginator dict 158-162, api_key auth dict 141-145, parent
  * interpolation `{resources.<parent>.<field>}` 116-123, incremental
  * placeholder `{incremental.start_value}` 102-107) into a runnable
  * [[RestEngine.RestSource]].
  *
  * This is the last parity surface of the reference's declarative model: a
  * user ships a config DOCUMENT, not code — new connectors without a
  * rebuild. The loader is a pure translation layer; execution (page loops,
  * incremental state, executor-side parent fan-out, dispositions) is the
  * existing engine, so `fromJson(render(Fleet.github(...)))` and
  * `Fleet.github(...)` are the SAME object and land byte-identical tables
  * (proven structurally in FleetConfigSpec and end-to-end by the
  * q_fleet_config oracle, which must hash-match q_fleet_pipeline's).
  *
  * Field names mirror the reference config dialect:
  *
  * {{{
  * {
  *   "name": "github",
  *   "client": {
  *     "base_url": "https://api.github.com",
  *     "headers": {"Accept": "application/vnd.github+json"},
  *     "auth": {"type": "api_key", "name": "api_token", "api_key": "…", "location": "query"}
  *   },
  *   "resource_defaults": {
  *     "primary_key": "id",
  *     "write_disposition": "merge",
  *     "endpoint": {"params": {"limit": 500}, "data_selector": "data",
  *                  "paginator": {"type": "cursor", "cursor_path": "additional_data.next_cursor",
  *                                "cursor_param": "cursor"}}
  *   },
  *   "resources": [
  *     "deals",
  *     {"name": "issues",
  *      "endpoint": {"path": "repos/o/r/issues",
  *                   "params": {"since": "{incremental.start_value}"},
  *                   "incremental": {"cursor_path": "updated_at", "initial_value": "2024-01-01"}},
  *      "primary_key": "id", "write_disposition": "merge"},
  *     {"name": "participants",
  *      "endpoint": {"path": "deals/{resources.deals.id}/participants"}}
  *   ]
  * }
  * }}}
  *
  * Paginator `type` values accepted (dlt names first, graft aliases in
  * parens): `offset`, `page_number`, `cursor`, `json_link` (`json_response`,
  * `next_url`), `header_link` (RFC 5988 `Link: <…>; rel="next"` — GitHub's
  * protocol, followed via [[HttpResponse.headers]]), `start_time`,
  * `single_page`, `auto`. The paginator may also sit at the CLIENT level
  * as a source-wide default (endpoint and resource_defaults override it);
  * with every level silent the endpoint resolves at runtime exactly like
  * dlt — [[RestEngine.Paginator.Auto]] probes the FIRST response (body
  * next-link, then `Link` header, then total-count, else single page)
  * and stays resolved for the rest of the chain, so the same API shape
  * always yields the same plan.
  *
  * The loader is STRICT: an unknown key at any level (root, client, auth,
  * paginator, resource, endpoint, incremental, write_disposition) fails
  * loudly naming the key and its location — dlt validates configs against
  * typed dicts, and a config-as-data surface that silently ignores a
  * typo'd `"paginater"` (yielding single-page) or a misplaced
  * `"incremental"` (silently non-incremental) would burn real users.
  * Container-valued params/headers are rejected the same way.
  */
object RestConfig {

  def fromJson(json: String): RestSource = fromNode(Json.parse(json))

  def fromNode(root: JsonNode): RestSource = {
    checkKeys(root, "config root", Set("name", "client", "resource_defaults", "resources"))
    val clientNode = req(root, "client", "config root")
    val client = parseClient(clientNode)
    // client-level paginator = the source-wide default (dlt rest_api's
    // ClientConfig.paginator); endpoint/resource_defaults paginators
    // override it, and with ALL levels silent the endpoint detects at
    // runtime (Paginator.Auto — dlt's own default)
    val clientPaginator = Option(clientNode.get("paginator")).map(parsePaginator)
    val defaults = Option(root.get("resource_defaults"))
    defaults.foreach(checkKeys(_, "resource_defaults", ResourceKeys - "name" - "include_from_parent"))
    // validate the defaults' endpoint EAGERLY, not just when a resource
    // consumes it — a typo in defaults must fail even with zero resources
    defaults.flatMap(d => Option(d.get("endpoint"))).filter(_.isObject).foreach { de =>
      checkKeys(de, "resource_defaults endpoint", EndpointKeys)
      Option(de.get("paginator")).foreach(parsePaginator)
      Option(de.get("incremental")).foreach(
        checkKeys(_, "resource_defaults incremental", IncrementalKeys))
      strMap(de, "params", "resource_defaults endpoint")
      Option(de.get("response_actions")).foreach(
        parseResponseActions(_, "resource_defaults endpoint"))
      Option(de.get("json")).filterNot(_.isObject).foreach(_ =>
        fail("resource_defaults endpoint 'json' must be a JSON object"))
    }
    defaults.flatMap(d => Option(d.get("processing_steps"))).foreach(
      parseProcessingSteps(_, "resource_defaults"))
    val resourcesNode = req(root, "resources", "config root")
    require(resourcesNode.isArray, "config 'resources' must be an array")
    // parse EVERY resource (a typo in a deselected resource still fails
    // loudly), then honor `selected: false` — dlt's per-resource opt-out.
    // A non-boolean `selected` ("false" the string, 0, null) fails loudly
    // like every other malformed key: silently loading a resource the
    // user believed deselected is the exact failure strict keys exist for
    val parsed = resourcesNode.elements().asScala.toSeq
      .map(rn => rn -> parseResource(rn, defaults, clientPaginator))
    val resources = parsed.collect {
      case (rn, r) if !rn.isObject || (Option(rn.get("selected")) match {
        case None => true
        case Some(s) if s.isBoolean => s.asBoolean
        case Some(s) => fail(s"resource '${r.name}' 'selected' must be a JSON boolean, " +
          s"got ${s.getNodeType.toString.toLowerCase} ${s.toString.take(40)}")
      }) => r
    }
    RestSource(
      name = str(root, "name").getOrElse("rest_api"),
      client = client,
      resources = resources,
    )
  }

  // ----------------------------------------------------------------- client

  private def parseClient(n: JsonNode): ClientConfig = {
    checkKeys(n, "client", Set("base_url", "auth", "headers", "paginator"))
    ClientConfig(
      baseUrl = reqStr(n, "base_url", "client"),
      auth = Option(n.get("auth")).map(parseAuth),
      headers = strMap(n, "headers", "client"),
    )
  }

  /** Auth dicts per the reference dialect: `api_key` with a `location`
    * (sources/pipedrive/rest_v2/__init__.py:141-145), `bearer`,
    * `http_basic`, `oauth2_client_credentials`.
    */
  def parseAuth(n: JsonNode): Auth = reqStr(n, "type", "auth") match {
    case "bearer" =>
      checkKeys(n, "bearer auth", Set("type", "token"))
      Auth.Bearer(reqStr(n, "token", "bearer auth"))
    case "api_key" =>
      checkKeys(n, "api_key auth", Set("type", "name", "api_key", "location"))
      val name = str(n, "name").getOrElse("Authorization")
      val key = reqStr(n, "api_key", "api_key auth")
      str(n, "location").getOrElse("header") match {
        case "query"  => Auth.QueryParam(name, key)
        case "header" => Auth.Header(name, key)
        case other    => fail(s"api_key auth location '$other' (expected 'query' or 'header')")
      }
    case "http_basic" =>
      checkKeys(n, "http_basic auth", Set("type", "username", "password"))
      Auth.Basic(reqStr(n, "username", "http_basic auth"), reqStr(n, "password", "http_basic auth"))
    case "oauth2_client_credentials" =>
      checkKeys(n, "oauth2_client_credentials auth", Set("type", "access_token_url",
        "token_url", "client_id", "client_secret", "refresh_token", "scope", "scopes"))
      new Auth.OAuth2(
        tokenUrl = str(n, "access_token_url").orElse(str(n, "token_url"))
          .getOrElse(fail("oauth2_client_credentials auth requires 'access_token_url'")),
        clientId = reqStr(n, "client_id", "oauth2 auth"),
        clientSecret = reqStr(n, "client_secret", "oauth2 auth"),
        refreshToken = str(n, "refresh_token"),
        scope = str(n, "scope").orElse {
          // dlt spells scopes as a list; join the canonical space-separated way
          Option(n.get("scopes")).filter(_.isArray)
            .map(_.elements().asScala.map(_.asText()).mkString(" "))
        },
      )
    case other =>
      fail(s"unsupported auth type '$other' (expected bearer | api_key | http_basic | oauth2_client_credentials)")
  }

  // -------------------------------------------------------------- paginator

  /** Accepts the dict form `{"type": …}` or the string shorthand for
    * parameterless types (`"single_page"`, `"offset"`, `"page_number"`,
    * `"json_link"`).
    */
  def parsePaginator(n: JsonNode): Paginator = {
    if (n.isTextual) return parsePaginatorType(n.asText(), n)
    parsePaginatorType(reqStr(n, "type", "paginator"), n)
  }

  private def parsePaginatorType(tpe: String, n: JsonNode): Paginator = {
    def keys(allowed: String*): Unit =
      if (n.isObject) checkKeys(n, s"$tpe paginator", allowed.toSet + "type")
    tpe match {
      case "offset" =>
        keys("offset_param", "limit_param", "limit", "page_size", "total_path")
        Paginator.Offset(
          offsetParam = str(n, "offset_param").getOrElse("offset"),
          limitParam = str(n, "limit_param").getOrElse("limit"),
          pageSize = int(n, "limit").orElse(int(n, "page_size")).getOrElse(100),
          totalPath = str(n, "total_path"),
        )
      case "page_number" =>
        keys("page_param", "size_param", "page_size", "total_path")
        Paginator.PageNumber(
          pageParam = str(n, "page_param").getOrElse("page"),
          sizeParam = str(n, "size_param").getOrElse("per_page"),
          pageSize = int(n, "page_size").getOrElse(100),
          totalPath = str(n, "total_path"),
        )
      case "cursor" =>
        keys("cursor_path", "cursor_param", "page_size", "size_param")
        Paginator.Cursor(
          cursorPath = reqStr(n, "cursor_path", "cursor paginator"),
          cursorParam = str(n, "cursor_param").getOrElse("cursor"),
          pageSize = int(n, "page_size").getOrElse(100),
          sizeParam = str(n, "size_param").getOrElse("limit"),
        )
      case "json_link" | "json_response" | "next_url" =>
        keys("next_url_path")
        Paginator.NextUrl(str(n, "next_url_path").getOrElse("next"))
      case "header_link" =>
        keys("links_next_key")
        Paginator.HeaderLink(str(n, "links_next_key").getOrElse("next"))
      case "start_time" =>
        keys("next_start_path", "start_param", "end_of_stream_path")
        Paginator.StartTime(
          nextStartPath = reqStr(n, "next_start_path", "start_time paginator"),
          startParam = reqStr(n, "start_param", "start_time paginator"),
          endOfStreamPath = str(n, "end_of_stream_path").getOrElse("end_of_stream"),
        )
      case "single_page" =>
        keys()
        Paginator.Single
      case "auto" =>
        keys()
        Paginator.Auto
      case other =>
        fail(s"unknown paginator type '$other' " +
          "(expected offset | page_number | cursor | json_link | header_link | start_time | single_page | auto)")
    }
  }

  // --------------------------------------------------------------- resource

  /** `{resources.<parent>.<field>}` placeholders — the reference's
    * parent-child interpolation (sources/pipedrive/rest_v2/__init__.py:116-123).
    */
  private val ParentRef = """\{resources\.([A-Za-z0-9_]+)\.([A-Za-z0-9_]+)\}""".r

  private val ResourceKeys = Set("name", "endpoint", "primary_key", "merge_key",
    "write_disposition", "table_name", "max_table_nesting", "include_from_parent",
    // `selected: false` excludes the resource (dlt's opt-out; honored in
    // fromNode). `parallelized` is accepted as a no-op: dlt uses it to move
    // a generator onto a thread pool, while graft's endpoint reads are
    // already partition-parallel (RestPagesV2.readMany plans one input
    // partition per endpoint, page-parallel under a total count).
    // `processing_steps` = the JSON-expressible filter/drop subset
    // (RestEngine.ProcessingStep; callable-only steps fail loudly).
    "selected", "parallelized", "processing_steps")
  // `method` accepts GET (the default spelled out) and POST (body via the
  // `json` key — dlt rest_api's POST-shaped endpoints); other verbs fail
  // in parseResource with a pointed message
  private val EndpointKeys = Set("path", "params", "data_selector", "paginator",
    "incremental", "max_pages", "response_actions", "method", "json")
  private val IncrementalKeys = Set("cursor_path", "start_param", "initial_value",
    "end_param", "end_value", "newest_first", "lag_days", "lag")

  private def parseResource(n: JsonNode, defaults: Option[JsonNode],
      clientPaginator: Option[Paginator] = None): RestResource = {
    // string shorthand: "deals" == {"name": "deals", "endpoint": {"path": "deals"}}
    val (node, name, pathOpt): (JsonNode, String, Option[String]) =
      if (n.isTextual) (Json.parse("{}"), n.asText(), Some(n.asText()))
      else {
        val nm = reqStr(n, "name", "resource")
        checkKeys(n, s"resource '$nm'", ResourceKeys)
        val ep = Option(n.get("endpoint"))
        val p = ep.flatMap {
          case e if e.isTextual => Some(e.asText()) // endpoint string shorthand = path
          case e                => str(e, "path")
        }
        (n, nm, p)
      }

    val epNode = Option(node.get("endpoint")).filter(_.isObject)
    epNode.foreach(checkKeys(_, s"resource '$name' endpoint", EndpointKeys))
    val defEp = defaults.flatMap(d => Option(d.get("endpoint"))).filter(_.isObject)
    defEp.foreach(checkKeys(_, "resource_defaults endpoint", EndpointKeys))

    val rawPath = pathOpt
      .orElse(defEp.flatMap(str(_, "path")))
      .getOrElse(name) // dlt: a resource with no endpoint path uses its name

    // defaults merge: resource params override default params key-wise
    // (reference semantics — rest_v2 merges endpoint_config over defaults)
    val rawParams = strMap2(defEp, "params", "resource_defaults endpoint") ++
      strMap2(epNode, "params", s"resource '$name' endpoint")

    // parent-child: collect {resources.parent.field} refs from the path and
    // the param VALUES (the engine interpolates both), rewrite to {field};
    // include_from_parent (sources/pipedrive/rest_v2/__init__.py:127-128,
    // settings.py:100) carries the listed PARENT fields into child rows as
    // `_<parent>_<field>` columns (the reference's own composite-key
    // spelling, settings.py:96-99)
    val includeFromParent = Option(node.get("include_from_parent"))
      .map(strList).getOrElse(Nil)
    val refs = (ParentRef.findAllMatchIn(rawPath) ++
      rawParams.valuesIterator.flatMap(ParentRef.findAllMatchIn(_))).toSeq
    val parents = refs.map(_.group(1)).distinct
    require(parents.size <= 1,
      s"resource '$name' references multiple parents: ${parents.mkString(", ")}")
    if (includeFromParent.nonEmpty && parents.isEmpty)
      fail(s"resource '$name' has include_from_parent but no " +
        "{resources.<parent>.<field>} reference binding a parent")
    val parent = parents.headOption.map { p =>
      ParentBinding(p, refs.map(_.group(2)).distinct, includeFromParent)
    }
    def rewrite(s: String) = ParentRef.replaceAllIn(s, m => s"{${m.group(2)}}")
    val path = rewrite(rawPath)

    // incremental: explicit dict, plus the `{incremental.start_value}` /
    // `{incremental.end_value}` param placeholders that NAME the params
    val incNode = epNode.flatMap(e => Option(e.get("incremental")))
      .orElse(defEp.flatMap(e => Option(e.get("incremental"))))
    val startParamFromPlaceholder =
      rawParams.collectFirst { case (k, v) if v == "{incremental.start_value}" => k }
    val endParamFromPlaceholder =
      rawParams.collectFirst { case (k, v) if v == "{incremental.end_value}" => k }
    val incremental = incNode.map { i =>
      checkKeys(i, s"resource '$name' incremental", IncrementalKeys)
      IncrementalBinding(
        cursorPath = reqStr(i, "cursor_path", s"resource '$name' incremental"),
        startParam = str(i, "start_param").orElse(startParamFromPlaceholder)
          .getOrElse(fail(s"resource '$name' incremental needs 'start_param' or a " +
            "'{incremental.start_value}' param placeholder")),
        initialValue = str(i, "initial_value"),
        endParam = str(i, "end_param").orElse(endParamFromPlaceholder),
        endValue = str(i, "end_value"),
        newestFirst = bool(i, "newest_first").getOrElse(false),
        lagDays = int(i, "lag_days").orElse(int(i, "lag")).getOrElse(0),
      )
    }
    // placeholder params are bindings, not literal request params
    val params = rawParams
      .filterNot { case (_, v) => v == "{incremental.start_value}" || v == "{incremental.end_value}" }
      .map { case (k, v) => k -> rewrite(v) }

    // precedence: endpoint > resource_defaults > client > Auto (runtime
    // detection against the first response — dlt rest_api's default when
    // every level is silent)
    val paginator = epNode.flatMap(e => Option(e.get("paginator")))
      .orElse(defEp.flatMap(e => Option(e.get("paginator"))))
      .map(parsePaginator)
      .orElse(clientPaginator)
      .getOrElse(Paginator.Auto)

    val dataSelector = epNode.flatMap(str(_, "data_selector"))
      .orElse(defEp.flatMap(str(_, "data_selector")))
      .getOrElse("$")

    val method = epNode.flatMap(str(_, "method")).orElse(defEp.flatMap(str(_, "method")))
      .map(_.toUpperCase).getOrElse("GET")
    if (method != "GET" && method != "POST")
      fail(s"resource '$name' endpoint method '$method': expected GET or POST " +
        "(other verbs have no extract-and-load meaning in this dialect)")

    // `json` = the POST body template, kept as raw object text (nested
    // values pass through verbatim — coercing to strings would change
    // the wire shape). Requires method POST: a GET with a body is a
    // config contradiction, not a request to make.
    val jsonBody = epNode.flatMap(e => Option(e.get("json")))
      .orElse(defEp.flatMap(e => Option(e.get("json"))))
      .map { b =>
        if (!b.isObject) fail(s"resource '$name' endpoint 'json' must be a JSON object")
        if (method != "POST")
          fail(s"resource '$name' endpoint has a 'json' body but method " +
            s"$method — request bodies require 'method': 'POST'")
        b.toString
      }

    val responseActions = epNode.flatMap(e => Option(e.get("response_actions")))
      .orElse(defEp.flatMap(e => Option(e.get("response_actions"))))
      .map(parseResponseActions(_, s"resource '$name'")).getOrElse(Nil)

    val processingSteps = Option(node.get("processing_steps"))
      .orElse(defaults.flatMap(d => Option(d.get("processing_steps"))))
      .map(parseProcessingSteps(_, s"resource '$name'")).getOrElse(Nil)

    val endpoint = EndpointConfig(
      path = path,
      params = params,
      dataSelector = dataSelector,
      paginator = paginator,
      incremental = incremental,
      parent = parent,
      maxPages = int2(epNode, "max_pages").orElse(int2(defEp, "max_pages")).getOrElse(10000),
      responseActions = responseActions,
      method = method,
      jsonBody = jsonBody,
      processingSteps = processingSteps,
    )

    RestResource(name, endpoint, parseHints(name, node, defaults))
  }

  // ------------------------------------------------------------ table hints

  private def parseHints(name: String, n: JsonNode, defaults: Option[JsonNode]): TableHints = {
    def field(k: String): Option[JsonNode] =
      Option(n.get(k)).orElse(defaults.flatMap(d => Option(d.get(k))))
    val pk = field("primary_key").map(strList).getOrElse(Nil)
    val mergeKey = field("merge_key").map(strList).getOrElse(Nil)
    val (disposition, scd2) = field("write_disposition") match {
      case None => (Disposition.Append: Disposition, false)
      case Some(d) if d.isTextual => (parseDisposition(d.asText()), false)
      // dict form: {"disposition": "merge", "strategy": "scd2"} (dlt merge strategies)
      case Some(d) =>
        checkKeys(d, s"resource '$name' write_disposition", Set("disposition", "strategy"))
        val base = parseDisposition(reqStr(d, "disposition", "write_disposition"))
        val strat = str(d, "strategy")
        strat match {
          case Some("scd2") =>
            require(base == Disposition.Merge, "strategy 'scd2' requires disposition 'merge'")
            (Disposition.Scd2: Disposition, true)
          case Some(other) => fail(s"unsupported merge strategy '$other' (expected scd2)")
          case None        => (base, false)
        }
    }
    TableHints(
      tableName = field("table_name").flatMap(t => if (t.isTextual) Some(t.asText()) else None).getOrElse(name),
      disposition = disposition,
      primaryKey = pk,
      mergeKey = mergeKey,
      maxTableNesting = field("max_table_nesting").flatMap(t => if (t.isInt) Some(t.asInt()) else None)
        .getOrElse(Int.MaxValue),
    )
  }

  /** `response_actions` array — dicts of `status_code` / `content` /
    * `action` (only `"ignore"`, dlt's JSON-expressible action; see
    * [[RestEngine.ResponseAction]]).
    */
  private def parseResponseActions(n: JsonNode, where: String): Seq[ResponseAction] = {
    if (!n.isArray) fail(s"$where response_actions must be an array")
    n.elements().asScala.toSeq.map { a =>
      checkKeys(a, s"$where response_action", Set("status_code", "content", "action"))
      try ResponseAction(
        statusCode = int(a, "status_code"),
        contentSubstring = str(a, "content"),
        action = str(a, "action").getOrElse("ignore"))
      catch {
        case e: IllegalArgumentException => fail(s"$where response_action: ${e.getMessage}")
      }
    }
  }

  /** `processing_steps` array — the JSON-expressible subset of dlt's
    * per-resource map/filter hooks (see [[RestEngine.ProcessingStep]]).
    * Each step is `{"filter": {"field": p, <op>: v}}` or
    * `{"map": {"drop_fields": [...]}}`; dlt's native steps are Python
    * callables a JSON document cannot carry, so anything outside the
    * declarative shapes fails loudly naming what is and isn't
    * expressible.
    */
  private def parseProcessingSteps(n: JsonNode, where: String): Seq[ProcessingStep] = {
    if (!n.isArray) fail(s"$where processing_steps must be an array")
    n.elements().asScala.toSeq.map { s =>
      val keys = if (s.isObject) s.fieldNames().asScala.toSeq else Nil
      keys match {
        case Seq("filter") =>
          val f = s.get("filter")
          if (!f.isObject) fail(s"$where processing_steps filter must be an object " +
            "(dlt's callable filters cannot ride a JSON config; use " +
            s"{'field': <path>, <op>: <value>} with ops ${ProcessingStep.FilterOps.toSeq.sorted.mkString("/")})")
          checkKeys(f, s"$where processing_steps filter",
            ProcessingStep.FilterOps + "field")
          val field = reqStr(f, "field", s"$where processing_steps filter")
          val ops = ProcessingStep.FilterOps.toSeq.sorted.flatMap(op =>
            Option(f.get(op)).map(op -> _))
          ops match {
            case Seq(("not_null", v)) =>
              if (!v.isBoolean || !v.asBoolean)
                fail(s"$where processing_steps filter not_null must be true")
              ProcessingStep.Filter(field, "not_null", None)
            case Seq((op, v)) =>
              if (v.isContainerNode)
                fail(s"$where processing_steps filter '$op' value must be a scalar")
              ProcessingStep.Filter(field, op, Some(if (v.isTextual) v.asText() else v.toString))
            case Seq() => fail(s"$where processing_steps filter needs exactly one op " +
              s"(${ProcessingStep.FilterOps.toSeq.sorted.mkString(", ")})")
            case many => fail(s"$where processing_steps filter has multiple ops " +
              s"(${many.map(_._1).mkString(", ")}); declare one step per predicate")
          }
        case Seq("map") =>
          val m = s.get("map")
          if (!m.isObject || m.fieldNames().asScala.toSeq != Seq("drop_fields"))
            fail(s"$where processing_steps map supports only {'drop_fields': [...]} — " +
              "dlt's map steps are Python callables a JSON config cannot carry; " +
              "apply DataFrame transforms on the returned frame instead")
          ProcessingStep.DropFields(strList(m.get("drop_fields")))
        case other =>
          fail(s"$where processing_steps entry must be {'filter': ...} or {'map': ...}" +
            (if (other.nonEmpty) s", got keys ${other.mkString("'", "', '", "'")}" else ""))
      }
    }
  }

  private def parseDisposition(s: String): Disposition = s match {
    case "append"  => Disposition.Append
    case "replace" => Disposition.Replace
    case "merge"   => Disposition.Merge
    case other     => fail(s"unsupported write_disposition '$other' (expected append | replace | merge)")
  }

  // ---------------------------------------------------------------- helpers

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"rest config: $msg")

  /** dlt rest_api keys graft RECOGNIZES but does not implement. Still a
    * hard failure (fail-loud is the point of strict keys — a silently
    * dropped `response_actions` would change error behavior, not just
    * cosmetics), but the error names the key as a known dlt feature with
    * the reason, so a ported config fails with guidance instead of an
    * anonymous unknown-key error.
    */
  private val KnownUnsupported: Map[String, String] = Map(
    "data" -> ("form-encoded request bodies are not implemented; POST endpoints " +
      "carry a JSON body via the 'json' key"),
  )

  /** Strict-key validation: any key outside `allowed` fails loudly naming
    * the key and its location — a typo must never silently change the
    * plan (a misspelled "paginater" would otherwise yield single-page).
    * Keys dlt defines but graft does not implement get a pointed message.
    */
  private def checkKeys(n: JsonNode, where: String, allowed: Set[String]): Unit =
    if (n.isObject) {
      val unknown = n.fieldNames().asScala.filterNot(allowed).toSeq.sorted
      if (unknown.nonEmpty) {
        val (recognized, alien) = unknown.partition(KnownUnsupported.contains)
        val notes = recognized.map(k => s"'$k' is a dlt rest_api key graft does not support " +
          s"(${KnownUnsupported(k)})")
        val head = if (alien.nonEmpty)
          s"unknown key(s) ${alien.mkString("'", "', '", "'")} in $where " +
            s"(allowed: ${allowed.toSeq.sorted.mkString(", ")})"
        else s"unsupported key(s) in $where"
        fail((head +: notes).mkString("; "))
      }
    }

  private def req(n: JsonNode, k: String, where: String): JsonNode =
    Option(n.get(k)).getOrElse(fail(s"$where requires '$k'"))

  private def reqStr(n: JsonNode, k: String, where: String): String = {
    val v = req(n, k, where)
    if (!v.isTextual) fail(s"$where field '$k' must be a string")
    v.asText()
  }

  private def str(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filter(_.isTextual).map(_.asText())

  private def int(n: JsonNode, k: String): Option[Int] =
    Option(n.get(k)).filter(_.isNumber).map(_.asInt())

  private def int2(n: Option[JsonNode], k: String): Option[Int] = n.flatMap(int(_, k))

  private def bool(n: JsonNode, k: String): Option[Boolean] =
    Option(n.get(k)).filter(_.isBoolean).map(_.asBoolean())

  /** string-or-list field (dlt primary_key accepts both). */
  private def strList(n: JsonNode): Seq[String] =
    if (n.isTextual) Seq(n.asText())
    else if (n.isArray) n.elements().asScala.map(_.asText()).toSeq
    else fail("expected a string or array of strings")

  /** JSON object → Map[String,String]; non-string scalars (numbers, bools —
    * the reference writes `"limit": 500`) render through their JSON text.
    * Container values (objects/arrays) FAIL loudly: Jackson's container
    * asText() returns "", so a nested object would otherwise silently
    * become an empty-string request param instead of a config error.
    */
  private def strMap(n: JsonNode, k: String, where: String): Map[String, String] =
    Option(n.get(k)).filter(_.isObject).map { o =>
      o.properties().asScala.map { e =>
        val v = e.getValue
        if (v.isContainerNode)
          fail(s"$where '$k.${e.getKey}' must be a scalar, got ${v.getNodeType.toString.toLowerCase}")
        e.getKey -> (if (v.isTextual) v.asText() else v.asText(v.toString))
      }.toMap
    }.getOrElse(Map.empty)

  private def strMap2(n: Option[JsonNode], k: String, where: String): Map[String, String] =
    n.map(strMap(_, k, where)).getOrElse(Map.empty)
}
