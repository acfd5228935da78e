package graft.connectors.sources

import graft.connectors.rest.RestEngine._
import graft.connectors.rest.{Auth, HttpTransport, UrlConnectionTransport}
import graft.core.{Disposition, TableHints}

/** The connector fleet as declarative configs over the REST engine —
  * SURVEY §2.1 rows 8-35. Each source mirrors the reference connector's
  * endpoints, pagination protocol, page size (BASELINE.md knob table),
  * incremental cursor and write disposition; per-connector row-shape logic
  * lives in `transforms` and is applied by the caller's pipeline.
  *
  * These configs are the "user could switch" surface: the reference's
  * `stripe_source(...)` call becomes `Fleet.stripe(apiKey)` feeding a
  * `Pipeline`.
  */
object Fleet {

  private def merge(table: String, pk: String*) =
    TableHints(table, Disposition.Merge, primaryKey = pk.toSeq)
  private def append(table: String) = TableHints(table, Disposition.Append)
  private def replace(table: String) = TableHints(table, Disposition.Replace)

  /** github (sources/github/__init__.py:13-149): REST events appended with
    * newest-first early stop; issues/PRs merged on id with `updated_at`
    * cursor (reference cursor binding at __init__.py:91-93).
    */
  def github(owner: String, repo: String, token: Option[String]): RestSource = RestSource(
    name = "github",
    client = ClientConfig("https://api.github.com", token.map(Auth.Bearer(_)),
      headers = Map("Accept" -> "application/vnd.github+json")),
    resources = Seq(
      RestResource("repo_events",
        EndpointConfig(s"repos/$owner/$repo/events", dataSelector = "$",
          paginator = Paginator.PageNumber(pageParam = "page", sizeParam = "per_page", pageSize = 100)),
        append("issues_events")),
      RestResource("issues",
        EndpointConfig(s"repos/$owner/$repo/issues",
          params = Map("state" -> "all", "sort" -> "updated", "direction" -> "asc"),
          paginator = Paginator.PageNumber(sizeParam = "per_page", pageSize = 100),
          incremental = Some(IncrementalBinding("updated_at", "since"))),
        merge("issues", "id")),
      RestResource("stargazers",
        EndpointConfig(s"repos/$owner/$repo/stargazers",
          paginator = Paginator.PageNumber(sizeParam = "per_page", pageSize = 100)),
        replace("stargazers")),
    ),
  )

  /** stripe (sources/stripe_analytics/__init__.py:14-99, helpers.py:11-66):
    * cursor pagination via `starting_after`, created-range filters, page 100.
    */
  def stripe(apiKey: String, endpoints: Seq[String] = Seq("Subscription", "Account", "Coupon", "Customer", "Product", "Price")): RestSource =
    RestSource(
      name = "stripe",
      client = ClientConfig("https://api.stripe.com/v1", Some(Auth.Bearer(apiKey))),
      resources = endpoints.map { e =>
        RestResource(e.toLowerCase,
          EndpointConfig(s"${e.toLowerCase}s", dataSelector = "data",
            paginator = Paginator.Cursor(cursorPath = "data[-1:].id", cursorParam = "starting_after", pageSize = 100),
            incremental = Some(IncrementalBinding("created", "created[gte]"))),
          replace(e.toLowerCase))
      },
    )

  /** hubspot (sources/hubspot/__init__.py:255-439, paging helpers.py:129-200):
    * CRM objects, next-URL paging under `paging.next.link`, merge on id,
    * page 100 (__init__.py:91).
    */
  def hubspot(apiKey: String, objects: Seq[String] = Seq("contacts", "companies", "deals", "tickets", "products", "quotes")): RestSource =
    RestSource(
      name = "hubspot",
      client = ClientConfig("https://api.hubapi.com", Some(Auth.Bearer(apiKey))),
      resources = objects.map { obj =>
        RestResource(obj,
          EndpointConfig(s"crm/v3/objects/$obj", params = Map("limit" -> "100"),
            dataSelector = "results",
            paginator = Paginator.NextUrl("paging.next.link")),
          merge(obj, "id"))
      } :+ RestResource("owners",
        EndpointConfig("crm/v3/owners", params = Map("limit" -> "100"),
          dataSelector = "results", paginator = Paginator.NextUrl("paging.next.link")),
        merge("owners", "id")),
    )

  /** hubspot with runtime property discovery
    * (sources/hubspot/__init__.py:128-141, 442-481; settings.py:124-130
    * HS_TO_DLT_TYPE): each object's property catalog is fetched from the
    * live properties endpoint, requested props are validated against it,
    * custom (non-`hs_`) props are unioned in when `includeCustomProps`,
    * the selection travels as the `properties` request param, and the
    * catalog's types become column hints so string-encoded numbers and
    * datetimes land typed (the normalizer applies the casts).
    */
  def hubspotDynamic(
      apiKey: String,
      transport: graft.connectors.rest.HttpTransport,
      objects: Seq[String] = Seq("deals", "contacts", "companies"),
      requestedProps: Map[String, Seq[String]] = Map.empty,
      includeCustomProps: Boolean = true,
  ): RestSource = {
    val client = ClientConfig("https://api.hubapi.com", Some(Auth.Bearer(apiKey)))
    RestSource(
      name = "hubspot",
      client = client,
      resources = objects.map { obj =>
        val catalog = Specialized.Hubspot.discoverProperties(client, obj, transport)
        val defaults = catalog.keySet.filter(_.startsWith("hs_"))
        val requested = requestedProps.getOrElse(obj, catalog.keys.toSeq.sorted)
        val selected = Specialized.Hubspot.selectProperties(
          requested, catalog, defaults, includeCustomProps)
        val hints = TableHints(obj, Disposition.Merge, primaryKey = Seq("id")).copy(
          columns = Specialized.Hubspot.hintsFor(
            catalog.view.filterKeys(selected.contains).toMap, prefix = "properties__"))
        RestResource(obj,
          EndpointConfig(s"crm/v3/objects/$obj",
            params = Map("limit" -> "100", "properties" -> selected.mkString(",")),
            dataSelector = "results",
            paginator = Paginator.NextUrl("paging.next.link")),
          hints)
      },
    )
  }

  /** zendesk support (sources/zendesk/__init__.py:218-436): cursor-paginated
    * objects page 100, incremental ticket export page 1000
    * (settings.py:6-7), tickets merged on id.
    */
  def zendesk(subdomain: String, email: String, apiToken: String): RestSource = RestSource(
    name = "zendesk_support",
    client = ClientConfig(s"https://$subdomain.zendesk.com/api/v2",
      Some(Auth.Basic(s"$email/token", apiToken))),
    resources = Seq(
      RestResource("tickets",
        EndpointConfig("incremental/tickets/cursor.json",
          params = Map("per_page" -> "1000"), dataSelector = "tickets",
          paginator = Paginator.Cursor("after_cursor", "cursor", pageSize = 1000),
          incremental = Some(IncrementalBinding("updated_at", "start_time"))),
        merge("tickets", "id")),
      RestResource("users",
        EndpointConfig("users.json", dataSelector = "users",
          paginator = Paginator.Cursor("meta.after_cursor", "page[after]", pageSize = 100)),
        merge("users", "id")),
      RestResource("groups",
        EndpointConfig("groups.json", dataSelector = "groups",
          paginator = Paginator.Cursor("meta.after_cursor", "page[after]", pageSize = 100)),
        merge("groups", "id")),
      RestResource("ticket_fields",
        EndpointConfig("ticket_fields.json", dataSelector = "ticket_fields",
          paginator = Paginator.Single),
        replace("ticket_fields")),
      // talk API: STREAM/START_TIME incremental-export protocol
      // (sources/zendesk/helpers/talk_api.py:14-18,63-116)
      RestResource("calls_incremental",
        EndpointConfig("channels/voice/stats/incremental/calls.json",
          dataSelector = "calls",
          paginator = Paginator.StartTime(nextStartPath = "next_start_time", startParam = "start_time"),
          incremental = Some(IncrementalBinding("updated_at", "start_time"))),
        merge("calls_incremental", "id")),
      RestResource("legs_incremental",
        EndpointConfig("channels/voice/stats/incremental/legs.json",
          dataSelector = "legs",
          paginator = Paginator.StartTime(nextStartPath = "next_start_time", startParam = "start_time"),
          incremental = Some(IncrementalBinding("updated_at", "start_time"))),
        merge("legs_incremental", "id")),
    ),
  )

  /** shopify Partner GraphQL generic query resource
    * (sources/shopify_dlt/__init__.py:168-228): a parameterized (query,
    * items path, cursor path) reader — runs through GraphQlReader.
    */
  def shopifyPartnerQuery(
      organizationId: String,
      accessToken: String,
      query: String,
      itemsPath: String,
      pageInfoPath: String,
  ): (graft.connectors.rest.GraphQlReader.GraphQlConfig, Map[String, String]) = (
    graft.connectors.rest.GraphQlReader.GraphQlConfig(
      url = s"https://partners.shopify.com/$organizationId/api/2024-01/graphql.json",
      query = query,
      itemsPath = itemsPath,
      pageInfoPath = pageInfoPath),
    Map("X-Shopify-Access-Token" -> accessToken),
  )

  /** pipedrive v2 (sources/pipedrive/rest_v2/__init__.py:96-168): cursor
    * paginator `next_cursor`, page 500, `updated_since` incremental, child
    * resources interpolated per parent id (116-136).
    */
  def pipedrive(apiToken: String): RestSource = RestSource(
    name = "pipedrive",
    client = ClientConfig("https://api.pipedrive.com/api/v2", Some(Auth.QueryParam("api_token", apiToken))),
    resources = Seq(
      RestResource("deals",
        EndpointConfig("deals", params = Map("sort_by" -> "update_time", "sort_direction" -> "desc"),
          dataSelector = "data",
          paginator = Paginator.Cursor("additional_data.next_cursor", "cursor", pageSize = 500),
          incremental = Some(IncrementalBinding("update_time", "updated_since"))),
        merge("deals", "id")),
      RestResource("persons",
        EndpointConfig("persons", dataSelector = "data",
          paginator = Paginator.Cursor("additional_data.next_cursor", "cursor", pageSize = 500)),
        merge("persons", "id")),
      RestResource("organizations",
        EndpointConfig("organizations", dataSelector = "data",
          paginator = Paginator.Cursor("additional_data.next_cursor", "cursor", pageSize = 500)),
        merge("organizations", "id")),
      RestResource("deal_participants",
        EndpointConfig("deals/{id}/participants", dataSelector = "data",
          paginator = Paginator.Cursor("additional_data.next_cursor", "cursor", pageSize = 500),
          parent = Some(ParentBinding("deals", Seq("id")))),
        merge("deal_participants", "id")),
    ),
  )

  /** slack (sources/slack/__init__.py:20-288, client helpers.py:61-206):
    * cursor paging under `response_metadata.next_cursor`; messages per
    * channel (dynamic table routing, §2.8) with `oldest` incremental.
    */
  def slack(token: String): RestSource = RestSource(
    name = "slack",
    client = ClientConfig("https://slack.com/api", Some(Auth.Bearer(token))),
    resources = Seq(
      RestResource("channels",
        EndpointConfig("conversations.list", dataSelector = "channels",
          paginator = Paginator.Cursor("response_metadata.next_cursor", "cursor", pageSize = 200)),
        replace("channels")),
      RestResource("users",
        EndpointConfig("users.list", dataSelector = "members",
          paginator = Paginator.Cursor("response_metadata.next_cursor", "cursor", pageSize = 200)),
        replace("users")),
      RestResource("messages",
        EndpointConfig("conversations.history", dataSelector = "messages",
          paginator = Paginator.Cursor("response_metadata.next_cursor", "cursor", pageSize = 200),
          incremental = Some(IncrementalBinding("ts", "oldest")),
          parent = Some(ParentBinding("channels", Seq("id")))),
        merge("messages", "ts")),
    ),
  )

  /** shopify (sources/shopify_dlt/__init__.py:23-165): REST admin objects,
    * next-URL via Link header emulated by `next` body field in the JSON
    * proxy, page 250 (settings.py:3), `updated_at_min` incremental.
    */
  def shopify(shop: String, token: String): RestSource = RestSource(
    name = "shopify",
    client = ClientConfig(s"https://$shop.myshopify.com/admin/api/2024-01",
      Some(Auth.Header("X-Shopify-Access-Token", token))),
    resources = Seq("products", "orders", "customers").map { obj =>
      RestResource(obj,
        EndpointConfig(s"$obj.json", params = Map("limit" -> "250"),
          dataSelector = obj,
          paginator = Paginator.Cursor("next_page_info", "page_info", pageSize = 250),
          incremental = Some(IncrementalBinding("updated_at", "updated_at_min"))),
        merge(obj, "id"))
    },
  )

  /** jira (sources/jira/__init__.py:13-120): offset paging
    * (startAt/maxResults), issues via JQL ordered by updated.
    */
  def jira(domain: String, email: String, apiToken: String): RestSource = RestSource(
    name = "jira",
    client = ClientConfig(s"https://$domain.atlassian.net/rest/api/3",
      Some(Auth.Basic(email, apiToken))),
    resources = Seq(
      RestResource("projects",
        EndpointConfig("project/search", dataSelector = "values",
          paginator = Paginator.Offset("startAt", "maxResults", pageSize = 50)),
        replace("projects")),
      RestResource("users",
        EndpointConfig("users/search", dataSelector = "$",
          paginator = Paginator.Offset("startAt", "maxResults", pageSize = 50)),
        replace("users")),
      RestResource("issues",
        EndpointConfig("search", params = Map("jql" -> "order by updated asc"),
          dataSelector = "issues",
          paginator = Paginator.Offset("startAt", "maxResults", pageSize = 100)),
        merge("issues", "id")),
    ),
  )

  /** freshdesk (sources/freshdesk/__init__.py:13-80): page-number paging,
    * `updated_since` incremental, merge on id.
    */
  def freshdesk(domain: String, apiKey: String): RestSource = RestSource(
    name = "freshdesk",
    client = ClientConfig(s"https://$domain.freshdesk.com/api/v2", Some(Auth.Basic(apiKey, "X"))),
    resources = Seq("agents", "companies", "contacts", "groups", "roles", "tickets").map { e =>
      RestResource(e,
        EndpointConfig(e, dataSelector = "$",
          paginator = Paginator.PageNumber("page", "per_page", pageSize = 100),
          incremental = if (e == "tickets" || e == "contacts")
            Some(IncrementalBinding("updated_at", "updated_since")) else None),
        merge(e, "id"))
    },
  )

  /** notion (sources/notion/__init__.py:13-85): cursor paging via
    * `next_cursor`, database rows as dynamic tables.
    */
  def notion(apiKey: String): RestSource = RestSource(
    name = "notion",
    client = ClientConfig("https://api.notion.com/v1", Some(Auth.Bearer(apiKey)),
      headers = Map("Notion-Version" -> "2022-06-28")),
    resources = Seq(
      RestResource("databases",
        EndpointConfig("search", dataSelector = "results",
          paginator = Paginator.Cursor("next_cursor", "start_cursor", pageSize = 100)),
        replace("databases")),
    ),
  )

  /** workable (sources/workable/__init__.py:30-120): paging via next-url,
    * dependent sub-endpoints per candidate/job.
    */
  def workable(subdomain: String, token: String): RestSource = RestSource(
    name = "workable",
    client = ClientConfig(s"https://$subdomain.workable.com/spi/v3", Some(Auth.Bearer(token))),
    resources = Seq(
      RestResource("candidates",
        EndpointConfig("candidates", dataSelector = "candidates",
          paginator = Paginator.NextUrl("paging.next"),
          incremental = Some(IncrementalBinding("updated_at", "updated_after"))),
        merge("candidates", "id")),
      RestResource("jobs",
        EndpointConfig("jobs", dataSelector = "jobs", paginator = Paginator.NextUrl("paging.next")),
        replace("jobs")),
      RestResource("candidate_activities",
        EndpointConfig("candidates/{id}/activities", dataSelector = "activities",
          paginator = Paginator.NextUrl("paging.next"),
          parent = Some(ParentBinding("candidates", Seq("id")))),
        append("candidate_activities")),
    ),
  )

  /** airtable (sources/airtable/__init__.py:11-70): offset-token cursor,
    * pk from table metadata; table per base table.
    */
  def airtable(apiKey: String, baseId: String, tables: Seq[String]): RestSource = RestSource(
    name = "airtable",
    client = ClientConfig(s"https://api.airtable.com/v0/$baseId", Some(Auth.Bearer(apiKey))),
    resources = tables.map { tbl =>
      RestResource(tbl,
        EndpointConfig(tbl, dataSelector = "records",
          paginator = Paginator.Cursor("offset", "offset", pageSize = 100)),
        merge(tbl, "id"))
    },
  )

  /** strapi (sources/strapi/__init__.py:11-40): page-number pagination. */
  def strapi(host: String, token: String, endpoints: Seq[String]): RestSource = RestSource(
    name = "strapi",
    client = ClientConfig(s"https://$host/api", Some(Auth.Bearer(token))),
    resources = endpoints.map { e =>
      RestResource(e,
        EndpointConfig(e, dataSelector = "data",
          paginator = Paginator.PageNumber("pagination[page]", "pagination[pageSize]", pageSize = 25)),
        replace(e))
    },
  )

  /** mux (sources/mux/__init__.py:15-60): page-number paging, assets+views. */
  def mux(tokenId: String, tokenSecret: String): RestSource = RestSource(
    name = "mux",
    client = ClientConfig("https://api.mux.com", Some(Auth.Basic(tokenId, tokenSecret))),
    resources = Seq(
      RestResource("assets",
        EndpointConfig("video/v1/assets", dataSelector = "data",
          paginator = Paginator.PageNumber("page", "limit", pageSize = 100)),
        merge("assets", "id")),
      RestResource("video_views",
        EndpointConfig("data/v1/video-views", dataSelector = "data",
          paginator = Paginator.PageNumber("page", "limit", pageSize = 100)),
        append("video_views")),
    ),
  )

  /** pokemon demo (sources/pokemon/__init__.py:15-45): offset paging. */
  def pokemon(): RestSource = RestSource(
    name = "pokemon",
    client = ClientConfig("https://pokeapi.co/api/v2"),
    resources = Seq(
      RestResource("pokemon",
        EndpointConfig("pokemon", dataSelector = "results",
          paginator = Paginator.Offset("offset", "limit", pageSize = 100)),
        replace("pokemon")),
    ),
  )

  /** chess.com (sources/chess/__init__.py:15-147): unauthenticated; player
    * profiles fanned out per player, month archives filtered by range and
    * a seen-archives state set (§2.7; the anti-join filter is applied by
    * the pipeline).
    */
  def chess(players: Seq[String]): RestSource = RestSource(
    name = "chess",
    client = ClientConfig("https://api.chess.com/pub"),
    resources = Seq(
      RestResource("players_profiles",
        EndpointConfig("player/{username}", dataSelector = "$",
          parent = Some(ParentBinding("players", Seq("username")))),
        merge("players_profiles", "player_id")),
      RestResource("players_archives",
        EndpointConfig("player/{username}/games/archives", dataSelector = "archives",
          parent = Some(ParentBinding("players", Seq("username")))),
        replace("players_archives")),
    ),
  )

  /** asana (sources/asana_dlt/__init__.py:30-260): workspaces fan out to
    * projects/tags/users/teams, projects to tasks (`modified_since`
    * incremental), tasks to stories — the transformer DAG as parent-bound
    * resources.
    */
  def asana(token: String): RestSource = RestSource(
    name = "asana",
    client = ClientConfig("https://app.asana.com/api/1.0", Some(Auth.Bearer(token))),
    resources = Seq(
      RestResource("workspaces",
        EndpointConfig("workspaces", dataSelector = "data",
          paginator = Paginator.Cursor("next_page.offset", "offset", pageSize = 100)),
        replace("workspaces")),
      RestResource("projects",
        EndpointConfig("workspaces/{gid}/projects", dataSelector = "data",
          paginator = Paginator.Cursor("next_page.offset", "offset", pageSize = 100),
          parent = Some(ParentBinding("workspaces", Seq("gid")))),
        replace("projects")),
      RestResource("tasks",
        EndpointConfig("projects/{gid}/tasks", dataSelector = "data",
          paginator = Paginator.Cursor("next_page.offset", "offset", pageSize = 100),
          incremental = Some(IncrementalBinding("modified_at", "modified_since")),
          parent = Some(ParentBinding("projects", Seq("gid")))),
        merge("tasks", "gid")),
      RestResource("stories",
        EndpointConfig("tasks/{gid}/stories", dataSelector = "data",
          paginator = Paginator.Cursor("next_page.offset", "offset", pageSize = 100),
          parent = Some(ParentBinding("tasks", Seq("gid")))),
        append("stories")),
    ),
  )

  /** personio (sources/personio/__init__.py:15-310): page-number paging
    * (200/page, __init__.py:19,27), `updated_since` incremental, per-
    * employee transformers. Auth is the reference's token EXCHANGE
    * (client credentials POSTed to /auth, bearer token from the
    * response's `data.token` — sources/personio/helpers.py:24-37),
    * modeled as the engine's OAuth2 client-credentials mode: the token
    * is minted lazily, cached to expiry, and re-minted on a 401.
    */
  def personio(clientId: String, clientSecret: String,
      authTransport: HttpTransport = new UrlConnectionTransport()): RestSource = RestSource(
    name = "personio",
    client = ClientConfig("https://api.personio.de/v1",
      Some(new Auth.OAuth2("https://api.personio.de/v1/auth", clientId, clientSecret,
        transport = authTransport, tokenJsonPath = "data.token"))),
    resources = Seq(
      RestResource("employees",
        EndpointConfig("company/employees", dataSelector = "data",
          paginator = Paginator.Offset("offset", "limit", pageSize = 200),
          incremental = Some(IncrementalBinding("last_modified_at", "updated_since"))),
        merge("employees", "id")),
      RestResource("absences",
        EndpointConfig("company/time-offs", dataSelector = "data",
          paginator = Paginator.Offset("offset", "limit", pageSize = 200)),
        merge("absences", "id")),
      RestResource("attendances",
        EndpointConfig("company/attendances", dataSelector = "data",
          paginator = Paginator.Offset("offset", "limit", pageSize = 200),
          incremental = Some(IncrementalBinding("updated_at", "updated_from"))),
        merge("attendances", "id")),
    ),
  )

  /** matomo (sources/matomo/__init__.py:15-228): one Reports API with
    * `method` params (table per method, §2.8) and the Live visits API with
    * 2000/page (168) — the session-close filter is
    * `Specialized.Matomo.removeActiveVisits`.
    */
  def matomo(baseUrl: String, apiToken: String, siteId: Int, methods: Seq[String]): RestSource = RestSource(
    name = "matomo",
    client = ClientConfig(baseUrl, Some(Auth.QueryParam("token_auth", apiToken))),
    resources = methods.map { m =>
      RestResource(m.replace('.', '_').toLowerCase,
        EndpointConfig("index.php",
          params = Map("module" -> "API", "method" -> m, "idSite" -> siteId.toString,
            "format" -> "JSON", "period" -> "day"),
          dataSelector = "$"),
        replace(m.replace('.', '_').toLowerCase))
    } :+ RestResource("visits",
      EndpointConfig("index.php",
        params = Map("module" -> "API", "method" -> "Live.getLastVisitsDetails",
          "idSite" -> siteId.toString, "format" -> "JSON"),
        dataSelector = "$",
        paginator = Paginator.Offset("filter_offset", "filter_limit", pageSize = 2000),
        incremental = Some(IncrementalBinding("lastActionTimestamp", "minTimestamp"))),
      TableHints("visits", Disposition.Append)),
  )

  /** google_analytics (sources/google_analytics/__init__.py:27-153): GA4
    * runReport pages of 1000 (35,51); rows come back pre-aggregated,
    * typing applied via `Specialized.GA`.
    */
  def googleAnalytics(propertyId: String, token: String, reports: Seq[String]): RestSource = RestSource(
    name = "google_analytics",
    client = ClientConfig("https://analyticsdata.googleapis.com/v1beta", Some(Auth.Bearer(token))),
    resources = reports.map { r =>
      RestResource(r,
        EndpointConfig(s"properties/$propertyId:runReport",
          params = Map("limit" -> "1000"), dataSelector = "rows",
          paginator = Paginator.Offset("offset", "limit", pageSize = 1000)),
        append(r))
    } :+ RestResource("metadata",
      EndpointConfig(s"properties/$propertyId/metadata", dataSelector = "$"),
      replace("metadata")),
  )

  /** facebook_ads (sources/facebook_ads/__init__.py:52-220): marketing
    * objects cursor-paged 50/page (57,132); insights are async report jobs
    * (AsyncJobPoller) fanned per day then unioned.
    */
  def facebookAds(accountId: String, accessToken: String): RestSource = RestSource(
    name = "facebook_ads",
    client = ClientConfig("https://graph.facebook.com/v19.0",
      Some(Auth.QueryParam("access_token", accessToken))),
    resources = Seq("campaigns", "adsets", "ads", "adcreatives", "leads").map { obj =>
      RestResource(obj,
        EndpointConfig(s"act_$accountId/$obj", params = Map("limit" -> "50"),
          dataSelector = "data",
          paginator = Paginator.Cursor("paging.cursors.after", "after", pageSize = 50)),
        replace(obj))
    } :+ RestResource("insights",
      // attribution window: each run rewinds the cursor 7 days and
      // re-fetches the still-settling trailing reports; merge on
      // (date_start, ad_id) dedups the overlap
      // (sources/facebook_ads/__init__.py:120-179)
      EndpointConfig(s"act_$accountId/insights", params = Map("limit" -> "50"),
        dataSelector = "data",
        paginator = Paginator.Cursor("paging.cursors.after", "after", pageSize = 50),
        incremental = Some(IncrementalBinding("date_start", "time_range[since]", lagDays = 7))),
      TableHints("insights", Disposition.Merge, primaryKey = Seq("date_start", "ad_id"))),
  )

  /** google_ads (sources/google_ads/__init__.py:67-238): GAQL queries via
    * searchStream — SQL-pushdown reader; the GAQL string is the plan.
    */
  def googleAds(customerId: String, token: String, queries: Map[String, String]): RestSource = RestSource(
    name = "google_ads",
    client = ClientConfig("https://googleads.googleapis.com/v16", Some(Auth.Bearer(token))),
    resources = queries.map { case (name, gaql) =>
      RestResource(name,
        EndpointConfig(s"customers/$customerId/googleAds:searchStream",
          params = Map("query" -> gaql), dataSelector = "results"),
        append(name))
    }.toSeq,
  )

  /** salesforce (sources/salesforce/__init__.py:23-148): sObjects through
    * the query endpoint — the generated SOQL (Specialized.Soql: field list
    * with compound pruning, cursor WHERE/ORDER BY) IS the pushdown; paging
    * follows `nextRecordsUrl` (helpers/records.py:99-134).
    */
  def salesforce(
      instanceUrl: String,
      accessToken: String,
      sobjects: Map[String, Seq[(String, String)]], // name → (field, type) catalog
      cursorField: String = "SystemModstamp",
  ): RestSource = RestSource(
    name = "salesforce",
    client = ClientConfig(s"$instanceUrl/services/data/v59.0", Some(Auth.Bearer(accessToken))),
    resources = sobjects.map { case (obj, fields) =>
      RestResource(obj.toLowerCase,
        EndpointConfig("query",
          params = Map("q" -> Specialized.Soql.query(obj, fields, Some(cursorField), None)),
          dataSelector = "records",
          paginator = Paginator.NextUrl("nextRecordsUrl"),
          incremental = Some(IncrementalBinding(cursorField, "q_cursor"))),
        merge(obj.toLowerCase, "Id"))
    }.toSeq,
  )

  /** bing webmaster (sources/bing_webmaster/__init__.py:19-100): single-page
    * JSON responses, composite merge key (38-43).
    */
  def bingWebmaster(apiKey: String, siteUrls: Seq[String]): RestSource = RestSource(
    name = "bing_webmaster",
    client = ClientConfig("https://ssl.bing.com/webmaster/api.svc/json",
      Some(Auth.QueryParam("apikey", apiKey))),
    resources = Seq(
      RestResource("page_stats",
        EndpointConfig("GetPageStats", dataSelector = "d",
          parent = Some(ParentBinding("sites", Seq("siteUrl")))),
        TableHints("page_stats", Disposition.Merge,
          mergeKey = Seq("date", "page", "site_url"))),
    ),
  )
}
