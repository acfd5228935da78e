package graft.connectors.sources

import graft.SparkTestBase
import graft.connectors.rest.{RestEngine, StaticPagesTransport}
import graft.core.Disposition

class FleetSpec extends SparkTestBase {

  test("fleet configs carry the reference's dispositions, keys and page sizes") {
    val gh = Fleet.github("o", "r", None)
    assert(gh.resources.map(_.name) == Seq("repo_events", "issues", "stargazers"))
    assert(gh.resources.find(_.name == "issues").get.hints.primaryKey == Seq("id"))
    assert(gh.resources.find(_.name == "repo_events").get.hints.disposition == Disposition.Append)

    val pd = Fleet.pipedrive("tok")
    val deals = pd.resources.find(_.name == "deals").get
    assert(deals.endpoint.incremental.get.startParam == "updated_since")
    val parts = pd.resources.find(_.name == "deal_participants").get
    assert(parts.endpoint.parent.get.keyFields == Seq("id"))

    val bing = Fleet.bingWebmaster("k", Nil)
    assert(bing.resources.head.hints.mergeKey == Seq("date", "page", "site_url"))

    // every fleet source must have ≥1 resource and a usable base url
    val all = Seq(gh, pd, bing, Fleet.stripe("k"), Fleet.hubspot("k"), Fleet.zendesk("s", "e", "t"),
      Fleet.slack("t"), Fleet.shopify("s", "t"), Fleet.jira("d", "e", "t"), Fleet.freshdesk("d", "k"),
      Fleet.notion("k"), Fleet.workable("s", "t"), Fleet.airtable("k", "b", Seq("t1")),
      Fleet.strapi("h", "t", Seq("e1")), Fleet.mux("i", "s"), Fleet.pokemon(), Fleet.chess(Seq("p")),
      Fleet.asana("t"), Fleet.personio("i", "s"),
      Fleet.matomo("https://m.example.test", "t", 1, Seq("VisitsSummary.get")),
      Fleet.googleAnalytics("123", "t", Seq("daily_users")),
      Fleet.facebookAds("42", "t"), Fleet.googleAds("c1", "t", Map("ads" -> "SELECT x FROM campaign")),
      Fleet.salesforce("https://x.my.salesforce.com", "t",
        Map("Account" -> Seq("Id" -> "id", "Name" -> "string", "BillingAddress" -> "address"))))
    all.foreach { s =>
      assert(s.resources.nonEmpty, s.name)
      assert(s.client.baseUrl.startsWith("https://"), s.name)
    }
  }

  test("a fleet source runs end-to-end against canned pages (github issues)") {
    import spark.implicits._
    val src = Fleet.github("octo", "repo", None)
    val issues = src.resources.find(_.name == "issues").get
    val t = StaticPagesTransport(Map(
      "repos/octo/repo/issues?direction=asc&per_page=100&sort=updated&state=all" ->
        """[{"id":1,"updated_at":"2024-01-01T00:00:00Z","title":"a"},
          | {"id":2,"updated_at":"2024-01-02T00:00:00Z","title":"b"}]""".stripMargin,
    ))
    val df = RestEngine.readResource(spark, src, issues, t)
    assert(df.count() == 2)
    assert(df.select("title").as[String].collect().toSet == Set("a", "b"))
  }

  test("stripe cursor pagination follows the last id of each page (data[-1:].id)") {
    import spark.implicits._
    val src = Fleet.stripe("sk_test")
    val customers = src.resources.find(_.name == "customer").get
    val t = StaticPagesTransport(Map(
      "v1/customers?limit=100" ->
        """{"data":[{"id":"cus_a","created":1},{"id":"cus_b","created":2}],"has_more":true}""",
      "v1/customers?limit=100&starting_after=cus_b" ->
        """{"data":[{"id":"cus_c","created":3}],"has_more":false}""",
      // stripe keeps returning the last id even on the final short page;
      // termination comes from the empty follow-up
      "v1/customers?limit=100&starting_after=cus_c" -> """{"data":[],"has_more":false}""",
    ))
    val df = RestEngine.readResource(spark, src, customers, t)
    assert(df.select("id").as[String].collect().toSet == Set("cus_a", "cus_b", "cus_c"))
  }

  test("hubspot dynamic property discovery drives column typing end-to-end") {
    import org.apache.spark.sql.types._
    val t = StaticPagesTransport(Map(
      "crm/v3/properties/deals" ->
        """{"results":[
          | {"name":"amount","type":"number"},
          | {"name":"closedate","type":"datetime"},
          | {"name":"hs_lastmodifieddate","type":"datetime"},
          | {"name":"custom_score","type":"number"}],"paging":{}}""".stripMargin,
      "crm/v3/objects/deals?limit=100&properties=amount,closedate,custom_score" ->
        """{"results":[
          | {"id":"1","properties":{"amount":"1250.5","closedate":"2024-03-01T10:00:00Z","custom_score":"7"}},
          | {"id":"2","properties":{"amount":"99","closedate":"2024-04-02T11:30:00Z","custom_score":"3.5"}}],
          | "paging":{}}""".stripMargin,
    ))
    val src = Fleet.hubspotDynamic("tok", t, objects = Seq("deals"),
      requestedProps = Map("deals" -> Seq("amount", "closedate")))
    val deals = src.resources.head
    // requested + discovered custom props travel as the request param
    assert(deals.endpoint.params("properties") == "amount,closedate,custom_score")
    // the catalog typed the flattened property columns
    val df = RestEngine.readResource(spark, src, deals, t)
    val root = graft.core.Normalize.normalize(df, deals.hints)("deals")
    assert(root.schema("properties__amount").dataType == DoubleType)
    assert(root.schema("properties__custom_score").dataType == DoubleType)
    assert(root.schema("properties__closedate").dataType == TimestampType)
    val r = root.orderBy("id").collect()
    assert(r.map(_.getAs[Double]("properties__amount")).toSeq == Seq(1250.5, 99.0))
    assert(r.head.getAs[java.sql.Timestamp]("properties__closedate") != null)
    // unknown requested props fail fast against the live catalog
    val e = intercept[IllegalArgumentException](
      Fleet.hubspotDynamic("tok", t, objects = Seq("deals"),
        requestedProps = Map("deals" -> Seq("nope"))))
    assert(e.getMessage.contains("nope"))
  }

  test("hubspot next-url pagination follows paging.next.link until absent") {
    import spark.implicits._
    val src = Fleet.hubspot("tok", objects = Seq("contacts"))
    val contacts = src.resources.find(_.name == "contacts").get
    val t = StaticPagesTransport(Map(
      "crm/v3/objects/contacts?limit=100" ->
        """{"results":[{"id":"1","properties":{"email":"a@x"}}],
          | "paging":{"next":{"link":"https://api.hubapi.com/crm/v3/objects/contacts?after=p2"}}}""".stripMargin,
      "crm/v3/objects/contacts?after=p2" ->
        """{"results":[{"id":"2","properties":{"email":"b@x"}}],"paging":{}}""",
    ))
    // note: the next-url carries its own query (after=p2); the engine drops
    // accumulated params and requests the link verbatim — the canned key
    // matches on path because StaticPagesTransport sees empty params
    val df = RestEngine.readResource(spark, src, contacts, t)
    assert(df.select("id").as[String].collect().toSet == Set("1", "2"))
  }
}
