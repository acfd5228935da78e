package graft.connectors

import graft.SparkTestBase
import graft.connectors.rest.{GraphQlReader, HttpResponse, HttpTransport}
import graft.connectors.sources.SheetsReader
import org.apache.spark.sql.functions._

class GraphQlTransport(pages: Map[String, String]) extends HttpTransport {
  var posts: List[String] = Nil
  override def get(url: String, params: Map[String, String], headers: Map[String, String]) =
    HttpResponse(405, "GET not supported")
  override def post(url: String, body: String, headers: Map[String, String]): HttpResponse = {
    posts = body :: posts
    val node = rest.Json.parse(body)
    val cursor = Option(node.get("variables").get("after")).map(_.asText()).getOrElse("start")
    pages.get(cursor) match {
      case Some(b) => HttpResponse(200, b)
      case None    => HttpResponse(400, s"""{"errors":[{"message":"bad cursor $cursor"}]}""")
    }
  }
}

class GraphQlSheetsSpec extends SparkTestBase {
  import spark.implicits._

  test("GraphQL relay paging + nested-connection flattening") {
    val page1 =
      """{"data":{"repository":{"issues":{
        |  "nodes":[{"id":1,"title":"a","labels":{"edges":[{"node":{"name":"bug"}},{"node":{"name":"p1"}}]}}],
        |  "pageInfo":{"hasNextPage":true,"endCursor":"c2"}}}}}""".stripMargin
    val page2 =
      """{"data":{"repository":{"issues":{
        |  "nodes":[{"id":2,"title":"b","labels":{"nodes":[{"name":"docs"}]}}],
        |  "pageInfo":{"hasNextPage":false,"endCursor":null}}}}}""".stripMargin
    val t = new GraphQlTransport(Map("start" -> page1, "c2" -> page2))
    val cfg = GraphQlReader.GraphQlConfig(
      url = "https://gql.test/graphql",
      query = "query($after:String){...}",
      itemsPath = "data.repository.issues.nodes[*]",
      pageInfoPath = "data.repository.issues.pageInfo")
    val df = GraphQlReader.read(spark, cfg, t)
    assert(df.count() == 2)
    // connection wrappers flattened to plain arrays of structs
    val labels = df.where($"id" === 1).select(expr("transform(labels, l -> l.name)")).head().getSeq[String](0)
    assert(labels == Seq("bug", "p1"))
    assert(t.posts.size == 2)
  }

  test("GraphQL errors surface as failures") {
    val t = new GraphQlTransport(Map("start" -> """{"errors":[{"message":"boom"}]}"""))
    val cfg = GraphQlReader.GraphQlConfig("https://gql.test/g", "q", itemsPath = "data.x[*]")
    val e = intercept[RuntimeException](GraphQlReader.fetchItems(cfg, t))
    assert(e.getMessage.contains("boom"))
  }

  test("sheets grid → typed DataFrame with inferred per-column types") {
    val grid = Seq(
      Seq("Name", "Age", "Score", "Active", "Name"), // dup header → suffixed
      Seq("alice", "30", "9.5", "TRUE", "x"),
      Seq("bob", "41", "7.25", "FALSE", null),
      Seq("carol", "oops", "1.0", "TRUE", "z"),      // bad numeric cell → null
      Seq(null, null, null, null, null),              // fully empty row dropped
    )
    val df = SheetsReader.fromGrid(spark, grid)
    assert(df.columns.toSeq == Seq("name", "age", "score", "active", "name_1"))
    assert(df.schema("age").dataType.typeName == "long")
    assert(df.schema("score").dataType.typeName == "double")
    assert(df.schema("active").dataType.typeName == "boolean")
    assert(df.count() == 3)
    assert(df.where($"name" === "carol").head().isNullAt(1))
    assert(df.where($"name" === "bob").head().getBoolean(3) == false)
  }
}
