package graft.connectors.rest

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Generic GraphQL resource reader — the github GraphQL path
  * (sources/github/__init__.py:13-149: paging helpers.py:127-175,
  * nested-connection flattening 105-126) and shopify's parameterized
  * partner query resource (sources/shopify_dlt/__init__.py:168-228:
  * query + data items path + pagination cursor path).
  *
  * Pagination: relay-style — variables carry `$after`; the response
  * exposes `pageInfo { hasNextPage, endCursor }` at `pageInfoPath`.
  * Nested connections inside each item ({edges:[{node:X}]} / {nodes:[X]})
  * are flattened to plain arrays before schema inference, so downstream
  * sees `ArrayType(StructType)` columns (SURVEY §2.1 row 16).
  */
object GraphQlReader {

  final case class GraphQlConfig(
      url: String,
      query: String,
      variables: Map[String, String] = Map.empty,
      itemsPath: String, // e.g. "data.repository.issues.nodes[*]"
      pageInfoPath: String = "", // e.g. "data.repository.issues.pageInfo"; empty = single page
      cursorVariable: String = "after",
      maxPages: Int = 10000,
  )

  def fetchItems(cfg: GraphQlConfig, transport: HttpTransport,
      headers: Map[String, String] = Map.empty): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var cursor: Option[String] = None
    var page = 0
    var done = false
    while (!done && page < cfg.maxPages) {
      val vars = Json.mapper.createObjectNode()
      cfg.variables.foreach { case (k, v) => vars.put(k, v) }
      cursor.foreach(c => vars.put(cfg.cursorVariable, c))
      val body = Json.mapper.createObjectNode()
      body.put("query", cfg.query)
      body.set[JsonNode]("variables", vars)

      val resp = transport.post(cfg.url, body.toString, headers)
      if (resp.status < 200 || resp.status >= 300)
        throw new RuntimeException(s"GraphQL POST ${cfg.url} -> HTTP ${resp.status}: ${resp.body.take(500)}")
      val root = Json.parse(resp.body)
      Option(root.get("errors")).filter(_.size() > 0).foreach { errs =>
        throw new RuntimeException(s"GraphQL errors: ${errs.toString.take(500)}")
      }

      val items = Json.select(root, cfg.itemsPath)
      out ++= items.map(n => flattenConnections(n).toString)
      page += 1

      if (cfg.pageInfoPath.isEmpty) done = true
      else {
        val pi = Json.select(root, cfg.pageInfoPath).headOption
        val hasNext = pi.exists(p => Option(p.get("hasNextPage")).exists(_.asBoolean(false)))
        cursor = pi.flatMap(p => Option(p.get("endCursor")).filterNot(_.isNull).map(_.asText()))
        done = !hasNext || cursor.isEmpty || items.isEmpty
      }
    }
    out.toSeq
  }

  /** Recursive rewrite: {edges:[{node:X},...]} and {nodes:[...]} become
    * plain arrays; also drops sibling pageInfo/totalCount wrappers
    * (github helpers.py:105-126).
    */
  def flattenConnections(node: JsonNode): JsonNode = node match {
    case obj: ObjectNode =>
      val fields = obj.properties().asScala.map(e => e.getKey).toSeq
      fields.foreach { name =>
        val child = obj.get(name)
        connectionArray(child) match {
          case Some(arr) =>
            val flat = Json.mapper.createArrayNode()
            arr.foreach(e => flat.add(flattenConnections(e)))
            obj.set[JsonNode](name, flat)
          case None =>
            obj.set[JsonNode](name, flattenConnections(child))
        }
      }
      obj
    case arr: ArrayNode =>
      val out = Json.mapper.createArrayNode()
      arr.elements().asScala.foreach(e => out.add(flattenConnections(e)))
      out
    case other => other
  }

  /** An object is a "connection" iff it has edges[{node}] or nodes[]. */
  private def connectionArray(n: JsonNode): Option[Seq[JsonNode]] = n match {
    case obj: ObjectNode if obj.has("edges") && obj.get("edges").isArray =>
      Some(obj.get("edges").elements().asScala.toSeq.flatMap(e => Option(e.get("node"))))
    case obj: ObjectNode if obj.has("nodes") && obj.get("nodes").isArray =>
      Some(obj.get("nodes").elements().asScala.toSeq)
    case _ => None
  }

  def read(spark: SparkSession, cfg: GraphQlConfig, transport: HttpTransport,
      headers: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val items = fetchItems(cfg, transport, headers)
    if (items.isEmpty) spark.emptyDataFrame
    else spark.read.json(spark.createDataset(items))
  }
}
