package graft.connectors.rest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal JSONPath-style navigation for `data_selector` / cursor-path
  * extraction (reference: `extract_jsonpath` sources/slack/helpers.py:24-42,
  * `data_selector` sources/pipedrive/rest_v2/__init__.py:157).
  *
  * Supported paths: `a.b.c`, leading `$.`, `[*]` array fan-out, bare `$`
  * (the root). Always returns the matched nodes (arrays fan out).
  */
object Json {
  val mapper = new ObjectMapper()

  def parse(s: String): JsonNode = mapper.readTree(s)

  def select(root: JsonNode, path: String): Seq[JsonNode] = {
    val clean = path.stripPrefix("$").stripPrefix(".")
    if (clean.isEmpty) return Seq(root)
    clean.split('.').foldLeft(Seq(root)) { (nodes, seg) =>
      val (field, fanOut) =
        if (seg.endsWith("[*]")) (seg.dropRight(3), true) else (seg, false)
      nodes.flatMap { n =>
        val next = if (field.isEmpty) Some(n) else Option(n.get(field))
        next.toSeq.flatMap { v =>
          if (fanOut && v.isArray) v.elements().asScala.toSeq else Seq(v)
        }
      }.filterNot(_.isMissingNode)
    }
  }

  /** First matching node as text, if present and non-null. */
  def selectString(root: JsonNode, path: String): Option[String] =
    select(root, path).headOption.filterNot(_.isNull).map { n =>
      if (n.isTextual) n.asText() else n.toString
    }

  /** Items under a data selector: if the node is an array, its elements;
    * a single object yields itself (pipedrive `data` single-or-list unwrap,
    * sources/pipedrive/helpers/pages.py:79-96).
    */
  def items(root: JsonNode, dataSelector: String): Seq[JsonNode] =
    select(root, dataSelector).flatMap { n =>
      if (n.isArray) n.elements().asScala.toSeq
      else if (n.isNull || n.isMissingNode) Nil
      else Seq(n)
    }
}
