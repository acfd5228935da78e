package graft.connectors.rest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal JSONPath-style navigation for `data_selector` / cursor-path
  * extraction (reference: `extract_jsonpath` sources/slack/helpers.py:24-42,
  * `data_selector` sources/pipedrive/rest_v2/__init__.py:157).
  *
  * Supported paths: `a.b.c`, leading `$.`, `[*]` array fan-out, `[N]`
  * index (negative = from the end), `[a:b]` python-style slices (so
  * stripe's `data[-1:].id` last-element cursor works), bare `$` (the
  * root). Always returns the matched nodes (arrays fan out).
  */
object Json {
  val mapper = new ObjectMapper()

  def parse(s: String): JsonNode = mapper.readTree(s)

  private val bracketRe = "\\[([^\\]]*)\\]".r

  private def parseIndex(s: String, path: String): Int =
    try s.trim.toInt
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"invalid JSONPath '$path': bracket index '$s' is not an integer " +
            "(supported ops: [*], [N], [a:b])")
    }

  def select(root: JsonNode, path: String): Seq[JsonNode] = {
    val clean = path.stripPrefix("$").stripPrefix(".")
    if (clean.isEmpty) return Seq(root)
    clean.split('.').foldLeft(Seq(root)) { (nodes, seg) =>
      val field = seg.takeWhile(_ != '[')
      val ops = bracketRe.findAllMatchIn(seg.drop(field.length)).map(_.group(1)).toSeq
      val afterField = nodes
        .flatMap(n => (if (field.isEmpty) Some(n) else Option(n.get(field))).toSeq)
        .filterNot(_.isMissingNode)
      ops.foldLeft(afterField) { (ns, op) =>
        ns.flatMap { v =>
          op match {
            case "*" =>
              if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            case s if s.contains(':') =>
              val parts = s.split(":", -1)
              if (parts.length != 2)
                throw new IllegalArgumentException(
                  s"invalid JSONPath '$path': slice '[$s]' must have exactly one ':' " +
                    "(steps are not supported)")
              if (!v.isArray) Nil
              else {
                val len = v.size()
                def norm(x: String, dflt: Int) =
                  if (x.isEmpty) dflt
                  else { val i = parseIndex(x, path); if (i < 0) math.max(0, len + i) else math.min(i, len) }
                (norm(parts(0), 0) until norm(parts(1), len)).map(v.get)
              }
            case idx =>
              val i = parseIndex(idx, path)
              if (!v.isArray) Nil
              else {
                val j = if (i < 0) v.size() + i else i
                if (j >= 0 && j < v.size()) Seq(v.get(j)) else Nil
              }
          }
        }.filterNot(_.isMissingNode)
      }
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
