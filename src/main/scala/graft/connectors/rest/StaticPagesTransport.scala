package graft.connectors.rest

/** Transport serving canned bodies keyed by `path?k=v&...` (params sorted)
  * with a bare-`path` fallback. Used by specs and the driver-verified REST
  * end-to-end query; also the pattern for record/replay fixtures.
  */
final case class StaticPagesTransport(pages: Map[String, String]) extends HttpTransport {
  override def get(url: String, params: Map[String, String], headers: Map[String, String]): HttpResponse = {
    val path = url.replaceFirst("^https?://[^/]+/", "")
    val key = path + "?" + params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
    // bare-path fallback ONLY for the param-less first request — a missing
    // paginated key must 404, not silently replay page one
    pages.get(key).orElse(if (params.isEmpty) pages.get(path) else None) match {
      case Some(body) => HttpResponse(200, body)
      case None       => HttpResponse(404, s"""{"error":"no page for $key"}""")
    }
  }
}
