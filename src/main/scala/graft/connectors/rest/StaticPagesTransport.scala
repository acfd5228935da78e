package graft.connectors.rest

/** Transport serving canned bodies keyed by `path?k=v&...` (params sorted)
  * with a bare-`path` fallback. Used by specs and the driver-verified REST
  * end-to-end query; also the pattern for record/replay fixtures.
  * `headers` (same key scheme) lets fixtures model header-borne
  * protocols — RFC 5988 `Link` pagination. Header NAMES are lowercased
  * here, not by the fixture author: HttpResponse.header lowercases only
  * the LOOKUP name, so a fixture keyed "Link" in natural casing would
  * otherwise silently yield no next link and truncate pagination to one
  * page with no error.
  */
final case class StaticPagesTransport(pages: Map[String, String],
    headers: Map[String, Map[String, String]] = Map.empty) extends HttpTransport {

  /** POST fixtures key on `POST <path-with-query>#<body>` — the engine
    * pre-appends query params to the URL for POST, and the body is part
    * of the request identity (cursor-in-body pagination differs only by
    * body between pages). Strict: no fallback, a missing key 404s.
    */
  override def post(url: String, body: String, headers0: Map[String, String]): HttpResponse = {
    val path = url.replaceFirst("^https?://[^/]+/", "")
    val key = s"POST $path#$body"
    pages.get(key) match {
      case Some(b) =>
        HttpResponse(200, b,
          headers.getOrElse(key, Map.empty).map { case (hk, hv) => hk.toLowerCase -> hv })
      case None => HttpResponse(404, s"""{"error":"no page for $key"}""")
    }
  }

  override def get(url: String, params: Map[String, String], headers0: Map[String, String]): HttpResponse = {
    val path = url.replaceFirst("^https?://[^/]+/", "")
    val key = path + "?" + params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
    // bare-path fallback ONLY for the param-less first request — a missing
    // paginated key must 404, not silently replay page one
    val hit = pages.get(key).map(key -> _)
      .orElse(if (params.isEmpty) pages.get(path).map(path -> _) else None)
    hit match {
      case Some((k, body)) =>
        HttpResponse(200, body,
          headers.getOrElse(k, Map.empty).map { case (hk, hv) => hk.toLowerCase -> hv })
      case None            => HttpResponse(404, s"""{"error":"no page for $key"}""")
    }
  }
}
