package graft.connectors.rest

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

/** HTTP response: status + body + response headers. Header NAMES are
  * lowercased (HTTP headers are case-insensitive; one canonical casing
  * keeps lookups deterministic) and repeated headers are joined with
  * ", " (RFC 7230's list rule — `Link` headers legally combine this
  * way). Headers power the protocol surfaces a body cannot express:
  * RFC 5988 `Link` pagination ([[RestEngine.Paginator.HeaderLink]]).
  */
final case class HttpResponse(status: Int, body: String,
    headers: Map[String, String] = Map.empty) {
  /** Case-insensitive header lookup (names are stored lowercased). */
  def header(name: String): Option[String] = headers.get(name.toLowerCase)
}

/** Pluggable transport so the engine is testable offline and swappable for
  * a pooled client in production. Implementations must be serializable:
  * parent-child fan-out runs transports ON EXECUTORS (mapPartitions), which
  * is this engine's substitute for the reference's thread-pool `@dlt.defer`
  * (sources/chess/__init__.py:54-60).
  */
trait HttpTransport extends Serializable {
  def get(url: String, params: Map[String, String], headers: Map[String, String]): HttpResponse
  /** JSON POST — needed by GraphQL sources; default unsupported so
    * GET-only fixtures stay untouched.
    */
  def post(url: String, body: String, headers: Map[String, String]): HttpResponse =
    throw new UnsupportedOperationException("transport does not support POST")
}

/** Stock JDK transport (no extra deps). Negotiates gzip (`Accept-Encoding:
  * gzip` on every request, transparent inflate when the server answers
  * `Content-Encoding: gzip`) — JSON APIs compress 5-10×, and the JDK's
  * HttpURLConnection does neither half by itself. Redirects follow the
  * JDK default (same-protocol 3xx); chunked transfer decoding is native
  * to HttpURLConnection. All of this is exercised against a live loopback
  * server in HttpTransportLiveSpec.
  */
final class UrlConnectionTransport(connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000,
    /** Cap on the BUFFERED body (post-inflate, so gzip bombs are caught
      * too). A fleet driver fans hundreds of fetches; one endpoint
      * answering with gigabytes must fail loud, not OOM the JVM.
      */
    maxBodyBytes: Int = 256 << 20)
    extends HttpTransport {

  /** Response headers, lowercased; multi-valued joined per RFC 7230.
    * The JDK exposes the status line under a null key — skipped.
    */
  private def responseHeaders(conn: HttpURLConnection): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    conn.getHeaderFields.asScala.collect {
      case (k, vs) if k != null => k.toLowerCase -> vs.asScala.mkString(", ")
    }.toMap
  }

  private def readBounded(in: java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > maxBodyBytes)
        throw new java.io.IOException(
          s"response body exceeds maxBodyBytes=$maxBodyBytes — refusing to buffer")
      n = in.read(buf)
    }
    out.toByteArray
  }

  private def readBody(conn: HttpURLConnection, status: Int): String = {
    val raw = if (status >= 400) conn.getErrorStream else conn.getInputStream
    if (raw == null) return ""
    val isGzip = "gzip".equalsIgnoreCase(String.valueOf(conn.getContentEncoding))
    try {
      if (!isGzip) {
        val bytes = readBounded(raw)
        // A connection dying mid-stream surfaces as a clean EOF short of
        // the declared Content-Length — read-until-EOF alone would hand a
        // silently truncated 200 body to the JSON layer (observed live in
        // HttpTransportLiveSpec). Retryable, so raise IOException.
        val declared = conn.getContentLengthLong
        if (declared >= 0 && bytes.length < declared)
          throw new java.io.IOException(
            s"response body truncated: read ${bytes.length} of $declared declared bytes")
        return new String(bytes, StandardCharsets.UTF_8)
      }
      // A 204/304 or a gzip-flagged error page may carry a zero-length
      // body; GZIPInputStream's constructor throws EOF on it, so peek one
      // byte before committing to the inflate path.
      val pb = new java.io.PushbackInputStream(raw, 1)
      val first = pb.read()
      if (first < 0) return ""
      pb.unread(first)
      // Close the GZIPInputStream itself (not just `raw`): each one owns an
      // Inflater whose native buffer otherwise waits for the GC Cleaner —
      // across a fleet fan-out of hundreds of fetches that native memory
      // balloons between collections. Construction stays inside the try so
      // a corrupt-header ZipException is still mapped to retryable.
      var gz: java.util.zip.GZIPInputStream = null
      try {
        gz = new java.util.zip.GZIPInputStream(pb)
        new String(readBounded(gz), StandardCharsets.UTF_8)
      } catch {
        case e @ (_: java.io.EOFException | _: java.util.zip.ZipException) =>
          // Mid-stream truncation or a server lying about the encoding:
          // never return a partial inflate (a silent prefix would corrupt
          // downstream parse/merge) — raise an IOException naming the
          // cause, which RetryingTransport treats as retryable.
          throw new java.io.IOException(
            s"gzip response body truncated or corrupt (${e.getMessage})", e)
      } finally if (gz != null) gz.close()
    } finally raw.close()
  }

  override def post(url: String, body: String, headers: Map[String, String]): HttpResponse = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setRequestProperty("Accept-Encoding", "gzip")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    try {
      conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
      val status = conn.getResponseCode
      HttpResponse(status, readBody(conn, status), responseHeaders(conn))
    } finally conn.disconnect()
  }

  override def get(url: String, params: Map[String, String], headers: Map[String, String]): HttpResponse = {
    val query = params.map { case (k, v) =>
      URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val full = if (query.isEmpty) url else if (url.contains("?")) s"$url&$query" else s"$url?$query"
    val conn = new URI(full).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestProperty("Accept-Encoding", "gzip")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    try {
      val status = conn.getResponseCode
      HttpResponse(status, readBody(conn, status), responseHeaders(conn))
    } finally conn.disconnect()
  }
}

/** Retry with exponential backoff on 429/5xx — the reference's retry
  * discipline (sources/facebook_ads/helpers.py:188-221,
  * sources/bing_webmaster/helpers.py:14-33) as a transport decorator.
  */
final class RetryingTransport(
    inner: HttpTransport,
    maxRetries: Int = 5,
    initialBackoffMs: Long = 500,
    maxBackoffMs: Long = 30000,
    sleeper: Long => Unit = Thread.sleep,
) extends HttpTransport {
  override def get(url: String, params: Map[String, String], headers: Map[String, String]): HttpResponse = {
    var attempt = 0
    var backoff = initialBackoffMs
    while (true) {
      val resp =
        try inner.get(url, params, headers)
        catch {
          case e: java.io.IOException if attempt < maxRetries => HttpResponse(-1, e.getMessage)
        }
      if (resp.status >= 200 && resp.status < 400) return resp
      val retryable = resp.status == 429 || resp.status >= 500 || resp.status == -1
      if (!retryable || attempt >= maxRetries)
        return resp
      sleeper(backoff)
      backoff = math.min(backoff * 2, maxBackoffMs)
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Auth strategies observed across the fleet: bearer tokens, api-key
  * headers, basic auth, query-param keys.
  */
sealed trait Auth extends Serializable {
  def applyTo(params: Map[String, String], headers: Map[String, String]): (Map[String, String], Map[String, String])
}
object Auth {
  final case class Bearer(token: String) extends Auth {
    def applyTo(p: Map[String, String], h: Map[String, String]) =
      (p, h + ("Authorization" -> s"Bearer $token"))
  }
  final case class Header(name: String, value: String) extends Auth {
    def applyTo(p: Map[String, String], h: Map[String, String]) = (p, h + (name -> value))
  }
  final case class Basic(user: String, password: String) extends Auth {
    def applyTo(p: Map[String, String], h: Map[String, String]) = {
      val enc = java.util.Base64.getEncoder.encodeToString(s"$user:$password".getBytes("UTF-8"))
      (p, h + ("Authorization" -> s"Basic $enc"))
    }
  }
  final case class QueryParam(name: String, value: String) extends Auth {
    def applyTo(p: Map[String, String], h: Map[String, String]) = (p + (name -> value), h)
  }

  /** OAuth2 bearer auth with expiry-driven refresh — the reference's
    * OAuth credential classes (sources/zendesk/helpers/credentials.py:32-51,
    * and dlt-core rest_api's refresh flows) as an engine auth mode.
    *
    * Grants: `refreshToken` present → refresh_token grant; absent →
    * client_credentials. The access token is fetched lazily from
    * `tokenUrl` (form-encoded POST, standard token JSON), cached until
    * `expires_in` minus a skew, then re-fetched; a 401 mid-pagination
    * makes the engine call [[invalidate]] and retry once with a fresh
    * token (RestEngine.fetchPages).
    *
    * Serializable like every Auth (parent fan-out runs transports on
    * executors); the cache is transient, so each executor fetches its
    * own token on first use — correct, since tokens are bearer
    * credentials any holder may mint.
    */
  final class OAuth2(
      tokenUrl: String,
      clientId: String,
      clientSecret: String,
      refreshToken: Option[String] = None,
      scope: Option[String] = None,
      transport: HttpTransport = new UrlConnectionTransport(),
      expirySkewMs: Long = 60000L,
      now: () => Long = () => System.currentTimeMillis(),
      /** Where the access token sits in the token response — standard
        * responses use `access_token`; non-standard token exchanges
        * (personio's `data.token`) override.
        */
      tokenJsonPath: String = "access_token",
  ) extends Auth {
    // transient primitives: deserialize on an executor as null/0 =
    // "no token yet", never a stale object
    @transient private var token: String = null
    @transient private var expiresAtMs: Long = 0L

    private def formEncode(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")

    private def accessToken(): String = synchronized {
      if (token != null && now() < expiresAtMs - expirySkewMs) token
      else {
        val grant = refreshToken match {
          case Some(rt) => Seq("grant_type" -> "refresh_token", "refresh_token" -> rt)
          case None     => Seq("grant_type" -> "client_credentials")
        }
        val form = grant ++ Seq("client_id" -> clientId, "client_secret" -> clientSecret) ++
          scope.map("scope" -> _)
        val resp = transport.post(tokenUrl, formEncode(form),
          Map("Content-Type" -> "application/x-www-form-urlencoded"))
        if (resp.status < 200 || resp.status >= 300)
          throw new RuntimeException(
            s"OAuth2 token grant failed: POST $tokenUrl -> HTTP ${resp.status}: ${resp.body.take(500)}")
        val node = Json.parse(resp.body)
        val t = Json.selectString(node, tokenJsonPath)
          .filter(_.nonEmpty)
          .getOrElse(throw new RuntimeException(
            s"OAuth2 token response has no '$tokenJsonPath': ${resp.body.take(500)}"))
        val ttlS = Option(node.get("expires_in")).map(_.asLong()).getOrElse(3600L)
        token = t
        expiresAtMs = now() + ttlS * 1000L
        t
      }
    }

    /** Drop the cached token (the engine calls this on a 401 so the next
      * request re-fetches — a revoked/expired-early token heals in one
      * retry).
      */
    def invalidate(): Unit = synchronized { token = null; expiresAtMs = 0L }

    def applyTo(p: Map[String, String], h: Map[String, String]) =
      (p, h + ("Authorization" -> s"Bearer ${accessToken()}"))
  }
}
