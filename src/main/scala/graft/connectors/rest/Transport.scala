package graft.connectors.rest

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

/** HTTP response: status + body. */
final case class HttpResponse(status: Int, body: String)

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

/** Stock JDK transport (no extra deps). */
final class UrlConnectionTransport(connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000)
    extends HttpTransport {

  override def post(url: String, body: String, headers: Map[String, String]): HttpResponse = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    try {
      conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
      val status = conn.getResponseCode
      val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val respBody = if (stream == null) "" else new String(stream.readAllBytes(), StandardCharsets.UTF_8)
      HttpResponse(status, respBody)
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
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    try {
      val status = conn.getResponseCode
      val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val body =
        if (stream == null) ""
        else new String(stream.readAllBytes(), StandardCharsets.UTF_8)
      HttpResponse(status, body)
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
}
