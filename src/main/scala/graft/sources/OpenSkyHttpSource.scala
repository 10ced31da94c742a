package graft.sources

import graft.streaming.IngestSource
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64

/** The real HTTP polling source (SURVEY §2A A1/A16): GET the states/all
  * endpoint with basic auth, fail fast on bad credentials.
  *
  * The reference's production path never validates (ValidateConfig is
  * defined but uncalled — SURVEY §3.1 note) and silently ships a broken
  * fetch (§1.3-2); here validate() runs before the loop starts and fetch
  * errors surface to PollingIngest's warn-and-backoff policy
  * (opensky_plugin.go:60-115 intent).
  *
  * Tested against a local JDK HttpServer stub (the fixture-server
  * strategy of opensky_plugin_test.go) — the container has no egress.
  */
final class OpenSkyHttpSource(
    baseUrl: String, user: String, password: String,
    timeoutSec: Long = 30) extends IngestSource {

  private val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSec)).build()

  private def auth: String =
    "Basic " + Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes(StandardCharsets.UTF_8))

  private def get(url: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(url))
        .header("Authorization", auth)
        .timeout(java.time.Duration.ofSeconds(timeoutSec))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  override def name: String = "opensky"
  override def tablePrefix: String = "flights"

  /** Fail-fast credential check (A16): non-200 aborts startup. */
  override def validate(): Unit = {
    val code = get(baseUrl).statusCode()
    require(code == 200, s"credential validation failed: HTTP $code from $baseUrl")
  }

  /** One snapshot (A1). Non-200 throws → PollingIngest backs off. */
  override def fetch(): String = {
    val resp = get(baseUrl)
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"fetch failed: HTTP ${resp.statusCode()}")
    resp.body()
  }
}
