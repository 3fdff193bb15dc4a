package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** K4/K5's live half: the trends/forecasts REST transport that carries
  * `Sinks.restPayload`'s JSON rows — real `java.net.http` calls, the same
  * split as K6's [[GeoServerRest]] (payload bytes are the hash-checked
  * correctness surface; this class is the wire).
  *
  * The endpoint shape is the reference client's documented contract
  * (`BiomassAggregate.py:383-395` update_trends, `BiomassForecast.py:126-144`
  * update_forecasts): ONE POST per run carrying the whole run's rows as a
  * single JSON array, with `Authorization: Bearer <api key>` and
  * `Content-Type: application/json`; the API answers 201 on success, 400 on
  * validation error, 401 on a bad key. The reference merely prints non-201
  * outcomes; here they RAISE (declared divergence, same as GeoServerRest) —
  * K8's notify path depends on loud failures, and a stalled API fails the
  * request deadline instead of hanging the pipeline.
  *
  * DRIVER-side by design: one call per run, payload bounded by zones×dates
  * (the reference's own shape), never per input row.
  */
final class RestApi(url: String, apiKey: String,
                    client: HttpClient = RestApi.defaultClient,
                    requestTimeout: Duration = Duration.ofSeconds(120)) {

  /** POST the run's payload rows as one JSON array; returns the server's
    * response body on 201. Non-201 → IOException (message carries the API's
    * status and body, which is what K8's failure email renders); a stall →
    * HttpTimeoutException. */
  def postAll(payloadRows: Seq[String]): String = {
    val body = payloadRows.mkString("[", ",", "]")
    val r = client.send(
      HttpRequest.newBuilder(URI.create(url)).timeout(requestTimeout)
        .header("Authorization", s"Bearer $apiKey")
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    r.statusCode() match {
      case 201 => r.body()
      case 400 => throw new java.io.IOException(s"validation error: ${r.body()}")
      case 401 => throw new java.io.IOException("authentication failed: invalid or missing API key")
      case c   => throw new java.io.IOException(s"unexpected response ($c): ${r.body()}")
    }
  }
}

object RestApi {
  /** Connect deadline too — an unreachable API must not hang in connect
    * before the request deadline can apply (same as GeoServerRest). */
  private[pipeline] val defaultClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
}
