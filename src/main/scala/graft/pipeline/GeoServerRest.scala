package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** K6's live half: the GeoServer REST transport trio that
  * `Sinks.publishMosaics` injects — real `java.net.http` calls carrying the
  * byte-reproducible mosaic.zip and time-dimension coverage XML that
  * PublishSpec pins.
  *
  * The endpoint shapes are the reference client's documented REST contract
  * (`tools.py:36-139` drives gsconfig's `Catalog` against `{base}/rest`;
  * `import_biomass.py:23-26` supplies url/user/password):
  *
  *   - store probe (`get_store`, tools.py:56-68): GET
  *     `rest/workspaces/{ws}/coveragestores/{store}.xml` — 200 present,
  *     404 absent (the reference's try/except-None);
  *   - mosaic create (`create_imagemosaic`, tools.py:105-110): PUT the zip to
  *     `rest/workspaces/{ws}/coveragestores/{store}/file.imagemosaic`
  *     as `application/zip`;
  *   - time-dimension enable (`coverage.save`, tools.py:111-132): PUT the
  *     coverage XML to
  *     `rest/workspaces/{ws}/coveragestores/{store}/coverages/{store}.xml`
  *     as `application/xml`;
  *   - granule harvest (`harvest_uploadgranule`, tools.py:136-139): POST the
  *     granule zip to the same `file.imagemosaic` resource.
  *
  * Credentials ride a Basic authorization header like the reference's
  * authenticated catalog session. This is DRIVER-side by design (one call
  * per published raster-date, never per row); failures surface as
  * exceptions for K8's notify path. PublishSpec exercises this class
  * end-to-end against an embedded localhost HTTP server — the request
  * sequence and payload bytes are asserted on a live socket, only the real
  * GeoServer stays external (same declared policy as K4/K5/K8).
  */
final class GeoServerRest(baseUrl: String, workspace: String,
                          user: String, password: String,
                          client: HttpClient = GeoServerRest.defaultClient,
                          requestTimeout: Duration = Duration.ofSeconds(120)) {

  private val auth = "Basic " + Base64.getEncoder.encodeToString(
    s"$user:$password".getBytes(StandardCharsets.UTF_8))

  private def storeUri(store: String, suffix: String = ".xml"): URI =
    URI.create(s"${baseUrl.stripSuffix("/")}/rest/workspaces/$workspace/coveragestores/$store$suffix")

  // A hung GeoServer must FAIL (feeding K8's notify path), not block the
  // publish loop forever: every request carries a deadline, so a stall
  // surfaces as HttpTimeoutException exactly like a non-2xx surfaces as
  // IOException. 120s default covers the mosaic-zip upload leg.
  private def reqBuilder(uri: URI): HttpRequest.Builder =
    HttpRequest.newBuilder(uri).timeout(requestTimeout)

  private def send(req: HttpRequest): HttpResponse[String] =
    client.send(req, HttpResponse.BodyHandlers.ofString())

  private def expect2xx(r: HttpResponse[String], what: String): Unit =
    if (r.statusCode() / 100 != 2)
      throw new java.io.IOException(s"$what failed: HTTP ${r.statusCode()} ${r.body()}")

  /** `storeExists` leg for `Sinks.publishMosaics`. */
  def storeExists(store: String): Boolean = {
    val r = send(reqBuilder(storeUri(store))
      .header("Authorization", auth).GET().build())
    r.statusCode() match {
      case 200 => true
      case 404 => false
      case c   => throw new java.io.IOException(s"store probe failed: HTTP $c")
    }
  }

  /** `create` leg: upload the mosaic zip, then enable the time dimension. */
  def create(store: String, zip: Array[Byte], coverageXml: String): Unit = {
    expect2xx(send(reqBuilder(storeUri(store, "/file.imagemosaic"))
      .header("Authorization", auth).header("Content-Type", "application/zip")
      .PUT(HttpRequest.BodyPublishers.ofByteArray(zip)).build()),
      s"create_imagemosaic($store)")
    expect2xx(send(reqBuilder(storeUri(store, s"/coverages/$store.xml"))
      .header("Authorization", auth).header("Content-Type", "application/xml")
      .PUT(HttpRequest.BodyPublishers.ofString(coverageXml)).build()),
      s"enable_time_dimension($store)")
  }

  /** `harvest` leg: POST a granule zip into the existing mosaic. */
  def harvest(store: String, zip: Array[Byte]): Unit =
    expect2xx(send(reqBuilder(storeUri(store, "/file.imagemosaic"))
      .header("Authorization", auth).header("Content-Type", "application/zip")
      .POST(HttpRequest.BodyPublishers.ofByteArray(zip)).build()),
      s"harvest_uploadgranule($store)")
}

object GeoServerRest {
  /** Default transport bounds the TCP connect too — an unreachable
    * GeoServer (firewalled, half-open) otherwise hangs in connect before
    * any request deadline can apply. */
  private[pipeline] val defaultClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
}
