package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** K4/K5: the trends/forecasts REST transport driven over a real localhost
  * HTTP socket (round-11 verdict #4 — the K6 PublishSpec treatment). The
  * payload BYTES are already hash-checked by `k4_rest_payload` /
  * `k5_forecast_payload`; this spec pins the wire: one POST per run, Bearer
  * auth, JSON array body, and the 400/401/stall failure surfaces K8 needs
  * to be loud. Pure driver-side, no Spark session. */
class LiveRestSpec extends AnyFunSuite {

  private val rows = Seq(
    """{"extId":"z1","mean":12.345678,"date":"2024-01-01"}""",
    """{"extId":"z1","mean":null,"date":"2024-01-17"}""",
    """{"extId":"z2","mean":0.25,"date":"2024-01-01"}""")

  final case class Req(method: String, path: String, auth: String,
                       contentType: String, body: String)

  /** One-endpoint API double: records the request, answers `status`. */
  private def withServer(status: Int, respBody: String = "")(
      f: (String, () => Seq[Req]) => Unit): Unit = {
    val reqs = collection.mutable.Buffer[Req]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      reqs += Req(ex.getRequestMethod, ex.getRequestURI.getPath,
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""),
        Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse(""), body)
      val bytes = respBody.getBytes("UTF-8")
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.getResponseBody.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => reqs.toSeq)
    finally server.stop(0)
  }

  test("201: one POST carrying the whole run as a JSON array, Bearer auth on the wire") {
    withServer(201, """{"saved":3}""") { (base, reqs) =>
      val api = new graft.pipeline.RestApi(s"$base/api/biomass/trends", "sekrit-key")
      assert(api.postAll(rows) == """{"saved":3}""")
      val Seq(r) = reqs()
      assert(r.method == "POST" && r.path == "/api/biomass/trends")
      assert(r.auth == "Bearer sekrit-key")
      assert(r.contentType == "application/json")
      // body bytes = the hash-checked payload rows, one array, no reformat
      assert(r.body == rows.mkString("[", ",", "]"))
      // NaN means ride as JSON null (BiomassAggregate.py:374 contract)
      assert(r.body.contains(""""mean":null"""))
    }
  }

  test("400 validation error raises with the API's body, not a silent print") {
    withServer(400, """{"error":"bad date"}""") { (base, _) =>
      val api = new graft.pipeline.RestApi(s"$base/t", "k")
      val e = intercept[java.io.IOException](api.postAll(rows))
      assert(e.getMessage.contains("validation error") && e.getMessage.contains("bad date"))
    }
  }

  test("401 bad key raises the authentication message") {
    withServer(401) { (base, _) =>
      val api = new graft.pipeline.RestApi(s"$base/t", "wrong")
      val e = intercept[java.io.IOException](api.postAll(rows))
      assert(e.getMessage.contains("authentication failed"))
    }
  }

  test("other non-201 raises with the status code") {
    withServer(503, "maintenance") { (base, _) =>
      val api = new graft.pipeline.RestApi(s"$base/t", "k")
      val e = intercept[java.io.IOException](api.postAll(rows))
      assert(e.getMessage.contains("503") && e.getMessage.contains("maintenance"))
    }
  }

  test("a stalled API fails the request deadline, it never hangs") {
    val srv = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val drain = new Thread(() => try { while (true) srv.accept() } catch { case _: Throwable => () })
    drain.setDaemon(true); drain.start()
    try {
      val api = new graft.pipeline.RestApi(
        s"http://127.0.0.1:${srv.getLocalPort}/t", "k",
        requestTimeout = java.time.Duration.ofMillis(300))
      val t0 = System.nanoTime()
      intercept[java.net.http.HttpTimeoutException](api.postAll(rows))
      assert((System.nanoTime() - t0) / 1e9 < 10.0)
    } finally srv.close()
  }
}
