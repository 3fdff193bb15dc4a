package graft

import java.util.zip.ZipInputStream

import graft.pipeline.Sinks
import org.scalatest.funsuite.AnyFunSuite

/** K6: the GeoServer publish contract (`tools.py:105-139`,
  * `import_biomass.py:66-76`) over an injected transport — the same
  * pattern FetchSpec uses for S5. Pure driver-side, no Spark session. */
class PublishSpec extends AnyFunSuite {

  private def unzip(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
      (e.getName, zin.readAllBytes())
    }.toSeq
  }

  private class FakeGeoServer {
    val stores = collection.mutable.Set[String]()
    val created = collection.mutable.Buffer[(String, Array[Byte], String)]()
    val harvested = collection.mutable.Buffer[(String, Array[Byte])]()
    def exists(s: String): Boolean = stores.contains(s)
    def create(s: String, zip: Array[Byte], xml: String): Unit = {
      stores += s; created += ((s, zip, xml))
    }
    def harvest(s: String, zip: Array[Byte]): Unit = harvested += ((s, zip))
  }

  private val rasters = Seq(
    "biomass_20240101.tif" -> Array[Byte](1, 2, 3),
    "biomass_20240117.tif" -> Array[Byte](4, 5),
    "biomass_20240202.tif" -> Array[Byte](6))

  test("fresh store: first raster creates the mosaic, the rest harvest granules") {
    val gs = new FakeGeoServer
    val log = Sinks.publishMosaics("biomass", rasters, gs.exists, gs.create, gs.harvest)
    assert(log.map(_.action) ==
      Seq(Sinks.CreateMosaic, Sinks.HarvestGranule, Sinks.HarvestGranule))
    assert(gs.created.size == 1 && gs.harvested.size == 2)
  }

  test("existing store: every raster is harvested, nothing re-created") {
    val gs = new FakeGeoServer
    gs.stores += "biomass"
    val log = Sinks.publishMosaics("biomass", rasters, gs.exists, gs.create, gs.harvest)
    assert(log.forall(_.action == Sinks.HarvestGranule))
    assert(gs.created.isEmpty && gs.harvested.size == 3)
  }

  test("create receives the time-dimension coverage XML for the store") {
    val gs = new FakeGeoServer
    Sinks.publishMosaics("biomass", rasters.take(1), gs.exists, gs.create, gs.harvest)
    val xml = gs.created.head._3
    assert(xml == Sinks.mosaicTimeDimensionXml("biomass"))
    assert(xml.contains("<presentation>LIST</presentation>"))
    assert(xml.contains("<units>ISO8601</units>"))
    assert(xml.contains("<enabled>true</enabled>"))
  }

  test("the shipped zip holds exactly the two mosaic descriptors plus the raster, byte-reproducible") {
    val gs = new FakeGeoServer
    Sinks.publishMosaics("biomass", rasters.take(1), gs.exists, gs.create, gs.harvest)
    val entries = unzip(gs.created.head._2)
    assert(entries.map(_._1) ==
      Seq("timeregex.properties", "indexer.properties", "biomass_20240101.tif"))
    assert(entries.last._2.toSeq == Seq[Byte](1, 2, 3))
    // the time index regex is the filename-date contract K2/K7 write to
    assert(new String(entries.head._2, "UTF-8").contains("format=yyyyMMdd"))
    // reproducibility: same inputs, same bytes (fixed entry timestamps)
    val again = Sinks.mosaicZip("biomass_20240101.tif", Array[Byte](1, 2, 3))
    assert(gs.created.head._2.toSeq == again.toSeq)
  }

  test("live socket: GeoServerRest drives create-then-harvest-then-enable-time over real HTTP") {
    // An embedded localhost server standing in for GeoServer's REST API —
    // the injected-transport policy kept (no real GeoServer), but the actual
    // java.net.http client path, URLs, methods, auth header and payload
    // bytes are exercised end-to-end on a live socket (round-9 verdict #5).
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    final case class Req(method: String, path: String, contentType: String,
                         auth: String, body: Array[Byte])
    val reqs = collection.mutable.Buffer[Req]()
    val stores = collection.mutable.Set[String]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = ex.getRequestBody.readAllBytes()
      val path = ex.getRequestURI.getPath
      reqs += Req(ex.getRequestMethod, path,
        Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse(""),
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""), body)
      val storeRx = "^/geoserver/rest/workspaces/waterpoints/coveragestores/([^/.]+)\\.xml$".r
      val fileRx = "^/geoserver/rest/workspaces/waterpoints/coveragestores/([^/.]+)/file\\.imagemosaic$".r
      val covRx = "^/geoserver/rest/workspaces/waterpoints/coveragestores/([^/.]+)/coverages/.*$".r
      val status = (ex.getRequestMethod, path) match {
        case ("GET", storeRx(s))  => if (stores.contains(s)) 200 else 404
        case ("PUT", fileRx(s))   => stores += s; 201 // create_imagemosaic
        case ("POST", fileRx(_))  => 202               // harvest_uploadgranule
        case ("PUT", covRx(_))    => 200               // coverage save (time dim)
        case _                    => 400
      }
      ex.sendResponseHeaders(status, 0); ex.getResponseBody.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/geoserver"
      val gs = new graft.pipeline.GeoServerRest(base, "waterpoints", "admin", "geoserver")
      val log = Sinks.publishMosaics("biomass", rasters,
        gs.storeExists, gs.create, gs.harvest)
      // decision tree over the live probe: first raster creates, rest harvest
      assert(log.map(_.action) ==
        Seq(Sinks.CreateMosaic, Sinks.HarvestGranule, Sinks.HarvestGranule))
      // wire-level sequence: probe(404) -> PUT zip -> PUT coverage xml ->
      // probe(200) -> POST zip -> probe(200) -> POST zip
      val prefix = "/geoserver/rest/workspaces/waterpoints/coveragestores/biomass"
      assert(reqs.map(r => (r.method, r.path)).toSeq == Seq(
        ("GET", s"$prefix.xml"),
        ("PUT", s"$prefix/file.imagemosaic"),
        ("PUT", s"$prefix/coverages/biomass.xml"),
        ("GET", s"$prefix.xml"),
        ("POST", s"$prefix/file.imagemosaic"),
        ("GET", s"$prefix.xml"),
        ("POST", s"$prefix/file.imagemosaic")))
      // payload bytes on the wire == the byte-reproducible mosaic zips
      val wireZips = reqs.filter(_.path.endsWith("file.imagemosaic")).map(_.body)
      assert(wireZips.map(_.toSeq) ==
        rasters.map { case (n, b) => Sinks.mosaicZip(n, b).toSeq })
      assert(wireZips.map(z => unzip(z).map(_._1).last) == rasters.map(_._1))
      // the coverage body is the time-dimension XML; auth rides every call
      val cov = reqs.find(_.path.endsWith("/coverages/biomass.xml")).get
      assert(new String(cov.body, "UTF-8") == Sinks.mosaicTimeDimensionXml("biomass"))
      assert(cov.contentType == "application/xml")
      assert(reqs.forall(_.auth.startsWith("Basic ")))
      assert(reqs.filter(_.path.endsWith("file.imagemosaic"))
        .forall(_.contentType == "application/zip"))
    } finally server.stop(0)
  }

  test("a stalled GeoServer fails loudly: request deadline fires, it never hangs") {
    // A server that accepts the TCP connection but never answers — without
    // the per-request .timeout() the publish loop would block here forever,
    // which breaks the "failures surface as exceptions for K8" contract.
    val srv = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val drain = new Thread(() => try { while (true) srv.accept() } catch { case _: Throwable => () })
    drain.setDaemon(true); drain.start()
    try {
      val gs = new graft.pipeline.GeoServerRest(
        s"http://127.0.0.1:${srv.getLocalPort}/geoserver", "waterpoints",
        "admin", "geoserver",
        requestTimeout = java.time.Duration.ofMillis(300))
      val t0 = System.nanoTime()
      intercept[java.net.http.HttpTimeoutException](gs.storeExists("biomass"))
      assert((System.nanoTime() - t0) / 1e9 < 10.0) // failed fast, not hung
    } finally srv.close()
  }
}
