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
}
