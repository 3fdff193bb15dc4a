package graft

import java.nio.file.Files

import graft.pipeline.{Notify, Progress}
import org.scalatest.funsuite.AnyFunSuite

/** K8 (templated notification payload) + K9 (progress checkpoints). */
class NotifyProgressSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------------- K8

  test("K8: fragments are appended inside the three template anchors") {
    val out = Notify.render(Notify.defaultTemplate,
      "HEAD", "INFO", "<li>item</li>")
    // appended just before each anchor's close tag, BeautifulSoup-style
    assert(out.contains("""HEAD</h1>"""))
    assert(out.contains("""INFO</p>"""))
    assert(out.contains("<li>item</li></tr>"))
    // anchors untouched otherwise
    assert(out.contains("""<h1 id="header" style="font-size: 24px">HEAD</h1>"""))
  }

  test("K8: render also works against the reference's real template") {
    val path = java.nio.file.Paths.get("/root/reference/src/codes/notification.html")
    assume(Files.exists(path))
    val tpl = new String(Files.readAllBytes(path), "UTF-8")
    val out = Notify.render(tpl, "H", "I", "<li>x</li>")
    assert(out.contains("H</h1>") && out.contains("I</p>") && out.contains("<li>x</li></tr>"))
  }

  test("K8: failure email carries the reference's fixed copy and the red error item") {
    val mime = Notify.failureEmail("Biomass not updated", "boom",
      Notify.defaultTemplate, "robot@example.org", Seq("a@example.org", "b@example.org"))
    assert(mime.contains("Subject: Biomass not updated\r\n"))
    assert(mime.contains("To: a@example.org, b@example.org\r\n"))
    assert(mime.contains("Notice: Biomass Data Failed to Update:"))
    assert(mime.contains("<li><span style='color: red;'>boom</span></li>"))
    assert(mime.contains("Content-Type: text/html"))
    // deterministic: same inputs, same bytes (boundary is a content digest)
    val again = Notify.failureEmail("Biomass not updated", "boom",
      Notify.defaultTemplate, "robot@example.org", Seq("a@example.org", "b@example.org"))
    assert(mime == again)
  }

  test("K8: success email lists the uploaded rasters") {
    val mime = Notify.successEmail("Biomass updated", Seq("biomass_20240101.tif",
      "biomass_20240117.tif"), Notify.defaultTemplate, "r@x.org", Seq("a@x.org"))
    assert(mime.contains("Notice: Biomass Data Updated Successfully:"))
    assert(mime.contains("<li>biomass_20240101.tif</li><li>biomass_20240117.tif</li>"))
  }

  test("K8: unknown anchor is a loud error") {
    intercept[IllegalArgumentException] {
      Notify.injectAt("<p id=\"other\"></p>", "header", "x")
    }
  }

  // ------------------------------------------------------------------- K6

  test("K6: mosaic zip payload — raster + the reference's two descriptors, byte-reproducible") {
    val tif = Array.tabulate[Byte](64)(_.toByte)
    val payload = graft.pipeline.Sinks.mosaicZip("biomass_20240116.tif", tif)
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(payload))
    val entries = Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
      e.getName -> zin.readAllBytes()
    }.toMap
    assert(entries.keySet == Set("timeregex.properties", "indexer.properties",
      "biomass_20240116.tif"))
    assert(entries("biomass_20240116.tif").toSeq == tif.toSeq)
    // descriptors match the reference's committed files verbatim
    val refDir = java.nio.file.Paths.get(
      "/root/reference/src/data/layers/biomass_properties")
    if (Files.exists(refDir)) {
      Seq("timeregex.properties", "indexer.properties").foreach { f =>
        val ref = new String(Files.readAllBytes(refDir.resolve(f)), "UTF-8")
        assert(new String(entries(f), "UTF-8").replaceAll("\\s+$", "")
          == ref.replaceAll("\\s+$", ""), s"descriptor drift: $f")
      }
    }
    // reproducible bytes (fixed entry timestamps)
    assert(payload.toSeq == graft.pipeline.Sinks.mosaicZip("biomass_20240116.tif", tif).toSeq)
    // time-dimension body carries the contract fields
    val xml = graft.pipeline.Sinks.mosaicTimeDimensionXml("biomass")
    assert(xml.contains("<enabled>true</enabled>") && xml.contains("ISO8601")
      && xml.contains("<presentation>LIST</presentation>"))
  }

  // ------------------------------------------------------------------- K9

  test("K9: every-Nth-unit markers, file write, resume skip, reset") {
    val units = (1 to 47).map(i => f"2024-01-$i%02d").toDF("d") // fake ordered units
    val ms = Progress.markers(units, "d", 20)
    val rows = ms.orderBy("seq").collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (20, "2024-01-20", "2024-01-20 is done"),
      (40, "2024-01-40", "2024-01-40 is done")))

    val dir = Files.createTempDirectory("graft_k9").toFile.getAbsolutePath
    Progress.writeMarkers(ms, dir)
    assert(new java.io.File(dir).list().sorted.toSeq ==
      Seq("2024-01-20 is done.npy", "2024-01-40 is done.npy"))
    assert(Progress.completedThrough(dir).contains("2024-01-40"))

    // a restarted run skips everything at-or-before the last marker
    val rest = Progress.resume(units, "d", dir).collect().map(_.getString(0)).sorted
    assert(rest.head == "2024-01-41" && rest.length == 7)

    // end-of-run reset empties the directory but keeps it present
    Progress.reset(dir)
    assert(new java.io.File(dir).isDirectory && new java.io.File(dir).list().isEmpty)
    // no markers → resume runs the full list
    assert(Progress.resume(units, "d", dir).count() == 47)
  }

  test("K9: marker interval must be positive") {
    intercept[IllegalArgumentException] {
      Progress.markers(Seq("a").toDF("d"), "d", 0)
    }
  }
}
