package graft

import graft.sources.GeoTiff
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for stages 1–3 against the reference's committed run
  * artifacts (the outputs CSVs and raster.tif): the multi-key join, the
  * biomass formula, and the raster burn reproduce the committed bytes.
  */
class GoldenPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Out = "/root/reference/src/outputs"

  test("stage 1 golden: ndvi ⋈ sm ⋈ preci == committed combined.csv") {
    def csv(name: String, schema: StructType) =
      spark.read.schema(schema).option("header", "true").csv(s"$Out/$name")
    val d = DoubleType
    val ndvi = csv("ndvi.csv", StructType(Seq(
      StructField("ndvi", d), StructField("X", d), StructField("Y", d),
      StructField("date", LongType))))
    val sm = csv("sm.csv", StructType(Seq(
      StructField("X", d), StructField("Y", d), StructField("date", LongType),
      StructField("sm", d))))
    val preci = csv("preci.csv", StructType(Seq(
      StructField("date", LongType), StructField("X", d), StructField("Y", d),
      StructField("preci", d))))
    // J1: the reference's two inner merges on (X, Y, date)
    val ours = ndvi.join(sm, Seq("X", "Y", "date"), "inner")
      .join(preci, Seq("X", "Y", "date"), "inner")
      .select(col("X").as("lon"), col("Y").as("lat"), col("date"),
              col("ndvi"), col("sm"), col("preci"))
    val golden = csv("combined.csv", StructType(Seq(
      StructField("lon", d), StructField("lat", d), StructField("date", LongType),
      StructField("ndvi", d), StructField("sm", d), StructField("preci", d))))
    assert(golden.count() == 19125)
    assert(ours.count() == 19125)
    val key = Seq("lon", "lat", "date", "ndvi", "sm", "preci").map(col)
    assert(ours.orderBy(key: _*).collect().toSeq ==
           golden.orderBy(key: _*).collect().toSeq) // bit-exact
  }

  test("stage 2 golden: biomass formula P6 matches committed results.csv") {
    val res = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$Out/results.csv")
      .select(col("pred").cast("double"), col("biom").cast("double"))
      .collect()
    assert(res.length == 19125)
    res.foreach { r =>
      val expected = graft.ml.GWR.biomass(r.getDouble(0))
      assert(math.abs(expected - r.getDouble(1)) < 1e-12,
        s"pred=${r.getDouble(0)} biom=${r.getDouble(1)} ours=$expected")
    }
  }

  test("stage 3 golden: grid constants + burned-raster invariants") {
    // the committed template raster carries the authoritative georeference —
    // it must equal our Affine constants (origin (36,15), 0.05°, 300×260)
    val tpl = GeoTiff.read(s"$Out/raster.tif")
    assert(tpl.width == 260 && tpl.height == 300)
    // (pixel scale / tiepoint live in the GeoTIFF tags; GeoTiff.read already
    // asserts the float32 profile — georef checked in the raw tags below)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$Out/raster.tif"))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ifd = bb.getInt(4)
    val n = bb.getShort(ifd) & 0xffff
    var scaleOff = -1
    var tieOff = -1
    (0 until n).foreach { i =>
      val e = ifd + 2 + i * 12
      bb.getShort(e) & 0xffff match {
        case 33550 => scaleOff = bb.getInt(e + 8)
        case 33922 => tieOff = bb.getInt(e + 8)
        case _ =>
      }
    }
    assert(bb.getDouble(scaleOff) == 0.05 && bb.getDouble(scaleOff + 8) == 0.05)
    assert(bb.getDouble(tieOff + 24) == 36.0 && bb.getDouble(tieOff + 32) == 15.0)

    // P7/P11 invariants on the real committed rasters: every valid pixel is
    // a positive 2-decimal value (abs(round(·,2)), non-positive → nodata)
    val r = GeoTiff.read("/root/reference/src/data/layers/biomass_et/biomass_20220101.tif")
    val valid = r.data.filter(_ != -99999.0f)
    assert(valid.nonEmpty)
    valid.foreach { v =>
      assert(v > 0, s"non-positive burned value $v should have been nodata")
      val cents = v * 100.0
      assert(math.abs(cents - math.round(cents)) < 0.5e-3,
        s"burned value $v is not 2-decimal (round(·,2))")
    }

    // and a burn of the committed results.csv stays on-grid and in-bounds
    val res = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$Out/results.csv")
      .select(col("_c0").cast("long").as("idx"), col("lon").cast("double"),
              col("lat").cast("double"), col("biom").cast("double"))
    val pts = res.select(
      lit(java.sql.Date.valueOf("2026-02-02")).as("date"),
      col("lon"), col("lat"), abs(round(col("biom"), 2)).as("value"),
      (-col("idx")).as("tie")) // rasterio burns last-wins → min of −idx
    val cells = graft.grid.Grid.burn(pts, graft.grid.Grid.Reference)
    val stats = cells.agg(count(lit(1)), min("row"), max("row"), min("col"), max("col")).head()
    info(s"burned ${stats.getLong(0)} cells from 19125 points")
    assert(stats.getLong(0) > 15000) // points collide on the 0.05° grid
    assert(stats.getInt(1) >= 0 && stats.getInt(2) < 300 &&
           stats.getInt(3) >= 0 && stats.getInt(4) < 260)
  }
}
