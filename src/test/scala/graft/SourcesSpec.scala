package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** S2/K1/K3: CSV scan with explicit schema (the reference's dtype-reassert
  * blocks become schema-on-read) and sink round-trips. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("S2+K1: CSV sink/scan round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toFile.getAbsolutePath
    val combinedSchema = StructType(Seq( // FIXTURES.md B3 shape
      StructField("lon", DoubleType), StructField("lat", DoubleType),
      StructField("date", LongType), StructField("ndvi", DoubleType),
      StructField("sm", DoubleType), StructField("preci", DoubleType)))
    val df = Seq(
      (39.41, 3.271, 20260202L, 0.22103376686573029, 0.05667313560843468, 0.0),
      (39.445, 3.261, 20260202L, 0.21, 0.06, 1.25))
      .toDF("lon", "lat", "date", "ndvi", "sm", "preci")
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(dir) // K1
    val back = spark.read.schema(combinedSchema).option("header", "true").csv(dir) // S2
    assert(back.schema == combinedSchema) // no inference — declared dtypes
    assert(back.orderBy("lon").collect().toSeq == df.orderBy("lon").collect().toSeq)
  }

  test("K3: partitioned parquet append/overwrite as the HDF5-resize analog") {
    val dir = Files.createTempDirectory("graft_zser").toFile.getAbsolutePath
    def batch(zone: String, dates: Seq[String]) =
      dates.map(d => (zone, java.sql.Date.valueOf(d), 1.0)).toDF("zone_id", "date", "biomass")
    batch("ET01", Seq("2024-01-01", "2024-01-17")).write
      .partitionBy("zone_id").mode("append").parquet(dir)
    // append 16 forecast rows ≙ unionByName + append (SURVEY §1.1 K3 verdict)
    batch("ET01", Seq("2024-02-02")).write
      .partitionBy("zone_id").mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 3)
    // overwrite-by-partition keeps other zones intact
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch("ET02", Seq("2024-01-01")).write
      .partitionBy("zone_id").mode("overwrite").parquet(dir)
    val zones = spark.read.parquet(dir).select("zone_id").distinct()
      .as[String].collect().sorted
    assert(zones.toSeq == Seq("ET01", "ET02"))
  }

  test("date-partitioned layout prunes partitions at planning time (S6/mosaic replacement)") {
    val dir = Files.createTempDirectory("graft_prune").toFile.getAbsolutePath
    (1 to 3).flatMap(d => Seq((s"2024-01-0$d", d.toLong, d * 1.5)))
      .toDF("d", "k", "v")
      .write.partitionBy("d").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).where($"d" === "2024-01-02")
    assert(q.count() == 1)
    // the filename-date scan of the reference (P14/A11) becomes a partition
    // filter: the planner never lists the other dates' files
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("2024-01-02"),
           s"expected pruned scan, got:\n$plan")
  }

  test("S1 golden: pure-JVM xlsx scan reads the reference's grid_points workbook") {
    val sheet = graft.sources.Xlsx.readSheet("/root/reference/src/inputs/grid_points.xlsx")
    assert(sheet.headers == Seq("X", "Y"))
    assert(sheet.rows.length == 19129)
    // the reference quantizes these points with round(·, 3) and joins them
    // against sampled rasters (data_extraction_v2.py:353-355); its committed
    // combined.csv coordinates must therefore be a subset of the rounded
    // workbook points
    val pts = sheet.rows.map(r =>
      (BigDecimal(r(0)).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
       BigDecimal(r(1)).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val combined = spark.read.option("header", "true").csv("/root/reference/src/outputs/combined.csv")
      .select($"lon".cast("double"), $"lat".cast("double"))
      .distinct().as[(Double, Double)].collect().toSet
    assert(combined.size > 19000)
    val missing = combined.diff(pts)
    assert(missing.isEmpty, s"${missing.size} combined coords not in the workbook, e.g. ${missing.take(3)}")
    // DataFrame face: header-named double columns
    val df = graft.sources.Xlsx.toDF(spark, "/root/reference/src/inputs/grid_points.xlsx")
    assert(df.columns.toSeq == Seq("X", "Y") && df.count() == 19129)
  }

  test("K2: TIFF encoder round-trips arbitrary float32 rasters bit-exactly") {
    val rnd = new scala.util.Random(5)
    val (w, h) = (37, 23) // odd sizes exercise the even-offset padding
    val data = Array.fill(w * h)(rnd.nextFloat() * 2000f - 1000f)
    val path = java.nio.file.Files.createTempFile("graft_tiff", ".tif").toString
    try {
      graft.sources.GeoTiff.write(path, w, h, data, Some(-99999.0))
      val r = graft.sources.GeoTiff.read(path)
      assert(r.width == w && r.height == h && r.nodata.contains(-99999.0))
      var i = 0
      while (i < data.length) {
        assert(java.lang.Float.floatToIntBits(r.data(i)) ==
               java.lang.Float.floatToIntBits(data(i)), s"cell $i")
        i += 1
      }
      // and without a nodata tag
      graft.sources.GeoTiff.write(path, 2, 2, Array(1f, 2f, 3f, 4f), None)
      assert(graft.sources.GeoTiff.read(path).nodata.isEmpty)
      // short nodata strings (<= 4 bytes incl. NUL) must round-trip via the
      // TIFF inline value field — "0\0" is 2 bytes
      graft.sources.GeoTiff.write(path, 2, 2, Array(1f, 2f, 3f, 4f), Some(0.0))
      assert(graft.sources.GeoTiff.read(path).nodata.contains(0.0))
      graft.sources.GeoTiff.write(path, 2, 2, Array(1f, 2f, 3f, 4f), Some(-99.0))
      assert(graft.sources.GeoTiff.read(path).nodata.contains(-99.0))
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
  }

  test("S8/K2: writer rejects dims beyond the SHORT tag range") {
    val path = java.nio.file.Files.createTempFile("graft_tiff_dim", ".tif").toString
    try {
      val e = intercept[IllegalArgumentException](
        graft.sources.GeoTiff.write(path, 65536, 1, new Array[Float](65536), None))
      assert(e.getMessage.contains("65535"))
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
  }

  test("S8: reader rejects big-endian and non-TIFF bytes loudly") {
    val path = java.nio.file.Files.createTempFile("graft_tiff_bad", ".tif").toString
    try {
      graft.sources.GeoTiff.write(path, 2, 2, Array(1f, 2f, 3f, 4f), None)
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      bytes(0) = 'M'.toByte; bytes(1) = 'M'.toByte // big-endian marker
      java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
      val e1 = intercept[IllegalArgumentException](graft.sources.GeoTiff.read(path))
      assert(e1.getMessage.contains("little-endian"))
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        "not a tiff at all".getBytes("US-ASCII"))
      intercept[Exception](graft.sources.GeoTiff.read(path))
      ()
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
  }
}
