package graft

import graft.agg.Zonal
import graft.core.CleanOps
import graft.grid.{Geometry, Grid}
import graft.sources.{GeoTiff, Shapefile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden test against the reference's OWN committed artifacts: read its
  * rasters (biomass_2022*.tif) and zone polygons (woredas.shp) with our
  * pure-Scala scans, run the zonal cascade, and compare with the zone
  * time-series it committed (outputs/Databases/woredas.csv).
  *
  * The reference computes these with rasterstats' 3-pass cascade
  * (BiomassAggregate.py:221-271); boundary-pixel rounding can differ by a
  * pixel for sliver zones, so the assertion is: the vast majority of zones
  * match tightly, and aggregate agreement is near-exact.
  */
class GoldenZonalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val RefRoot = "/root/reference/src"
  private val Dates = Seq("20220101", "20220117", "20220218")

  test("zonal cascade over the reference's rasters matches woredas.csv") {
    // S8: raster scans → cell table with sentinel masking
    val cells = Dates.flatMap { d =>
      val r = GeoTiff.read(s"$RefRoot/data/layers/biomass_et/biomass_$d.tif")
      assert(r.width == 260 && r.height == 300 && r.nodata.contains(-99999.0))
      for (row <- 0 until r.height; col <- 0 until r.width)
        yield (d, row, col, r.value(row, col).toDouble)
    }.toDF("date", "row", "col", "raw")
      .select(col("date"), col("row"), col("col"),
              CleanOps.sentinelToNull(col("raw")).as("value"))

    // S7: shapefile scan → 151 zones
    val zones = Shapefile.readZones(s"$RefRoot/inputs/Shapefiles/woredas.shp", "ADM3_PCODE")
    assert(zones.length == 151)
    val polys = zones.map { case (id, rings) => (id, Geometry.Polygon(rings)) }

    // the cascade over the static membership map
    val member = Zonal.membershipShapes(spark, polys, Grid.Reference)
    val cents = Zonal.centroidShapes(spark, polys, Grid.Reference)
    val ours = Zonal.zonalStats(cells, member, cents)
      .select($"zone_id", $"date", $"mean_value")
      .as[(String, String, Option[Double])].collect()
      .map { case (z, d, m) => (z, d) -> m.getOrElse(Double.NaN) }.toMap

    // golden values (NaN was flushed to 0.0 at BiomassAggregate.py:325)
    val golden = scala.io.Source.fromFile(s"$RefRoot/outputs/Databases/woredas.csv")
      .getLines().drop(1).map(_.split(","))
      .collect { case Array(z, d, b) if Dates.contains(d) => (z, d) -> b.toDouble }
      .toMap
    assert(golden.size == 151 * Dates.length)

    val diffs = golden.toSeq.map { case (k, g) =>
      val o = ours.getOrElse(k, Double.NaN)
      val ov = if (o.isNaN) 0.0 else o
      (k, g, ov, math.abs(ov - g))
    }
    val tight = diffs.count(_._4 < 1e-6)
    val close = diffs.count(_._4 < 0.02)
    info(s"${tight}/${diffs.size} zones match < 1e-6; $close within 0.02")
    diffs.sortBy(-_._4).take(5).foreach { case (k, g, o, d) =>
      info(f"worst: $k golden=$g%.6f ours=$o%.6f |Δ|=$d%.6f")
    }
    // strict-leg zones should agree to float rounding; only boundary-pixel
    // slivers may drift
    assert(tight >= (diffs.size * 0.9).toInt,
      s"only $tight/${diffs.size} zonal means matched the reference's committed outputs")
    assert(close == diffs.size, "some zone means diverge materially")
  }
}
