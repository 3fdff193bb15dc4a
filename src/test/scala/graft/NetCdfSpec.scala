package graft

import java.nio.file.Files

import graft.sources.NetCdf
import org.scalatest.funsuite.AnyFunSuite

/** S4: classic NetCDF-3 codec — TAMSAT-shaped round trips through our own
  * writer/reader, record-var interleaving, CF decode, loud rejections. */
class NetCdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tamsatFile(dir: String, name: String, day0: String,
                         nRecs: Int, fill: Double = -999.0): String = {
    val (h, w) = (4, 5)
    // rfe[t][la][lo] = t*1000 + la*10 + lo, one fill hole per record
    val data = Array.tabulate(nRecs * h * w) { i =>
      if (i % (h * w) == 7) fill else i / (h * w) * 1000.0 + i % (h * w)
    }
    val path = s"$dir/$name"
    NetCdf.write(path,
      dims = Seq("time" -> -1, "lat" -> h, "lon" -> w),
      vars = Seq(
        NetCdf.VarSpec("time", Seq("time"), 6,
          Seq("units" -> Left(s"days since $day0")), Array.tabulate(nRecs)(_.toDouble)),
        NetCdf.VarSpec("lat", Seq("lat"), 5, Nil, Array(15.0, 14.0, 13.0, 12.0)),
        NetCdf.VarSpec("lon", Seq("lon"), 5, Nil, Array(36.0, 37.0, 38.0, 39.0, 40.0)),
        NetCdf.VarSpec("rfe", Seq("time", "lat", "lon"), 5,
          Seq("_FillValue" -> Right(Array(fill)),
              "scale_factor" -> Right(Array(0.5)),
              "add_offset" -> Right(Array(1.0))), data)))
    path
  }

  test("S4: TAMSAT-shaped write/read round trip (two interleaved record vars)") {
    val dir = Files.createTempDirectory("graft_nc").toFile.getAbsolutePath
    val path = tamsatFile(dir, "rfe2024_01_01.nc", "2024-01-01", nRecs = 3)
    val nc = NetCdf.read(path)
    assert(nc.numRecs == 3)
    assert(nc.dims.map(d => (d.name, d.length, d.unlimited)) ==
      Seq(("time", 0, true), ("lat", 4, false), ("lon", 5, false)))
    val (rfe, shape) = NetCdf.readVar(nc, "rfe")
    assert(shape == Seq(3, 4, 5))
    assert(rfe(0) == 0.0 && rfe(21) == 1001.0 && rfe(2 * 20 + 19) == 2019.0)
    assert(rfe(7) == -999.0) // the fill hole, raw
    val (lats, _) = NetCdf.readVar(nc, "lat")
    assert(lats.toSeq == Seq(15.0, 14.0, 13.0, 12.0))
    val (times, _) = NetCdf.readVar(nc, "time")
    assert(times.toSeq == Seq(0.0, 1.0, 2.0))
  }

  test("S4: CF decode — scale/offset applied, fill to null, dates from units") {
    val dir = Files.createTempDirectory("graft_nc").toFile.getAbsolutePath
    val path = tamsatFile(dir, "rfe2024_02_10.nc", "2024-02-10", nRecs = 2)
    val cells = NetCdf.cells(Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(cells.length == 2 * 4 * 5)
    val byKey = cells.map(c => (c._1.toString, c._2, c._3) -> c._4).toMap
    // rfe[0][0][0] = 0 -> 0*0.5+1.0 = 1.0 at (2024-02-10, 15.0, 36.0)
    assert(byKey(("2024-02-10", 15.0, 36.0)).contains(1.0))
    // rfe[1][0][1] = 1001 -> 501.5 on day +1
    assert(byKey(("2024-02-11", 15.0, 37.0)).contains(501.5))
    // the fill hole (i=7 per record: la=1, lo=2) decodes to None
    assert(byKey(("2024-02-10", 14.0, 38.0)).isEmpty)
  }

  test("S4: single record var packs without inter-record padding") {
    val dir = Files.createTempDirectory("graft_nc").toFile.getAbsolutePath
    val path = s"$dir/single.nc"
    NetCdf.write(path,
      dims = Seq("time" -> -1, "x" -> 3),
      vars = Seq(NetCdf.VarSpec("v", Seq("time", "x"), 5, Nil,
        Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))))
    val nc = NetCdf.read(path)
    assert(nc.numRecs == 2)
    val (v, shape) = NetCdf.readVar(nc, "v")
    assert(shape == Seq(2, 3) && v.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("S4: rejects non-NetCDF and 64-bit-offset files loudly") {
    val e1 = intercept[IllegalArgumentException](
      NetCdf.parse("parquet?".getBytes("US-ASCII")))
    assert(e1.getMessage.contains("CDF magic"))
    val e2 = intercept[IllegalArgumentException](
      NetCdf.parse(Array('C'.toByte, 'D'.toByte, 'F'.toByte, 2.toByte, 0, 0, 0, 0)))
    assert(e2.getMessage.contains("version"))
  }

  test("S4: distributed scanCells over a directory of daily files") {
    val dir = Files.createTempDirectory("graft_nc_scan").toFile.getAbsolutePath
    tamsatFile(dir, "rfe2024_03_01.nc", "2024-03-01", nRecs = 1)
    tamsatFile(dir, "rfe2024_03_02.nc", "2024-03-02", nRecs = 1)
    val df = NetCdf.scanCells(spark, s"$dir/*.nc")
    assert(df.count() == 2 * 4 * 5)
    assert(df.where(org.apache.spark.sql.functions.col("value").isNull).count() == 2)
    val dates = df.select("date").distinct().collect().map(_.getDate(0).toString).sorted
    assert(dates.toSeq == Seq("2024-03-01", "2024-03-02"))
  }
}
