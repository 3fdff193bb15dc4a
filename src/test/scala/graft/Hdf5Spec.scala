package graft

import java.nio.file.Files

import graft.sources.Hdf5
import org.scalatest.funsuite.AnyFunSuite

/** S9: HDF5 classic codec — reference-shaped per-zone databases
  * (`BiomassAggregate.py:348-357`: rank-2 float64 datasets, LZF chunks,
  * `Column_Names` attribute) round-tripped through our own writer/reader,
  * LZF stream properties, loud rejections. */
class Hdf5Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def zoneData(n: Int, seed: Int): Array[Double] =
    Array.tabulate(2 * n) { i =>
      if (i % 2 == 0) 20200000.0 + i / 2  // Date column, YYYYMMDD-ish
      else (i / 2 * 37 + seed) % 1000 / 10.0
    }

  test("S9: reference-shaped database round trip (chunked + LZF + attrs)") {
    val dir = Files.createTempDirectory("graft_h5").toFile.getAbsolutePath
    val path = s"$dir/zones.h5"
    val cols = Map("Column_Names" -> Seq("Date", "Biomass"))
    Hdf5.write(path, Seq(
      Hdf5.DatasetSpec("Afar", Seq(45, 2), zoneData(45, 1), cols, chunkRows = 16),
      Hdf5.DatasetSpec("Somali", Seq(45, 2), zoneData(45, 2), cols, chunkRows = 16),
      Hdf5.DatasetSpec("Oromia", Seq(45, 2), zoneData(45, 3), cols, chunkRows = 16)))
    val dss = Hdf5.read(path)
    // symbol-table order is by name
    assert(dss.map(_.name) == Seq("Afar", "Oromia", "Somali"))
    dss.foreach { ds =>
      assert(ds.dims == Seq(45L, 2L))
      assert(ds.attrs == cols)
    }
    assert(dss.find(_.name == "Afar").get.data.toSeq == zoneData(45, 1).toSeq)
    assert(dss.find(_.name == "Somali").get.data.toSeq == zoneData(45, 2).toSeq)
  }

  test("S9: contiguous layout round trip, partial last chunk, single-row file") {
    val dir = Files.createTempDirectory("graft_h5").toFile.getAbsolutePath
    val contig = s"$dir/contig.h5"
    Hdf5.write(contig, Seq(Hdf5.DatasetSpec("z", Seq(7, 2), zoneData(7, 9))))
    assert(Hdf5.read(contig).head.data.toSeq == zoneData(7, 9).toSeq)
    // 45 rows with chunkRows=16 → 2 full chunks + a zero-padded partial;
    // the padding must NOT leak into the decoded values (asserted above);
    // here: a 1-row dataset where the chunk is almost all padding
    val tiny = s"$dir/tiny.h5"
    Hdf5.write(tiny, Seq(Hdf5.DatasetSpec("t", Seq(1, 2), Array(3.0, 4.0), chunkRows = 16)))
    assert(Hdf5.read(tiny).head.data.toSeq == Seq(3.0, 4.0))
  }

  test("S9: zoneSeries flattening and the distributed scan") {
    val dir = Files.createTempDirectory("graft_h5").toFile.getAbsolutePath
    Hdf5.write(s"$dir/a.h5", Seq(
      Hdf5.DatasetSpec("Z1", Seq(3, 2), Array(1.0, 10.0, 2.0, 20.0, 3.0, 30.0), chunkRows = 2)))
    Hdf5.write(s"$dir/b.h5", Seq(
      Hdf5.DatasetSpec("Z2", Seq(2, 2), Array(1.0, 5.0, 2.0, 6.0))))
    val rows = Hdf5.scanZoneSeries(spark, s"$dir/*.h5")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == Seq(
      ("Z1", 0, 1.0, 10.0), ("Z1", 1, 2.0, 20.0), ("Z1", 2, 3.0, 30.0),
      ("Z2", 0, 1.0, 5.0), ("Z2", 1, 2.0, 6.0)))
  }

  test("LZF: compress/decompress identity on repetitive, random, and tiny inputs") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      Array.empty[Byte],
      Array[Byte](1),
      Array.fill(100)(42.toByte),                       // long back-references
      Array.tabulate(5000)(i => (i % 7).toByte),        // periodic
      Array.fill(4096)(rnd.nextInt().toByte),           // incompressible
      ("abcabcabcXabcabcabc" * 40).getBytes("UTF-8"))
    cases.foreach { in =>
      val c = Hdf5.Lzf.compress(in)
      assert(Hdf5.Lzf.decompress(c, in.length).toSeq == in.toSeq)
    }
    // repetitive data must actually compress (the filter is pointless otherwise)
    val rep = Array.fill(8192)(1.toByte)
    assert(Hdf5.Lzf.compress(rep).length < rep.length / 4)
  }

  test("S9: loud rejection of non-classic dialects and unsupported profiles") {
    val dir = Files.createTempDirectory("graft_h5").toFile.getAbsolutePath
    val path = s"$dir/z.h5"
    Hdf5.write(path, Seq(Hdf5.DatasetSpec("z", Seq(2, 2), Array(1.0, 2.0, 3.0, 4.0))))
    val good = Files.readAllBytes(java.nio.file.Paths.get(path))
    intercept[IllegalArgumentException] { Hdf5.parse("nope".getBytes) }
    val v2 = good.clone(); v2(8) = 2 // superblock version 2
    intercept[IllegalArgumentException] { Hdf5.parse(v2) }
    // a (n × 3) dataset is not a zone series
    Hdf5.write(path, Seq(Hdf5.DatasetSpec("z", Seq(2, 3), Array.fill(6)(1.0))))
    intercept[IllegalArgumentException] {
      Hdf5.zoneSeries(Files.readAllBytes(java.nio.file.Paths.get(path)))
    }
  }
}
