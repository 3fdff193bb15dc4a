package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.grid.Geometry

/** S7: Shapefile scan — minimal pure-Scala ESRI shapefile + dBase reader for
  * the reference's zone dimension (`BiomassAggregate.py:86-89`): polygon
  * records (.shp) joined positionally with attribute records (.dbf).
  * Returns ring sets; containment uses even-odd crossing, so multi-part
  * polygons and holes need no winding analysis.
  */
object Shapefile {

  /** Read polygons: one Shape (= ring set) per record. */
  def readShp(path: String): Seq[Seq[Geometry.Ring]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes)
    require(bb.order(ByteOrder.BIG_ENDIAN).getInt(0) == 9994, s"$path: not a shapefile")
    val fileLen = bb.getInt(24) * 2 // 16-bit words
    val shapeType = bb.order(ByteOrder.LITTLE_ENDIAN).getInt(32)
    require(shapeType == 5, s"$path: only polygon (5) supported, got $shapeType")

    val out = Seq.newBuilder[Seq[Geometry.Ring]]
    var off = 100
    while (off < fileLen) {
      val contentLen = bb.order(ByteOrder.BIG_ENDIAN).getInt(off + 4) * 2
      val c = off + 8
      bb.order(ByteOrder.LITTLE_ENDIAN)
      val recType = bb.getInt(c)
      if (recType == 5) {
        val numParts = bb.getInt(c + 36)
        val numPoints = bb.getInt(c + 40)
        val partsOff = c + 44
        val pointsOff = partsOff + numParts * 4
        val parts = Array.tabulate(numParts)(i => bb.getInt(partsOff + i * 4))
        val rings = (0 until numParts).map { p =>
          val from = parts(p)
          val until = if (p + 1 < numParts) parts(p + 1) else numPoints
          val xs = new Array[Double](until - from)
          val ys = new Array[Double](until - from)
          var i = from
          while (i < until) {
            xs(i - from) = bb.getDouble(pointsOff + i * 16)
            ys(i - from) = bb.getDouble(pointsOff + i * 16 + 8)
            i += 1
          }
          Geometry.Ring(xs, ys)
        }
        out += rings
      } else out += Seq.empty // null shape
      off += 8 + contentLen
    }
    out.result()
  }

  /** Read one string attribute column from the .dbf (dBase III layout). */
  def readDbfColumn(path: String, column: String): Seq[String] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = bb.getInt(4)
    val hdrLen = bb.getShort(8) & 0xffff
    val recLen = bb.getShort(10) & 0xffff
    // field descriptors: 32 bytes each, from offset 32 until 0x0D
    var off = 32
    var fieldOff = 1 // record starts with deletion flag byte
    var colOff = -1
    var colLen = -1
    while (bytes(off) != 0x0d) {
      val name = new String(bytes, off, 11).takeWhile(_ != 0)
      val len = bytes(off + 16) & 0xff
      if (name == column) { colOff = fieldOff; colLen = len }
      fieldOff += len
      off += 32
    }
    require(colOff >= 0, s"$path: no column $column")
    (0 until nRec).map { r =>
      new String(bytes, hdrLen + r * recLen + colOff, colLen, "ISO-8859-1").trim
    }
  }

  /** Zones keyed by an attribute: (key, rings). */
  def readZones(shpPath: String, keyColumn: String): Seq[(String, Seq[Geometry.Ring])] = {
    val dbf = shpPath.replaceAll("\\.shp$", ".dbf")
    readDbfColumn(dbf, keyColumn).zip(readShp(shpPath))
  }
}
