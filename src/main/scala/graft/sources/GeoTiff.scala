package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** S8: GeoTIFF scan — a minimal pure-Scala reader for the raster layout the
  * reference writes (`rasterize.py:63`): classic little-endian TIFF,
  * uncompressed, stripped, single-band float32. Parses the IFD, the strip
  * tables, and the GDAL nodata tag; returns the band row-major.
  *
  * This is a *reader for the at-rest format*, not a GIS library: anything
  * outside the reference's profile (compression, tiles, big-endian) is
  * rejected loudly.
  */
object GeoTiff {

  final case class Raster(width: Int, height: Int, nodata: Option[Double],
                          data: Array[Float]) {
    def value(row: Int, col: Int): Float = data(row * width + col)
  }

  def read(path: String): Raster = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes)
    require(bytes(0) == 'I' && bytes(1) == 'I', s"$path: only little-endian TIFF supported")
    bb.order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getShort(2) == 42, s"$path: not a classic TIFF")

    val ifdOff = bb.getInt(4)
    val n = bb.getShort(ifdOff) & 0xffff
    var width, height, rowsPerStrip = 0
    var bitsPerSample = 0
    var compression, sampleFormat = 1
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var nodata: Option[Double] = None

    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1
      case 3 | 8         => 2
      case 4 | 9 | 11    => 4
      case 5 | 10 | 12   => 8
      case _             => 1
    }
    def readArray(typ: Int, count: Int, valOff: Int): Array[Long] = {
      val sz = typeSize(typ)
      val base = if (sz.toLong * count <= 4) valOff else bb.getInt(valOff)
      // when inline, valOff IS the position of the value bytes
      val pos = if (sz.toLong * count <= 4) valOff else base
      Array.tabulate(count) { i =>
        typ match {
          case 3 => (bb.getShort(pos + i * 2) & 0xffff).toLong
          case 4 => bb.getInt(pos + i * 4).toLong & 0xffffffffL
          case _ => sys.error(s"unsupported tag array type $typ")
        }
      }
    }

    var i = 0
    while (i < n) {
      val e = ifdOff + 2 + i * 12
      val tag = bb.getShort(e) & 0xffff
      val typ = bb.getShort(e + 2) & 0xffff
      val count = bb.getInt(e + 4)
      val valOff = e + 8
      def scalar: Int = typ match {
        case 3 => bb.getShort(valOff) & 0xffff
        case 4 => bb.getInt(valOff)
        case _ => bb.getInt(valOff)
      }
      tag match {
        case 256   => width = scalar
        case 257   => height = scalar
        case 258   => bitsPerSample = scalar
        case 259   => compression = scalar
        case 273   => stripOffsets = readArray(typ, count, valOff)
        case 278   => rowsPerStrip = scalar
        case 279   => stripCounts = readArray(typ, count, valOff)
        case 339   => sampleFormat = scalar
        case 42113 => // GDAL_NODATA: ASCII
          val off = if (count <= 4) valOff else bb.getInt(valOff)
          val s = new String(bytes, off, count - 1).trim
          nodata = scala.util.Try(s.toDouble).toOption
        case _ =>
      }
      i += 1
    }
    require(compression == 1, s"$path: compressed TIFF not supported")
    require(bitsPerSample == 32 && sampleFormat == 3,
      s"$path: expected float32 band, got bits=$bitsPerSample fmt=$sampleFormat")

    val data = new Array[Float](width * height)
    var row = 0
    stripOffsets.indices.foreach { s =>
      val rows = math.min(rowsPerStrip, height - row)
      var r = 0
      while (r < rows) {
        var c = 0
        val base = stripOffsets(s).toInt + r * width * 4
        while (c < width) {
          data((row + r) * width + c) = bb.getFloat(base + c * 4)
          c += 1
        }
        r += 1
      }
      row += rows
    }
    Raster(width, height, nodata, data)
  }
}
