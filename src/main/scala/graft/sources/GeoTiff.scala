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

  /** K2 sink: encode a single-band float32 raster as a minimal classic
    * little-endian TIFF — one strip, uncompressed, GDAL_NODATA ascii tag —
    * exactly the dialect [[read]] parses (and the shape of the reference's
    * per-date `biomass_YYYYMMDD.tif` outputs, `rasterize.py:57-66`: one
    * float32 band, nodata −99999). Layout: header, pixel strip at offset 8,
    * nodata string, IFD last. */
  def write(path: String, width: Int, height: Int, data: Array[Float],
            nodata: Option[Double] = None): Unit = {
    require(data.length == width * height, s"data ${data.length} != $width x $height")
    // dims are emitted as SHORT (type 3) tags; larger rasters would silently
    // truncate through the reader's getShort & 0xffff round trip
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"dims $width x $height exceed SHORT-tag range (65535)")
    val ndBytes = nodata.map { v =>
      ((if (v == v.toLong.toDouble) v.toLong.toString else v.toString) + "\u0000") // NUL-terminated: TIFF ASCII count includes the terminator
        .getBytes("US-ASCII")
    }
    // TIFF spec: tag values of <= 4 bytes live INSIDE the tag's value field,
    // not out-of-line (and [[read]] decodes them inline) — only reserve the
    // out-of-line region for longer nodata strings
    val ndInline = ndBytes.exists(_.length <= 4)
    val dataOff = 8
    val dataLen = width * height * 4
    var ndOff = dataOff + dataLen
    if (ndOff % 2 == 1) ndOff += 1
    val ndLen = if (ndInline) 0 else ndBytes.map(_.length).getOrElse(0)
    var ifdOff = ndOff + ndLen
    if (ifdOff % 2 == 1) ifdOff += 1
    val nTags = 9 + (if (ndBytes.isDefined) 1 else 0)
    val total = ifdOff + 2 + nTags * 12 + 4
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    data.foreach(bb.putFloat)
    bb.position(ndOff)
    if (!ndInline) ndBytes.foreach(bb.put)
    bb.position(ifdOff)
    bb.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(id.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    }
    // ascending tag order, as the spec requires
    tag(256, 3, 1, width)            // ImageWidth
    tag(257, 3, 1, height)           // ImageLength
    tag(258, 3, 1, 32)               // BitsPerSample
    tag(259, 3, 1, 1)                // Compression: none
    tag(262, 3, 1, 1)                // PhotometricInterpretation: BlackIsZero
    tag(273, 4, 1, dataOff)          // StripOffsets (single strip)
    tag(278, 3, 1, height)           // RowsPerStrip
    tag(279, 4, 1, dataLen)          // StripByteCounts
    tag(339, 3, 1, 3)                // SampleFormat: IEEE float
    ndBytes.foreach { b => // GDAL_NODATA: inline when it fits the value field
      val value = if (ndInline) b.zipWithIndex.map { case (x, i) => (x & 0xff) << (8 * i) }.sum
                  else ndOff
      tag(42113, 2, b.length, value)
    }
    bb.putInt(0) // no next IFD
    Files.write(Paths.get(path), bb.array())
    ()
  }
}
