package graft.multimodal

/** Pure-JVM spec-level media codecs — the same discipline as the NetCDF-3 /
  * HDF5 / GeoTIFF codecs in graft.sources: written from the PUBLIC format
  * specifications, no codec libraries, subsetted to what the engine
  * produces and consumes. Round-trips and hand-built golden byte layouts
  * are pinned in CodecSpec.
  *
  *  - [[Bmp]]: Windows BMP, BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
  *    (40 bytes, `biSize` 40) + uncompressed 24-bit BI_RGB pixel rows,
  *    bottom-up, each row zero-padded to a 4-byte boundary. The decoder
  *    also accepts top-down files (negative `biHeight`) and arbitrary
  *    `bfOffBits` (palette/gap bytes are skipped), which the encoder never
  *    writes — decode is strictly wider than encode, as a parser must be.
  *  - [[Wav]]: RIFF/WAVE with a 16-byte PCM `fmt ` chunk and a `data`
  *    chunk of unsigned 8-bit mono samples. All chunk sizes little-endian;
  *    odd-sized chunk data is followed by a pad byte (RIFF rule), and the
  *    decoder walks unknown chunks (LIST, fact, …) instead of assuming
  *    `data` starts at byte 44.
  */
object Codecs {
  private[graft] def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private[graft] def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
    ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private[graft] def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt
  private[graft] def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private[graft] def putU32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xff).toByte
    b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte
    b(o + 3) = ((v >> 24) & 0xff).toByte
  }
}

object Bmp {
  import Codecs._

  final case class Image(width: Int, height: Int, gray: Array[Byte])

  /** Bytes per stored pixel row: 3·width rounded up to a 4-byte boundary. */
  def rowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Total encoded size for a width×height grayscale-as-24-bit image. */
  def encodedSize(width: Int, height: Int): Int = 54 + rowSize(width) * height

  /** Encode gray bytes (row-major, top-down, length = width·height) as a
    * 24-bit BI_RGB BMP with B = G = R = gray, bottom-up rows. */
  def encode(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"bad BMP encode geometry: ${width}x$height with ${gray.length} pixels")
    val rs = rowSize(width)
    val out = new Array[Byte](encodedSize(width, height))
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length.toLong) // bfSize
    putU32(out, 10, 54L)              // bfOffBits
    putU32(out, 14, 40L)              // biSize
    putU32(out, 18, width.toLong)
    putU32(out, 22, height.toLong)    // positive = bottom-up
    putU16(out, 26, 1)                // biPlanes
    putU16(out, 28, 24)               // biBitCount
    putU32(out, 30, 0L)               // BI_RGB
    putU32(out, 34, (rs * height).toLong) // biSizeImage
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rs // bottom-up storage
      var x = 0
      while (x < width) {
        val g = gray(y * width + x)
        val o = rowOff + x * 3
        out(o) = g; out(o + 1) = g; out(o + 2) = g // B, G, R
        x += 1
      }
      y += 1
    }
    out
  }

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  /** Parse headers and pixel rows; gray = blue channel (the encoder writes
    * B = G = R). Handles bottom-up and top-down storage and non-54
    * `bfOffBits`. Only the encoder's subset (24-bit BI_RGB) is accepted —
    * anything else throws, it never silently misreads. */
  def decode(b: Array[Byte]): Image = {
    require(isBmp(b), "not a BMP: bad magic/length")
    val offBits = u32(b, 10).toInt
    val biSize = u32(b, 14).toInt
    require(biSize >= 40, s"unsupported DIB header size $biSize")
    val width = i32(b, 18)
    val rawH = i32(b, 22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    require(width > 0 && height > 0, s"bad BMP dims ${width}x$rawH")
    require(u16(b, 28) == 24, s"unsupported biBitCount ${u16(b, 28)}")
    require(u32(b, 30) == 0L, s"unsupported biCompression ${u32(b, 30)}")
    val rs = rowSize(width)
    require(b.length >= offBits + rs * height, "truncated BMP pixel array")
    val gray = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rowOff = offBits + srcRow * rs
      var x = 0
      while (x < width) {
        gray(y * width + x) = b(rowOff + x * 3) // blue channel
        x += 1
      }
      y += 1
    }
    Image(width, height, gray)
  }
}

object Wav {
  import Codecs._

  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                         samples: Array[Byte])

  /** Total encoded size for n 8-bit mono samples (incl. RIFF pad byte). */
  def encodedSize(nSamples: Int): Int = 44 + nSamples + (nSamples % 2)

  /** Encode unsigned 8-bit mono PCM. */
  def encode(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val pad = samples.length % 2
    val out = new Array[Byte](encodedSize(samples.length))
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putU32(out, 4, (out.length - 8).toLong)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putU32(out, 16, 16L)             // fmt chunk size
    putU16(out, 20, 1)               // PCM
    putU16(out, 22, 1)               // mono
    putU32(out, 24, sampleRate.toLong)
    putU32(out, 28, sampleRate.toLong) // byteRate = rate·blockAlign
    putU16(out, 32, 1)               // blockAlign = channels·bits/8
    putU16(out, 34, 8)               // bitsPerSample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putU32(out, 40, samples.length.toLong)
    System.arraycopy(samples, 0, out, 44, samples.length)
    // `pad` trailing zero byte already present (array is zero-initialized)
    require(pad == 0 || out(out.length - 1) == 0, "pad byte")
    out
  }

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Walk the chunk list for `fmt ` and `data` — NOT assuming data at 44,
    * skipping unknown chunks and their RIFF pad bytes. Accepts the
    * encoder's subset (PCM, 8-bit); other formats throw. */
  def decode(b: Array[Byte]): Audio = {
    require(isWav(b), "not a WAV: bad magic/length")
    var off = 12
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var blockAlign = -1
    var samples: Array[Byte] = null
    while (off + 8 <= b.length && (sampleRate < 0 || samples == null)) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = u32(b, off + 4).toInt
      require(off + 8 + size <= b.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(size >= 16, s"short fmt chunk: $size")
          require(u16(b, off + 8) == 1, s"unsupported audio format ${u16(b, off + 8)}")
          channels = u16(b, off + 10)
          sampleRate = u32(b, off + 12).toInt
          blockAlign = u16(b, off + 20)
          bits = u16(b, off + 22)
          require(bits == 8 && channels == 1 && blockAlign == 1,
            s"unsupported PCM layout: $channels ch, $bits bit, align $blockAlign")
        case "data" =>
          samples = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + size)
        case _ => () // LIST, fact, … — skip
      }
      off += 8 + size + (size % 2) // chunks are word-aligned
    }
    require(sampleRate > 0 && samples != null, "missing fmt /data chunk")
    Audio(sampleRate, channels, bits, samples)
  }
}
