package graft

import graft.multimodal.{Bmp, Wav}
import org.scalatest.funsuite.AnyFunSuite

/** Spec-compliance tests for the pure-JVM media codecs — the SourcesSpec
  * discipline applied to BMP and WAV: byte-level golden headers built by
  * hand from the public format specs (so an endianness or offset bug fails
  * against the SPEC, not against our own encoder), round-trips across
  * padding geometries, and decoder-wider-than-encoder cases (top-down BMP,
  * WAV with an unknown chunk before `data`). */
class CodecSpec extends AnyFunSuite {

  private def u16(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
    ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  test("BMP golden header layout: 2x2 image, every field per the spec") {
    val px = Array[Byte](10, 20, 30, 40) // rows top-down: (10,20),(30,40)
    val b = Bmp.encode(2, 2, px)
    // rowSize(2) = ((6+3)/4)*4 = 8; file = 54 + 16 = 70
    assert(b.length == 70)
    assert(b(0) == 'B' && b(1) == 'M')
    assert(u32(b, 2) == 70L)        // bfSize
    assert(u32(b, 10) == 54L)       // bfOffBits
    assert(u32(b, 14) == 40L)       // biSize (BITMAPINFOHEADER)
    assert(u32(b, 18) == 2L && u32(b, 22) == 2L) // width, height (bottom-up)
    assert(u16(b, 26) == 1 && u16(b, 28) == 24)  // planes, bitcount
    assert(u32(b, 30) == 0L)        // BI_RGB
    assert(u32(b, 34) == 16L)       // biSizeImage = rowSize*height
    // bottom-up storage: first stored row is the BOTTOM image row (30,40)
    assert(b(54) == 30 && b(55) == 30 && b(56) == 30) // B,G,R of pixel (1,0)
    assert(b(57) == 40 && b(58) == 40 && b(59) == 40)
    assert(b(60) == 0 && b(61) == 0)                  // row padding to 8
    assert(b(62) == 10 && b(65) == 20)                // top row stored second
    val img = Bmp.decode(b)
    assert(img.width == 2 && img.height == 2 && img.gray.toSeq == px.toSeq)
  }

  test("BMP round-trips across row-padding geometries") {
    for ((w, h) <- Seq((1, 1), (3, 2), (4, 4), (5, 3), (12, 7), (13, 1))) {
      val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
      val img = Bmp.decode(Bmp.encode(w, h, px))
      assert(img.width == w && img.height == h, s"dims for ${w}x$h")
      assert(img.gray.toSeq == px.toSeq, s"pixels for ${w}x$h (rowSize ${Bmp.rowSize(w)})")
    }
  }

  test("BMP decoder accepts top-down files (negative biHeight) and non-54 offsets") {
    val px = Array[Byte](1, 2, 3, 4, 5, 6)
    val b = Bmp.encode(3, 2, px)
    // flip to top-down: negate height, swap stored rows
    val td = b.clone()
    val negH = -2
    td(22) = (negH & 0xff).toByte; td(23) = ((negH >> 8) & 0xff).toByte
    td(24) = 0xff.toByte; td(25) = 0xff.toByte
    val rs = Bmp.rowSize(3)
    System.arraycopy(b, 54 + rs, td, 54, rs)     // top image row first
    System.arraycopy(b, 54, td, 54 + rs, rs)
    val img = Bmp.decode(td)
    assert(img.gray.toSeq == px.toSeq, "top-down decode must match")
    // gap bytes before the pixel array (bfOffBits = 58)
    val gap = new Array[Byte](b.length + 4)
    System.arraycopy(b, 0, gap, 0, 54)
    System.arraycopy(b, 54, gap, 58, b.length - 54)
    graft.multimodal.Codecs.putU32(gap, 10, 58L)
    graft.multimodal.Codecs.putU32(gap, 2, gap.length.toLong)
    assert(Bmp.decode(gap).gray.toSeq == px.toSeq, "bfOffBits != 54 decode")
  }

  test("WAV golden header layout: 4 samples at 8 kHz, every field per the spec") {
    val s = Array[Byte](0, 64, 127.toByte, 255.toByte)
    val b = Wav.encode(8000, s)
    assert(b.length == 48) // 44 + 4, no pad
    assert(new String(b, 0, 4, "US-ASCII") == "RIFF")
    assert(u32(b, 4) == 40L)  // riffSize = total - 8
    assert(new String(b, 8, 4, "US-ASCII") == "WAVE")
    assert(new String(b, 12, 4, "US-ASCII") == "fmt ")
    assert(u32(b, 16) == 16L) // fmt chunk size
    assert(u16(b, 20) == 1 && u16(b, 22) == 1)       // PCM, mono
    assert(u32(b, 24) == 8000L && u32(b, 28) == 8000L) // rate, byteRate
    assert(u16(b, 32) == 1 && u16(b, 34) == 8)       // blockAlign, bits
    assert(new String(b, 36, 4, "US-ASCII") == "data")
    assert(u32(b, 40) == 4L)
    assert(b.slice(44, 48).toSeq == s.toSeq)
    val a = Wav.decode(b)
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 8)
    assert(a.samples.toSeq == s.toSeq)
  }

  test("WAV odd-length data gets the RIFF pad byte; sizes stay consistent") {
    val s = Array.tabulate(7)(i => (i * 31).toByte)
    val b = Wav.encode(8000, s)
    assert(b.length == 52 && b.length % 2 == 0) // 44 + 7 + 1 pad
    assert(u32(b, 4) == (b.length - 8).toLong)
    assert(u32(b, 40) == 7L)  // data size excludes the pad byte
    assert(b(51) == 0)        // the pad byte itself
    assert(Wav.decode(b).samples.toSeq == s.toSeq)
  }

  test("WAV decoder walks unknown chunks instead of assuming data at 44") {
    val s = Array[Byte](9, 8, 7, 6)
    val base = Wav.encode(8000, s)
    // splice a 6-byte 'LIST' chunk (odd size -> +1 pad) between fmt and data
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val out = new Array[Byte](base.length + extra.length)
    System.arraycopy(base, 0, out, 0, 36)          // RIFF..fmt chunk
    System.arraycopy(extra, 0, out, 36, extra.length)
    System.arraycopy(base, 36, out, 36 + extra.length, base.length - 36)
    graft.multimodal.Codecs.putU32(out, 4, (out.length - 8).toLong)
    val a = Wav.decode(out)
    assert(a.samples.toSeq == s.toSeq && a.sampleRate == 8000)
  }

  test("malformed containers throw instead of misreading") {
    intercept[IllegalArgumentException](Bmp.decode("BMnot a real bmp".getBytes.padTo(60, 0.toByte)))
    intercept[IllegalArgumentException](Wav.decode(new Array[Byte](44)))
    // truncated pixel array
    val good = Bmp.encode(4, 4, Array.fill(16)(7.toByte))
    intercept[IllegalArgumentException](Bmp.decode(good.take(60)))
  }
}
