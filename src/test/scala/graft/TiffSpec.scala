package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Tiff

/** Golden-byte + hardening gates for the dual-endian baseline TIFF
  * codec (the qm13 executor path). The golden array is HAND-ASSEMBLED
  * from the TIFF 6.0 spec — independent of both the encoder and the
  * decoder — in the BIG-endian order, because MM is the arm every
  * LE-only codec in the family would fail. */
class TiffSpec extends AnyFunSuite {

  private val px2x1 = Array[Byte](1, 2, 3, 4, 5, 6)

  /** 2×1 RGB, MM order, IFD at 8, bps array at 122, strip at 128. */
  private val goldenMM: Array[Byte] = {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    b('M', 'M', 0x00, 0x2A, 0, 0, 0, 8) ++
      b(0x00, 0x09) ++
      b(0x01, 0x00, 0x00, 0x03, 0, 0, 0, 1, 0x00, 0x02, 0, 0) ++ // w=2
      b(0x01, 0x01, 0x00, 0x03, 0, 0, 0, 1, 0x00, 0x01, 0, 0) ++ // h=1
      b(0x01, 0x02, 0x00, 0x03, 0, 0, 0, 3, 0, 0, 0x00, 0x7A) ++ // bps@122
      b(0x01, 0x03, 0x00, 0x03, 0, 0, 0, 1, 0x00, 0x01, 0, 0) ++ // comp=1
      b(0x01, 0x06, 0x00, 0x03, 0, 0, 0, 1, 0x00, 0x02, 0, 0) ++ // rgb
      b(0x01, 0x11, 0x00, 0x04, 0, 0, 0, 1, 0, 0, 0x00, 0x80) ++ // strip@128
      b(0x01, 0x15, 0x00, 0x03, 0, 0, 0, 1, 0x00, 0x03, 0, 0) ++ // spp=3
      b(0x01, 0x16, 0x00, 0x04, 0, 0, 0, 1, 0, 0, 0, 1) ++       // rps=1
      b(0x01, 0x17, 0x00, 0x04, 0, 0, 0, 1, 0, 0, 0, 6) ++       // len=6
      b(0, 0, 0, 0) ++                                           // next IFD
      b(0x00, 0x08, 0x00, 0x08, 0x00, 0x08) ++                   // 8,8,8
      px2x1
  }

  test("hand-built big-endian golden decodes to the exact pixels") {
    val img = Tiff.decodeRgb(goldenMM)
    assert(img.width == 2 && img.height == 1 && img.bigEndian)
    assert(img.rgb.toSeq == px2x1.toSeq)
  }

  test("encoder reproduces the golden bytes (MM) byte for byte") {
    assert(Tiff.encodeRgb(2, 1, px2x1, bigEndian = true).toSeq
      == goldenMM.toSeq)
  }

  test("both orders round-trip; bytes differ, pixels agree") {
    val rgb = Array.tabulate(3 * 5 * 4)(i => ((i * 37 + 11) % 256).toByte)
    val ii = Tiff.encodeRgb(5, 4, rgb, bigEndian = false)
    val mm = Tiff.encodeRgb(5, 4, rgb, bigEndian = true)
    assert(ii.length == mm.length && ii.toSeq != mm.toSeq)
    val di = Tiff.decodeRgb(ii); val dm = Tiff.decodeRgb(mm)
    assert(!di.bigEndian && dm.bigEndian)
    assert(di.rgb.toSeq == rgb.toSeq && dm.rgb.toSeq == rgb.toSeq)
    assert(di.width == 5 && dm.height == 4)
  }

  test("the SHORT-inline-value trap: an MM width read as u32 is wrong") {
    // tag 256's value field in goldenMM reads 0x00020000 as a raw u32 —
    // the naive decode; the spec read (first two bytes as u16) gives 2.
    // This pins WHY the per-type read exists.
    val e = 10 // first IFD entry offset
    val rawU32 = ((goldenMM(e + 8) & 0xff) << 24) |
      ((goldenMM(e + 9) & 0xff) << 16) |
      ((goldenMM(e + 10) & 0xff) << 8) | (goldenMM(e + 11) & 0xff)
    assert(rawU32 == 0x00020000 && rawU32 != 2)
  }

  test("untrusted headers are rejected before allocation") {
    // implausible dims: patch width to 0xFFFF and length stays 6
    val hugeW = goldenMM.clone
    hugeW(18) = 0xFF.toByte; hugeW(19) = 0xFF.toByte
    assertThrows[IllegalArgumentException](Tiff.decodeRgb(hugeW))
    // strip offset beyond the file
    val badOff = goldenMM.clone
    badOff(78) = 0x7F.toByte // StripOffsets value high byte
    assertThrows[IllegalArgumentException](Tiff.decodeRgb(badOff))
    // wrong magic
    val badMagic = goldenMM.clone
    badMagic(3) = 0x2B.toByte
    assertThrows[IllegalArgumentException](Tiff.decodeRgb(badMagic))
    // truncated file
    assertThrows[IllegalArgumentException](
      Tiff.decodeRgb(goldenMM.take(100)))
  }

  test("u32-max dims cannot wrap the pixel-count guard") {
    // w = h = 0xFFFFFFFF: the true product 2^64-2^33+1 wraps NEGATIVE in
    // a Long, so the old `w * h <= MaxPixels` product-only guard PASSED
    // a 4-billion-pixel header; the per-dimension caps must reject it
    // at the dims check itself, not via downstream strip arithmetic
    // (which can be wrapped back into agreement by a crafted stripLen).
    val wrap = goldenMM.clone
    // width tag (offset 10): type -> LONG(4), value -> 0xFFFFFFFF
    wrap(13) = 0x04; wrap(18) = 0xFF.toByte; wrap(19) = 0xFF.toByte
    wrap(20) = 0xFF.toByte; wrap(21) = 0xFF.toByte
    // height tag (offset 22): same
    wrap(25) = 0x04; wrap(30) = 0xFF.toByte; wrap(31) = 0xFF.toByte
    wrap(32) = 0xFF.toByte; wrap(33) = 0xFF.toByte
    val e = intercept[IllegalArgumentException](Tiff.decodeRgb(wrap))
    assert(e.getMessage.contains("implausible dims"),
      s"overflow header must die at the dims guard, got: ${e.getMessage}")
  }
}
