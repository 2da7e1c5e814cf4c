package graft

import graft.multimodal.Bmp
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BMP FORMAT itself, independently of the encoder: a golden
  * byte array assembled by hand from the spec (bottom-up rows, BGR,
  * row padding, header offsets) must decode to known pixels — so a
  * decoder bug cannot be masked by a mirrored encoder bug (the qm9
  * gate's independence argument), plus round-trip and rejection
  * properties across the dimension/direction grid. */
class BmpSpec extends AnyFunSuite {

  /** Hand-assembled 2×2 bottom-up 24-bit BMP:
    * image (top-down):  (0,0)=red (1,0)=green / (0,1)=blue (1,1)=white.
    * File rows bottom-up → first stored row is the BOTTOM image row
    * (blue, white), each row 6 pixel bytes + 2 padding = 8. */
  private val golden: Array[Byte] = {
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0,
      0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0)
    val rowBottom = Array[Int](255, 0, 0, 255, 255, 255, 0, 0) // BGR: blue, white + pad
    val rowTop = Array[Int](0, 0, 255, 0, 255, 0, 0, 0)        // BGR: red, green + pad
    (header ++ rowBottom ++ rowTop).map(_.toByte)
  }

  test("golden hand-built 2x2 BMP decodes to the spec'd pixels") {
    val img = Bmp.decode24(golden)
    assert(img.width === 2 && img.height === 2)
    // row-major top-down RGB
    assert(img.rgb.map(_ & 0xff).toSeq === Seq(
      255, 0, 0,   0, 255, 0,    // red, green
      0, 0, 255,   255, 255, 255 // blue, white
    ))
  }

  test("decoder honors a non-54 pixel-array offset (header gap)") {
    // splice 4 gap bytes between headers and pixels; patch offset+size
    val gapped = golden.take(54) ++ Array[Byte](9, 9, 9, 9) ++ golden.drop(54)
    gapped(10) = 58 // pixel offset
    gapped(2) = 74  // file size (unchecked beyond bounds, but keep honest)
    val img = Bmp.decode24(gapped)
    assert(img.rgb.map(_ & 0xff).toSeq === Bmp.decode24(golden).rgb.map(_ & 0xff).toSeq)
  }

  test("encode/decode round-trips across sizes, paddings and directions") {
    for (w <- Seq(1, 2, 3, 4, 5, 16, 17, 21); h <- Seq(1, 2, 7, 12);
         topDown <- Seq(false, true)) {
      val rgb = Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)
      val bytes = Bmp.encode24(w, h, rgb, topDown)
      // size formula: header + padded rows
      assert(bytes.length === 54 + h * ((3 * w + 3) / 4 * 4))
      val img = Bmp.decode24(bytes)
      assert(img.width === w && img.height === h, s"${w}x$h topDown=$topDown")
      assert(img.rgb.sameElements(rgb), s"${w}x$h topDown=$topDown")
    }
  }

  test("top-down and bottom-up encodings of one image differ in bytes, agree decoded") {
    val w = 5; val h = 3
    val rgb = Array.tabulate(3 * w * h)(i => (i % 256).toByte)
    val up = Bmp.encode24(w, h, rgb, topDown = false)
    val down = Bmp.encode24(w, h, rgb, topDown = true)
    assert(!up.sameElements(down))
    assert(Bmp.decode24(up).rgb.sameElements(Bmp.decode24(down).rgb))
  }

  test("rejects overflow-adversarial headers (claimed dims wrap int arithmetic)") {
    // width near 2^31: 3*width wraps negative; the decoder must reject
    // via the pre-arithmetic dims-vs-file-size bound, not crash or
    // read garbage
    val evil = Bmp.encode24(2, 2, new Array[Byte](12))
    evil(18) = -1; evil(19) = -1; evil(20) = -1; evil(21) = 0x7f // width = 2^31-1
    assertThrows[IllegalArgumentException](Bmp.decode24(evil))
    val evil2 = Bmp.encode24(2, 2, new Array[Byte](12))
    evil2(10) = -1; evil2(11) = -1; evil2(12) = -1; evil2(13) = 0x7f // huge offset
    assertThrows[IllegalArgumentException](Bmp.decode24(evil2))
  }

  test("rejects non-BMP and unsupported variants") {
    def bad(f: Array[Byte] => Unit, mut: Array[Byte]): Unit =
      assertThrows[IllegalArgumentException](f(mut))
    val base = Bmp.encode24(2, 2, new Array[Byte](12))
    bad(Bmp.decode24(_), Array[Byte](1, 2, 3))
    val wrongMagic = base.clone(); wrongMagic(0) = 'X'
    bad(Bmp.decode24(_), wrongMagic)
    val bpp8 = base.clone(); bpp8(28) = 8
    bad(Bmp.decode24(_), bpp8)
    val rle = base.clone(); rle(30) = 1
    bad(Bmp.decode24(_), rle)
    val truncated = base.take(base.length - 1)
    bad(Bmp.decode24(_), truncated)
  }
}
