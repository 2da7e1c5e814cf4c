package graft.multimodal

/** Pure-JVM 24-bit uncompressed BMP codec — the round-10 replacement of
  * the declared codec-stub boundary (`Media.decodeStub`) with ONE honest
  * real format, so the executor-side decode path in qm9 exercises actual
  * byte-layout parsing (little-endian headers, BGR order, 4-byte row
  * padding, bottom-up vs top-down row direction) instead of a fake.
  *
  * Format coverage (the classic Windows V3 shape every generator emits):
  *  - BITMAPFILEHEADER (14 B): "BM", file size, pixel-array offset
  *  - BITMAPINFOHEADER (40 B): width, SIGNED height (negative =
  *    top-down), planes=1, bpp=24, compression=0 (BI_RGB)
  *  - pixel array: rows padded to 4-byte multiples, BGR byte order,
  *    bottom-up when height > 0
  *
  * Encoder and decoder are deliberately written against the SPEC
  * independently (no shared row-layout helper): a decode bug cannot be
  * masked by a mirrored encode bug, which is what makes the qm9
  * round-trip + formula-oracle gate meaningful.
  *
  * Scale shape: both directions are row-local byte work — encode/decode
  * runs inside one mapPartitions stage, payload bytes never shuffle.
  */
/** qm9's fixed-width per-image feature row (all INT64-exact so the
  * DuckDB oracle can replay them from the pixel formula). */
case class BmpFeat(doc_id: Long, w: Long, h: Long, n_bytes: Long,
                   sum_r: Long, sum_g: Long, sum_b: Long, wsum: Long)

object Bmp {

  /** Encode row-major TOP-DOWN RGB pixels (3 bytes per pixel, r,g,b) as
    * a 24-bit BI_RGB BMP. `topDown = true` writes a negative-height
    * header with rows in file order top-first; otherwise the standard
    * bottom-up layout. */
  def encode24(width: Int, height: Int, rgb: Array[Byte],
               topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"need ${3 * width * height} rgb bytes, got ${rgb.length}")
    val rowBytes = (3 * width + 3) / 4 * 4
    val size = 54 + rowBytes * height
    val out = new Array[Byte](size)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte
      out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, size)
    put32(10, 54)                        // pixel-array offset
    put32(14, 40)                        // biSize
    put32(18, width)
    put32(22, if (topDown) -height else height)
    put16(26, 1)                         // planes
    put16(28, 24)                        // bpp
    put32(30, 0)                         // BI_RGB
    put32(34, rowBytes * height)         // biSizeImage
    put32(38, 2835); put32(42, 2835)     // 72 dpi, conventional
    var y = 0
    while (y < height) {
      // file row index for image row y (top-down image coordinates)
      val fileRow = if (topDown) y else height - 1 - y
      var x = 0
      val base = 54 + fileRow * rowBytes
      while (x < width) {
        val p = 3 * (y * width + x)
        out(base + 3 * x) = rgb(p + 2)       // B
        out(base + 3 * x + 1) = rgb(p + 1)   // G
        out(base + 3 * x + 2) = rgb(p)       // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded image: row-major TOP-DOWN RGB bytes (r,g,b per pixel). */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Decode a 24-bit uncompressed BMP. Honors the header's pixel-array
    * offset (gap bytes between headers and pixels are legal), signed
    * height, and row padding. Throws IllegalArgumentException on any
    * non-BMP or unsupported-variant input — the caller decides whether
    * that is an error record or a task failure. */
  def decode24(bytes: Array[Byte]): Image = {
    def fail(msg: String) = throw new IllegalArgumentException(s"bmp: $msg")
    if (bytes.length < 54) fail(s"too short (${bytes.length} B)")
    if (bytes(0) != 'B' || bytes(1) != 'M') fail("missing BM magic")
    def get32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def get16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val pixelOff = get32(10)
    val infoSize = get32(14)
    if (infoSize < 40) fail(s"info header $infoSize B unsupported")
    val width = get32(18)
    val rawHeight = get32(22)
    val topDown = rawHeight < 0
    val height = if (topDown) -rawHeight else rawHeight
    if (width <= 0 || height <= 0) fail(s"bad dims ${width}x$rawHeight")
    // overflow guard BEFORE any arithmetic on the untrusted dims: a
    // header can claim width near 2^31 and make `3*width` wrap —
    // the file-length bound below would then pass on garbage. The
    // file itself caps the real dims (3 bytes/pixel), so this bound
    // rejects nothing decodable.
    if (width.toLong * height > bytes.length.toLong)
      fail(s"dims ${width}x$height exceed file size")
    if (get16(26) != 1) fail("planes != 1")
    val bpp = get16(28)
    if (bpp != 24) fail(s"bpp $bpp unsupported (24 only)")
    if (get32(30) != 0) fail("compressed BMP unsupported")
    val rowBytes = (3 * width + 3) / 4 * 4
    if (pixelOff < 0 || pixelOff.toLong + rowBytes.toLong * height > bytes.length)
      fail("pixel array runs past end of file")
    val rgb = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      val base = pixelOff + fileRow * rowBytes
      var x = 0
      while (x < width) {
        val p = 3 * (y * width + x)
        rgb(p) = bytes(base + 3 * x + 2)      // R
        rgb(p + 1) = bytes(base + 3 * x + 1)  // G
        rgb(p + 2) = bytes(base + 3 * x)      // B
        x += 1
      }
      y += 1
    }
    Image(width, height, rgb)
  }
}
