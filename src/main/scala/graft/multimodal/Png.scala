package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM 8-bit-RGB PNG codec — the second honest format of the
  * multimodal decode family (Bmp.scala is the first): unlike BMP this
  * one exercises a real COMPRESSED container — zlib DEFLATE streams
  * (java.util.zip, the JVM's public binding of the RFC 1950/1951
  * codec), chunk framing with CRC-32 validation, and the five PNG
  * scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6) whose
  * byte-prediction arithmetic the decoder must invert exactly.
  *
  * Format coverage: 8-bit/channel truecolor (color type 2), no
  * interlace — the shape every screenshot/figure generator emits.
  *  - signature (8 B) · IHDR (w, h, depth 8, color 2, 0/0/0)
  *  - one or more IDAT chunks: zlib stream of filter-byte-prefixed
  *    scanlines (the decoder concatenates ALL IDATs before inflating —
  *    split streams are legal and common)
  *  - IEND; ancillary chunks are skipped by the decoder
  *
  * Encoder and decoder are deliberately written against the SPEC
  * independently (the encoder FORWARD-filters with its own arithmetic,
  * the decoder UN-filters with its own; no shared predictor helper) —
  * a mirrored-bug cancellation cannot fake the qm12 formula-oracle
  * match. The deflate BYTE STREAM is not a cross-engine constant
  * (compression level/strategy vary), so qm12's features come only
  * from DECODED pixels, never from compressed sizes.
  *
  * Scale shape: both directions are row-local byte work inside one
  * mapPartitions stage — payload bytes never shuffle.
  */
/** qm12's fixed-width per-image feature row (all INT64-exact so the
  * DuckDB oracle can replay them from the pixel formula; deliberately
  * NO compressed-size column — deflate output is not a cross-engine
  * constant). */
case class PngFeat(doc_id: Long, w: Long, h: Long, n_px: Long,
                   sum_r: Long, sum_g: Long, sum_b: Long, wsum: Long)

object Png {

  private val Sig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Paeth predictor (RFC 2083 §6.6) — used by BOTH directions, but
    * this is the one spec-mandated shared function (the filter is
    * defined BY this predictor); the filtering/unfiltering loops that
    * apply it remain independent. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode row-major TOP-DOWN RGB pixels as an 8-bit truecolor PNG.
    * `filterOf(y)` picks the scanline filter type (0–4) per row — the
    * qm12 fixture varies it so a decoder that only handles filter 0
    * cannot pass. `idatSplit` > 0 splits the zlib stream into chunks of
    * that size (decoder must concatenate). */
  def encode(width: Int, height: Int, rgb: Array[Byte],
             filterOf: Int => Int = _ => 0,
             idatSplit: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"need ${3 * width * height} rgb bytes, got ${rgb.length}")
    val stride = 3 * width
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = filterOf(y) & 7
      require(ft <= 4, s"filter $ft out of range")
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val left = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff
                 else 0
        val filt = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (filt & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = zbuf.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      def be32(v: Int) = Array(((v >>> 24) & 0xff).toByte,
        ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
        (v & 0xff).toByte)
      out.write(be32(body.length))
      val tb = tag.getBytes("US-ASCII")
      val crc = new CRC32(); crc.update(tb); crc.update(body)
      out.write(tb); out.write(body); out.write(be32(crc.getValue.toInt))
    }
    val ihdr = new Array[Byte](13)
    def ihdrBe32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >>> 24) & 0xff).toByte
      ihdr(off + 1) = ((v >>> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >>> 8) & 0xff).toByte
      ihdr(off + 3) = (v & 0xff).toByte
    }
    ihdrBe32(0, width); ihdrBe32(4, height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolor
    chunk("IHDR", ihdr)
    if (idatSplit > 0 && z.length > idatSplit) {
      var off = 0
      while (off < z.length) {
        val n = math.min(idatSplit, z.length - off)
        chunk("IDAT", java.util.Arrays.copyOfRange(z, off, off + n))
        off += n
      }
    } else chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decoded image: row-major TOP-DOWN RGB bytes. */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Decode an 8-bit truecolor PNG: validate signature + chunk CRCs,
    * concatenate IDAT payloads, inflate, un-filter each scanline.
    * Throws IllegalArgumentException on malformed or unsupported
    * input. Untrusted-header hardening mirrors Bmp.decode24: dims are
    * bounds-checked with long arithmetic BEFORE any allocation sized
    * from them, and the inflater output is capped at the exact raw
    * size the header implies. */
  def decode(bytes: Array[Byte]): Image = {
    def fail(msg: String) = throw new IllegalArgumentException(s"png: $msg")
    if (bytes.length < Sig.length + 12) fail(s"too short (${bytes.length} B)")
    var i = 0
    while (i < Sig.length) {
      if (bytes(i) != Sig(i)) fail("bad signature")
      i += 1
    }
    def be32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)

    var width = 0; var height = 0
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    var pos = Sig.length
    while (!sawIend) {
      if (pos + 12 > bytes.length) fail("truncated chunk stream")
      val len = be32(pos)
      if (len < 0 || pos.toLong + 12L + len > bytes.length)
        fail(s"chunk length $len runs past end of file")
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != be32(pos + 8 + len))
        fail(s"$tag chunk CRC mismatch")
      tag match {
        case "IHDR" =>
          if (sawIhdr) fail("duplicate IHDR")
          if (len != 13) fail(s"IHDR length $len")
          width = be32(pos + 8); height = be32(pos + 12)
          if (width <= 0 || height <= 0) fail(s"bad dims ${width}x$height")
          // 3 B/pixel + 1 filter byte/row; cap total raw size to keep
          // (stride + 1) * height inside Int before any allocation
          if (width.toLong * height > (Int.MaxValue - height.toLong) / 3)
            fail(s"dims ${width}x$height too large")
          val depth = bytes(pos + 16) & 0xff
          val ctype = bytes(pos + 17) & 0xff
          if (depth != 8 || ctype != 2)
            fail(s"only 8-bit truecolor supported (depth $depth type $ctype)")
          if ((bytes(pos + 18) & 0xff) != 0) fail("bad compression method")
          if ((bytes(pos + 19) & 0xff) != 0) fail("bad filter method")
          if ((bytes(pos + 20) & 0xff) != 0) fail("interlace unsupported")
          sawIhdr = true
        case "IDAT" =>
          if (!sawIhdr) fail("IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunk — skip
      }
      pos += 12 + len
    }
    if (!sawIhdr) fail("missing IHDR")
    val stride = 3 * width
    val rawLen = (stride + 1) * height
    val raw = new Array[Byte](rawLen)
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < rawLen && !infl.finished()) {
        val n = infl.inflate(raw, got, rawLen - got)
        if (n == 0 && infl.needsInput()) fail("zlib stream truncated")
        got += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(s"corrupt zlib stream: ${e.getMessage}")
    } finally infl.end()
    if (got < rawLen) fail(s"raw data short: $got of $rawLen B")

    val rgb = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      var x = 0
      while (x < stride) {
        val fv = raw(y * (stride + 1) + 1 + x) & 0xff
        val a = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff
                else 0
        val recon = ft match {
          case 0 => fv
          case 1 => fv + a
          case 2 => fv + b
          case 3 => fv + (a + b) / 2
          case 4 => fv + paeth(a, b, c)
          case other => fail(s"scanline filter $other at row $y"); 0
        }
        rgb(y * stride + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, rgb)
  }
}
