package graft.multimodal

/** Pure-JVM baseline TIFF codec (uncompressed 8-bit RGB, single strip)
  * — the BYTE-ORDER member of the real-codec family: BMP/WAV/PNG are
  * all little-endian-only formats, so none of those decoders proves
  * the executor path handles a big-endian container. TIFF is the
  * classic dual-order format ("II" little / "MM" big, magic 42), and
  * its inline-value rule is the classic endianness trap: a SHORT tag
  * value occupies the FIRST two bytes of the 4-byte value field in
  * the FILE's byte order — a decoder that blindly reads the field as
  * u32 on a big-endian file sees value·65536.
  *
  * Format coverage (baseline TIFF 6.0, the shape every scanner
  * emits): 8-byte header (order marker, magic, IFD offset), one IFD
  * (count, 12-byte entries sorted by tag, next-IFD = 0), tags
  * 256/257 ImageWidth/Length (SHORT), 258 BitsPerSample (3×SHORT via
  * offset), 259 Compression = 1, 262 Photometric = 2 (RGB),
  * 273 StripOffsets, 277 SamplesPerPixel = 3, 278 RowsPerStrip,
  * 279 StripByteCounts; pixel data one packed row-major RGB strip
  * (TIFF strips carry no row padding — unlike BMP).
  *
  * Encoder and decoder are written against the spec independently
  * (no shared layout constants beyond the public format): the decoder
  * re-derives everything from the header — byte order per read,
  * IFD offset as stored (never assumed 8), SHORT-vs-LONG per entry
  * type — so a mirrored encode/decode bug cannot hide (the Bmp
  * convention). Untrusted header fields are bounds-checked BEFORE any
  * allocation (the round-10 Bmp/Wav hardening convention).
  *
  * Scale shape: both directions are row-local byte work inside one
  * mapPartitions stage; payload bytes never shuffle.
  */
case class TiffImage(width: Int, height: Int, rgb: Array[Byte],
                     bigEndian: Boolean)

/** qm13's fixed-width per-image feature row (INT64-exact so the
  * DuckDB oracle replays it from the pixel formula). */
case class TiffFeat(doc_id: Long, w: Long, h: Long, big_endian: Long,
                    n_bytes: Long, sum_r: Long, sum_g: Long,
                    sum_b: Long, wsum: Long)

object Tiff {

  /** Encode row-major top-down RGB pixels as baseline TIFF in the
    * requested byte order. Layout: header(8) + IFD(2+9·12+4) +
    * BitsPerSample array(6) + strip(3·w·h) = 128 + 3·w·h bytes. */
  def encodeRgb(width: Int, height: Int, rgb: Array[Byte],
                bigEndian: Boolean): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"need ${3 * width * height} rgb bytes, got ${rgb.length}")
    val ifdOff = 8
    val nTags = 9
    val bpsOff = ifdOff + 2 + nTags * 12 + 4 // 122, even
    val stripOff = bpsOff + 6                // 128
    val out = new Array[Byte](stripOff + rgb.length)
    def put16(off: Int, v: Int): Unit =
      if (bigEndian) {
        out(off) = ((v >>> 8) & 0xff).toByte; out(off + 1) = (v & 0xff).toByte
      } else {
        out(off) = (v & 0xff).toByte; out(off + 1) = ((v >>> 8) & 0xff).toByte
      }
    def put32(off: Int, v: Int): Unit =
      if (bigEndian) { put16(off, v >>> 16); put16(off + 2, v & 0xffff) }
      else { put16(off, v & 0xffff); put16(off + 2, v >>> 16) }
    // header
    out(0) = if (bigEndian) 'M' else 'I'
    out(1) = out(0)
    put16(2, 42)
    put32(4, ifdOff)
    // IFD
    put16(ifdOff, nTags)
    var e = ifdOff + 2
    // a SHORT's inline value sits in the FIRST two bytes of the value
    // field in the file's byte order; the remaining two bytes are zero
    def entryShort(tag: Int, v: Int): Unit = {
      put16(e, tag); put16(e + 2, 3); put32(e + 4, 1); put16(e + 8, v)
      e += 12
    }
    def entryLong(tag: Int, v: Int): Unit = {
      put16(e, tag); put16(e + 2, 4); put32(e + 4, 1); put32(e + 8, v)
      e += 12
    }
    entryShort(256, width)
    entryShort(257, height)
    // BitsPerSample: 3 SHORTs never fit inline -> offset
    put16(e, 258); put16(e + 2, 3); put32(e + 4, 3); put32(e + 8, bpsOff)
    e += 12
    entryShort(259, 1)  // no compression
    entryShort(262, 2)  // RGB
    entryLong(273, stripOff)
    entryShort(277, 3)
    entryLong(278, height)
    entryLong(279, 3 * width * height)
    put32(e, 0) // next IFD
    put16(bpsOff, 8); put16(bpsOff + 2, 8); put16(bpsOff + 4, 8)
    System.arraycopy(rgb, 0, out, stripOff, rgb.length)
    out
  }

  private val MaxPixels = 1 << 26 // 64 Mpx guard before allocation

  /** Independent spec decoder: byte order from the marker, IFD walked
    * from the STORED offset, entry values read per their declared
    * type, untrusted sizes bounds-checked before allocation. */
  def decodeRgb(bytes: Array[Byte]): TiffImage = {
    require(bytes.length >= 8, "truncated TIFF header")
    val big = (bytes(0), bytes(1)) match {
      case ('M', 'M') => true
      case ('I', 'I') => false
      case _ => throw new IllegalArgumentException("not a TIFF byte-order marker")
    }
    def u8(o: Int): Int = bytes(o) & 0xff
    def rd16(o: Int): Int = {
      require(o >= 0 && o + 2 <= bytes.length, s"u16 read at $o out of bounds")
      if (big) (u8(o) << 8) | u8(o + 1) else (u8(o + 1) << 8) | u8(o)
    }
    def rd32(o: Int): Long = {
      require(o >= 0 && o + 4 <= bytes.length, s"u32 read at $o out of bounds")
      if (big) (rd16(o).toLong << 16) | rd16(o + 2)
      else (rd16(o + 2).toLong << 16) | rd16(o)
    }
    require(rd16(2) == 42, s"bad TIFF magic ${rd16(2)}")
    val ifd = rd32(4)
    require(ifd >= 8 && ifd + 2 <= bytes.length, s"IFD offset $ifd out of bounds")
    val n = rd16(ifd.toInt)
    require(ifd + 2 + 12L * n + 4 <= bytes.length, "IFD overruns file")
    var (w, h, comp, photo, spp) = (0L, 0L, -1L, -1L, 1L)
    var (stripOff, stripLen, bpsVal) = (-1L, -1L, -1L)
    var bpsOffOrInline = -1L
    var bpsCount = 0L
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + 12 * i
      val tag = rd16(e)
      val typ = rd16(e + 2)
      val cnt = rd32(e + 4)
      // value per declared type: SHORT inline in the FIRST two bytes,
      // LONG as the full field — the dual-order trap under test
      def scalar: Long = typ match {
        case 3 => rd16(e + 8).toLong
        case 4 => rd32(e + 8)
        case t => throw new IllegalArgumentException(s"tag $tag type $t unsupported")
      }
      tag match {
        case 256 => w = scalar
        case 257 => h = scalar
        case 258 =>
          bpsCount = cnt
          if (cnt == 1) bpsVal = scalar
          else bpsOffOrInline = rd32(e + 8)
        case 259 => comp = scalar
        case 262 => photo = scalar
        case 273 => require(cnt == 1, s"multi-strip ($cnt) unsupported"); stripOff = scalar
        case 277 => spp = scalar
        case 279 => require(cnt == 1, s"multi-strip ($cnt) unsupported"); stripLen = scalar
        case _ => () // RowsPerStrip / ancillary tags: not needed for one strip
      }
      i += 1
    }
    require(comp == 1, s"compression $comp unsupported")
    require(photo == 2 && spp == 3, s"not 8-bit RGB (photo=$photo spp=$spp)")
    if (bpsCount == 3) {
      val o = bpsOffOrInline
      require(o >= 0 && o + 6 <= bytes.length, "BitsPerSample out of bounds")
      require(rd16(o.toInt) == 8 && rd16(o.toInt + 2) == 8
        && rd16(o.toInt + 4) == 8, "BitsPerSample != 8,8,8")
    } else require(bpsVal == 8, s"BitsPerSample $bpsVal unsupported")
    // bound each dimension BEFORE multiplying: w and h are unsigned
    // 32-bit reads, so a crafted header can put w*h in [2^63, 2^64)
    // where the Long product wraps negative (or wraps twice back to a
    // small positive 3*w*h matching an attacker-chosen stripLen) and a
    // product-only guard passes — per-dim caps make the products exact
    require(w > 0 && h > 0 && w <= MaxPixels && h <= MaxPixels
        && w * h <= MaxPixels,
      s"implausible dims ${w}x$h")
    require(stripLen == 3 * w * h, s"strip length $stripLen != ${3 * w * h}")
    require(stripOff >= 0 && stripOff + stripLen <= bytes.length,
      "strip out of bounds")
    val rgb = new Array[Byte]((3 * w * h).toInt)
    System.arraycopy(bytes, stripOff.toInt, rgb, 0, rgb.length)
    TiffImage(w.toInt, h.toInt, rgb, big)
  }
}
