package graft.multimodal

/** Pure-JVM RIFF/WAVE PCM16 mono codec — the audio sibling of [[Bmp]]
  * (round 10): qm7 proved little-endian WAV HEADER parsing with SQL
  * byte slicing; this takes the audio modality to the qm9/qm10
  * standard — a real encoder and an INDEPENDENT chunk-walking decoder
  * on the executor path, so qm11's fingerprints come from decoded
  * sample values, not from the generation formula.
  *
  * Format: canonical RIFF container — "RIFF" [size] "WAVE", a "fmt "
  * chunk (PCM tag 1, mono, 16-bit, little-endian fields), a "data"
  * chunk of int16 LE samples. The DECODER walks chunks generically
  * (any chunk order, unknown chunks skipped, odd-size padding honored
  * per the RIFF spec), so a decode bug cannot be masked by the
  * encoder's fixed layout — the same independence argument as Bmp.
  */
object Wav {

  /** Encode mono int16 samples as a canonical 44-byte-header WAV. */
  def encode16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
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
    def putTag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    putTag(0, "RIFF"); put32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16)
    put16(20, 1)                       // PCM
    put16(22, 1)                       // mono
    put32(24, sampleRate)
    put32(28, sampleRate * 2)          // byte rate
    put16(32, 2)                       // block align
    put16(34, 16)                      // bits per sample
    putTag(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(45 + 2 * i) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Decode a PCM16 mono WAV by WALKING the RIFF chunks (any order,
    * unknown chunks skipped, odd sizes padded). Throws
    * IllegalArgumentException on non-WAV or unsupported variants. */
  def decode16(bytes: Array[Byte]): Audio = {
    def fail(msg: String) = throw new IllegalArgumentException(s"wav: $msg")
    def get32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def get16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def tag(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    if (bytes.length < 12) fail(s"too short (${bytes.length} B)")
    if (tag(0) != "RIFF") fail("missing RIFF magic")
    if (tag(8) != "WAVE") fail("not a WAVE form")
    var off = 12
    var rate = -1
    var fmtOk = false
    var data: Audio = null
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val size = get32(off + 4)
      // LONG arithmetic: a claimed size near 2^31 would wrap
      // `off + 8 + size` negative and slip past an int comparison
      if (size < 0 || off.toLong + 8L + size > bytes.length)
        fail(s"chunk '$id' runs past end of file")
      if (id == "fmt ") {
        if (size < 16) fail(s"fmt chunk $size B unsupported")
        if (get16(off + 8) != 1) fail("non-PCM format unsupported")
        if (get16(off + 10) != 1) fail("only mono supported")
        if (get16(off + 22) != 16) fail("only 16-bit supported")
        rate = get32(off + 12)
        fmtOk = true
      } else if (id == "data") {
        if (!fmtOk) fail("data chunk before fmt chunk")
        if (size % 2 != 0) fail("odd data size for 16-bit samples")
        val n = size / 2
        val s = new Array[Short](n)
        var i = 0
        while (i < n) {
          s(i) = ((bytes(off + 8 + 2 * i) & 0xff)
            | (bytes(off + 9 + 2 * i) << 8)).toShort
          i += 1
        }
        data = Audio(rate, s)
      }
      // RIFF chunks are word-aligned: odd sizes carry one pad byte
      off += 8 + size + (size % 2)
    }
    if (data == null) fail("no data chunk")
    data
  }
}
