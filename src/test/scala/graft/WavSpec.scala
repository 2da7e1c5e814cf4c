package graft

import graft.multimodal.Wav
import org.scalatest.funsuite.AnyFunSuite

/** Pins the RIFF/WAVE PCM16 FORMAT itself, independently of the
  * encoder: hand-assembled golden bytes (including a container with an
  * extra unknown chunk and an odd-size pad) must decode to known
  * samples — the qm11 gate's independence argument — plus round-trip
  * and rejection properties. */
class WavSpec extends AnyFunSuite {

  /** Hand-built canonical WAV: 8000 Hz mono, samples [1, -2, 300]. */
  private val golden: Array[Byte] = {
    def le32(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff,
      (v >> 16) & 0xff, (v >> 24) & 0xff)
    def le16(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff)
    def tag(s: String) = s.map(_.toInt).toArray
    (tag("RIFF") ++ le32(36 + 6) ++ tag("WAVE") ++
      tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      tag("data") ++ le32(6) ++
      le16(1) ++ le16(0xFFFE) ++ le16(300) // 1, -2, 300 as int16 LE
    ).map(_.toByte)
  }

  test("golden hand-built WAV decodes to the spec'd samples") {
    val au = Wav.decode16(golden)
    assert(au.sampleRate === 8000)
    assert(au.samples.toSeq === Seq[Short](1, -2, 300))
  }

  test("decoder walks unknown chunks (odd size + pad byte) before data") {
    // splice a 3-byte 'LIST' chunk (odd size => 1 pad byte) after fmt
    def le32(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff,
      (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)
    val extra = "LIST".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte](9, 9, 9, 0) // 3 payload + 1 pad
    val spliced = golden.take(36) ++ extra ++ golden.drop(36)
    // patch RIFF size
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    val au = Wav.decode16(spliced)
    assert(au.sampleRate === 8000 && au.samples.toSeq === Seq[Short](1, -2, 300))
  }

  test("encode/decode round-trips including negative samples and rates") {
    for (n <- Seq(0, 1, 7, 528); rate <- Seq(8000, 16000, 44100)) {
      val s = Array.tabulate(n)(i => ((i * 7919 + 13) % 65536 - 32768).toShort)
      val au = Wav.decode16(Wav.encode16(rate, s))
      assert(au.sampleRate === rate)
      assert(au.samples.sameElements(s), s"n=$n rate=$rate")
    }
  }

  test("rejects overflow-adversarial chunk sizes (int wrap cannot slip the bound)") {
    // claimed data size near 2^31: off + 8 + size wraps negative in
    // int arithmetic; the long-arithmetic bound must reject it
    val evil = golden.clone()
    evil(40) = -8; evil(41) = -1; evil(42) = -1; evil(43) = 0x7f
    assertThrows[IllegalArgumentException](Wav.decode16(evil))
  }

  test("rejects non-WAV and unsupported variants") {
    def bad(mut: Array[Byte]): Unit =
      assertThrows[IllegalArgumentException](Wav.decode16(mut))
    bad(Array[Byte](1, 2, 3))
    val wrongForm = golden.clone(); wrongForm(8) = 'X'
    bad(wrongForm)
    val stereo = golden.clone(); stereo(22) = 2
    bad(stereo)
    val bits8 = golden.clone(); bits8(34) = 8
    bad(bits8)
    val nonPcm = golden.clone(); nonPcm(20) = 3
    bad(nonPcm)
    bad(golden.take(golden.length - 1)) // truncated data chunk
  }
}
