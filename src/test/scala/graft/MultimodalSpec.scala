package graft

import java.nio.charset.StandardCharsets

import graft.queries.Multimodal

/** The GRFT1 container contract behind m35–m38: pack/parse round-trip,
  * generator-contract header fields, and loud rejection of corrupt bytes.
  * The queries' decode passes all go through [[Multimodal.parseHeader]],
  * so this is the byte-level truth the DuckDB oracles predict from `text`.
  */
class MultimodalSpec extends SparkTestBase {

  private def pack(s: String): Array[Byte] =
    Multimodal.packPayload(s.getBytes(StandardCharsets.UTF_8))

  test("pack/parse round-trips the header for bodies of many sizes") {
    // sizes straddling every field's arithmetic: empty, u16 width wrap
    // (640), height cycle (480·k/7 neighborhoods), multi-byte body_len
    val sizes = Seq(0, 1, 2, 3, 15, 16, 17, 639, 640, 641, 479, 480,
      65535, 65536, 70000)
    sizes.foreach { n =>
      val body = Array.fill[Byte](n)(('a' + n % 26).toByte)
      val p = Multimodal.packPayload(body)
      assert(p.length == Multimodal.HeaderLen + n)
      val h = Multimodal.parseHeader(p)
      assert(h.bodyLen == n.toLong, s"bodyLen for n=$n")
      assert(h.width == n % 640, s"width for n=$n")
      assert(h.height == n.toLong * 7 % 480, s"height for n=$n")
      assert(h.channels == n % 3 + 1, s"channels for n=$n")
      // body preserved byte-for-byte after the header
      assert(p.drop(Multimodal.HeaderLen).sameElements(body))
    }
  }

  test("parseHeader rejects corrupt payloads loudly") {
    val good = pack("hello world")
    // wrong magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.parseHeader(badMagic))
    // unsupported version
    val badVer = good.clone(); badVer(4) = 9
    intercept[IllegalArgumentException](Multimodal.parseHeader(badVer))
    // truncated body (length field no longer matches)
    intercept[IllegalArgumentException](Multimodal.parseHeader(good.dropRight(1)))
    // shorter than a header at all
    intercept[IllegalArgumentException](Multimodal.parseHeader(Array[Byte](1, 2, 3)))
  }

  test("little-endian field encoding is genuinely positional") {
    // body_len = 0x12345 → bytes 10..13 = 45 23 01 00; width/height/channels
    // checked at exact offsets so a layout drift can't hide behind parseHeader
    val n = 0x12345
    val p = Multimodal.packPayload(new Array[Byte](n))
    assert((p(10) & 0xff) == 0x45 && (p(11) & 0xff) == 0x23 &&
      (p(12) & 0xff) == 0x01 && (p(13) & 0xff) == 0x00)
    val w = n % 640
    assert((p(5) & 0xff) == (w & 0xff) && (p(6) & 0xff) == (w >> 8))
    val h = n.toLong * 7 % 480
    assert((p(7) & 0xff) == (h & 0xff).toInt && (p(8) & 0xff) == (h >> 8).toInt)
    assert((p(9) & 0xff) == n % 3 + 1)
  }
}
