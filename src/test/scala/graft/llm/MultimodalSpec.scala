package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Real header parsing: decodeMeta against byte-literal BMP/PNG/GIF/WAV
  * headers (endianness, signed BMP dims, magic detection, honest nulls for
  * codec-bound formats). */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] = be32(v).reverse
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def pngBytes(w: Int, h: Int): Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h)
  private def bmpBytes(w: Int, h: Int): Array[Byte] =
    "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(40) ++ le32(w) ++ le32(h)
  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ le16(w) ++ le16(h)
  private def wavBytes(channels: Int, rate: Int): Array[Byte] =
    "RIFF".getBytes ++ le32(0) ++ "WAVEfmt ".getBytes ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(rate)

  private def decode(payloads: Seq[Array[Byte]]) =
    payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "payload")
      .select(F.col("id"), Multimodal.decodeMeta(F.col("payload")).as("m"))
      .orderBy("id")
      .select("id", "m.format", "m.width", "m.height", "m.sample_rate",
        "m.channels", "m.n_bytes")
      .collect()

  behavior of "decodeMeta"

  it should "parse PNG/BMP/GIF dimensions and WAV audio shape from real headers" in {
    val rows = decode(Seq(
      pngBytes(320, 200),
      bmpBytes(640, 480),
      gifBytes(13, 37),
      wavBytes(channels = 2, rate = 44100)))
    rows(0).getString(1) shouldBe "png"
    (rows(0).getInt(2), rows(0).getInt(3)) shouldBe ((320, 200))
    rows(1).getString(1) shouldBe "bmp"
    (rows(1).getInt(2), rows(1).getInt(3)) shouldBe ((640, 480))
    rows(2).getString(1) shouldBe "gif"
    (rows(2).getInt(2), rows(2).getInt(3)) shouldBe ((13, 37))
    rows(3).getString(1) shouldBe "wav"
    rows(3).isNullAt(2) shouldBe true // no pixel dims for audio
    (rows(3).getInt(4), rows(3).getInt(5)) shouldBe ((44100, 2))
  }

  it should "pass BMP's signed int32 dims through (negative = top-down rows)" in {
    val rows = decode(Seq(bmpBytes(1920, -1080)))
    (rows(0).getInt(2), rows(0).getInt(3)) shouldBe ((1920, -1080))
  }

  it should "detect codec-bound formats by magic with null dims, never fabricate" in {
    val jpeg = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte) ++ Array.fill[Byte](8)(1)
    val webp = "RIFF".getBytes ++ le32(0) ++ "WEBP".getBytes ++ Array.fill[Byte](8)(0)
    val junk = "just some text".getBytes
    val rows = decode(Seq(jpeg, webp, junk))
    rows.map(_.getString(1)) shouldBe Array("jpeg", "webp", "unknown")
    rows.foreach { r =>
      r.isNullAt(2) shouldBe true
      r.isNullAt(3) shouldBe true
      r.isNullAt(4) shouldBe true
    }
  }

  it should "never misparse a payload shorter than its magic's header" in {
    // a PNG signature with a truncated IHDR must not read past the bytes
    val short = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val rows = decode(Seq(short, Array.empty[Byte]))
    rows(0).getString(1) shouldBe "unknown"
    rows(1).getString(1) shouldBe "unknown"
    rows(1).getInt(6) shouldBe 0
  }
}
