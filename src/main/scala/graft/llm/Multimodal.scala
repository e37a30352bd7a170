package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample shapes.
 *
 * `decodeMeta` REALLY parses the pure-JVM-decodable header formats — BMP,
 * PNG, GIF (pixel dimensions) and WAV (sample rate / channels) live at
 * fixed byte offsets, no codec needed. JPEG/WebP are detected by magic but
 * their dimensions sit in variable-position segments (a marker walk, not a
 * fixed offset) and full pixel/audio DECODE is codec-bound — those stay
 * honestly out of scope here; swap in a pandas UDF over mapInPandas with
 * PIL/torchaudio in production, every other part of the pipeline stays
 * unchanged.
 *
 * All parsing is codegen'd string/arithmetic ops over `hex(payload)` —
 * one scan, no UDF, stays inside whole-stage codegen.
 */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of a text column —
    * in production this is the raw media blob read from object storage). */
  def attachBinary(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, F.encode(F.col(srcCol), "utf-8"))

  /** Hex digits of byte `i` (0-based) of a hex-encoded binary. */
  private def byteHex(hx: Column, i: Int): Column = F.substring(hx, 2 * i + 1, 2)

  /** Unsigned little-endian integer of `n` bytes at byte offset `off`. */
  private def leUInt(hx: Column, off: Int, n: Int): Column =
    F.conv(F.concat((off + n - 1 to off by -1).map(byteHex(hx, _)): _*), 16, 10)
      .cast("long")

  /** Unsigned big-endian integer of `n` bytes at byte offset `off`. */
  private def beUInt(hx: Column, off: Int, n: Int): Column =
    F.conv(F.concat((off until off + n).map(byteHex(hx, _)): _*), 16, 10)
      .cast("long")

  /** Reinterpret an unsigned 32-bit value as signed (BMP width/height are
    * int32; a negative height means a top-down bitmap). */
  private def asInt32(v: Column): Column =
    F.when(v >= 2147483648L, v - 4294967296L).otherwise(v)

  /**
   * Typed metadata struct parsed from the payload header:
   * `(n_bytes, format, width, height, sample_rate, channels)`.
   * Dimensions are real for BMP/PNG/GIF, audio shape is real for WAV;
   * JPEG/WebP are magic-detected with null dimensions (see object doc);
   * anything else is `format = "unknown"` with null typed fields — never
   * a fabricated value.
   */
  def decodeMeta(bin: Column): Column = {
    val nBytes = F.octet_length(bin)
    // every parsed field lives in the first 28 bytes — hex only that
    // prefix, never the payload (a media blob is MBs; hexing it whole
    // would do 100,000x the work of the header read and double the
    // per-row memory)
    val hx = F.hex(F.substring(bin, 1, 28))
    val isPng = hx.startsWith("89504E470D0A1A0A") && nBytes >= 24
    val isBmp = hx.startsWith("424D") && nBytes >= 26
    val isGif = (hx.startsWith("474946383961") || hx.startsWith("474946383761")) &&
      nBytes >= 10
    val isWav = hx.startsWith("52494646") && nBytes >= 28 &&
      F.substring(hx, 17, 8) === "57415645" && // "WAVE" at byte 8
      F.substring(hx, 25, 8) === "666D7420"    // "fmt " chunk at byte 12
    val isJpeg = hx.startsWith("FFD8FF")
    val isWebp = hx.startsWith("52494646") && nBytes >= 16 &&
      F.substring(hx, 17, 8) === "57454250"    // "WEBP" at byte 8
    val format = F.when(isPng, "png").when(isBmp, "bmp").when(isGif, "gif")
      .when(isWav, "wav").when(isWebp, "webp").when(isJpeg, "jpeg")
      .otherwise("unknown")
    // PNG IHDR: width/height BE32 at bytes 16/20. BMP BITMAPINFOHEADER:
    // signed LE32 at 18/22. GIF logical screen: LE16 at 6/8.
    val width = F.when(isPng, beUInt(hx, 16, 4))
      .when(isBmp, asInt32(leUInt(hx, 18, 4)))
      .when(isGif, leUInt(hx, 6, 2))
    val height = F.when(isPng, beUInt(hx, 20, 4))
      .when(isBmp, asInt32(leUInt(hx, 22, 4)))
      .when(isGif, leUInt(hx, 8, 2))
    // WAV fmt chunk: channels LE16 at byte 22, sample rate LE32 at byte 24
    val sampleRate = F.when(isWav, leUInt(hx, 24, 4))
    val channels = F.when(isWav, leUInt(hx, 22, 2))
    F.struct(
      nBytes.as("n_bytes"),
      format.as("format"),
      width.cast("int").as("width"),
      height.cast("int").as("height"),
      sampleRate.cast("int").as("sample_rate"),
      channels.cast("int").as("channels"))
  }

  /** Frame sampling shape: logical frame offsets every `frameBytes` bytes —
    * with a real codec this is timestamp-based frame extraction; the
    * partition/batch geometry is identical. */
  def sampleFrames(bin: Column, frameBytes: Int, maxFrames: Int): Column = {
    require(frameBytes > 0, s"frameBytes must be > 0, got $frameBytes")
    val n = F.octet_length(bin)
    // integer ceil-div; Column./ is double division, so floor+cast back
    val count = F.least(F.floor((n + frameBytes - 1) / frameBytes).cast("int"),
      F.lit(maxFrames))
    F.when(n === 0, F.array().cast("array<struct<offset:int,size:int>>"))
      .otherwise(F.transform(F.sequence(F.lit(0), count - 1), i =>
        F.struct(
          (i * frameBytes).as("offset"),
          F.least(F.lit(frameBytes), n - i * frameBytes).as("size"))))
  }

  /** Full multimodal pass over a corpus: payload + metadata + frame index.
    * One scan, no shuffle. */
  def extract(df: DataFrame, srcCol: String, frameBytes: Int = 256,
              maxFrames: Int = 16): DataFrame = {
    val withBin = attachBinary(df, srcCol)
    withBin
      .withColumn("meta", decodeMeta(F.col("payload")))
      .withColumn("frames", sampleFrames(F.col("payload"), frameBytes, maxFrames))
  }
}
