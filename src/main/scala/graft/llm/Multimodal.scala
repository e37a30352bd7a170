package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample shapes.
 *
 * `decodeMeta` REALLY parses the pure-JVM-decodable headers:
 *  - BMP, PNG, GIF pixel dimensions and WAV sample rate / channels at their
 *    fixed byte offsets;
 *  - WebP dimensions for all three chunk layouts (VP8 lossy frame header,
 *    VP8L lossless bitstream, VP8X extended canvas) — fixed offsets inside
 *    the first RIFF chunk;
 *  - JPEG dimensions via a BOUNDED SOF-marker walk (up to `JpegMaxSegments`
 *    segments within the first `JpegPrefixBytes` bytes) expressed as an
 *    `aggregate` fold — an iterative expression, no UDF. JPEGs whose SOF
 *    sits beyond the prefix (e.g. behind a multi-KB EXIF APP1) return null
 *    dimensions, honestly, rather than a guess.
 *
 * Assumptions, stated rather than silent: WAV rate/channels are read only
 * when the `fmt ` chunk is at byte 12 (the overwhelmingly common layout);
 * a spec-legal RIFF/WAVE with a leading JUNK/LIST chunk still classifies
 * as `wav` but with null audio fields. BMP dimensions are read only when
 * the DIB header size field is a known BITMAPCOREHEADER/INFOHEADER variant,
 * so a random "BM"-prefixed payload is not parsed into garbage dims. Full
 * pixel/audio DECODE is codec-bound and out of scope: swap in a pandas UDF
 * over mapInPandas with PIL/torchaudio in production — every other part of
 * the pipeline stays unchanged.
 *
 * Fixed-offset parsing is codegen'd string/arithmetic ops over a 30-byte
 * `hex(payload)` prefix — one scan, no UDF, whole-stage codegen. The JPEG
 * walk uses `aggregate` (a higher-order function, interpreted lambda) over
 * a 512-byte prefix, evaluated only on rows whose magic says JPEG.
 */
object Multimodal {

  /** JPEG SOF search is bounded to this many leading bytes … */
  val JpegPrefixBytes = 512
  /** … and this many marker-segment hops. */
  val JpegMaxSegments = 12

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

  /** JPEG SOF markers (SOF0..15 minus DHT C4 / JPG C8 / DAC CC): the
    * segment whose payload is `precision(1) height(BE16) width(BE16) ...`. */
  private val JpegSofMarkers =
    Seq("C0", "C1", "C2", "C3", "C5", "C6", "C7", "C9", "CA", "CB", "CD", "CE", "CF")
  /** Markers that end the header scan: SOS (entropy data follows), EOI,
    * a stray SOI, and the standalone (length-less) TEM/RSTn markers the
    * walk cannot step over. */
  private val JpegHaltMarkers =
    Seq("DA", "D9", "D8", "01", "D0", "D1", "D2", "D3", "D4", "D5", "D6", "D7")

  /** `(width, height)` from a JPEG's SOF segment, found by a bounded marker
    * walk over `hx` (the hex of the first `JpegPrefixBytes` bytes): start at
    * byte 2, hop `FF xx | len(BE16) | payload` segments until a SOF marker,
    * a halt marker, a malformed length, or the prefix/segment budget runs
    * out. Expressed as one `aggregate` fold so the expression tree is linear
    * in `JpegMaxSegments` (a hand-unrolled chain would duplicate the offset
    * subtree exponentially). */
  private def jpegDims(hx: Column, nBytes: Column): (Column, Column) = {
    def byteAt(o: Column): Column = hx.substr(o * 2 + 1, F.lit(2))
    def be16At(o: Column): Column = F.conv(hx.substr(o * 2 + 1, F.lit(4)), 16, 10).cast("long")
    val limit = F.least(F.lit(JpegPrefixBytes.toLong), nBytes.cast("long"))
    val init = F.struct(
      F.lit(2L).as("off"), F.lit(null).cast("long").as("w"),
      F.lit(null).cast("long").as("h"), F.lit(false).as("dead"))
    val folded = F.aggregate(
      F.sequence(F.lit(1), F.lit(JpegMaxSegments)), init, (acc, _) => {
        val off = acc.getField("off")
        val w = acc.getField("w")
        val dead = acc.getField("dead")
        val done = dead || w.isNotNull
        val canRead = off + 4 <= limit          // marker(2) + length(2)
        val m1 = byteAt(off + 1)
        val isMarker = byteAt(off) === "FF"
        val isSof = isMarker && m1.isin(JpegSofMarkers: _*)
        val sofReadable = off + 9 <= limit      // height/width at off+5..off+8
        val segLen = be16At(off + 2)
        val hit = !done && canRead && isSof && sofReadable
        F.struct(
          F.when(done || isSof, off).otherwise(off + 2 + segLen).as("off"),
          F.when(done, w).when(hit, be16At(off + 7)).as("w"),
          F.when(done, acc.getField("h")).when(hit, be16At(off + 5)).as("h"),
          (done || (dead || !canRead || !isMarker || (isSof && !sofReadable) ||
            m1.isin(JpegHaltMarkers: _*) || segLen < 2 || segLen.isNull))
            .as("dead"))
      })
    (folded.getField("w"), folded.getField("h"))
  }

  /**
   * Typed metadata struct parsed from the payload header:
   * `(n_bytes, format, width, height, sample_rate, channels)`.
   * Dimensions are real for BMP/PNG/GIF/WebP(VP8|VP8L|VP8X)/JPEG (bounded
   * SOF walk — see object doc), audio shape is real for WAV with the
   * standard fmt-at-12 layout; anything else is `format = "unknown"` with
   * null typed fields — never a fabricated value.
   */
  def decodeMeta(bin: Column): Column = {
    val nBytes = F.octet_length(bin)
    // every fixed-offset field lives in the first 30 bytes — hex only that
    // prefix, never the payload (a media blob is MBs; hexing it whole
    // would do 100,000x the work of the header read and double the
    // per-row memory)
    val hx = F.hex(F.substring(bin, 1, 30))
    val isPng = hx.startsWith("89504E470D0A1A0A") && nBytes >= 24
    val isBmp = hx.startsWith("424D") && nBytes >= 26
    val isGif = (hx.startsWith("474946383961") || hx.startsWith("474946383761")) &&
      nBytes >= 10
    val isRiff = hx.startsWith("52494646")
    // "wav" on RIFF/WAVE alone; rate/channels additionally need the "fmt "
    // chunk at byte 12 (spec-legal files with a leading JUNK/LIST chunk
    // classify correctly but keep null audio fields — see object doc)
    val isWav = isRiff && nBytes >= 12 &&
      F.substring(hx, 17, 8) === "57415645"    // "WAVE" at byte 8
    val wavFmtAt12 = isWav && nBytes >= 28 &&
      F.substring(hx, 25, 8) === "666D7420"    // "fmt " chunk at byte 12
    val isJpeg = hx.startsWith("FFD8FF")
    val isWebp = isRiff && nBytes >= 16 &&
      F.substring(hx, 17, 8) === "57454250"    // "WEBP" at byte 8
    val format = F.when(isPng, "png").when(isBmp, "bmp").when(isGif, "gif")
      .when(isWav, "wav").when(isWebp, "webp").when(isJpeg, "jpeg")
      .otherwise("unknown")
    // BMP: only trust dims when the DIB header size field (LE32 at 14) is a
    // known variant — a random "BM"-prefixed payload stays format=bmp with
    // null dims instead of garbage. CORE (size 12): LE16 dims at 18/20;
    // INFO family: signed LE32 at 18/22.
    val dibSize = leUInt(hx, 14, 4)
    val bmpCore = isBmp && dibSize === 12L
    val bmpInfo = isBmp && dibSize.isin(40L, 52L, 56L, 64L, 108L, 124L)
    // WebP: first chunk fourcc at bytes 12-15 picks the layout.
    //  VP8  (lossy):   sync 9D 01 2A at 23-25, then 14-bit dims in LE16s
    //                  at 26/28 (needs 30 bytes)
    //  VP8L (lossless): sig 0x2F at 20, then 2x14 bits packed LE starting
    //                  at 21: w-1 = bits[0:14), h-1 = bits[14:28)
    //  VP8X (extended): 24-bit LE canvas w-1/h-1 at 24/27 (needs 30 bytes)
    val webpChunk = F.substring(hx, 25, 8)
    val webpVp8 = isWebp && nBytes >= 30 && webpChunk === "56503820" &&
      F.substring(hx, 47, 6) === "9D012A"
    val webpVp8l = isWebp && nBytes >= 25 && webpChunk === "5650384C" &&
      byteHex(hx, 20) === "2F"
    val webpVp8x = isWebp && nBytes >= 30 && webpChunk === "56503858"
    val vp8lBits = leUInt(hx, 21, 4)
    // JPEG: bounded SOF walk over a larger prefix, hexed (and folded) only
    // on rows whose magic says JPEG — When evaluates branches lazily
    val (jw, jh) = jpegDims(F.hex(F.substring(bin, 1, JpegPrefixBytes)), nBytes)
    // PNG IHDR: width/height BE32 at bytes 16/20. BMP: see above. GIF
    // logical screen: LE16 at 6/8.
    val width = F.when(isPng, beUInt(hx, 16, 4))
      .when(bmpCore, leUInt(hx, 18, 2))
      .when(bmpInfo, asInt32(leUInt(hx, 18, 4)))
      .when(isGif, leUInt(hx, 6, 2))
      .when(webpVp8, leUInt(hx, 26, 2).bitwiseAND(0x3FFF))
      .when(webpVp8l, vp8lBits.bitwiseAND(0x3FFF) + 1L)
      .when(webpVp8x, leUInt(hx, 24, 3) + 1L)
      .when(isJpeg, jw)
    val height = F.when(isPng, beUInt(hx, 20, 4))
      .when(bmpCore, leUInt(hx, 20, 2))
      .when(bmpInfo, asInt32(leUInt(hx, 22, 4)))
      .when(isGif, leUInt(hx, 8, 2))
      .when(webpVp8, leUInt(hx, 28, 2).bitwiseAND(0x3FFF))
      .when(webpVp8l, F.shiftright(vp8lBits, 14).bitwiseAND(0x3FFF) + 1L)
      .when(webpVp8x, leUInt(hx, 27, 3) + 1L)
      .when(isJpeg, jh)
    // WAV fmt chunk: channels LE16 at byte 22, sample rate LE32 at byte 24
    val sampleRate = F.when(wavFmtAt12, leUInt(hx, 24, 4))
    val channels = F.when(wavFmtAt12, leUInt(hx, 22, 2))
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
