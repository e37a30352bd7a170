package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample shapes.
 *
 * The Spark-side plumbing (schema, batching, partitioning, column shapes)
 * is real; the actual media DECODE IS A STUB — the container has no
 * image/audio codecs, so `decodeMeta` derives a deterministic fake header
 * from the payload bytes. Swap `fakeHeader` for a real decoder (e.g. a
 * pandas UDF over mapInPandas with PIL/torchaudio) in production; every
 * other part of the pipeline stays unchanged.
 */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of a text column —
    * in production this is the raw media blob read from object storage). */
  def attachBinary(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, F.encode(F.col(srcCol), "utf-8"))

  /**
   * STUB decode: typed metadata struct from the payload. Real decoders
   * replace the width/height/format derivation; n_bytes stays.
   * Deterministic: derived from byte length and first byte.
   */
  def decodeMeta(bin: Column): Column = {
    val nBytes = F.octet_length(bin)
    val b0 = F.ascii(bin.cast("string").substr(1, 1))
    F.struct(
      nBytes.as("n_bytes"),
      (b0 % 640 + 64).as("width"),
      (b0 % 480 + 48).as("height"),
      F.when(nBytes % 3 === 0, "jpeg").when(nBytes % 3 === 1, "png")
        .otherwise("webp").as("format"))
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
