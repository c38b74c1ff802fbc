package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extraction as batched per-partition transforms.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is STUBBED: [[decodeImageStub]] produces deterministic fake
  * features derived from the bytes (clearly marked). Everything around it —
  * schema, batching, partitioning, null handling — is real and tested, so a
  * real codec drops in by replacing one function.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wraps a binary payload column into (media, meta) columns; metadata that
    * is derivable without decoding (byte length, sniffed format) is computed
    * natively. */
  def withMediaColumns(df: DataFrame, payload: Column, format: Column): DataFrame =
    df.withColumn("media", payload)
      .withColumn("meta", struct(
        format.as("format"),
        lit(null).cast(IntegerType).as("width"), // unknown until decode
        lit(null).cast(IntegerType).as("height"),
        octet_length(payload).cast(LongType).as("n_bytes")))

  /** Cheap, decode-free payload features — all native expressions. */
  def payloadFeatures(media: Column): Column = struct(
    octet_length(media).cast(LongType).as("n_bytes"),
    xxhash64(media).as("content_hash"),
    sha2(media, 256).as("sha256"))

  /** STUB image decode. A real implementation would JNI into a codec per
    * partition; this deterministic fake derives pseudo-dimensions from the
    * content hash so downstream logic (resize planning, aspect filtering,
    * batch shaping) is exercisable end-to-end. Marked unimplemented on
    * purpose — replace `fakeDecode` with the codec call.
    */
  def decodeImageStub(df: DataFrame, mediaCol: String): DataFrame = {
    val fakeW = (abs(xxhash64(col(mediaCol))) % 3840 + 16).cast(IntegerType)
    val fakeH = (abs(xxhash64(col(mediaCol), lit(1))) % 2160 + 16).cast(IntegerType)
    df.withColumn("decoded", struct(
      fakeW.as("width"),
      fakeH.as("height"),
      lit("FAKE-DECODE").as("codec") // marker: not a real decode
    ))
  }

  /** Resize plan (real logic over stubbed dimensions): target the longest
    * side to `maxSide` keeping aspect, never upscaling. */
  def resizePlan(decoded: Column, maxSide: Int): Column = {
    val w = decoded.getField("width"); val h = decoded.getField("height")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h).cast("double"))
    struct(
      round(w * scale).cast(IntegerType).as("target_width"),
      round(h * scale).cast(IntegerType).as("target_height"),
      scale.as("scale"))
  }

  /** Deterministic frame sampling for video-like payloads: pick `n` frame
    * indices evenly spaced in [0, frameCount). */
  def sampleFrameIndices(frameCount: Column, n: Int): Column =
    when(frameCount <= 0, array().cast(ArrayType(LongType)))
      .otherwise(array_distinct(transform(sequence(lit(0), lit(n - 1)),
        i => floor(i * frameCount.cast("double") / n).cast(LongType))))

  /** Batched feature extraction through a real `mapPartitions` boundary:
    * demonstrates the partition-iterator shape a native codec integration
    * uses (amortized per-partition init), while the per-row "model" is the
    * deterministic fake. */
  def extractFeaturesBatched(df: DataFrame, mediaCol: String, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("feature_vec", ArrayType(DoubleType), nullable = false))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition init happens HERE (codec/model load in a real impl)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](mediaIdx)
          val feat = fakeEmbedding(bytes, 8)
          Row.fromSeq(row.toSeq :+ feat.toSeq)
        }
      }
    }(encoder)
  }

  /** Deterministic fake embedding from bytes (stands in for a model forward
    * pass). */
  private def fakeEmbedding(bytes: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    if (bytes == null) return out
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xFF) / 255.0
      i += 1
    }
    out
  }
}
