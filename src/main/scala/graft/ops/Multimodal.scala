package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extraction as batched per-partition transforms.
  *
  * Image decode ([[decodeImage]]) and resize ([[resizeImage]]) are REAL,
  * via the JDK's ImageIO (PNG/BMP/GIF/JPEG readers ship with the JVM);
  * audio decode ([[decodeAudio]]) parses WAV/AIFF via javax.sound. The
  * "model forward pass" in [[extractFeaturesBatched]] is a real fixed-weight
  * integer network (sum-pool + the portable +-1 linear layer), batched the
  * way a native inference integration batches — trained weights would swap
  * in as one Array without touching the plan; [[decodeImageStub]] is kept
  * for payloads in formats the JDK cannot read.
  */
/** Decoded-media structs — top-level so their encoders stay codegen-compiled
  * (case classes nested in an object become inner classes whose accessors
  * Janino cannot bind, silently dropping the projection to interpreted). */
final case class DecodedImage(width: Int, height: Int, mean_luminance: Double)

final case class SampledFrame(frame_idx: Long, n_frames: Int, frame: Array[Byte])

final case class DecodedAudio(
    sample_rate: Double, channels: Int, n_frames: Long, duration_seconds: Double)

object Multimodal {

  // BufferedImage/ImageIO work without a display, but only in headless mode
  System.setProperty("java.awt.headless", "true")
  // ImageIO's default Image{Input,Output}Stream is DISK-backed: every
  // read/write creates and deletes a temp file. Memory-backed streams cut
  // the dominant per-image cost for the KB-sized payloads this pipeline
  // decodes (a codec that needs spill-to-disk would manage it itself).
  javax.imageio.ImageIO.setUseCache(false)

  /** Per-thread reader/writer reuse: `ImageIO.read`/`write` scan the service
    * registry and instantiate a fresh codec per CALL. Readers and writers
    * are not thread-safe but are reusable, so one instance per (thread,
    * format) amortizes codec setup across a partition — the batched-decoder
    * layout, without forcing callers through mapPartitions. Formats are
    * sniffed from magic bytes; anything unrecognized falls back to the
    * generic ImageIO path. */
  private val readerCache =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
      override def initialValue() = new java.util.HashMap()
    }
  private val writerCache =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageWriter]] {
      override def initialValue() = new java.util.HashMap()
    }

  private def sniffFormat(b: Array[Byte]): String = {
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P') "png"
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) "jpeg"
    else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else null
  }

  /** Decode via a thread-cached reader; falls back to `ImageIO.read` for
    * unsniffable formats. Returns null if undecodable (same as ImageIO). */
  private[ops] def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val fmt = sniffFormat(bytes)
    if (fmt == null)
      return javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val cache = readerCache.get()
    var reader = cache.get(fmt)
    if (reader == null) {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
      if (!it.hasNext)
        return javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      reader = it.next(); cache.put(fmt, reader)
    }
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally { reader.setInput(null); iis.close() }
  }

  /** Encode via a thread-cached writer (default params — byte-identical to
    * `ImageIO.write`, which resolves the same registered writer). */
  private[ops] def writeImage(img: java.awt.image.RenderedImage,
      format: String): Array[Byte] = {
    val cache = writerCache.get()
    var writer = cache.get(format)
    if (writer == null) {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName(format)
      require(it.hasNext, s"no ImageIO writer for format $format")
      writer = it.next(); cache.put(format, writer)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
    } finally { writer.setOutput(null); ios.close() }
    bos.toByteArray
  }

  /** REAL image decode: parses the payload with ImageIO and computes
    * dimensions plus mean luminance over a bounded 32x32 sampling grid
    * (constant work per image regardless of size). Undecodable or null
    * payloads yield a null struct — the pipeline keeps flowing. */
  def decodeImage(df: DataFrame, mediaCol: String): DataFrame = {
    val decodeUdf = udf((bytes: Array[Byte]) => decodeImageBytes(bytes))
    df.withColumn("decoded", decodeUdf(col(mediaCol)))
  }

  private[ops] def decodeImageBytes(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null) return None
    try {
      val img = readImage(bytes)
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      val stepX = math.max(1, w / 32); val stepY = math.max(1, h / 32)
      var sum = 0.0; var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
            0.114 * (rgb & 0xFF)
          n += 1
          x += stepX
        }
        y += stepY
      }
      Some(DecodedImage(w, h, if (n == 0) 0.0 else sum / n))
    } catch { case _: Exception => None }
  }

  /** Average-hash (aHash) perceptual fingerprint over a REAL ImageIO
    * decode — the image NEAR-DUP signal (the text tier's MinHash
    * analogue): sample an 8x8 deterministic grid (nearest pixel at
    * (i*w div 8, j*h div 8) — integer arithmetic, no resampling filter,
    * so the fingerprint is engine-replayable), compute integer luminance
    * lum = 299 R + 587 G + 114 B per cell, and set bit k = j*8+i iff
    * lum_k * 64 > sum(lums) (strictly above the average). Returns a
    * 64-char '0'/'1' string (bit 0 first) — portable, bandable, and
    * Hamming distance IS the perceptual distance. Undecodable/null
    * payloads yield null (the [[decodeImage]] contract). Constant work
    * per image regardless of size. */
  def imageAHash(df: DataFrame, mediaCol: String): DataFrame = {
    val f = udf((bytes: Array[Byte]) => aHashBytes(bytes))
    df.withColumn("phash", f(col(mediaCol)))
  }

  private[ops] def aHashBytes(bytes: Array[Byte]): Option[String] = {
    if (bytes == null) return None
    try {
      val img = readImage(bytes)
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      val lums = new Array[Long](64)
      var total = 0L
      var k = 0
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) {
          val rgb = img.getRGB(i * w / 8, j * h / 8)
          val lum = 299L * ((rgb >> 16) & 0xFF) +
            587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
          lums(k) = lum; total += lum
          i += 1; k += 1
        }
        j += 1
      }
      val sb = new java.lang.StringBuilder(64)
      k = 0
      while (k < 64) { sb.append(if (lums(k) * 64 > total) '1' else '0'); k += 1 }
      Some(sb.toString)
    } catch { case _: Exception => None }
  }

  /** Banded Hamming near-dup over [[imageAHash]] fingerprints — the LSH
    * family's bucket join on bit slices: the 64-bit fingerprint splits
    * into `bands` equal slices, pairs sharing any slice become
    * candidates (via the shared [[Dedup.bandedCandidates]] core, so the
    * `maxBucket` hot-bucket star collapse applies verbatim), and the
    * exact Hamming distance verifies. PIGEONHOLE EXACTNESS: a pair at
    * Hamming <= bands-1 cannot differ in every slice, so for
    * `maxHamming <= bands - 1` recall is exact (the SimHash-chunk rule);
    * the op REQUIRES that inequality rather than silently under-
    * recalling. NULL fingerprints fail loud — filter undecoded rows
    * explicitly. Returns (id_a, id_b, hamming), id_a < id_b. */
  def phashNearDupPairs(df: DataFrame, idCol: String, phashCol: String,
      maxHamming: Int, bands: Int = 8, maxBucket: Int = 0): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      s"maxHamming ($maxHamming) must be <= bands - 1 (${bands - 1}) — " +
        "the pigeonhole guarantee breaks past it; raise bands for a " +
        "larger radius")
    val sliceLen = 64 / bands
    val checked = when(col(phashCol).isNull, raise_error(lit(
        "phashNearDupPairs: NULL fingerprint — undecodable payloads " +
          "yield null from imageAHash; filter them explicitly upstream"))
        .cast("string"))
      .otherwise(col(phashCol))
    val withHash = df.select(col(idCol).as("id"), checked.as("__ph"))
      .localCheckpoint(false) // banding + both verify joins share it
    val banded = withHash.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        col("__ph").substr(b * sliceLen + 1, sliceLen)): _*))
        .as(Seq("band", "bucket")))
    val candidates = Dedup.bandedCandidates(banded, maxBucket)
    val hamming = udf((a: String, b: String) => {
      var d = 0; var i = 0
      while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
      d
    })
    candidates
      .join(withHash.select(col("id").as("id_a"), col("__ph").as("__pa")), "id_a")
      .join(withHash.select(col("id").as("id_b"), col("__ph").as("__pb")), "id_b")
      .withColumn("hamming", hamming(col("__pa"), col("__pb")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** REAL resize: decodes, scales the longest side to `maxSide` (keeping
    * aspect, never upscaling — same rule as [[resizePlan]]) and re-encodes.
    * Returns null for undecodable payloads. */
  def resizeImage(df: DataFrame, mediaCol: String, maxSide: Int,
      format: String = "png"): DataFrame = {
    val resizeUdf = udf((bytes: Array[Byte]) => {
      if (bytes == null) null
      else try {
        val img = readImage(bytes)
        if (img == null) null
        else {
          val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
          val tw = math.max(1, math.round(img.getWidth * scale).toInt)
          val th = math.max(1, math.round(img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(tw, th,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.drawImage(img.getScaledInstance(tw, th, java.awt.Image.SCALE_AREA_AVERAGING),
            0, 0, null)
          g.dispose()
          writeImage(out, format)
        }
      } catch { case _: Exception => null }
    })
    df.withColumn("resized", resizeUdf(col(mediaCol)))
  }

  /** REAL audio decode: parses WAV/AIFF/AU headers via javax.sound and
    * returns sample rate, channels, frame count, and duration. */
  def decodeAudio(df: DataFrame, mediaCol: String): DataFrame = {
    val decodeUdf = udf((bytes: Array[Byte]) => {
      if (bytes == null) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        val frames = in.getFrameLength
        // validate the header's frame count against the payload: it can be
        // NOT_SPECIFIED (-1), or a lie (streamed WAVs write 0xFFFFFFFF
        // chunk sizes) — releasing it as-is reads as a negative duration
        // or a ~4.3e9-frame clip; a frame count the payload cannot hold is
        // malformed input and follows the documented None contract.
        // Bound against the DATA bytes remaining after the parser consumed
        // the header (in.available()), not the whole buffer: a header
        // overstating by up to headerBytes/frameSize frames would pass a
        // bytes.length bound
        val frameSize = fmt.getFrameSize.toLong
        val payload = in.available().toLong
        val plausible = frames >= 0 && fmt.getSampleRate > 0 &&
          (frameSize <= 0 || frames <= payload / math.max(frameSize, 1L))
        if (!plausible) None
        else Some(DecodedAudio(fmt.getSampleRate.toDouble, fmt.getChannels, frames,
          frames.toDouble / fmt.getSampleRate))
      } catch { case _: Exception => None }
    })
    df.withColumn("decoded_audio", decodeUdf(col(mediaCol)))
  }

  /** Deterministic synthetic PNG: dimensions derived from the text length
    * (w = 4 + len%13, h = 4 + (len/13)%11), pixels from the text bytes —
    * real, decodable image payloads for pipeline tests without external
    * media files. */
  def syntheticPng(text: String): Array[Byte] = {
    // CODEPOINTS, not UTF-16 units: the oracle derives the expected
    // dimensions from DuckDB len(text), which counts codepoints — an
    // astral-plane char (emoji) counts 1 there but 2 in String.length,
    // so the Java side must count the same way
    val len = if (text == null) 0 else text.codePointCount(0, text.length)
    val w = 4 + len % 13
    val h = 4 + (len / 13) % 11
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bytes = if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val v = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xFF
        img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | ((v * 7) & 0xFF))
        x += 1
      }
      y += 1
    }
    writeImage(img, "png")
  }

  /** Deterministic synthetic WAV: 8-bit mono PCM at `sampleRate`, one frame
    * per byte of the text. */
  def syntheticWav(text: String, sampleRate: Float = 16000f): Array[Byte] = {
    val data = if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 8, 1, false, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, data.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

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
    * indices evenly spaced in [0, frameCount). `n` must be positive (the
    * [[sampleFrames]] guard): n = 0 would build sequence(0, -1) — Spark's
    * DESCENDING [0, -1], not empty — and divide by zero, silently
    * returning [0, Long.MinValue] instead of an empty index set. */
  def sampleFrameIndices(frameCount: Column, n: Int): Column = {
    require(n > 0, s"n must be positive, got $n")
    when(frameCount <= 0, array().cast(ArrayType(LongType)))
      .otherwise(array_distinct(transform(sequence(lit(0), lit(n - 1)),
        i => floor(i * frameCount.cast("double") / n).cast(LongType))))
  }

  /** Synthetic multi-frame container: "GFTV" magic, int32 frame count, then
    * length-prefixed frames — stands in for a video container so the
    * frame-sampling PLUMBING (parse, offset walk, sampled explode, per-frame
    * decode) is fully real while the frame codec stays the JDK PNG decode
    * that `mm_decode_resize` oracle-verifies. */
  def syntheticVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GFTV")
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    bos.toByteArray
  }

  /** Parse a GFTV container and emit one row per SAMPLED frame — the same
    * evenly-spaced-index arithmetic as [[sampleFrameIndices]], so only the
    * n sampled frames are materialized and decoded downstream (the skipped
    * frames' bytes are never copied out of the payload). Malformed payloads
    * yield zero rows. */
  def sampleFrames(df: DataFrame, mediaCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val magic = "GFTV".getBytes("US-ASCII")
    val f = udf((bytes: Array[Byte]) => {
      if (bytes == null || bytes.length < 8 ||
        !java.util.Arrays.equals(java.util.Arrays.copyOf(bytes, 4), magic))
        Array.empty[SampledFrame]
      else {
        try {
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(bytes, 4, bytes.length - 4))
          val count = in.readInt()
          if (count <= 0) Array.empty[SampledFrame]
          else {
            // sampled indices: floor(j * count / n), distinct, ascending
            val want = new java.util.LinkedHashSet[Long]()
            var j = 0
            while (j < n) {
              want.add(math.floor(j.toDouble * count / n).toLong)
              j += 1
            }
            val out = Array.newBuilder[SampledFrame]
            var i = 0L
            var remaining = count
            while (remaining > 0) {
              val len = in.readInt()
              // validate BEFORE allocating: a corrupt/hostile length prefix
              // must not trigger a multi-GB allocation whose OutOfMemoryError
              // (an Error, not Exception) would escape the catch below and
              // kill the task instead of yielding zero rows
              if (len < 0 || len > bytes.length)
                throw new java.io.IOException(s"bad frame length $len")
              if (want.contains(i)) {
                val b = new Array[Byte](len)
                in.readFully(b)
                out += SampledFrame(i, count, b)
              } else in.skipBytes(len)
              i += 1
              remaining -= 1
            }
            out.result()
          }
        } catch { case _: Exception => Array.empty[SampledFrame] }
      }
    })
    df.withColumn("__sf", explode(f(col(mediaCol))))
      .withColumn("frame_idx", col("__sf.frame_idx"))
      .withColumn("n_frames", col("__sf.n_frames"))
      .withColumn("frame", col("__sf.frame"))
      .drop("__sf")
  }

  /** Batched model feature extraction through a real `mapPartitions`
    * boundary: the partition-iterator shape a native inference integration
    * uses (the "model" — the weight matrix — is materialized ONCE per
    * partition, exactly where a real impl would load weights or open a
    * codec; rows then flow through in `batchSize` groups, the unit a
    * batched forward pass consumes).
    *
    * The model itself is a REAL two-layer deterministic network with fixed
    * weights, all-integer so every feature is bit-exact and oracle-
    * replayable:
    *   1. sum-pool the signed byte stream into `inDim` buckets
    *      (acc[i mod inDim] += payload[i], signed int8 semantics), and
    *   2. a fixed +-1 linear layer: feature[j] = sum_i acc[i] * W[i][j],
    *      W = [[Similarity.portableSigns]] (the engine-wide portable md5
    *      +-1 matrix, Achlioptas-style Rademacher weights), accumulated
    *      in Long.
    * No sandbox weights are needed because the weights are the portable
    * matrix; swapping in trained weights changes one Array, not the plan.
    * Output column `feature_vec` is array<bigint>, nulls embed as zeros. */
  def extractFeaturesBatched(df: DataFrame, mediaCol: String,
      batchSize: Int = 64, inDim: Int = 16, outDim: Int = 8): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("feature_vec", ArrayType(LongType), nullable = false))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition init: the model weights materialize HERE, once
      val weights = Similarity.portableSigns(inDim, outDim)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](mediaIdx)
          val feat = modelForward(bytes, weights, inDim, outDim)
          Row.fromSeq(row.toSeq :+ feat.toSeq)
        }
      }
    }(encoder)
  }

  /** The fixed-weight forward pass: signed-byte sum-pool to `inDim`, then
    * the +-1 linear layer — all-Long, bit-exact. */
  private def modelForward(bytes: Array[Byte], weights: Array[Array[Int]],
      inDim: Int, outDim: Int): Array[Long] = {
    val out = new Array[Long](outDim)
    if (bytes == null) return out
    val acc = new Array[Long](inDim)
    var i = 0
    while (i < bytes.length) { acc(i % inDim) += bytes(i).toLong; i += 1 }
    var j = 0
    while (j < outDim) {
      var s = 0L; var k = 0
      while (k < inDim) { s += acc(k) * weights(k)(j); k += 1 }
      out(j) = s
      j += 1
    }
    out
  }
}
