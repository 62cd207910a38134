package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decode / feature-extract / frame-sample
  * as distributed transforms.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real,
  * and so are the decoders the JDK ships: images decode via ImageIO
  * (PNG/JPEG/GIF/BMP — [[decodeImageMeta]], [[resizeImages]],
  * [[intensityHistogram]]) and audio via javax.sound.sampled (WAV/AIFF/
  * AU — [[decodeAudioMeta]], r10). Formats with no in-container codec
  * (video, MP3, HEIC, …) fall back to a clearly-marked DETERMINISTIC
  * STUB with a `real_decode = false` flag — swap the stub for a real
  * codec (JNI, Arrow-batched worker) without touching the surrounding
  * plan.
  */
object MediaColumns {

  /** Sniff a media type from magic bytes (real logic — works on real
    * payloads: JPEG/PNG/RIFF-WAV; UNKNOWN otherwise).
    */
  def mediaType(payload: Column): Column = {
    val magic = hex(substring(payload, 1, 4))
    when(magic.startsWith("FFD8"), "image/jpeg")
      .when(magic === "89504E47", "image/png")
      .when(magic === "52494646", "audio/wav")
      .otherwise("application/octet-stream")
  }

  /** STUB decode: in production this calls the real codec; here the
    * "decoded" dimensions are a deterministic fake derived from the
    * payload hash so the plumbing (struct schema, nullability, codegen)
    * is exercised end-to-end and results are reproducible.
    */
  def stubDecodeMeta(payload: Column): Column = {
    val h = abs(xxhash64(payload))
    struct(
      octet_length(payload).as("n_bytes"),
      mediaType(payload).as("media_type"),
      (pmod(h, lit(3840)) + 1).cast("int").as("width"),     // STUB
      (pmod(h / 3840, lit(2160)) + 1).cast("int").as("height"), // STUB
      (pmod(h, lit(240)) + 1).cast("int").as("n_frames"))   // STUB
  }

  /** Real decode for formats the JDK ships codecs for (PNG/JPEG/GIF/BMP
    * via ImageIO), deterministic stub otherwise — the mapPartitions
    * batch shape a heavyweight codec (JNI, Arrow-batched worker) slots
    * into. One decoder probe per row, streamed, no shuffle.
    */
  def decodeImageMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("real_decode", BooleanType))), nullable = true))
    val idx = inSchema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val meta: Row =
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img != null) Row(img.getWidth, img.getHeight, true)
            else Row(stubDim(bytes, 3840), stubDim(bytes, 2160), false) // STUB fallback
          } catch {
            case scala.util.control.NonFatal(_) =>
              Row(stubDim(bytes, 3840), stubDim(bytes, 2160), false)   // STUB fallback
          }
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(enc)
  }

  private def stubDim(bytes: Array[Byte], mod: Int): Int =
    (math.abs(java.util.Arrays.hashCode(bytes).toLong) % mod).toInt + 1

  /** Evenly-spaced frame indices for sampling `n` frames — real logic
    * over the (stubbed) frame count.
    */
  def frameSampleIndices(meta: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => (i * meta.getField("n_frames") / n).cast("int"))

  /** Distributed image resize (bounded box, aspect preserved): real
    * ImageIO decode→scale→PNG re-encode for JDK-supported formats,
    * deterministic stub otherwise (truncated payload + flag) — same
    * mapPartitions batch shape as [[decodeImageMeta]], so a heavyweight
    * codec slots in without touching the plan. No shuffle; payload
    * bytes stream through the task.
    */
  def resizeImages(df: DataFrame, payloadCol: String,
                   maxW: Int, maxH: Int): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("resized", BinaryType, nullable = true),
      StructField("resize_meta", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("real_resize", BooleanType))), nullable = true)))
    val idx = inSchema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val (out, meta): (Array[Byte], Row) =
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img != null) {
              val scale = math.min(1.0,
                math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
              val (w2, h2) = (math.max(1, math.round(img.getWidth * scale).toInt),
                math.max(1, math.round(img.getHeight * scale).toInt))
              val dst = new java.awt.image.BufferedImage(w2, h2,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w2, h2, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", bos)
              (bos.toByteArray, Row(w2, h2, true))
            } else
              (java.util.Arrays.copyOf(bytes, math.min(bytes.length, 256)),
                Row(stubDim(bytes, maxW), stubDim(bytes, maxH), false)) // STUB fallback
          } catch {
            case scala.util.control.NonFatal(_) =>
              (java.util.Arrays.copyOf(bytes, math.min(bytes.length, 256)),
                Row(stubDim(bytes, maxW), stubDim(bytes, maxH), false)) // STUB fallback
          }
        Row.fromSeq(row.toSeq ++ Seq(out, meta))
      }
    }(enc)
  }

  /** Feature extraction: normalized `bins`-bucket intensity histogram as
    * `array<float>` — gray-pixel histogram when the payload decodes
    * (subsampled to ≤64k pixels per image so a 4k frame costs the same
    * as a thumbnail), raw-byte histogram otherwise (deterministic, and
    * honest: it is a content fingerprint, not an image feature). The
    * output column feeds the vector operators (cosine / LSH / IVF)
    * directly.
    */
  def intensityHistogram(df: DataFrame, payloadCol: String,
                         bins: Int = 16): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("features", ArrayType(FloatType), nullable = true),
      StructField("real_features", BooleanType, nullable = false)))
    val idx = inSchema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val hist = new Array[Long](bins)
        var real = false
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img != null) {
            real = true
            val (w, h) = (img.getWidth, img.getHeight)
            val step = math.max(1, math.sqrt(w.toLong * h / 65536.0).toInt)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                hist(gray * bins / 256) += 1
                x += step
              }
              y += step
            }
          }
        } catch { case scala.util.control.NonFatal(_) => real = false }
        if (!real) {
          java.util.Arrays.fill(hist, 0L)
          bytes.foreach(b => hist((b & 0xff) * bins / 256) += 1)
        }
        val total = math.max(1L, hist.sum).toFloat
        Row.fromSeq(row.toSeq ++ Seq(hist.map(c => c / total).toSeq, real))
      }
    }(enc)
  }

  /** REAL audio decode for formats the JDK ships codecs for (WAV/AIFF/
    * AU via `javax.sound.sampled` — r10: the audio half of the media
    * surface no longer stubs), deterministic stub fallback otherwise —
    * the same honest split as [[decodeImageMeta]]. Per payload:
    * container metadata (sample rate, channels, frame count, duration)
    * plus two PCM features computed from the decoded samples — RMS and
    * peak amplitude, normalized to [0, 1] — over at most `maxFrames`
    * frames so a long file costs the same as a clip. One streamed
    * decoder probe per row inside mapPartitions; no shuffle; the
    * feature doubles are exact functions of the payload bytes
    * (deterministic across runs and executors).
    */
  def decodeAudioMeta(df: DataFrame, payloadCol: String,
                      maxFrames: Int = 1 << 20): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("audio", StructType(Seq(
        StructField("sample_rate", IntegerType),
        StructField("channels", IntegerType),
        StructField("n_frames", LongType),
        StructField("duration_sec", DoubleType),
        StructField("rms", DoubleType),
        StructField("peak", DoubleType),
        StructField("real_decode", BooleanType))), nullable = true))
    val idx = inSchema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val decoded =
          try {
            import javax.sound.sampled.{AudioFormat, AudioSystem}
            val in = AudioSystem.getAudioInputStream(
              new java.io.BufferedInputStream(
                new java.io.ByteArrayInputStream(bytes)))
            try {
              val fmt = in.getFormat
              // normalize to 16-bit signed PCM so sample math is uniform
              val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
                fmt.getSampleRate, 16, fmt.getChannels,
                fmt.getChannels * 2, fmt.getSampleRate, false)
              val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
              val nFrames = in.getFrameLength
              val dur =
                if (nFrames >= 0) nFrames.toDouble / fmt.getSampleRate else -1.0
              val take = math.min(
                if (nFrames >= 0) nFrames else maxFrames.toLong, maxFrames.toLong)
              val buf = new Array[Byte](4096)
              var sumSq = 0.0
              var peak = 0.0
              var samples = 0L
              val wanted = take * fmt.getChannels
              var reading = true
              while (reading && samples < wanted) {
                val n = pcm.read(buf)
                if (n <= 0) reading = false
                else {
                  var i = 0
                  while (i + 1 < n && samples < wanted) {
                    // little-endian 16-bit signed
                    val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort / 32768.0
                    sumSq += s * s
                    val a = math.abs(s)
                    if (a > peak) peak = a
                    samples += 1
                    i += 2
                  }
                }
              }
              val rms = if (samples > 0) math.sqrt(sumSq / samples) else 0.0
              Row(fmt.getSampleRate.toInt, fmt.getChannels, nFrames, dur,
                rms, peak, true)
            } finally in.close()
          } catch {
            case scala.util.control.NonFatal(_) =>
              // deterministic stub fallback, flagged (the image pattern)
              val h = java.lang.Math.abs(java.util.Arrays.hashCode(bytes).toLong)
              Row((h % 48000 + 1).toInt, (h % 2 + 1).toInt, -1L, -1.0,
                0.0, 0.0, false)
          }
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }(enc)
  }

  /** Attach payload + metadata + sampled frame indices to a DataFrame
    * holding binary content in `payloadCol`. One narrow projection —
    * no shuffle, scales linearly with input splits.
    */
  def enrich(df: DataFrame, payloadCol: String, sampleFrames: Int = 8): DataFrame = {
    val meta = stubDecodeMeta(col(payloadCol))
    df.withColumn("media_meta", meta)
      .withColumn("frame_samples", frameSampleIndices(col("media_meta"), sampleFrames))
  }
}
