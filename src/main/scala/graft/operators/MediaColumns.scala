package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decode / feature-extract / frame-sample
  * as distributed transforms.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real;
  * the codec step is a clearly-marked DETERMINISTIC STUB because no
  * image/audio libraries ship in this container — swap `stubDecodeMeta`
  * for a real decoder (e.g. a JNI codec or an Arrow-batched Python
  * worker) without touching the surrounding plan.
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
