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
