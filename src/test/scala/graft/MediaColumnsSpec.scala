package graft

import graft.operators.MediaColumns
import org.apache.spark.sql.functions._

class MediaColumnsSpec extends SparkSpec {
  import spark.implicits._

  private val jpegMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2)
  private val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 3, 4)

  test("media type sniffing from magic bytes (real logic)") {
    val df = Seq((1L, jpegMagic), (2L, pngMagic), (3L, "plain".getBytes))
      .toDF("id", "payload")
    val got = df.select(col("id"), MediaColumns.mediaType(col("payload")).as("mt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "image/jpeg")
    assert(got(2L) == "image/png")
    assert(got(3L) == "application/octet-stream")
  }

  test("decodeImageMeta really decodes JDK-supported formats, stubs the rest") {
    // build a real 17x9 PNG in-JVM
    val img = new java.awt.image.BufferedImage(17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val df = Seq((1L, png), (2L, "not an image".getBytes)).toDF("id", "payload")
    val out = MediaColumns.decodeImageMeta(df, "payload")
      .select(col("id"), col("decoded.width"), col("decoded.height"), col("decoded.real_decode"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((17, 9, true)))    // real ImageIO decode
    assert(out(2L)._3 == false)           // deterministic stub fallback
  }

  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, ((x * 7 + y * 13) % 256) * 0x010101)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("resizeImages: real bounded-box resize for decodable payloads, stub for the rest") {
    val df = Seq((1L, realPng(64, 32)), (2L, realPng(8, 4)), (3L, "junk".getBytes))
      .toDF("id", "payload")
    val out = MediaColumns.resizeImages(df, "payload", maxW = 16, maxH = 16)
      .select(col("id"), col("resized"), col("resize_meta.width"),
        col("resize_meta.height"), col("resize_meta.real_resize"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    // 64x32 scaled into a 16x16 box preserving aspect -> 16x8, re-decodable
    assert(out(1L)._2 == 16 && out(1L)._3 == 8 && out(1L)._4)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(1L)._1))
    assert(back.getWidth == 16 && back.getHeight == 8)
    // already inside the box: never upscaled
    assert(out(2L)._2 == 8 && out(2L)._3 == 4 && out(2L)._4)
    // junk: stub fallback, flagged, deterministic
    assert(!out(3L)._4 && out(3L)._1.sameElements("junk".getBytes))
  }

  test("intensityHistogram: normalized features, real for images, byte-hist for junk") {
    val df = Seq((1L, realPng(40, 40)), (2L, "abcabc".getBytes)).toDF("id", "payload")
    val out = MediaColumns.intensityHistogram(df, "payload", bins = 8)
      .select(col("id"), col("features"), col("real_features"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Float](1), r.getBoolean(2)))).toMap
    assert(out(1L)._2 && !out(2L)._2)
    out.values.foreach { case (h, _) =>
      assert(h.length == 8)
      assert(math.abs(h.sum - 1.0f) < 1e-5, s"not normalized: $h")
    }
    // deterministic across runs
    val again = MediaColumns.intensityHistogram(df, "payload", bins = 8)
      .select("features").collect().map(_.getSeq[Float](0))
    assert(again.toSeq.map(_.mkString(",")).sorted ==
      out.values.map(_._1.mkString(",")).toSeq.sorted)
    // features feed the vector ops directly
    val withF = MediaColumns.intensityHistogram(df, "payload", bins = 8)
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val sim = graft.functions.VectorFunctions.bruteForceTopK(withF, withF, k = 1).count()
    assert(sim == 2)
  }

  test("binaryFile source feeds the media pipeline end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.png").toPath, realPng(20, 10))
    java.nio.file.Files.write(new java.io.File(dir, "b.png").toPath, realPng(6, 6))
    java.nio.file.Files.write(new java.io.File(dir, "notes.txt").toPath, "hi".getBytes)
    val df = graft.sources.Sources.loadBinary(spark, dir.getAbsolutePath, Some("*.png"))
    assert(df.count() == 2) // glob filters the txt out
    val out = MediaColumns.decodeImageMeta(df.select(col("path"), col("content")), "content")
      .select(col("decoded.width"), col("decoded.height"), col("decoded.real_decode"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(out == Set((20, 10, true), (6, 6, true)))
  }

  test("approx_count_distinct sketch lands within 5% of exact") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_orderkey"))).head.getLong(0)
    // q69 now asserts the per-group bound inside the harness; every
    // within_5pct flag must be true here too
    val flags = graft.queries.ExtraQueries.q69ApproxDistinct(spark, sf)
      .select(col("orders_within_5pct"), col("parts_within_5pct")).collect()
    assert(flags.nonEmpty && flags.forall(r => r.getBoolean(0) && r.getBoolean(1)))
    val global = li.select(approx_count_distinct(col("l_orderkey"), 0.01)).head.getLong(0)
    assert(math.abs(global - exact).toDouble / exact < 0.05,
      s"approx=$global exact=$exact")
  }

  test("decodeAudioMeta REALLY decodes WAV via the JDK codec; garbage falls back flagged") {
    // synthesize a genuine 16-bit mono WAV: 0.25 s of a 440 Hz sine at
    // amplitude 0.5 — RMS must land at amp/sqrt(2), peak at amp
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioSystem, AudioInputStream}
    val rate = 8000f
    val n = 2000
    val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2, 3, 4, 5))).toDF("id", "payload")
    val out = MediaColumns.decodeAudioMeta(df, "payload")
      .select(col("id"), col("audio.*")).orderBy(col("id")).collect()
    val real = out(0)
    assert(real.getBoolean(real.fieldIndex("real_decode")))
    assert(real.getInt(real.fieldIndex("sample_rate")) == 8000)
    assert(real.getInt(real.fieldIndex("channels")) == 1)
    assert(real.getLong(real.fieldIndex("n_frames")) == n)
    assert(math.abs(real.getDouble(real.fieldIndex("duration_sec")) - n / rate) < 1e-9)
    val rms = real.getDouble(real.fieldIndex("rms"))
    val peak = real.getDouble(real.fieldIndex("peak"))
    assert(math.abs(rms - amp / math.sqrt(2)) < 0.01, s"rms=$rms")
    assert(math.abs(peak - amp) < 0.01, s"peak=$peak")
    // garbage payload: flagged stub, never a task failure
    val stub = out(1)
    assert(!stub.getBoolean(stub.fieldIndex("real_decode")))
    // deterministic across runs
    val again = MediaColumns.decodeAudioMeta(df, "payload")
      .select(col("id"), col("audio.*")).orderBy(col("id")).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // narrow plan — decode never shuffles
    val plan = MediaColumns.decodeAudioMeta(df, "payload")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("enrich attaches typed metadata struct + frame samples, deterministic, no shuffle") {
    val df = Seq((1L, jpegMagic), (2L, pngMagic)).toDF("id", "payload")
    val out = MediaColumns.enrich(df, "payload", sampleFrames = 4)
    val schema = out.schema("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq ==
      Seq("n_bytes", "media_type", "width", "height", "n_frames"))
    val r1 = out.drop("payload").collect()
    val r2 = MediaColumns.enrich(df, "payload", sampleFrames = 4).drop("payload").collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq) // deterministic stub
    val frames = r1.head.getSeq[Int](r1.head.fieldIndex("frame_samples"))
    assert(frames.length == 4 && frames == frames.sorted)
    // narrow plan: no exchange in the physical plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
