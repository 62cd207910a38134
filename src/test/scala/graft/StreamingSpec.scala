package graft

import graft.streaming.StreamingOps
import java.nio.file.{Files, Paths, StandardCopyOption}

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg equals the batch q43 result (memory sink, processAllAvailable)") {
    // start-stream-then-files-arrive: an EMPTY source directory must
    // still yield a stream (schema falls back to the current vintage;
    // review r8 #3) with the normalized TIMESTAMP ts
    {
      val empty = Files.createTempDirectory("graft-empty-events").toString
      val s = StreamingOps.readEventStream(spark, empty)
      assert(s.isStreaming)
      assert(s.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
    }
    // stage the events parquet in a stream-source directory
    val dir = Files.createTempDirectory("graft-stream")
    Files.list(Paths.get(s"$sf")).filter(_.getFileName.toString == "events.parquet")
      .forEach(p => Files.copy(p, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING))

    val stream = StreamingOps.hourlyByType(StreamingOps.readEventStream(spark, dir.toString))
    val q = stream.writeStream
      .format("memory").queryName("hourly_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.sql("SELECT * FROM hourly_out ORDER BY bucket, event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = graft.queries.TextQueries.q43EventsHourly(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("flatMapGroupsWithState running counter converges to batch counts") {
    val dir = Files.createTempDirectory("graft-stream3")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val stream = StreamingOps.runningCountsByUser(
      StreamingOps.readEventStream(spark, dir.toString))
    val q = stream.writeStream
      .format("memory").queryName("counts_out").outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // last update per user = total events for that user
    val got = spark.sql(
      "SELECT user_id, MAX(n_events) FROM counts_out GROUP BY user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("stream-static join: events stream enriched with the customer dim") {
    val dir = Files.createTempDirectory("graft-stream5")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val stream = StreamingOps.readEventStream(spark, dir.toString)
    val dim = Tables.customer(spark, sf)
      .select(org.apache.spark.sql.functions.col("c_custkey"),
        org.apache.spark.sql.functions.col("c_mktsegment"))
    val joined = stream.join(dim,
      org.apache.spark.sql.functions.expr("user_id = c_custkey"), "inner")
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("SELECT COUNT(*) FROM enriched").head().getLong(0)
    val ev = Tables.events(spark, sf)
    val want = ev.join(dim, ev("user_id") === dim("c_custkey")).count()
    assert(got == want && got > 0)
  }

  test("streaming dedup within watermark drops duplicate keys") {
    val dir = Files.createTempDirectory("graft-stream4")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    // user_id repeats heavily within the window → dedup on user_id keeps
    // far fewer rows than arrive; event_id is unique → keeps all
    val byUser = StreamingOps.dedupEvents(
      StreamingOps.readEventStream(spark, dir.toString), Seq("user_id"))
    val q = byUser.writeStream.format("memory").queryName("dedup_user")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.sql("SELECT COUNT(*) FROM dedup_user").head().getLong(0)
    val total = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(kept < total && kept >= users)
  }

  test("streaming fingerprint dedup equals batch exact dedup on normalized text") {
    import org.apache.spark.sql.functions._
    // docs whose texts differ only in case/whitespace → same fingerprint
    val dir = Files.createTempDirectory("graft-stream5")
    val docs = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 'Hello  World', timestamp'2024-01-01 10:00:00'),
        |  (2L, 'hello world',  timestamp'2024-01-01 10:01:00'),
        |  (3L, 'Other Doc',    timestamp'2024-01-01 10:02:00'),
        |  (4L, '  HELLO   world ', timestamp'2024-01-01 10:03:00'),
        |  (5L, 'other doc',    timestamp'2024-01-01 10:04:00')
        |AS t(doc_id, text, ts)""".stripMargin)
    docs.write.parquet(dir.resolve("docs.parquet").toString)
    val stream = spark.readStream.schema(docs.schema)
      .parquet(dir.resolve("docs.parquet").toString)
    val q = StreamingOps.dedupDocsByFingerprint(stream, "text")
      .writeStream.format("memory").queryName("dedup_fp")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.sql("SELECT COUNT(*) FROM dedup_fp").head().getLong(0)
    // batch twin: exact dedup on the same normalized fingerprint
    graft.functions.expressions.GraftFunctions.register(spark)
    val batch = graft.functions.Dedup.exact(
      docs, call_function("norm_fingerprint", col("text")), col("doc_id")).count()
    assert(kept == batch && kept == 2L)
  }

  test("streaming centroid assignment: the batch clusterAssign runs on a stream unchanged") {
    import org.apache.spark.sql.functions._
    // row-local broadcast-argmax + broadcast LocalRelation id map =
    // stateless projection + stream-static join — the topic-bucketing
    // half of SemDeDup (q109/q111) needs NO streaming variant; the
    // within-cluster prune is cross-row and stays batch
    val dir = Files.createTempDirectory("graft-stream-assign")
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.2f, 0.8f)), (4L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    emb.write.parquet(dir.resolve("emb.parquet").toString)
    val seeds = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val stream = spark.readStream.schema(emb.schema)
      .parquet(dir.resolve("emb.parquet").toString)
    val q = graft.functions.VectorFunctions.clusterAssign(stream, seeds)
      .select("vec_id", "cid")
      .writeStream.format("memory").queryName("assign_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql("SELECT vec_id, cid FROM assign_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batch = graft.functions.VectorFunctions.clusterAssign(emb, seeds)
      .select("vec_id", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streamed == batch)
    assert(streamed == Seq((0L, 0L), (1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("streaming bloom decontamination equals the batch operator (zero stream-side state)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-stream-decon")
    val docs = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 'held out question one'),
        |  (2L, 'ordinary training text'),
        |  (3L, 'HELD  OUT question one'),
        |  (4L, 'another ordinary document'),
        |  (5L, 'held out question two')
        |AS t(doc_id, text)""".stripMargin)
    docs.write.parquet(dir.resolve("docs.parquet").toString)
    val bench = spark.sql(
      "SELECT * FROM VALUES ('held out question one'), ('held out question two') AS b(text)")
    val stream = spark.readStream.schema(docs.schema)
      .parquet(dir.resolve("docs.parquet").toString)
    // absurd fpp so the false-positive verify path provably exercises
    val q = StreamingOps.decontaminateStream(stream, bench, "text",
        expectedItems = 4, fpp = 0.5)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.sql("SELECT doc_id FROM decon_stream")
      .collect().map(_.getLong(0)).sorted.toSeq
    val batch = graft.functions.Dedup
      .decontaminateExactBloom(docs, bench, "text", expectedItems = 4, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == batch && kept == Seq(2L, 4L))
  }

  test("Mix.split and redact_pii run unchanged on a stream (stateless row-local stages)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-stream-split")
    val docs = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 'mail me me@x.example.org please'),
        |  (2L, 'plain text'), (3L, 'more text'), (4L, 'and more'),
        |  (5L, 'fifth doc')
        |AS t(doc_id, text)""".stripMargin)
    docs.write.parquet(dir.resolve("docs.parquet").toString)
    val stream = spark.readStream.schema(docs.schema)
      .parquet(dir.resolve("docs.parquet").toString)
    val q = graft.functions.Mix.split(
        stream.withColumn("text", graft.functions.TextFunctions.redactPii(col("text"))),
        col("doc_id"), Seq("train" -> 14, "val" -> 1, "test" -> 1))
      .writeStream.format("memory").queryName("stream_split")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("SELECT doc_id, text, split FROM stream_split").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    // identical labels to the batch run — membership is a pure id function
    val batch = graft.functions.Mix.split(docs, col("doc_id"),
        Seq("train" -> 14, "val" -> 1, "test" -> 1))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == 5 && got.forall { case (id, (_, s)) => batch(id) == s })
    assert(got(1L)._1.contains("<EMAIL>") && !got(1L)._1.contains("@"))
  }

  test("watermarked stream-stream join matches the batch time-range join") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-stream6")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val stream = StreamingOps.readEventStream(spark, dir.toString)
    val q = StreamingOps.purchaseAttribution(stream)
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("SELECT COUNT(*) FROM attr").head().getLong(0)
    val ev = Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val want = p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")).count()
    assert(got == want && got > 0)
  }

  test("streaming session windows produce bounded sessions per user") {
    val dir = Files.createTempDirectory("graft-stream2")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val stream = StreamingOps.sessionsByUser(StreamingOps.readEventStream(spark, dir.toString))
    val q = stream.writeStream
      .format("memory").queryName("sessions_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val sessions = spark.sql("SELECT user_id, COUNT(*) FROM sessions_out GROUP BY user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // batch q44 counts must match the streaming session-window counts
    val batch = graft.queries.TextQueries.q44Sessionize(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sessions == batch)
  }

  test("LM perplexity scores a stream unchanged and equals the batch scores (r13)") {
    import org.apache.spark.sql.functions._
    // the CCNet deployment shape, literally: model trained once on the
    // (batch) trusted corpus, broadcast, then applied to an unbounded
    // stream as a stateless row-local projection — nothing about
    // BigramPerplexityBroadcast is batch-specific
    val dir = Files.createTempDirectory("graft-stream-lm")
    val docs = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 'the cat sat on the mat'),
        |  (2L, 'the cat sat on the hat'),
        |  (3L, 'completely different words entirely'),
        |  (4L, 'the cat sat on the mat again')
        |AS t(doc_id, text)""".stripMargin)
    docs.write.parquet(dir.resolve("docs.parquet").toString)
    val t = split(col("text"), " ")
    val lm = graft.functions.NgramLm.trainTrigramLm(docs, t,
      maxVocab = 16, minCount = 1)
    val stream = spark.readStream.schema(docs.schema)
      .parquet(dir.resolve("docs.parquet").toString)
    val q = stream.select(col("doc_id"),
        graft.functions.NgramLm.perplexity(stream, lm, t,
          lambda = 0.9, lambda3 = 0.5).as("ppl"))
      .writeStream.format("memory").queryName("lm_ppl")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql("SELECT doc_id, ppl FROM lm_ppl ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = docs.select(col("doc_id"),
        graft.functions.NgramLm.perplexity(docs, lm, t,
          lambda = 0.9, lambda3 = 0.5).as("ppl"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(streamed == batch) // bit-identical: same model, same fold
    // the repeated template scores lower than the outlier
    val byId = streamed.toMap
    assert(byId(1L) < byId(3L) && byId(2L) < byId(3L))
  }

  test("gopherRules and c4Clean run on streams unchanged (stateless projections)") {
    import org.apache.spark.sql.functions._
    // both r9 quality operators are row-local Column functions — a
    // streaming corpus filters through them with zero state, the
    // 100 TB continuous-ingest shape
    val dir = Files.createTempDirectory("graft-stream-quality")
    Files.copy(Paths.get(s"$sf/documents.parquet"), dir.resolve("documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id"),
        graft.functions.TextFunctions.gopherRules(
          col("text"), minWords = 30, minStopTypes = 1).getField("keep").as("g_keep"),
        graft.functions.TextFunctions.c4Clean(col("text")).getField("keep").as("c_keep"),
        graft.functions.TextFunctions.repetitionProfile(col("text"))
          .getField("keep").as("r_keep"),
        graft.functions.TextFunctions.scriptProfile(col("text"))
          .getField("script").as("script"),
        graft.functions.TextFunctions.compressionRatio(col("text")).as("ratio"))
    val q = stream.writeStream.format("memory").queryName("quality_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
        "SELECT doc_id, g_keep, c_keep, r_keep, script, ratio FROM quality_stream ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getString(4), r.getDouble(5))).toSeq
    val batch = spark.read.parquet(dir.toString)
      .select(col("doc_id"),
        graft.functions.TextFunctions.gopherRules(
          col("text"), minWords = 30, minStopTypes = 1).getField("keep"),
        graft.functions.TextFunctions.c4Clean(col("text")).getField("keep"),
        graft.functions.TextFunctions.repetitionProfile(col("text")).getField("keep"),
        graft.functions.TextFunctions.scriptProfile(col("text")).getField("script"),
        graft.functions.TextFunctions.compressionRatio(col("text")))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getString(4), r.getDouble(5))).toSeq
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.exists(_._2) && streamed.exists(!_._2)) // both outcomes live
  }
}
