package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

case class UserEvent(user_id: Long, event_type: String)
case class UserState(count: Long)
case class UserUpdate(user_id: Long, n_events: Long)

/** Structured Streaming surface: the reference is strictly batch
  * (SURVEY §2b — its nearest analog is chunk-at-a-time pipelining), so
  * this is a forward extension: the same event analytics as the batch
  * queries (q43/q44), expressed as incremental streaming plans with
  * watermarks — the idiomatic home for the `events` table at scale.
  */
object StreamingOps {

  /** File-source stream over a directory of events parquet.
    *
    * The ts physical type has varied by generator vintage (TIMESTAMP
    * (NANOS)-as-LongType under nanosAsLong; TIMESTAMP_NTZ(µs) today), so
    * the stream schema is inferred from a one-off batch read of the same
    * directory (driver-side footer read, no data scan) and ts is then
    * normalized by the SAME rule as the batch loader
    * ([[graft.Tables.normalizeEventsTs]]) — guaranteeing streaming and
    * batch twins agree on the instant, whatever the file vintage.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    // start-stream-then-files-arrive is the standard file-source
    // pattern: an empty directory has no footer to infer from, so fall
    // back to the CURRENT generator vintage's schema (TIMESTAMP_NTZ µs)
    // — normalizeEventsTs maps it to the same TIMESTAMP either way.
    // Known residual: a stream started on an empty dir that later
    // receives the HISTORICAL nanos-vintage files is pinned to the NTZ
    // schema (a stream's schema is fixed at start); with mixed-vintage
    // sources, stage at least one current-vintage file before start, or
    // pass the schema explicitly via readStream yourself.
    val schema =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException =>
        StructType(Seq(
          StructField("event_id", LongType),
          StructField("ts", TimestampNTZType),
          StructField("user_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType),
          StructField("props", StringType)))
      }
    graft.Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(dir))
  }

  /** Tumbling 1-hour windows per event type with a 2-hour watermark:
    * late events beyond the watermark are dropped, state is bounded —
    * the incremental counterpart of batch q43_events_hourly.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))

  /** Arbitrary keyed state via flatMapGroupsWithState: a running
    * per-user event counter that emits the updated total on every
    * micro-batch — the custom-state escape hatch for logic windows
    * can't express (per-key state lives in the state store, bounded by
    * key cardinality, not stream length).
    */
  def runningCountsByUser(events: DataFrame): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserState]) => {
          val prev = state.getOption.map(_.count).getOrElse(0L)
          val n = prev + it.size
          state.update(UserState(n))
          Iterator(UserUpdate(uid, n))
        })
  }

  /** Streaming exact dedup with bounded state: duplicates of the key
    * arriving within the watermark window are dropped, state for keys
    * older than the watermark is evicted — the incremental counterpart
    * of batch exact dedup (q30) that never accumulates unbounded state.
    */
  def dedupEvents(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming text dedup by normalized fingerprint — the streaming
    * face of the batch fingerprint dedup (q38): each document is
    * fingerprinted ROW-LOCALLY by the native `norm_fingerprint`
    * expression (lowercase/whitespace-normalized md5, codegen'd), then
    * duplicates within the watermark are dropped. State per unique doc
    * = one 16-byte key, evicted past the watermark — the shape that
    * holds on an unbounded 100 TB ingest stream.
    */
  def dedupDocsByFingerprint(docs: DataFrame, textCol: String,
                             tsCol: String = "ts",
                             watermark: String = "2 hours"): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("fp", call_function("norm_fingerprint", col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))
  }

  /** Decontaminate an UNBOUNDED document stream against a STATIC
    * benchmark with zero stream-side state: the Bloom probe
    * ([[graft.functions.Dedup.benchBloomBytes]], built once from the
    * static side at stream start) is a row-local codegen'd predicate, so
    * misses — the overwhelming bulk — pass through with no join and no
    * state; the hit sliver exact-verifies through a stream-static LEFT
    * OUTER join against the benchmark's distinct fingerprints (the
    * static side is a lookup, nothing is buffered per the stream).
    * Result rows equal the batch [[graft.functions.Dedup.decontaminateExactBloom]]
    * over the same data — StreamingSpec proves the equality.
    */
  def decontaminateStream(docs: DataFrame, bench: DataFrame, textCol: String,
                          expectedItems: Long = 1L << 20,
                          fpp: Double = 0.01): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(docs.sparkSession)
    def fp(c: org.apache.spark.sql.Column) = call_function("norm_fingerprint", c)
    val key = xxhash64(fp(col(textCol)))
    val bytes = graft.functions.Dedup
      .benchBloomBytes(bench.select(key.as("k")), expectedItems, fpp)
      .getOrElse(return docs)
    // broadcast handle in the plan, bits in the block manager — same
    // rationale as the batch twin (VERDICT r6 #2); broadcast variables
    // are readable from every microbatch of a streaming query
    val bc = docs.sparkSession.sparkContext.broadcast(bytes)
    val hit = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.BloomMightContainBroadcast(bc,
        org.apache.spark.sql.GraftColumnBridge.expression(key)))
    val benchFps = bench.select(fp(col(textCol)).as("__graft_bench_fp")).distinct()
    val survivors = docs.filter(hit)
      .join(benchFps, fp(col(textCol)) === col("__graft_bench_fp"), "left_outer")
      .filter(col("__graft_bench_fp").isNull)
      .drop("__graft_bench_fp")
    docs.filter(!hit).unionByName(survivors)
  }

  /** Watermarked stream-stream join: every purchase joined to the same
    * user's views in the preceding hour (attribution). The time-range
    * predicate is what makes BOTH sides' state finite on an unbounded
    * stream: a view older than watermark + 1 h can never match a future
    * purchase, so the state store evicts it; purchases are held at most
    * their own watermark. Without the range condition Spark would
    * (correctly) refuse to run the join in append mode — unbounded
    * state is a plan error, not a runtime surprise.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_ts"), col("v_ts"), col("value"))
  }

  /** Session windows per user (30-min gap) — Spark's native session
    * window keeps per-key state bounded by the watermark, the streaming
    * counterpart of batch q44_sessionize.
    */
  def sessionsByUser(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
