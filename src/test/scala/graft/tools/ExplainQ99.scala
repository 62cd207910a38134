package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: q99 A/B/C and leg pricing for the AsofMergeJoin plan. */
object ExplainQ99 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    val d = "/root/testdata/sf0.1"
    val sqlText = graft.operators.GraftSqlParser.rewriteAll(
      graft.queries.CoreQueries.asofSqlText)
    graft.Tables.events(spark, d).createOrReplaceTempView("events")
    graft.Tables.orders(spark, d)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .createOrReplaceTempView("orders")
    def time(tag: String, f: () => Long): Unit = {
      f() // warm
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q99ab] $tag median=${ts(ts.size / 2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("asof-merge", () => spark.sql(sqlText).count())
    val noSort = sqlText.replaceAll("(?i)ORDER BY e\\.event_id\\s*$", "")
    time("asof-merge-no-sort", () => spark.sql(noSort).count())
    time("q20-union-window", () =>
      graft.queries.CoreQueries.q20AsofJoin(spark, d).count())
    time("rewrite-only", () => {
      graft.operators.GraftSqlParser.rewriteAll(
        graft.queries.CoreQueries.asofSqlText); 1L })
    time("plan-only", () => {
      spark.sql(sqlText).queryExecution.executedPlan; 1L })
    val dfOnce = spark.sql(sqlText)
    time("exec-only", () => dfOnce.count())
    // per-stage wall for one exec
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        val m = si.taskMetrics
        stages.add(s"stage${si.stageId} tasks=${si.numTasks} wall=${dur.getOrElse(-1L)}ms " +
          s"run=${m.executorRunTime}ms cpu=${m.executorCpuTime / 1000000}ms " +
          s"deser=${m.executorDeserializeTime}ms gc=${m.jvmGCTime}ms")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    dfOnce.count()
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    stages.forEach(s => println("[q99stage] " + s))
    stages.clear()
    spark.sparkContext.addSparkListener(listener)
    graft.queries.CoreQueries.q20AsofJoin(spark, d).count()
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    stages.forEach(s => println("[q20stage] " + s))
    // AQE off A/B
    val s2 = spark.newSession()
    graft.functions.expressions.GraftFunctions.register(s2)
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    graft.Tables.events(s2, d).createOrReplaceTempView("events")
    graft.Tables.orders(s2, d)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .createOrReplaceTempView("orders")
    val dfNoAqe = s2.sql(sqlText)
    time("exec-only-noaqe", () => dfNoAqe.count())
    println("=== final AQE plan ===")
    println(dfOnce.queryExecution.executedPlan.toString.linesIterator.take(30).mkString("\n"))
    val q20Once = graft.queries.CoreQueries.q20AsofJoin(spark, d)
    time("q20-exec-only", () => q20Once.count())
    time("full-q99-entry", () =>
      graft.queries.CoreQueries.q99AsofSql(spark, d).count())
    // leg pricing
    val ev = spark.table("events").select(col("user_id"), col("ts"), col("event_id"))
    val od = spark.table("orders").select(col("o_custkey"), col("o_orderdate"))
    time("leg-ev-shuffle-sort", () =>
      ev.repartition(col("user_id")).sortWithinPartitions("user_id", "ts").count())
    time("leg-od-shuffle-sort", () =>
      od.repartition(col("o_custkey")).sortWithinPartitions("o_custkey", "o_orderdate").count())
    time("leg-ev-scan", () => ev.count())
    time("leg-od-scan", () => od.count())
  }
}
