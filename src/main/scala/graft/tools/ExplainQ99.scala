package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: q99 A/B — raw NTZ orders view (join condition casts the
  * build side per pair-evaluation) vs a session-tz-normalized orders
  * view (cast paid once per row at the scan).
  */
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
    def time(tag: String, setup: () => Unit): Unit = {
      setup()
      spark.sql(sqlText).count() // warm
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sqlText).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q99ab] $tag median=${ts(ts.size / 2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    graft.Tables.events(spark, d).createOrReplaceTempView("events")
    time("raw-ntz-orders", () =>
      graft.Tables.orders(spark, d).createOrReplaceTempView("orders"))
    time("tz-normalized-orders", () =>
      graft.Tables.orders(spark, d)
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
        .createOrReplaceTempView("orders"))
    spark.stop()
  }
}
