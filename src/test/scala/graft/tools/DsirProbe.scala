package graft.tools

import graft.Tables
import graft.functions.{Mix, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage latency of the DSIR featurization at one SF,
  * to locate the dominant cost before optimizing. Usage:
  *   runMain graft.tools.DsirProbe [sfDir]
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[dsirprobe] $label median=${ts(1)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val tok = TextFunctions.tokens(col("text"))
    val bigrams = when(size(tok) >= 2,
      zip_with(slice(tok, lit(1), size(tok) - 1), slice(tok, lit(2), size(tok) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val grams = docs.select(col("doc_id").as("doc"),
      explode(concat(tok, bigrams)).as("g"))
    time("explode grams")(grams.count())
    val hashed = grams.select(col("doc"),
      (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % 8192).as("b"))
    time("explode+md5 bucket")(hashed.count())
    time("bucket counts")(hashed.groupBy("b").count().count())
    time("doc feature vectors")(hashed.groupBy("doc", "b").count().count())
    time("full dsirScores")(
      Mix.dsirScores(docs, docs.filter(col("lang") === "en"), "doc_id", "text").count())
    spark.stop()
  }
}
