package graft.tools

import graft.Tables._
import graft.functions.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: q35 at sf1 in isolation — bimodal timings (2.9 s vs 13.6 s
  * across ScaleProbe runs) need a cause before SCALE.md can claim a
  * slope. Prints per-run wall + the candidate/verify row counts.
  */
object Q35Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/repo/scaledata/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "48g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = documents(spark, d)
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 32)
    val cand = Dedup.lshCandidates(sigs, 8, 4)
    println(s"[q35] candidates: ${cand.count()}")
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      val n = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 32, 8, 0.6).count()
      println(f"[q35] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
    }
    spark.stop()
  }
}
