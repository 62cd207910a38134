package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: SparkEntry.entry must return rows > 0 on
  * sf0.001 (the driver runs exactly this check each round).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
