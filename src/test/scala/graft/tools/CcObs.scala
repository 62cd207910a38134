package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: does Observation report metrics on a localCheckpoint(true)
  * action (the CC fusion's assumption), or does the fallback count fire?
  */
object CcObs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (0L until 100L).toDF("node")
      .select(col("node"), (col("node") + 1).as("comp"), col("node").as("prev"))
    val obs = org.apache.spark.sql.Observation()
    val next = df.observe(obs, count(when(col("comp") =!= col("prev"), 1)).as("changed"))
      .localCheckpoint(true)
    val m = org.apache.spark.sql.GraftColumnBridge.observedOrEmpty(obs)
    println(s"[ccobs] metrics=$m rows=${next.count()}")
    spark.stop()
  }
}
