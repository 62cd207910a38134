package graft.tools
import org.apache.spark.sql.SparkSession
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    Seq("date_diff", "datediff", "time_bucket", "len").foreach { n =>
      println(n + " registered: " + reg.functionExists(FunctionIdentifier(n)))
    }
    for (q <- Seq(
      "SELECT date_sub('month', DATE '2024-01-31', DATE '2024-03-01') AS m",
      "SELECT datesub('hour', TIMESTAMP '2024-01-01 00:59:00', TIMESTAMP '2024-01-01 01:01:00') AS m")) {
      try println("direct OK: " + spark.sql(q).collect().head)
      catch { case e: Exception => println("direct ERR: " + e.getClass.getName + ": " + String.valueOf(e.getMessage).replace('\n', ' ').take(160)) }
    }
    spark.stop()
  }
}
