package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: plan shape of the r16 restructured sample paths. */
object SamplePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    val df = spark.range(1).toDF("z")
    def plan(sql: String): String =
      graft.operators.SqlStage("s", sql).apply(spark, df)
        .queryExecution.executedPlan.toString
    val p1 = plan("SELECT l_orderkey FROM lineitem WHERE l_orderkey < 100 USING SAMPLE reservoir(10 ROWS) REPEATABLE (7)")
    println("[splan] rows-restructure: TakeOrdered=" + p1.contains("TakeOrderedAndProject")
      + " SortExec=" + p1.contains("SortExec")
      + " ReadSchemaCols=" + "ReadSchema:[^\n]*".r.findFirstIn(p1).getOrElse("?").take(140))
    val p2 = plan("SELECT l_orderkey FROM lineitem WHERE l_orderkey < 100 USING SAMPLE 10 PERCENT")
    println("[splan] pct-wrap: Sample=" + p2.contains("Sample")
      + " Pushed=" + "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(p2).getOrElse("?"))
    spark.stop()
  }
}
