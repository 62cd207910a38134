package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: which GROUP BY ROLLUP alias / grouping() argument
  * combinations does Spark resolve vs DuckDB (both accept all four).
  */
object GroupingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[2]").appName("gprobe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.createDataFrame(Seq(("a", "x", 1L), ("b", "y", 2L)))
      .toDF("n_name", "seg", "v").createOrReplaceTempView("t")
    def tryq(label: String, q: String): Unit =
      try println(s"$label OK: " + graft.operators.SqlStage("g", q)
        .apply(spark, spark.table("t")).columns.mkString(","))
      catch { case e: Exception => println(s"$label ERR: " +
        Option(e.getMessage).getOrElse("?").replace('\n', ' ').take(120)) }
    val q0 = "SELECT n_name AS g, grouping(n_name) AS m, count(*) FROM t GROUP BY ROLLUP (g)"
    println("rw0: " + graft.operators.GraftSqlParser.rewriteGroupingAliases(q0, 7))
    println("rw1: " + graft.operators.GraftSqlParser.rewriteGroupingAliases(q0, 6))
    println("rw2: " + graft.operators.GraftSqlParser.rewriteGroupingAliases(q0, 5)
      .length)
    tryq("gbAlias_grExpr",
      "SELECT n_name AS g, grouping(n_name) AS m, count(*) FROM t GROUP BY ROLLUP (g)")
    tryq("gbAlias_grAlias",
      "SELECT n_name AS g, grouping(g) AS m, count(*) FROM t GROUP BY ROLLUP (g)")
    tryq("gbExpr_grExpr",
      "SELECT n_name AS g, grouping(n_name) AS m, count(*) FROM t GROUP BY ROLLUP (n_name)")
    tryq("gbExpr_grAlias",
      "SELECT n_name AS g, grouping(g) AS m, count(*) FROM t GROUP BY ROLLUP (n_name)")
    spark.stop()
  }
}
