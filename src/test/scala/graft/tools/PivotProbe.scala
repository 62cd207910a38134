package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: PIVOT statement USING-alias / multi-aggregate naming vs
  * the DuckDB probes (F_mv / F_count_star() / value-major order).
  */
object PivotProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[2]").appName("pivotprobe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.createDataFrame(Seq(("a", "F", 1L), ("a", "O", 2L), ("b", "F", 3L)))
      .toDF("f", "s", "x").createOrReplaceTempView("t")
    val df = spark.table("t")
    def tryq(label: String, q: String): Unit =
      try {
        val r = graft.operators.SqlStage("p", q).apply(spark, df)
        println(s"$label OK: cols=${r.columns.mkString(",")} rows=" +
          r.collect().sortBy(_.getString(0)).mkString(" | "))
      } catch { case e: Exception =>
        println(s"$label ERR: " + Option(e.getMessage).getOrElse("?").replace('\n', ' ').take(200)) }
    val gen1 = graft.operators.GraftSqlParser.rewritePivotStatement(
      spark, "PIVOT t ON s USING min(x) AS mv GROUP BY f")
    println("gen1: " + gen1)
    try println("raw1 OK: " + spark.sql(gen1).columns.mkString(","))
    catch { case e: Exception => println("raw1 ERR: " +
      Option(e.getMessage).getOrElse("?").replace('\n', ' ').take(200)) }
    val gen2 = graft.operators.GraftSqlParser.rewritePivotStatement(
      spark, "PIVOT t ON s USING count(*) AS c GROUP BY f")
    println("gen2: " + gen2)
    try println("raw2 OK: " + spark.sql(gen2).columns.mkString(","))
    catch { case e: Exception => println("raw2 ERR: " +
      Option(e.getMessage).getOrElse("?").replace('\n', ' ').take(200)) }
    spark.createDataFrame(Seq(("a", "en", 1L), ("a", "zh", 2L), ("b", "en", 3L)))
      .toDF("src", "lang", "n").createOrReplaceTempView("d2")
    println("genT: " + graft.operators.GraftSqlParser.rewritePivotStatement(
      spark, "PIVOT d2 ON lang USING count(*) GROUP BY src ORDER BY src"))
    try {
      val r = graft.operators.SqlStage("p",
        "PIVOT d2 ON lang USING count(*) GROUP BY src ORDER BY src")
        .apply(spark, spark.table("d2"))
      println("testT OK: " + r.columns.mkString(","))
    } catch { case e: Exception => println("testT ERR: " +
      Option(e.getMessage).getOrElse("?").replace('\n', ' ').take(300)) }
    tryq("alias2", "PIVOT t ON s USING min(x) AS mv, count(*) AS c GROUP BY f")
    tryq("alias1", "PIVOT t ON s USING min(x) AS mv GROUP BY f")
    tryq("noalias2", "PIVOT t ON s USING min(x), max(x) GROUP BY f")
    tryq("mixed", "PIVOT t ON s USING min(x), count(*) GROUP BY f")
    tryq("star_c", "PIVOT t ON s USING count(*) AS c GROUP BY f")
    tryq("plain", "PIVOT t ON s USING min(x) GROUP BY f")
    tryq("implicit2", "PIVOT (SELECT f, s, x FROM t) ON s USING min(x) AS mv, count(*) AS c")
    tryq("in2", "PIVOT t ON s IN ('F') USING min(x) AS mv, count(*) AS c GROUP BY f")
    spark.stop()
  }
}
