package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: which DuckDB-isms run natively on this Spark build. */
object FnNativeCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq((1, "a", 10), (1, "b", 20), (2, "c", 5)).toDF("g", "s", "v")
      .createOrReplaceTempView("t")
    val probes = Seq(
      "GROUP BY ALL" -> "SELECT g, sum(v) FROM t GROUP BY ALL",
      "ORDER BY ALL" -> "SELECT g, v FROM t ORDER BY ALL",
      "arg_max" -> "SELECT arg_max(s, v) FROM t",
      "arg_min" -> "SELECT arg_min(s, v) FROM t",
      "max_by" -> "SELECT max_by(s, v) FROM t",
      "string_agg" -> "SELECT string_agg(s, ',') FROM t",
      "listagg" -> "SELECT listagg(s, ',') FROM t",
      "list_has_any" -> "SELECT list_has_any(array(1,2), array(2,3))",
      "list_has_all" -> "SELECT list_has_all(array(1,2,3), array(2,3))",
      "list_value" -> "SELECT list_value(1, 2, 3)",
      "array_agg" -> "SELECT array_agg(s) FROM t",
      "date_part" -> "SELECT date_part('year', DATE'2024-01-02')",
      "generate_series" -> "SELECT * FROM generate_series(1, 3)",
      "range_tbl" -> "SELECT * FROM range(1, 4)",
      "try_cast" -> "SELECT try_cast('x' AS INT)",
      "greatest" -> "SELECT greatest(1, 2)",
      "bar" -> "SELECT bar(1, 0, 10)",
      "regexp_extract_all" -> "SELECT regexp_extract_all('a1b2', '\\\\d', 0)"
    )
    for ((n, q) <- probes) {
      try { spark.sql(q).collect(); println(s"[fn] OK   $n") }
      catch { case e: Throwable => println(s"[fn] MISS $n: ${e.getClass.getSimpleName} ${e.getMessage.take(80).replace('\n',' ')}") }
    }
    spark.stop()
  }
}
