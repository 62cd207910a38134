package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: sixth dialect probe sweep — run every DuckDB-validated
  * scalar call (/tmp/duck_probe6.json) through SqlStage and report the
  * ones that throw (candidates for closure or guided errors).
  */
object Sweep6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1).toDF("z")
    if (!new java.io.File("/tmp/duck_probe6.tsv").isFile) {
      // the probe list is generated driver-side from duckdb_functions()
      // (see the r14 session notes); without it this diagnostic no-ops
      println("[sweep6] /tmp/duck_probe6.tsv missing — generate it from " +
        "duckdb_functions() first (fn\\tSELECT fn(args) AS m\\tresult)")
      spark.stop()
      return
    }
    val entries = scala.io.Source.fromFile("/tmp/duck_probe6.tsv").getLines()
      .map(_.split("\t")).collect { case a if a.length >= 2 => (a(0), a(1)) }
      .toSeq
    var okN, failN = 0
    entries.foreach { case (fn, sql) =>
      try {
        graft.operators.SqlStage("s", sql).apply(spark, df).collect()
        okN += 1
      } catch {
        case e: Throwable =>
          failN += 1
          println(s"[miss] $fn :: $sql :: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(110)}")
      }
    }
    println(s"[sweep6] ok=$okN fail=$failN")
    spark.stop()
  }
}
