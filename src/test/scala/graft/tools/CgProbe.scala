package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: bisect whole-stage-codegen failures in new dialect
  * expressions — runs each candidate snippet with codegen fallback OFF
  * so a compile error surfaces as the failing snippet instead of a
  * silent interpreter downgrade.
  */
object CgProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(3).toDF("z")
    val snippets = Seq(
      "SELECT millisecond(make_time(1, 2, CAST(z AS DOUBLE) + 3.25)) AS m FROM df",
      "SELECT microsecond(CAST('2024-01-15 13:30:05.123' AS TIMESTAMP) + to_milliseconds(z)) AS m FROM df",
      "SELECT CAST(timezone(CAST('2024-01-15' AS TIMESTAMP)) AS BIGINT) AS m FROM df",
      "SELECT add(z) AS m, subtract(z) AS m2 FROM df",
      "SELECT like_escape('a' || z, 'ax%', 'x') AS m FROM df",
      "SELECT ilike_escape('a' || z, 'Ax%', 'x') AS m FROM df",
      "SELECT array_to_string(list_resize([z, z+1], 4), ',') AS m FROM df",
      "SELECT list_element(array_cross_product([CAST(z AS DOUBLE),2.0,3.0],[4.0,5.0,6.0]), 1) AS m FROM df",
      "SELECT length([z, z]) AS m FROM df",
      "SELECT json_array(z, 'a', NULL) AS m FROM df",
      "SELECT json_object() AS m FROM df",
      "SELECT json_structure('{\"a\": 1}') AS m FROM df",
      "SELECT json_contains('{\"a\": 1}', '1') AS m FROM df",
      "SELECT strftime(try_strptime('2024-01-15', ['%d/%m/%Y', '%Y-%m-%d']), '%Y-%m-%d') AS m FROM df",
      "SELECT octet_length(encode('ab' || z)) AS m FROM df",
      "SELECT CAST(make_time(1, 2, 3.0) AS VARCHAR) AS m FROM df",
      "SELECT strftime(make_timestamptz(2024, 1, z + 1, 13, 30, 5.5), '%Y-%m-%d %H:%M:%S') AS m FROM df",
      "SELECT hour(make_time(1, 2, CAST(z AS DOUBLE))) AS m FROM df"
    )
    snippets.foreach { s =>
      try {
        graft.operators.SqlStage("cg", s).apply(spark, df).collect()
        println(s"[ok]   $s")
      } catch {
        case e: Throwable =>
          println(s"[FAIL] $s :: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ").take(200)}")
      }
    }
    spark.stop()
  }
}

/** Scratch: the full q180 text under CODEGEN_ONLY against real data. */
object CgProbeQ180 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("DEBUG")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.createOrReplaceTempView("lineitem")
    try {
      val out = graft.operators.SqlStage("q180", graft.queries.ExtraQueries.sweep7SqlText).apply(spark, li)
      out.collect().take(2).foreach(println)
      println("[q180] OK")
    } catch {
      case e: Throwable =>
        println(s"[q180] FAIL ${e.getClass.getName}")
        var c: Throwable = e
        while (c != null) { println("  cause: " + Option(c.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ").take(300)); c = c.getCause }
    }
    spark.stop()
  }
}
