package graft.tools
import org.apache.spark.sql.SparkSession

object CgProbeQ180Cols {
  val cols = Seq(
    "CAST(tms AS STRING) AS tmv",
    "CAST(hour(tm) AS INT) AS th",
    "CAST(minute(tm) AS INT) AS tmin",
    "CAST(second(tm) AS INT) AS tsec",
    "CAST(millisecond(tm) AS BIGINT) AS tm_ms",
    "CAST(microsecond(tm) AS BIGINT) AS tm_us",
    "CAST(millisecond(ts) AS BIGINT) AS ts_ms",
    "CAST(timezone(ts) AS BIGINT) AS tz_s",
    "CAST(epoch_ns(ts) AS BIGINT) AS ens",
    "strftime(make_timestamptz(2024, 1, k % 28 + 1, 13, 30, 5.5), '%Y-%m-%d %H:%M:%S') AS mtz",
    "like_escape(l_returnflag || '%', l_returnflag || 'x%', 'x') AS le",
    "array_to_string(list_resize([k, CAST(ln AS BIGINT)], 4), ',') AS lr",
    "json_array(k, l_returnflag, NULL) AS ja",
    "json_structure(json_object('q', CAST(l_quantity AS INT), 'f', l_returnflag)) AS js",
    "json_contains(json_object('f', l_returnflag), '\"A\"') AS jc",
    "strftime(try_strptime(strftime(ts, '%Y-%m-%d'), ['%d/%m/%Y', '%Y-%m-%d']), '%Y-%m-%d') AS tsp",
    "CAST(octet_length(encode(l_returnflag || l_linestatus)) AS INT) AS ol"
  )
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.createOrReplaceTempView("lineitem")
    val cte = """WITH t AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
               l_returnflag, l_linestatus, l_quantity,
               make_time(CAST(l_quantity AS INT) % 24,
                         CAST(l_partkey AS INT) % 60,
                         CAST(CAST(l_suppkey AS INT) % 60 AS DOUBLE) + 0.25) AS tm,
               make_time(CAST(l_quantity AS INT) % 24,
                         CAST(l_partkey AS INT) % 60,
                         CAST(CAST(l_suppkey AS INT) % 60 AS DOUBLE)) AS tms,
               CAST(l_shipdate AS TIMESTAMP)
                 + to_milliseconds(CAST(l_partkey AS INT) % 90000) AS ts
        FROM lineitem WHERE l_orderkey < 60) SELECT k, ln, """
    cols.foreach { c =>
      try {
        graft.operators.SqlStage("cg", cte + c + " FROM t ORDER BY k, ln").apply(spark, li).collect()
        println(s"[ok]   $c")
      } catch {
        case e: Throwable => println(s"[FAIL] $c :: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120)}")
      }
    }
    spark.stop()
  }
}
