package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[2]").appName("probe")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.range(10).selectExpr("id AS i", "id % 3 AS g").createOrReplaceTempView("t")
    def tryq(label: String, q: String): Unit =
      try println(s"$label OK: " + spark.sql(q).collect().take(3).mkString(" | "))
      catch { case e: Exception => println(s"$label ERR: " + e.getMessage.take(150)) }
    tryq("percentile_within", "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY i) AS m FROM t")
    tryq("stragg_orderby", "SELECT g, string_agg(i, ',' ORDER BY i DESC) AS s FROM t GROUP BY g ORDER BY g")
    tryq("listagg_within", "SELECT g, listagg(i, ',') WITHIN GROUP (ORDER BY i DESC) AS s FROM t GROUP BY g ORDER BY g")
    tryq("arrayagg_orderby", "SELECT g, array_agg(i ORDER BY i DESC) AS s FROM t GROUP BY g ORDER BY g")
    tryq("frame_exclude", "SELECT i, sum(i) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS s FROM t ORDER BY i LIMIT 3")
    tryq("string_agg_plain", "SELECT g, string_agg(i, ',') AS s FROM t GROUP BY g ORDER BY g")
    spark.stop()
  }
}
