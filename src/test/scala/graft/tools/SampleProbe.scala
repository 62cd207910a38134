package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: r16 sample-order + percentage-reservoir smoke. */
object SampleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = spark.range(100).toDF("r")
    df.createOrReplaceTempView("w")
    def q(sql: String) =
      graft.operators.SqlStage("s", sql).apply(spark, df).collect()
    println("pct25of40: " + q("SELECT count(*) AS n FROM (SELECT * FROM (SELECT r FROM w WHERE r < 40) t USING SAMPLE reservoir(25%))").head.getLong(0))
    println("pct10of25(2.5->3): " + q("SELECT count(*) AS n FROM (SELECT * FROM (SELECT r FROM w WHERE r < 25) t USING SAMPLE reservoir(10%))").head.getLong(0))
    println("sizefirst: " + q("SELECT count(*) AS n FROM (SELECT * FROM (SELECT r FROM w WHERE r < 25) t USING SAMPLE 50% (reservoir, 7))").head.getLong(0))
    // WHERE + exact-n: sample 10 from base 100, THEN filter — count < 10
    val c1 = q("SELECT count(*) AS n FROM (SELECT * FROM w WHERE r < 50 USING SAMPLE reservoir(10 ROWS) REPEATABLE (7))").head.getLong(0)
    val c2 = q("SELECT count(*) AS n FROM (SELECT * FROM w WHERE r < 50 USING SAMPLE reservoir(10 ROWS) REPEATABLE (7))").head.getLong(0)
    println(s"whereRows: $c1 deterministic=${c1 == c2}")
    // pct reservoir WITH where: n = round(10% of base 100) = 10 pre-filter
    val c3 = q("SELECT count(*) AS n FROM (SELECT * FROM w WHERE r < 50 USING SAMPLE reservoir(10%) REPEATABLE (7))").head.getLong(0)
    println(s"wherePct: $c3 (should equal whereRows $c1)")
    // qualified refs survive the restructure
    println("qualified: " + q("SELECT t.r FROM w t WHERE t.r < 50 USING SAMPLE reservoir(5 ROWS) REPEATABLE (3)").length)
    spark.stop()
  }
}
