package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation (lineitem ⋈ orders ⋈ customer ⋈ broadcast nation)
    * with a window rank — the SURVEY §7 "minimum slice" flagship.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    CoreQueries.q03JoinRevenueByNation(spark, d)
      .withColumn("rank", row_number().over(Window.orderBy(col("revenue").desc, col("n_name"))))
      .filter(col("rank") <= 5)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ TextQueries.all ++ VectorQueries.all ++ ExtraQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.sql ++ TextQueries.sql ++ VectorQueries.sql ++ ExtraQueries.sql
}
