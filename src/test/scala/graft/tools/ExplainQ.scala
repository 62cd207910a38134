package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print the formatted physical plan of selected queries.
  * Usage: runMain graft.tools.ExplainQ q77_ann_ivf,q78_bpe_tokens
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    val names = if (args.nonEmpty) args(0).split(",").toSeq else Seq("q77_ann_ivf")
    names.foreach { n =>
      println(s"===== $n")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
