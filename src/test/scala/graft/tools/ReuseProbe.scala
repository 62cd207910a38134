package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.Exchange

/** Scratch: why two seemingly-identical exchanges in one plan don't
  * reuse — print each Exchange's canonicalized form and the pairwise
  * equality matrix. AQE off so the static plan is the executed shape.
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q112_dsir_scores")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    println(s"[reuseprobe] ${exchanges.size} exchanges")
    exchanges.zipWithIndex.foreach { case (e, i) =>
      println(s"[reuseprobe] --- exchange $i hash=${e.canonicalized.hashCode()} " +
        s"${e.nodeName}")
    }
    for (i <- exchanges.indices; j <- exchanges.indices if i < j) {
      val eq = exchanges(i).sameResult(exchanges(j))
      if (exchanges(i).canonicalized.hashCode() == exchanges(j).canonicalized.hashCode() || eq)
        println(s"[reuseprobe] pair ($i,$j) sameResult=$eq")
    }
    // dump the canonical trees of the two heaviest (first two hash-part)
    exchanges.take(6).zipWithIndex.foreach { case (e, i) =>
      println(s"[reuseprobe] ===== canonical $i =====")
      println(e.canonicalized.toString.linesIterator.take(12).mkString("\n"))
    }
    spark.stop()
  }
}
