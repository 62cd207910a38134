package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: jobs per CC round with AQE OFF (one action = one job). */
object CcJobs2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.conf.set("spark.graft.cc.localEdges", "0") // force the distributed loop
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val path = (0L until 199L).map(i => (i, i + 1))
    val df = path.toDF("doc_a", "doc_b")
    graft.functions.Dedup.connectedComponents(df) // warm
    Thread.sleep(500)
    jobs.set(0)
    graft.functions.Dedup.connectedComponents(df)
    Thread.sleep(500)
    println(s"[ccjobs2] jobs=${jobs.get} (path-200, AQE off)")
    spark.stop()
  }
}
