package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: count Spark jobs per connectedComponents round (VERDICT
  * r15 #3 — the observed-metric fusion should pay ONE job per round;
  * the fallback count() would make it two).
  */
object CcJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
    val t0 = System.nanoTime()
    graft.functions.Dedup.connectedComponents(df)
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    // 200-node path needs ~8 doubling rounds; pre-loop setup adds a
    // couple of jobs (edges/labels checkpoints)
    println(f"[ccjobs] jobs=${jobs.get} wall=$dt%.2f s (path-200)")
    spark.stop()
  }
}
