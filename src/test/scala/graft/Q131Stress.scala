package graft

/** Scratch stress for the r12 de-flake: run q131 the way the bench
  * does — many concurrent invocations in one JVM — and fail loudly on
  * any exception (VERDICT r11 #2 repro harness; `sbt
  * "Test/runMain graft.Q131Stress"`).
  */
object Q131Stress {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[32]").getOrCreate()
    val q = SparkEntry.queries("q131_rest_pipeline")
    val passes = 6
    val streams = 10
    val pool = java.util.concurrent.Executors.newFixedThreadPool(streams)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val futs = (1 to streams).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit =
            try { val n = q(spark, sf).collect().length; require(n > 0) }
            catch { case t: Throwable => errs.incrementAndGet(); t.printStackTrace() }
        })
      }
      futs.foreach(_.get())
      println(f"[stress] pass $p: ${(System.nanoTime() - t0) / 1e9}%.2f s, errs=${errs.get()}")
    }
    pool.shutdown()
    spark.stop()
    if (errs.get() > 0) sys.exit(1)
    println("[stress] q131 clean")
  }
}
