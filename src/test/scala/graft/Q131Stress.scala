package graft

/** Scratch stress for the r12 de-flake (`sbt "Test/runMain
  * graft.Q131Stress"`): run q131 the way the bench does — many
  * concurrent streams in one JVM — RACING q124, whose batch registers
  * the shared temp-view name `df` with the nation table. On a single
  * shared session this reproduces the r11/r12 bench failure
  * (`UNRESOLVED_COLUMN lang ... did you mean n_nationkey`): every
  * SqlStage registers its stage input as `df`, so q131's pipeline SQL
  * can resolve another stream's relation. With one `newSession()` per
  * task (independent temp-view catalogs — the Bench r12 fix) the mix
  * is clean.
  */
object Q131Stress {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[32]").getOrCreate()
    val qRest = SparkEntry.queries("q131_rest_pipeline")
    val qCopy = SparkEntry.queries("q124_copy_roundtrip")
    val passes = 6
    val streams = 10
    val pool = java.util.concurrent.Executors.newFixedThreadPool(streams)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val futs = (1 to streams).map { i =>
        pool.submit(new Runnable {
          def run(): Unit =
            try {
              val sess = spark.newSession()
              graft.functions.expressions.GraftFunctions.register(sess)
              // ONE q124 stream races nine q131 streams — the df-view
              // race under test; several q124s at once would instead
              // race each other on the shared /tmp COPY path (user
              // error in any engine, DuckDB included: the bench queue
              // runs each query once per pass)
              val q = if (i == 1) qCopy else qRest
              val n = q(sess, sf).collect().length
              require(n > 0)
            } catch { case t: Throwable => errs.incrementAndGet(); t.printStackTrace() }
        })
      }
      futs.foreach(_.get())
      println(f"[stress] pass $p: ${(System.nanoTime() - t0) / 1e9}%.2f s, errs=${errs.get()}")
    }
    pool.shutdown()
    spark.stop()
    if (errs.get() > 0) sys.exit(1)
    println("[stress] q131/q124 mixed-session stress clean")
  }
}
