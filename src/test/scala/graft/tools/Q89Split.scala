package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: split q89's latency — minhash pair generation vs the CC
  * loop vs final aggregate (uncontended, QProbe session config).
  */
object Q89Split {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sfDir)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q89split] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    graft.SparkEntry.queries("q89_dedup_clusters")(spark, sfDir).count()
    (1 to 2).foreach { i =>
      val pairs = time(s"pairs#$i") {
        val p = graft.functions.Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 3, numHashes = 32, bands = 8, threshold = 0.6).localCheckpoint(true)
        println(s"[q89split] n_pairs=${p.count()}")
        p
      }
      val labels = time(s"cc#$i")(
        graft.functions.Dedup.connectedComponents(pairs))
      time(s"agg#$i")(labels.groupBy(col("comp")).agg(count(lit(1))).count())
    }
    spark.stop()
  }
}
