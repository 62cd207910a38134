package graft.tools

import graft.functions.{Dedup, TextFunctions}
import graft.functions.expressions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose q34 (PPJoin exact Jaccard) stage costs at a given
  * SF. Not part of the shipped API.
  */
object JacProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$d/documents.parquet")
    df.count()

    def time(name: String)(f: => Long): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"JPROBE $name%-28s run$r ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }

    val t = 0.6
    val docs = df.select(col("doc_id").as("doc"),
        array_sort(call_function("shingle_hashes",
          TextFunctions.tokens(col("text")), lit(3))).as("shs"))
      .select(col("doc"), size(col("shs")).as("n"), col("shs"))
    val prefixLen = greatest(
      col("n") - ceil(col("n") * t - lit(1e-9)).cast("int") + 1, lit(0))
    val prefix = docs.select(col("doc"), col("n"),
      posexplode(slice(col("shs"), lit(1), prefixLen)).as(Seq("p", "sh")))
    val alpha = ceil(lit(t / (1.0 + t)) * (col("a.n") + col("b.n")) - lit(1e-9))
    val ubound = lit(1) + least(col("a.n") - col("a.p") - 1, col("b.n") - col("b.p") - 1)
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc") &&
        col("a.n") * t <= col("b.n") && col("b.n") * t <= col("a.n") && ubound >= alpha)
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
    val i = call_function("sorted_intersect_count", col("sa"), col("sb"))
    val verified = cand
      .join(docs.select(col("doc").as("doc_a"), col("n").as("na"), col("shs").as("sa")), "doc_a")
      .join(docs.select(col("doc").as("doc_b"), col("n").as("nb"), col("shs").as("sb")), "doc_b")
      .withColumn("i", i)
      .select(col("doc_a"), col("doc_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= t)
      .distinct()

    val verifiedBc = cand
      .join(broadcast(docs.select(col("doc").as("doc_a"), col("n").as("na"), col("shs").as("sa"))), "doc_a")
      .join(broadcast(docs.select(col("doc").as("doc_b"), col("n").as("nb"), col("shs").as("sb"))), "doc_b")
      .withColumn("i", i)
      .select(col("doc_a"), col("doc_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= t)
      .distinct()

    // arrays ride along on the prefix rows (no verify join at all)
    val prefixW = docs.select(col("doc"), col("n"), col("shs"),
      posexplode(slice(col("shs"), lit(1), prefixLen)).as(Seq("p", "sh")))
    val iW = call_function("sorted_intersect_count", col("a.shs"), col("b.shs"))
    val verifiedW = prefixW.as("a")
      .join(prefixW.as("b"), col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc") &&
        col("a.n") * t <= col("b.n") && col("b.n") * t <= col("a.n") && ubound >= alpha)
      .withColumn("i", iW)
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        (col("i").cast("double") / (col("a.n") + col("b.n") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= t)
      .distinct()

    // early dedup of id-pairs + forced broadcast verify joins: candidate
    // side never shuffles with arrays attached
    val verifiedEarly = cand.dropDuplicates("doc_a", "doc_b")
      .join(broadcast(docs.select(col("doc").as("doc_a"), col("n").as("na"), col("shs").as("sa"))), "doc_a")
      .join(broadcast(docs.select(col("doc").as("doc_b"), col("n").as("nb"), col("shs").as("sb"))), "doc_b")
      .withColumn("i", i)
      .select(col("doc_a"), col("doc_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= t)

    time("full_orderby")(verified.orderBy("doc_a", "doc_b").count())
    time("full_orderby_early")(verifiedEarly.orderBy("doc_a", "doc_b").count())

    // inverted-index variant for comparison
    val inv = Dedup.jaccardPairs(df, "doc_id", "text", 3, t)
    time("inverted_index")(inv.count())
    spark.stop()
  }
}
