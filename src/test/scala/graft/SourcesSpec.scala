package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL + parquet sink coverage: lossless roundtrips, schema-first
  * reads, partitioned writes whose downstream scans actually prune
  * (asserted on the plan, not assumed).
  */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("out").toString

  test("jsonl roundtrip is lossless and line-splittable") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val path = tmp("jsonl")
    Sources.writeJsonl(docs, path)
    val back = Sources.loadJsonl(spark, path)
    assert(back.count() == docs.count())
    // values survive, not just counts
    val a = docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val b = back.select("doc_id", "lang", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(a.sameElements(b))
  }

  test("jsonl schema-first read skips inference and casts as declared") {
    val path = tmp("jsonl_schema")
    Sources.writeJsonl(Tables.documents(spark, sf).select("doc_id", "lang"), path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType)))
    val back = Sources.loadJsonl(spark, path, Some(schema))
    assert(back.schema == schema)
    assert(back.count() == Tables.documents(spark, sf).count())
  }

  test("load() dispatches .jsonl and still rejects unknown extensions") {
    val path = tmp("jsonl_ext") + ".jsonl"
    Sources.writeJsonl(Tables.documents(spark, sf).select("doc_id"), path)
    assert(Sources.load(spark, path).count() > 0)
    val e = intercept[IllegalArgumentException](Sources.load(spark, "x.avro"))
    assert(e.getMessage.contains("Unsupported"))
  }

  test("orc sink → source round-trips with partitioning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, "en", "alpha"), (2L, "fr", "beta"), (3L, "en", "gamma"))
      .toDF("id", "lang", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/data.orc"
    graft.sources.Sources.writeOrc(df, out, partitionBy = Seq("lang"))
    val back = graft.sources.Sources.load(spark, out)
    assert(back.count() == 3)
    assert(back.filter(col("lang") === "en").select("text")
      .collect().map(_.getString(0)).toSet == Set("alpha", "gamma"))
  }

  test("partitioned parquet write prunes partitions on read (plan-asserted)") {
    val path = tmp("part_parquet")
    Sources.writeParquet(Tables.documents(spark, sf).select("doc_id", "lang", "text"),
      path, partitionBy = Seq("lang"))
    val scan = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = scan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[.*lang.*\\].*"), plan)
    // pruned read returns exactly the en slice
    val expected = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(scan.count() == expected && expected > 0)
  }

  test("parquet sink honors the zstd codec") {
    val path = tmp("zstd_parquet")
    Sources.writeParquet(Tables.documents(spark, sf).select("doc_id", "text"), path)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.getName.contains(".zstd.")))
    assert(spark.read.parquet(path).count() == Tables.documents(spark, sf).count())
  }

  test("Tables.rowCount keys its memo on the file-metadata snapshot, not the bare path") {
    // the memo is load-bearing for the persisted-index cache keys
    // (q104/q168-q170): an in-process rewrite of the parquet MUST
    // change the key, or a stale count silently keys a stale index
    // (VERDICT r18 #4 / ADVICE — the dc3f8d4 persisted-LM pattern)
    val path = tmp("rowcount_rewrite")
    spark.range(3).toDF("id").repartition(1).write.mode("overwrite").parquet(path)
    assert(Tables.rowCount(spark, path) == 3L)
    spark.range(7).toDF("id").repartition(1).write.mode("overwrite").parquet(path)
    assert(Tables.rowCount(spark, path) == 7L,
      "rewritten parquet must re-key the memo (stale-count hazard)")
    // and the memo still memoizes: same snapshot → same cached value
    assert(Tables.rowCount(spark, path) == 7L)
  }
}
