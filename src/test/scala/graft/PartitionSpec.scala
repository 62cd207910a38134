package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partition-layout behaviors that matter at 100 TB: hive-style
  * partitioned writes, partition pruning at read (PartitionFilters, not
  * data filters), and the scalar-UDF registry (reference O15 / readme
  * TODO parity).
  */
class PartitionSpec extends SparkSpec {

  test("partitionBy write → read prunes partitions at the scan") {
    val out = Files.createTempDirectory("graft-part").toString + "/docs"
    Tables.documents(spark, sf)
      .write.partitionBy("lang").mode("overwrite").parquet(out)
    // layout: one directory per lang
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.exists(_.startsWith("lang=")))

    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    val s = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(s.contains("PartitionFilters") &&
      s.matches("(?s).*PartitionFilters: \\[.*lang.*\\].*"), s)
    val nEn = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(pruned.count() == nEn)
  }

  test("scalar UDF registry: spark.udf.register usable from sql stages") {
    spark.udf.register("luhn_ish", (s: String) => s.length % 10)
    val df = graft.operators.SqlStage("t", "SELECT luhn_ish('12345') AS x")
      .apply(spark, Tables.nation(spark, sf))
    assert(df.head().getInt(0) == 5)
  }
}
