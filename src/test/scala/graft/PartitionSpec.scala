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

  test("bucketed tables join with NO exchange on either side (the SCALE.md q03 knob)") {
    val root = Files.createTempDirectory("graft-bucket").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    // at test SF both sides fit the broadcast threshold, which would
    // sidestep the shuffle question entirely — disable it so the plan
    // is the sort-merge a 100 TB fact⋈fact join gets
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Sources.writeBucketed(li, "li_b", s"$root/li",
        Seq("l_orderkey"), buckets = 8)
      graft.sources.Sources.writeBucketed(ord, "ord_b", s"$root/ord",
        Seq("o_orderkey"), buckets = 8)
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // the bucketing IS the hash partitioning: sort-merge with no
      // shuffle on either side, scans marked bucketed
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // same rows as the shuffled join of the raw frames
      assert(joined.count() == li.join(ord,
        col("l_orderkey") === col("o_orderkey")).count())
      // the unbucketed baseline DOES shuffle — the knob is what removes it
      val baseline = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(baseline.contains("Exchange hashpartitioning"), baseline)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("writeSorted: per-file key ranges are pairwise disjoint (footer-pruning property)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-sorted").toString + "/orders"
    graft.sources.Sources.writeSorted(
      Tables.orders(spark, sf), dir, Seq("o_orderkey"), files = 8)
    // one row per written FILE with its min/max of the sort key — the
    // exact stats parquet footers expose to the scan's row-group filter
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 4, s"expected several files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: hi=$hi1 vs next lo=$lo2")
      case _ =>
    }
    // rows and content survive the layout unchanged
    assert(spark.read.parquet(dir).count() == Tables.orders(spark, sf).count())
    // a selective range filter now touches a bounded slice of files:
    // the matching files' ranges cover the predicate, others can't
    val n = Tables.orders(spark, sf).count()
    val probe = ranges(ranges.length / 2)._1
    val hits = ranges.count { case (lo, hi) => lo <= probe + 10 && probe <= hi }
    assert(hits <= 2, s"a 10-key range should sit in at most 2 files, hit $hits of ${ranges.length}")
    assert(n > 0)
  }

  test("writeSorted read side: a selective sort-key filter SKIPS data (scan metrics)") {
    import org.apache.spark.sql.functions._
    // the complementary half of the disjoint-ranges proof above: the
    // pruning the layout EXISTS for actually fires at read time — the
    // scan's own metrics show it read a bounded slice, not the table
    val dir = java.nio.file.Files.createTempDirectory("graft-sortread").toString + "/orders"
    graft.sources.Sources.writeSorted(
      Tables.orders(spark, sf), dir, Seq("o_orderkey"), files = 8)
    val total = spark.read.parquet(dir).count()
    val keys = spark.read.parquet(dir).agg(
      min(col("o_orderkey")), max(col("o_orderkey"))).collect().head
    val mid = (keys.getLong(0) + keys.getLong(1)) / 2
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.read.parquet(dir)
        .filter(col("o_orderkey").between(mid, mid + 10))
      q.collect()
      val scan = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      // the range predicate reached the parquet scan...
      assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual"),
        scan.metadata("PushedFilters"))
      // ...and footer stats pruned row groups: the scan OUTPUT a small
      // slice of the table (disjoint per-file ranges → the 10-key range
      // lives in ~1 of 8 files; an unsorted layout outputs ~everything
      // because every row group spans the whole key range)
      val scanned = scan.metrics("numOutputRows").value
      assert(scanned <= total / 4,
        s"scan output $scanned of $total rows — footer pruning didn't fire")
      assert(scanned > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("scalar UDF registry: spark.udf.register usable from sql stages") {
    spark.udf.register("luhn_ish", (s: String) => s.length % 10)
    val df = graft.operators.SqlStage("t", "SELECT luhn_ish('12345') AS x")
      .apply(spark, Tables.nation(spark, sf))
    assert(df.head().getInt(0) == 5)
  }
}
