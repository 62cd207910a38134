package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing — the SCALE.md knob that removes the lineitem⋈orders
  * exchange at 100 TB: both sides written bucketed on the join key join
  * WITHOUT any shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero exchanges; results match the shuffled join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bkt")
    od.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("od_bkt")

    val joined = spark.table("li_bkt")
      .join(spark.table("od_bkt"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(graft.Tables.dec2(col("l_quantity"))).cast("double").as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located and co-sorted: sort-merge join with no shuffle of either side
    assert(!plan.contains("Exchange hashpartitioning"), plan)

    val expected = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(graft.Tables.dec2(col("l_quantity"))).cast("double").as("qty"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val got = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == expected)

    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS od_bkt")
  }
}
