package graft

import graft.functions.{JsonOps, Scored, TopKAggregator}
import graft.operators.Skew
import org.apache.spark.sql.functions._

case class Li(l_returnflag: String, l_quantity: Double)

class UtilOpsSpec extends SparkSpec {
  import spark.implicits._

  test("flattenJson expands sampled schema incl. nested structs") {
    val df = Seq(
      (1L, """{"a": 1, "b": {"c": "x"}}"""),
      (2L, """{"a": 2, "b": {"c": "y"}}""")).toDF("id", "js")
    val flat = JsonOps.flattenJson(df, "js")
    assert(flat.columns.toSeq == Seq("id", "a", "b"))
    val rows = flat.select(col("id"), col("a"), col("b.c")).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 1L, "x"), (2L, 2L, "y")))
  }

  test("flattenJson is a no-op on all-null columns") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "js")
    assert(JsonOps.flattenJson(df, "js").columns.toSeq == Seq("id", "js"))
  }

  test("TopKAggregator keeps k best with deterministic ties, merge-safe across partitions") {
    val topk = udaf(new TopKAggregator(2), org.apache.spark.sql.Encoders.product[Scored])
    val df = Seq(
      ("g1", 5.0, 10L), ("g1", 5.0, 3L), ("g1", 9.0, 7L), ("g1", 1.0, 99L),
      ("g2", 2.0, 1L)).toDF("g", "score", "id").repartition(4)
    val got = df.groupBy("g").agg(topk(col("score"), col("id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("g1") == Seq(7L, 3L)) // 9.0 first; 5.0 tie broken to lower id
    assert(got("g2") == Seq(1L))
  }

  test("typed Dataset API: case-class encoder + groupByKey aggregation") {
    import spark.implicits._
    val ds = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity")).as[Li]
    val typed = ds.groupByKey(_.l_returnflag)
      .mapGroups((flag, it) => (flag, it.map(_.l_quantity).sum))
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) => assert(math.abs(v - untyped(k)) < 1e-6) }
  }

  test("saltedJoin is row-identical to the plain equi-join") {
    val large = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (9, "zz")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(large, small, "k", salt = 8).select("k", "v", "name")
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 1000)
  }
}
