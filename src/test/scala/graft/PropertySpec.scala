package graft

import graft.operators.{RestConfig, RestStage, RowTransformStage}
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.scalacheck.Gen

/** Property-based coverage (SURVEY §5 strategy item 2) using raw
  * ScalaCheck generators sampled in-loop (no scalatest-plus bridge in
  * the offline dep set): CSV sink→source round-trips under arbitrary
  * delimiters/content, template substitution totality, and the
  * reference's keep-on-error row semantics.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val cell = Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
  private val delims = Seq(";", ",", "|", "\t")

  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  test("CSV sink → source round-trips rows for any delimiter") {
    for (trial <- 1 to 8) {
      val d = delims(trial % delims.size)
      val rows = List.fill(6)((sample(cell), sample(cell)))
      val df = rows.toDF("a", "b")
      val out = Files.createTempDirectory("graft-prop").toString + "/csv"
      Sources.writeCsv(df, out, d)
      val back = spark.read.option("header", "true").option("delimiter", d).csv(out)
      assert(back.count() == rows.size)
      val got = back.collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(got.toList == rows.sorted, s"delimiter '$d'")
    }
  }

  test("template substitution: filled iff every placeholder resolves") {
    for (_ <- 1 to 20) {
      val v = sample(Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty))
      val rowMap: Map[String, Any] = Map("x" -> v)
      val filled = RestStage.buildUri(
        RestConfig(host = "http://h", path = "/p/{x}"), rowMap)
      assert(filled.contains(s"http://h/p/$v"))
      val missing = RestStage.buildUri(
        RestConfig(host = "http://h", path = "/p/{y}"), rowMap)
      assert(missing.isEmpty)
    }
  }

  test("RowTransformStage: failing rows pass through unchanged with error count (§2c)") {
    val acc = spark.sparkContext.longAccumulator("errs")
    val df = Seq((1L, "ok"), (2L, "boom"), (3L, "ok")).toDF("id", "v")
    val stage = RowTransformStage("t", row => {
      if (row.getString(1) == "boom") throw new RuntimeException("nope")
      Row(row.getLong(0) * 10, row.getString(1))
    }, acc)
    val out = stage(spark, df).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((10L, "ok"), (2L, "boom"), (30L, "ok"))) // original row kept
    assert(acc.value == 1L)
  }
}
