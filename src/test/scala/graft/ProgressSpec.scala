package graft

import graft.operators.ProgressListener
import java.nio.file.Files

/** O20/O23 parity: per-stage progress/ETA status line + CLI flags. */
class ProgressSpec extends SparkSpec {
  import spark.implicits._

  test("listener emits reference-shaped status lines with tasks, rows, ETA") {
    val lines = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val l = new ProgressListener(out = s => lines.add(s), cores = 4, intervalMs = 0L)
    spark.sparkContext.addSparkListener(l)
    try {
      spark.range(100000).toDF("n").repartition(8)
        .groupBy(($"n" % 10).as("k")).count().collect()
      // listener bus is async — poll until the final Tasks:n/n line lands
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
        !l.lastLine.matches(""".*Tasks:(\d+)/\1 .*""")) Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(l)
    assert(!lines.isEmpty)
    val line = l.lastLine
    assert(line.matches("""Stage \d+ \(.*\): Tasks:\d+/\d+ Rows:\d+ rows/s:\d+ avgT:\d+ms ETA:\d{2}:\d{2}:\d{2}"""),
      s"unexpected status line: $line")
    // a completed stage reports done == total
    val done = lines.toArray.map(_.toString).filter(_.matches(""".*Tasks:(\d+)/\1 .*"""))
    assert(done.nonEmpty, "no final Tasks:n/n line")
  }

  test("Main CLI flags: -i prints per-stage rows, -d deletes stale output, -v accepted") {
    val dir = Files.createTempDirectory("graft-cli").toFile
    val in = new java.io.File(dir, "in.csv")
    val w = new java.io.PrintWriter(in)
    w.println("v"); (1 to 20).foreach(w.println); w.close()
    val conf = new java.io.File(dir, "p.yml")
    val cw = new java.io.PrintWriter(conf)
    cw.println(
      """filters:
        |  - name: double
        |    actionType: derive
        |    actionConfig:
        |      columns:
        |        - {name: two, expr: "CAST(v AS INT) * 2"}
        |""".stripMargin)
    cw.close()
    val out = new java.io.File(dir, "out")
    // plant a stale output file for -d to remove
    out.mkdirs()
    val stale = new java.io.File(out, "stale.txt")
    new java.io.PrintWriter(stale) { print("old"); close() }
    Main.main(Array(in.getAbsolutePath, conf.getAbsolutePath, out.getAbsolutePath,
      "-i", "-d", "-v"))
    assert(!stale.exists(), "-d must delete the previous output")
    val back = spark.read.option("header", "true").csv(out.getAbsolutePath)
    assert(back.count() == 20)
    // unknown flags are rejected with usage guidance
    val e = intercept[IllegalArgumentException](
      Main.main(Array(in.getAbsolutePath, conf.getAbsolutePath, out.getAbsolutePath, "-x")))
    assert(e.getMessage.contains("unknown flag"))
  }

  test("stage reports preserve YAML filter order") {
    val dir = Files.createTempDirectory("graft-ord").toFile
    val in = new java.io.File(dir, "in.csv")
    val w = new java.io.PrintWriter(in)
    w.println("v"); (1 to 3).foreach(w.println); w.close()
    val yaml =
      """filters:
        |  - name: first
        |    actionType: derive
        |    actionConfig:
        |      columns: [{name: a, expr: "1"}]
        |  - name: second
        |    actionType: sql
        |    code: "SELECT * FROM df"
        |  - name: third
        |    actionType: derive
        |    actionConfig:
        |      columns: [{name: b, expr: "2"}]
        |""".stripMargin
    val res = graft.operators.Pipeline.runYaml(spark, yaml, in.getAbsolutePath)
    assert(res.stages.map(_.name) == Seq("first", "second", "third"))
    assert(res.stages.map(_.actionType) == Seq("derive", "sql", "derive"))
  }
}
