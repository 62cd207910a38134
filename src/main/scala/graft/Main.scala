package graft

import graft.operators.Pipeline
import org.apache.spark.sql.SparkSession

/** CLI parity with the reference (O23, /root/reference/filefilter.py:381-409):
  * `graft.Main IN CONFIG OUT` — load IN, fold the YAML stages, write OUT.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: graft.Main <input> <config.yml> <output>")
    val Array(in, confPath, out) = args.take(3)
    // spark-submit injects spark.master; GraftSession defaults local[*].
    // Only stop the session if this invocation created it — Main is also
    // callable in-process (tests, notebooks) against a live session.
    val preExisting = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).isDefined
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val yaml = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(confPath)))
    val res = Pipeline.runYaml(spark, yaml, in, Some(out))
    res.stages.foreach(r => println(s"[graft] stage ${r.name} (${r.actionType}) done"))
    if (!preExisting) spark.stop()
  }
}
