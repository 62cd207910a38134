package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSON-string column helpers — the reference carries nested data as
  * JSON strings (SURVEY §1: filters.py:78 stores REST responses via
  * json.dumps; fullExample.yml.old:75-91 flattens with pd.json_normalize).
  */
object JsonOps {

  /** Flatten-all: infer the JSON schema from one sampled non-null value
    * (a deliberate, documented one-row driver collect — schema inference
    * is metadata work, not data flow; SURVEY §7 hard part 3), then
    * `from_json` + expand `parsed.*` alongside the original columns.
    */
  def flattenJson(df: DataFrame, jsonCol: String, dropSource: Boolean = true): DataFrame = {
    val sample = df.select(col(jsonCol)).filter(col(jsonCol).isNotNull).limit(1).collect()
    if (sample.isEmpty) df
    else {
      val ddl = df.sparkSession.range(1)
        .select(schema_of_json(lit(sample.head.getString(0))).as("s"))
        .head().getString(0)
      val parsed = df.withColumn("__parsed", from_json(col(jsonCol), ddl, Map.empty[String, String]))
      val base = if (dropSource) parsed.drop(jsonCol) else parsed
      base.select(col("*"), col("__parsed.*")).drop("__parsed")
    }
  }
}
