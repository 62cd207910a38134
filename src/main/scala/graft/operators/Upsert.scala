package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Key-based upsert (SCD-1 / CDC merge): rows from `updates` replace
  * same-key rows in `base`; unmatched base rows pass through. The
  * declarative MERGE shape without a table format: one left-anti join
  * (shuffles only the base keys against the update keys) + a union —
  * both sides stay fully distributed, no driver-side state.
  *
  * 100 TB shape: the anti join shuffles on the merge key (or broadcasts
  * when the update batch is small — the common CDC case, and what AQE
  * picks at runtime); the union is plan-only. With partitioned parquet
  * sinks ([[graft.sources.Sources.writeParquet]]) rewrite only the
  * partitions the update batch touches (dynamic partition overwrite).
  */
object Upsert {

  def byKey(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    updates.unionByName(
      base.join(updates.select(keys.map(col): _*), keys, "left_anti"))
  }
}
