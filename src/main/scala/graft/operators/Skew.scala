package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is lopsided (AQE's
  * skew-join handles sort-merge skew at runtime; explicit salting is the
  * deterministic-plan alternative, and the only option when AQE can't
  * split, e.g. broadcast-ineligible aggregations over hot keys).
  */
object Skew {

  /** Salted equi-join: the large side spreads each key over `salt`
    * sub-keys; the small side is replicated `salt` times. Result is
    * row-identical to `large.join(small, key)` but the shuffle of a hot
    * key fans out over `salt` reducers.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    val l = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
