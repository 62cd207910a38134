package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Hot-bucket capping shared by the LSH family ([[VectorFunctions]]
  * sign-LSH buckets, [[Dedup]] MinHash band buckets). Any
  * bucketed-equality-join candidate generator has the same failure
  * mode: a bucket of size m produces m²/2 candidate pairs, so one
  * pathological bucket (duplicated embeddings, boilerplate/empty
  * documents, an undersized signature space) turns a near-linear plan
  * quadratic. The cap deterministically down-samples every bucket to
  * `cap` members (rank by xxhash64(id) — stable across runs and
  * partitionings), bounding any bucket's pair blowup at cap²/2.
  */
object Buckets {

  /** Keep at most `cap` rows per bucket (the partition defined by
    * `bucketCols`), ranked by xxhash64 of `idCol`. One extra shuffle of
    * the input rows on the same key the candidate join uses —
    * O(m log m) per bucket instead of the join's O(m²). `cap <= 0`
    * disables. `obs` surfaces `rows_evicted` / `hot_buckets` /
    * `max_bucket_size` through `Dataset.observe` when the query runs
    * (no extra pass): at 100 TB an operator watches these to learn the
    * signature space is undersized instead of discovering it as missing
    * pairs.
    */
  def capHot(df: DataFrame, bucketCols: Seq[Column], idCol: Column,
             cap: Int, obs: Option[Observation] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (cap <= 0) df
    else {
      val w = Window.partitionBy(bucketCols: _*).orderBy(xxhash64(idCol), idCol)
      val ranked = df.withColumn("rn", row_number().over(w))
      val audited = obs match {
        case Some(o) => ranked.observe(o,
          sum(when(col("rn") > cap, 1L).otherwise(0L)).as("rows_evicted"),
          // one row per hot bucket sits at rank cap+1 (observe forbids
          // distinct aggregates, so count those rows instead)
          count(when(col("rn") === cap + 1, 1)).as("hot_buckets"),
          max(col("rn")).as("max_bucket_size"))
        case None => ranked
      }
      audited.filter(col("rn") <= cap).drop("rn")
    }
  }
}
