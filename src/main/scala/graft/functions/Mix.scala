package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-mix rebalancing for training pipelines: deterministic
  * per-stratum down-sampling (e.g. "keep 75% of English, 25% of German")
  * with the portable md5-prefix trick (same family as q68's hash
  * sample): the first hex digit of md5(id) is uniform over 16 buckets
  * and identical in every engine, so rates are expressed in sixteenths
  * and the SAME rows are kept by Spark, DuckDB, or any re-run — no RNG,
  * no seed coordination, rows stay sampled-in forever (stable train/eval
  * membership across pipeline versions).
  *
  * 100 TB shape: a pure row-local filter — no shuffle, pushes past
  * column pruning, composes with any downstream operator.
  */
object Mix {

  /** Keep `sixteenths(stratum)/16` of each stratum's rows (strata absent
    * from the map are kept whole). Rates are per-id deterministic:
    * md5's first hex digit < the stratum's threshold digit.
    */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
                       sixteenths: Map[String, Int]): DataFrame = {
    require(sixteenths.values.forall(n => n >= 0 && n <= 16),
      "rates are sixteenths in [0, 16]")
    // '0'..'9','a'..'f' sort lexicographically, so "digit < threshold"
    // implements u < n/16; 'g' > 'f' keeps everything.
    val threshold = sixteenths.toSeq.sortBy(_._1).foldLeft(lit("g")) {
      case (acc, (stratum, n)) =>
        when(stratumCol === stratum, lit("0123456789abcdefg".charAt(n).toString))
          .otherwise(acc)
    }
    df.filter(substring(md5(idCol.cast("string")), 1, 1) < threshold)
  }
}
