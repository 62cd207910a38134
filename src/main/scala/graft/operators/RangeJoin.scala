package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unkeyed interval (range) joins at scale. Spark plans a bare
  * `ts BETWEEN start AND end` join as a BroadcastNestedLoopJoin —
  * O(rows × intervals), the classic 100 TB killer. The standard fix is
  * binning: quantize time into fixed-width bins, explode each interval
  * over the bins it covers, and equi-join on the bin — one shuffle on an
  * 8-byte key, exact containment re-checked as a cheap post-probe
  * filter. Each qualifying (row, interval) pair meets in EXACTLY the bin
  * containing ts, so the join needs no distinct.
  *
  * Bin width tuning: cost ≈ rows + Σ interval_len/bin. Pick bin ≈ median
  * interval length so each interval explodes to ~2 bins; hot bins
  * (bursty rows) are split by AQE skew handling like any equality join.
  */
object RangeJoin {

  /** Join `rows` to the intervals whose [startCol, endCol) half-open
    * window contains `tsCol`. Both sides keep all their columns.
    */
  def byTime(rows: DataFrame, tsCol: String,
             intervals: DataFrame, startCol: String, endCol: String,
             binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    // floor(floor(x)/w) == floor(x/w) for integer w — second-truncated
    // unix_timestamp bins agree with the precise-timestamp bins.
    val rb = rows.withColumn("__bin",
      floor(unix_timestamp(col(tsCol)) / binSeconds))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(unix_timestamp(col(startCol)) / binSeconds),
        floor(unix_timestamp(col(endCol)) / binSeconds))))
    rb.join(ib, rb("__bin") === ib("__bin") &&
        col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
