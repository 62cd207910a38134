package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector / embedding operators. Dot products and norms are sequential
  * left-folds over the array in double precision (`aggregate` +
  * `zip_with`), which is bit-for-bit the order DuckDB's
  * list_cosine_similarity(DOUBLE[], DOUBLE[]) uses — so similarity
  * scores hash-match the oracle exactly, no rounding fudge.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ as a sequential double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = a·b / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors of each query vector: broadcast
    * the (small) query set against all candidates, rank per query. The
    * exact baseline; cost O(|Q|·N) — fine when |Q| is bounded.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = candidates.as("c")
      .join(broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("cid"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Deterministic pseudo-random hyperplane component via splitmix64
    * (public-domain mix function), scaled to [-0.5, 0.5).
    */
  private def splitmixUnit(seed: Long): Double = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of v·plane_j,
    * planes derived deterministically from (table, j, dim). Returns an
    * int bucket column usable in equality joins — the scale path for
    * ANN: candidates co-bucket, so the similarity join is shuffle-
    * parallel instead of O(N²).
    */
  def lshBucket(v: Column, dim: Int, bits: Int, table: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val plane = (0 until dim).map(dI => splitmixUnit(table.toLong * 1000003L + j * 1009L + dI))
      val dotP = (0 until dim).map(dI =>
        element_at(v, dI + 1).cast("double") * lit(plane(dI))).reduce(_ + _)
      shiftleft(when(dotP >= 0, 1L).otherwise(0L), j)
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed approximate top-k: queries join candidates sharing any
    * of `tables` bucket signatures, then exact cosine + rank within the
    * (much smaller) candidate set.
    */
  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              dim: Int, bits: Int = 4, tables: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def withBuckets(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("embedding"),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col("embedding"), dim, bits, t)): _*)).as(Seq("tbl", "bucket")))
    val qb = withBuckets(queries)
    val cb = withBuckets(candidates)
    val cand = qb.as("q")
      .join(cb.as("c"),
        col("q.tbl") === col("c.tbl") && col("q.bucket") === col("c.bucket") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("cid"),
        col("q.embedding").as("qv"), col("c.embedding").as("cv"))
      .distinct()
    val scored = cand.select(col("qid"), col("cid"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
