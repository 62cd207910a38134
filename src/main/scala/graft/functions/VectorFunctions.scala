package graft.functions

import graft.functions.expressions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector / embedding operators, backed by the native Catalyst
  * expressions in [[graft.functions.expressions]] (tight JVM loops over
  * ArrayData — the aggregate/zip_with formulation stays interpreted and
  * the per-bit LSH expression tree broke janino). Dot products and norms
  * fold sequentially in double precision, bit-for-bit matching DuckDB's
  * list_cosine_similarity / list_dot_product over DOUBLE[], so scores
  * hash-match the oracle exactly.
  */
object VectorFunctions {

  /** cos(a,b); requires GraftFunctions registered on the session (done
    * automatically by the DataFrame entry points below).
    */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** ‖a‖₂. */
  def norm(a: Column): Column = call_function("vec_norm", a)

  /** Brute-force top-k cosine neighbors of each query vector: broadcast
    * the (small) query set against all candidates, rank per query. The
    * exact baseline; cost O(|Q|·N) — fine when |Q| is bounded.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(queries.sparkSession)
    val joined = candidates.as("c")
      .join(broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("cid"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Pairwise embedding near-dup detection at scale: banded sign-LSH
    * candidate generation (equality self-join on (table, bucket) — the
    * same banding shape as [[Dedup.lshCandidates]] for MinHash), then
    * exact cosine verification restricted to candidates. Precision is
    * exact (every emitted pair really clears `threshold`); recall per
    * pair at angle θ is 1-(1-(1-θ/π)^bits)^tables — e.g. at cos ≥ 0.9
    * (θ≈26°) the defaults give ≥ 0.99, while at the near-random
    * cos ≈ 0.45 the fixture uses it degrades gracefully (the exact
    * all-pairs join in q46 stays the verification oracle; see
    * ExtraQueries.q46EmbedNearDup).
    *
    * 100 TB shape: signatures are row-local (native expression, no
    * shuffle), candidates come from a bucketed equality join that only
    * shuffles (id, table, bucket) triples — the wide vector payload is
    * re-joined by id only for the verified candidate set.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, bits: Int = 8, tables: Int = 16): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val sig = df.select(col(idCol).as("vid"),
      posexplode(call_function("lsh_signature", col(vecCol), lit(bits), lit(tables)))
        .as(Seq("tbl", "bucket")))
    val cand = sig.as("x")
      .join(sig.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("id_a"), col("y.vid").as("id_b"))
      .distinct()
    val e = df.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    cand.join(e.as("ea"), col("id_a") === col("ea.vid"))
      .join(e.as("eb"), col("id_b") === col("eb.vid"))
      .select(col("id_a"), col("id_b"), cosine(col("ea.vec"), col("eb.vec")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-bucketed approximate top-k: queries join candidates sharing any
    * of `tables` random-hyperplane bucket signatures, then exact cosine
    * + rank within the (much smaller) candidate set — the scale path:
    * the similarity join is a shuffle-parallel equality join on
    * (table, bucket) instead of O(N²).
    */
  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              bits: Int = 4, tables: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(queries.sparkSession)
    def withBuckets(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("embedding"),
        posexplode(call_function("lsh_signature", col("embedding"), lit(bits), lit(tables)))
          .as(Seq("tbl", "bucket")))
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
