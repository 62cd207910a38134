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
    *
    * Parameter sizing: with fixed `bits`, expected bucket population is
    * n/2^bits, so candidate pairs grow O(n²/2^bits) — `bits` must scale
    * with the corpus: bits ≈ log₂(n) − log₂(target bucket size) (e.g.
    * n=10⁹ with ~1k-row buckets → bits ≈ 20). `maxBucketSize` is the
    * backstop for CLUSTERED corpora where some buckets stay hot at any
    * bits (duplicated embeddings, zero vectors): buckets over the cap
    * are deterministically sampled down to it (rank by xxhash64(id)),
    * bounding any one bucket's pair blowup at cap²/2. Sampling can drop
    * pairs whose BOTH members were evicted from EVERY shared bucket —
    * with `tables` independent tables that loss is (1-(cap/m)²)^tables
    * per hot bucket of size m, and a bucket over the cap is itself the
    * signal that `bits` is undersized for the corpus. Set
    * `maxBucketSize = 0` to disable.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, bits: Int = 8, tables: Int = 16,
                      maxBucketSize: Int = 4096): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val cand = lshPairCandidates(df, idCol, vecCol, bits, tables, maxBucketSize)
    val e = df.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    cand.join(e.as("ea"), col("id_a") === col("ea.vid"))
      .join(e.as("eb"), col("id_b") === col("eb.vid"))
      .select(col("id_a"), col("id_b"), cosine(col("ea.vec"), col("eb.vec")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Candidate stage of [[lshNearDupPairs]]: distinct (id_a, id_b) pairs
    * sharing any (table, bucket), with the hot-bucket cap applied.
    * Exposed for tests and for callers that verify with their own
    * distance.
    */
  def lshPairCandidates(df: DataFrame, idCol: String, vecCol: String,
                        bits: Int, tables: Int, maxBucketSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(df.sparkSession)
    val raw = df.select(col(idCol).as("vid"),
      posexplode(call_function("lsh_signature", col(vecCol), lit(bits), lit(tables)))
        .as(Seq("tbl", "bucket")))
    val sig =
      if (maxBucketSize <= 0) raw
      else {
        // Deterministic down-sample of hot buckets: one extra shuffle of
        // the id-triples (same key as the join below), O(m log m) per
        // bucket instead of the join's O(m²).
        val w = Window.partitionBy(col("tbl"), col("bucket")).orderBy(xxhash64(col("vid")), col("vid"))
        raw.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= maxBucketSize).drop("rn")
      }
    sig.as("x")
      .join(sig.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("id_a"), col("y.vid").as("id_b"))
      .distinct()
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
