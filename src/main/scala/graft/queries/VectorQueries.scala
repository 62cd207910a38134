package graft.queries

import graft.Tables._
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float> dim 64):
  * exact brute-force cosine top-k (oracle-checked bit-for-bit against
  * DuckDB's list_cosine_similarity on DOUBLE[]), an LSH-bucketed
  * approximate variant (the 100 TB path, rows-only), and exact-fold
  * vector norms.
  */
object VectorQueries {

  /** Banded sign-LSH embedding near-dup pairs — the scale path for
    * pairwise embedding dedup (Spark-only planes, rows-only check;
    * precision is exact by construction, recall vs the q46 all-pairs
    * oracle asserted in DedupSpec).
    */
  def q37EmbedNearDupLsh(s: SparkSession, d: String): DataFrame =
    VF.lshNearDupPairs(embeddings(s, d), "vec_id", "embedding",
        threshold = 0.45, bits = 8, tables = 16)
      .orderBy(col("id_a"), col("id_b"))

  /** Brute-force cosine top-5 for query vectors vec_id < 10. */
  def q40CosineTopk(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    VF.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
      .select(col("qid"), col("cid"), col("cos"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** LSH-bucketed approximate top-5 (Spark-only planes — rows-only
    * check; recall vs q40 asserted in the test suite).
    */
  def q41AnnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    VF.annTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
        bits = 4, tables = 8)
      .select(col("qid"), col("cid"), col("cos"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** IVF-Flat approximate top-5 (centroid sample is Spark-side — rows
    * only check; recall vs q40 and clustered-corpus recall asserted in
    * the test suite).
    */
  def q77AnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    VF.ivfTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
        nlist = 16, nprobe = 4)
      .select(col("qid"), col("cid"), col("cos"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Vector norms + per-label stats, exact sequential folds. */
  def q45EmbeddingNorms(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    embeddings(s, d)
      .select(col("vec_id"), col("label"), VF.norm(col("embedding")).as("norm"))
      .orderBy(col("vec_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_embed_neardup_lsh" -> (q37EmbedNearDupLsh _),
    "q40_cosine_topk"    -> (q40CosineTopk _),
    "q41_ann_lsh"        -> (q41AnnLsh _),
    "q45_embedding_norm" -> (q45EmbeddingNorms _),
    "q77_ann_ivf"        -> (q77AnnIvf _),
  )

  val sql: Map[String, String] = Map(
    "q40_cosine_topk" -> """
      WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv
                 FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id cid, CAST(embedding AS DOUBLE[]) cv FROM embeddings),
      s AS (SELECT qid, cid, list_cosine_similarity(qv, cv) cos
            FROM q, c WHERE cid <> qid),
      r AS (SELECT qid, cid, cos,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) rn
            FROM s)
      SELECT qid, cid, cos, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""",

    "q45_embedding_norm" -> """
      SELECT vec_id, label,
        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[]))) AS norm
      FROM embeddings ORDER BY vec_id""",
  )
}
