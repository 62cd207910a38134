package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.expressions.{BigramLmModel, BigramPerplexityBroadcast, GraftFunctions, KnModel, KnPerplexityBroadcast}

/** Capacity-bounded n-gram language model for perplexity-based quality
  * filtering — the CCNet pipeline's scoring half (Wenzek et al. 2020,
  * arXiv:1911.00359 §3.3: a small LM trained on trusted text ranks
  * pages by perplexity; [[Mix.qualityBuckets]] then cuts head/middle/
  * tail on that score). The reference pipeline consumes such scores as
  * opaque columns (`/root/reference/filefilter.py:340-342` passthrough
  * SQL over whatever scoring produced); this operator PRODUCES them
  * inside the engine.
  *
  * Training is two bounded aggregation passes (the classic
  * count-then-prune shape KenLM's pruning also takes — Heafield 2011):
  *
  *  1. unigram counts (one shuffle on token; distinct-token cardinality
  *     is zipf-bounded), vocabulary capped to the `maxVocab` most
  *     frequent (ties to the lexicographically smaller token —
  *     deterministic), everything else mapped to the UNK symbol;
  *  2. bigram counts over the UNK-mapped stream (one shuffle on the
  *     token pair), pruned to counts ≥ `minCount` AND the `maxBigrams`
  *     most frequent (same deterministic order) — the model size is
  *     bounded by its CAPS, never by the corpus.
  *
  * The collected model broadcasts to executors (maxVocab + maxBigrams
  * entries — the CCNet deployment shape: KenLM models ship to workers,
  * documents never shuffle to score); scoring is the row-local
  * codegen'd [[graft.functions.expressions.BigramPerplexityBroadcast]].
  *
  * At 100 TB: both training shuffles carry (token[-pair], partial
  * count) rows with map-side combine; the caps bound the driver collect
  * and the broadcast exactly like the heavy-hitter sketches
  * ([[TextFunctions.heavyHitters]]). In production CCNet the LM is
  * trained ONCE on a small trusted corpus (Wikipedia) and reused —
  * train on the trusted slice, score the 100 TB.
  */
object NgramLm {

  /** Train a [[BigramLmModel]] from `df`'s token arrays (pass
    * `TextFunctions.tokens(col)` or any array<string> column).
    */
  def trainBigramLm(df: DataFrame, tokensCol: Column,
                    maxVocab: Int = 65536, minCount: Int = 2,
                    maxBigrams: Int = 1 << 20): BigramLmModel = {
    require(maxVocab >= 1 && maxBigrams >= 0 && minCount >= 1,
      s"need maxVocab >= 1, maxBigrams >= 0, minCount >= 1")
    val toks = df.select(explode(tokensCol).as("w"))
    val rawUni = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    // vocabulary: the maxVocab most frequent tokens, deterministic ties
    val vocabRows = rawUni
      .orderBy(col("c").desc, col("w")).limit(maxVocab).collect()
    val vocab = new java.util.HashSet[String]()
    vocabRows.foreach(r => vocab.add(r.getString(0)))
    val spark = df.sparkSession
    val unk = BigramPerplexityBroadcast.Unk
    // UNK-mapped unigram counts: vocab rows keep their exact counts,
    // the tail folds into one UNK row. nTokens comes from a DISTRIBUTED
    // sum over the count relation (never collect the raw zipf token
    // space — at web scale distinct tokens are billions of rows), and
    // unkCount falls out by subtraction from the already-collected
    // vocab rows.
    val uni = new java.util.HashMap[String, Long]()
    var vocabTokens = 0L
    vocabRows.foreach { r =>
      uni.put(r.getString(0), r.getLong(1))
      vocabTokens += r.getLong(1)
    }
    val nTokens = rawUni.agg(sum(col("c")).as("n")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getLong(0)))
      .getOrElse(0L)
    val unkCount = nTokens - vocabTokens
    if (unkCount > 0) uni.put(unk, unkCount)
    // bigram counts: one corpus pass + one raw-pair shuffle, then the
    // (small) distinct-pair relation UNK-maps through two broadcast
    // joins against the vocab and re-aggregates — count-then-map gives
    // identical sums to mapping per token without a UDF in the hot pass
    val vocabDf = spark.createDataFrame(
      java.util.Arrays.asList(vocabRows.map(r => Row(r.getString(0))): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vw",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val rawPairs = df.select(tokensCol.as("ts"))
      .where(size(col("ts")) >= 2)
      .select(posexplode(slice(col("ts"), lit(1), size(col("ts")) - 1)).as(Seq("p", "w1")),
        col("ts"))
      .select(col("w1"), element_at(col("ts"), col("p") + 2).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val pairs = rawPairs
      .join(broadcast(vocabDf.select(col("vw").as("m1"))), col("w1") === col("m1"), "left")
      .join(broadcast(vocabDf.select(col("vw").as("m2"))), col("w2") === col("m2"), "left")
      .select(coalesce(col("m1"), lit(unk)).as("w1"),
        coalesce(col("m2"), lit(unk)).as("w2"), col("c"))
      .groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("c"))
      .where(col("c") >= minCount)
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(maxBigrams)
      .collect()
    val bi = new java.util.HashMap[String, java.util.HashMap[String, Long]]()
    pairs.foreach { r =>
      bi.computeIfAbsent(r.getString(0), _ => new java.util.HashMap[String, Long]())
        .put(r.getString(1), r.getLong(2))
    }
    new BigramLmModel(uni, bi, nTokens, uni.size().toLong)
  }

  /** Order-3 upgrade (r13): [[trainBigramLm]]'s model plus pruned
    * trigram counts over the same UNK-mapped stream — one more
    * count-then-map pass with its own prune (`minCount`) and cap
    * (`maxTrigrams`), the same KenLM count-pruning shape one order up.
    * Score with `perplexity(..., lambda3 > 0)`: recursive
    * Jelinek-Mercer — λ3·c(u,v,w)/c(u,v) interpolating into the bigram
    * estimate, backing off THROUGH the pruned bigram table when the
    * context pair itself was pruned (the expression and the q149
    * oracle replay agree on that rule exactly).
    */
  def trainTrigramLm(df: DataFrame, tokensCol: Column,
                     maxVocab: Int = 65536, minCount: Int = 2,
                     maxBigrams: Int = 1 << 20,
                     maxTrigrams: Int = 1 << 21): BigramLmModel = {
    require(maxTrigrams >= 0, "maxTrigrams >= 0")
    val base = trainBigramLm(df, tokensCol, maxVocab, minCount, maxBigrams)
    val spark = df.sparkSession
    val unk = BigramPerplexityBroadcast.Unk
    val vocabDf = spark.createDataFrame(
      java.util.Arrays.asList(base.uni.keySet().toArray.collect {
        case w: String if w != unk => Row(w)
      }.toSeq: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vw",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val rawTris = df.select(tokensCol.as("ts"))
      .where(size(col("ts")) >= 3)
      .select(posexplode(slice(col("ts"), lit(1), size(col("ts")) - 2)).as(Seq("p", "w1")),
        col("ts"))
      .select(col("w1"), element_at(col("ts"), col("p") + 2).as("w2"),
        element_at(col("ts"), col("p") + 3).as("w3"))
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c"))
    val tris = rawTris
      .join(broadcast(vocabDf.select(col("vw").as("m1"))), col("w1") === col("m1"), "left")
      .join(broadcast(vocabDf.select(col("vw").as("m2"))), col("w2") === col("m2"), "left")
      .join(broadcast(vocabDf.select(col("vw").as("m3"))), col("w3") === col("m3"), "left")
      .select(coalesce(col("m1"), lit(unk)).as("w1"),
        coalesce(col("m2"), lit(unk)).as("w2"),
        coalesce(col("m3"), lit(unk)).as("w3"), col("c"))
      .groupBy(col("w1"), col("w2"), col("w3")).agg(sum(col("c")).as("c"))
      .where(col("c") >= minCount)
      .orderBy(col("c").desc, col("w1"), col("w2"), col("w3"))
      .limit(maxTrigrams).collect()
    val tri = new java.util.HashMap[String,
      java.util.HashMap[String, java.util.HashMap[String, Long]]]()
    tris.foreach { r =>
      tri.computeIfAbsent(r.getString(0),
          _ => new java.util.HashMap[String, java.util.HashMap[String, Long]]())
        .computeIfAbsent(r.getString(1), _ => new java.util.HashMap[String, Long]())
        .put(r.getString(2), r.getLong(3))
    }
    new BigramLmModel(base.uni, base.bi, base.nTokens, base.vSize, tri)
  }

  /** Order-4 upgrade (r13): [[trainTrigramLm]]'s model plus pruned
    * 4-gram counts over the same UNK-mapped stream — one further
    * count-then-map pass with its own prune (`minCount`) and cap
    * (`maxQuadgrams`). Score with `perplexity(..., lambda4 > 0)`:
    * λ4·c(t,u,v,w)/c(t,u,v) interpolating into the trigram estimate,
    * backing off through the PRUNED trigram table when the context
    * triple itself was pruned — the identical recursion one order up
    * (the q166 oracle replays the whole order-4 construction).
    */
  def trainQuadgramLm(df: DataFrame, tokensCol: Column,
                      maxVocab: Int = 65536, minCount: Int = 2,
                      maxBigrams: Int = 1 << 20,
                      maxTrigrams: Int = 1 << 21,
                      maxQuadgrams: Int = 1 << 22): BigramLmModel = {
    require(maxQuadgrams >= 0, "maxQuadgrams >= 0")
    val base = trainTrigramLm(df, tokensCol, maxVocab, minCount,
      maxBigrams, maxTrigrams)
    val spark = df.sparkSession
    val unk = BigramPerplexityBroadcast.Unk
    val sep = expressions.BigramLmModel.CtxSep
    val vocabDf = spark.createDataFrame(
      java.util.Arrays.asList(base.uni.keySet().toArray.collect {
        case w: String if w != unk => Row(w)
      }.toSeq: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vw",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val rawQuads = df.select(tokensCol.as("ts"))
      .where(size(col("ts")) >= 4)
      .select(posexplode(slice(col("ts"), lit(1), size(col("ts")) - 3)).as(Seq("p", "w1")),
        col("ts"))
      .select(col("w1"), element_at(col("ts"), col("p") + 2).as("w2"),
        element_at(col("ts"), col("p") + 3).as("w3"),
        element_at(col("ts"), col("p") + 4).as("w4"))
      .groupBy(col("w1"), col("w2"), col("w3"), col("w4")).agg(count(lit(1)).as("c"))
    val quads = rawQuads
      .join(broadcast(vocabDf.select(col("vw").as("m1"))), col("w1") === col("m1"), "left")
      .join(broadcast(vocabDf.select(col("vw").as("m2"))), col("w2") === col("m2"), "left")
      .join(broadcast(vocabDf.select(col("vw").as("m3"))), col("w3") === col("m3"), "left")
      .join(broadcast(vocabDf.select(col("vw").as("m4"))), col("w4") === col("m4"), "left")
      .select(coalesce(col("m1"), lit(unk)).as("w1"),
        coalesce(col("m2"), lit(unk)).as("w2"),
        coalesce(col("m3"), lit(unk)).as("w3"),
        coalesce(col("m4"), lit(unk)).as("w4"), col("c"))
      .groupBy(col("w1"), col("w2"), col("w3"), col("w4")).agg(sum(col("c")).as("c"))
      .where(col("c") >= minCount)
      .orderBy(col("c").desc, col("w1"), col("w2"), col("w3"), col("w4"))
      .limit(maxQuadgrams).collect()
    val quad = new java.util.HashMap[String, java.util.HashMap[String, Long]]()
    quads.foreach { r =>
      val ctx = r.getString(0) + sep + r.getString(1) + sep + r.getString(2)
      quad.computeIfAbsent(ctx, _ => new java.util.HashMap[String, Long]())
        .put(r.getString(3), r.getLong(4))
    }
    new BigramLmModel(base.uni, base.bi, base.nTokens, base.vSize, base.tri, quad)
  }

  /** Derive interpolated Kneser-Ney statistics (Kneser & Ney 1995;
    * Chen & Goodman 1998 §2.7 — KenLM's default smoothing) from a
    * trained bigram model's PRUNED pair table: per-context fanout
    * N1+(v,·), per-word continuation counts N1+(·,w), total surviving
    * pairs N1+(·,·). Pure driver-side counting over the
    * capacity-bounded (≤ maxBigrams entries) collected table — no
    * extra corpus pass, no shuffle; the derived maps are bounded by
    * the same caps as the base model and broadcast with it.
    */
  def kneserNey(base: BigramLmModel): KnModel = {
    val fanout = new java.util.HashMap[String, Long]()
    val cont = new java.util.HashMap[String, Long]()
    var pairs = 0L
    base.bi.forEach { (w1, inner) =>
      fanout.put(w1, inner.size().toLong)
      pairs += inner.size()
      inner.keySet().forEach { w2 =>
        cont.merge(w2, 1L, (a, b) => a + b)
      }
    }
    new KnModel(base, fanout, cont, pairs)
  }

  /** Kneser-Ney perplexity column under [[kneserNey]]'s statistics —
    * the absolute-discount counterpart of [[perplexity]]'s
    * Jelinek-Mercer mix; same broadcast-once/score-row-locally shape.
    */
  def knPerplexity(df: DataFrame, model: KnModel, tokensCol: Column,
                   discount: Double = 0.75): Column = {
    require(discount > 0 && discount < 1, s"discount in (0, 1); got $discount")
    GraftFunctions.register(df.sparkSession)
    val bc = df.sparkSession.sparkContext.broadcast(model)
    org.apache.spark.sql.GraftColumnBridge.column(
      KnPerplexityBroadcast(bc, discount,
        org.apache.spark.sql.GraftColumnBridge.expression(tokensCol)))
  }

  /** Perplexity column over a token-array column under a trained model
    * (broadcast once per call; reuse the returned Column across
    * selects rather than re-calling per projection). `lambda3 > 0`
    * engages the model's trigram order ([[trainTrigramLm]]).
    */
  def perplexity(df: DataFrame, model: BigramLmModel, tokensCol: Column,
                 lambda: Double = 0.9, lambda3: Double = 0.0,
                 lambda4: Double = 0.0): Column = {
    require(lambda >= 0 && lambda < 1, s"lambda in [0, 1); got $lambda")
    require(lambda3 >= 0 && lambda3 < 1, s"lambda3 in [0, 1); got $lambda3")
    require(lambda4 >= 0 && lambda4 < 1, s"lambda4 in [0, 1); got $lambda4")
    GraftFunctions.register(df.sparkSession)
    val bc = df.sparkSession.sparkContext.broadcast(model)
    org.apache.spark.sql.GraftColumnBridge.column(
      BigramPerplexityBroadcast(bc, lambda,
        org.apache.spark.sql.GraftColumnBridge.expression(tokensCol), lambda3,
        lambda4))
  }
}
