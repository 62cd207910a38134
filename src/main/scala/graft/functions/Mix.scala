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

  /** Token-budget mix sampling: real training mixes are specified in
    * TOKENS per source/language, not documents — keep each stratum's
    * documents, in a deterministic pseudo-random order (md5(id), id),
    * until the stratum's token budget is exhausted; strata absent from
    * the map are kept whole. The document that would cross the budget
    * is dropped (cum > budget), so kept strata never exceed their
    * budget. Membership is stable per corpus snapshot (the hash order
    * is id-derived); unlike [[split]], growing the corpus CAN displace
    * later-ordered documents — inherent to any fixed-budget selection.
    *
    * ADDS a `cum_tokens` column (the stratum-cumulative token count in
    * hash order — the selection boundary evidence); the input must not
    * already have one (fail-fast rather than silent overwrite).
    *
    * Skew-proof two-level cumsum: a single window over the stratum key
    * would serialize a dominant stratum (one language = 90% of the
    * corpus) through one partition. Instead the cumsum decomposes along
    * the md5-prefix blocks of the hash order itself: md5 strings sort
    * as (first `digits` hex chars, rest), so the stratum-global running
    * sum = (total of all earlier prefix blocks) + (running sum inside
    * this row's block). Level 1 computes the block-local cumsum with a
    * window over (stratum, prefix) — `fanout`× the parallelism; level 2
    * computes per-(stratum, prefix) totals (strata × fanout rows — tiny)
    * and their exclusive running sum, broadcast-joined back. Identical
    * values to the single-window form, one extra (small) shuffle.
    * `fanout` is a power of 16 (hex-prefix blocks): 16 per hex digit,
    * up to 16^7 — size it so corpus_tokens / (strata_min_share · fanout)
    * fits a single task's sort budget.
    */
  def tokenBudget(df: DataFrame, stratumCol: Column, idCol: Column,
                  tokenCount: Column, budgets: Map[String, Long],
                  fanout: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digits = hexPrefixDigits(fanout, "fanout")
    require(!df.columns.contains("cum_tokens"),
      "tokenBudget adds a cum_tokens column; the input already has one — rename it first")
    val work = df
      .withColumn("__graft_stratum", stratumCol)
      .withColumn("__graft_h", md5(idCol.cast("string")))
      .withColumn("__graft_pfx", substring(col("__graft_h"), 1, digits))
    val wLocal = Window.partitionBy(col("__graft_stratum"), col("__graft_pfx"))
      .orderBy(col("__graft_h"), idCol)
    val local = work.withColumn("__graft_cum_local", sum(tokenCount).over(wLocal))
    val wPfx = Window.partitionBy(col("__graft_bs")).orderBy(col("__graft_bp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = work.groupBy(
        col("__graft_stratum").as("__graft_bs"), col("__graft_pfx").as("__graft_bp"))
      .agg(sum(tokenCount).as("__graft_tot"))
      .select(col("__graft_bs"), col("__graft_bp"),
        coalesce(sum(col("__graft_tot")).over(wPfx), lit(0L)).as("__graft_base"))
    val limit = budgets.toSeq.sortBy(_._1).foldLeft(lit(Long.MaxValue)) {
      case (acc, (stratum, b)) => when(stratumCol === stratum, lit(b)).otherwise(acc)
    }
    local
      .join(broadcast(bases),
        col("__graft_stratum") <=> col("__graft_bs") &&
          col("__graft_pfx") <=> col("__graft_bp"))
      .withColumn("cum_tokens", col("__graft_base") + col("__graft_cum_local"))
      .filter(col("cum_tokens") <= limit)
      .drop("__graft_stratum", "__graft_h", "__graft_pfx", "__graft_cum_local",
        "__graft_bs", "__graft_bp", "__graft_base")
  }

  /** Greedy concat-order sequence packing: assign every document the
    * training sequence ("pack") in which its FIRST token falls when the
    * corpus is concatenated in a deterministic pseudo-random order
    * (md5(id), id) and cut into fixed `seqLen`-token sequences — the
    * concat-and-chunk packing GPT-style training uses. Documents
    * crossing a pack boundary are attributed to the pack they start in;
    * splitting across the boundary is the downstream chunk step's job
    * ([[graft.functions.TextFunctions.chunkWindows]] / q85), kept out
    * of this operator so the assignment stays a pure per-row function
    * of the cumulative stream.
    *
    * Packing runs WITHIN `shards` hash-shards (the first N hex digits
    * of md5(id) → 16^N shards), not one global stream: a global cumsum
    * would be a single-partition total-order sort — the one window
    * shape this repo bans at scale. Shard count IS the parallelism
    * knob: each shard is one window partition sorting ~1/shards of the
    * corpus, so at 100 TB pick shards ≈ corpus_tokens / task_budget
    * rounded up to a power of 16 (e.g. 4096 shards → ~25 GB/task).
    * Shard-local pack ids are globally unique as (pack_shard,
    * pack_id); each shard's stream is independently deterministic, and
    * any engine replays the assignment from `substr(md5(id), 1, N)`.
    * ADDS `pack_shard`, `pack_offset` (token offset of the doc in its
    * shard's stream) and `pack_id` (= pack_offset / seqLen); the input
    * must not already have them (fail-fast, no silent overwrite).
    */
  def packSequences(df: DataFrame, idCol: Column, tokenCount: Column,
                    seqLen: Long, shards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digits = hexPrefixDigits(shards, "shards")
    Seq("pack_shard", "pack_offset", "pack_id").foreach(c =>
      require(!df.columns.contains(c),
        s"packSequences adds a $c column; the input already has one — rename it first"))
    val shard = conv(substring(md5(idCol.cast("string")), 1, digits), 16, 10).cast("int")
    val w = Window.partitionBy(col("pack_shard"))
      .orderBy(md5(idCol.cast("string")), idCol)
    df.withColumn("pack_shard", shard)
      .withColumn("pack_offset", sum(tokenCount).over(w) - tokenCount)
      .withColumn("pack_id", floor(col("pack_offset") / seqLen).cast("long"))
  }

  /** `n` must be 16^digits for digits in [1, 7] (hex-prefix sharding of
    * md5; 16^7 still fits an int shard id). Returns `digits`.
    */
  private def hexPrefixDigits(n: Int, param: String): Int = {
    var d = 0
    var v = 1L
    while (v < n) { v *= 16; d += 1 }
    require(v == n && d >= 1 && d <= 7,
      s"$param must be a power of 16 in [16, 16^7] (hex-prefix sharding), got $n")
    d
  }

  /** Temperature-based stratum rebalancing — the multinomial mix
    * flattening multilingual LM training uses (Lample & Conneau,
    * "Cross-lingual Language Model Pretraining", 2019: sample language
    * i with probability ∝ p_i^alpha): each stratum's share moves from
    * p_i to p_i^alpha (renormalized, total row count preserved up to
    * quantization), realized DETERMINISTICALLY — every row is emitted
    * `floor(f)` times plus one more when its md5 first hex digit is
    * below the factor's fractional sixteenths, where
    * f = N·n_i^alpha / (Z·n_i), Z = Σ n_j^alpha, quantized to
    * sixteenths. Low-resource strata upsample (repeat copies, `copy` =
    * 0..k-1), dominant strata downsample (some rows drop) — no RNG, no
    * seed, identical output in any engine with md5 (the q95 oracle
    * replays it in SQL).
    *
    * Determinism discipline: alpha = 0.5 uses sqrt (correctly rounded
    * per IEEE 754 everywhere); Z sums DECIMAL(38,10)-cast terms so the
    * total is addition-order-independent (the [[graft.Tables]] dsum
    * argument); everything after is arithmetic on identical doubles.
    * Other alphas use pow, whose last-ulp behavior is libm-specific —
    * fine for production mixing, excluded from the hash gate.
    *
    * 100 TB shape: two tiny aggregates over stratum counts + one
    * broadcast join + a row-local explode — no corpus shuffle at all.
    */
  def temperatureResample(df: DataFrame, stratumCol: Column, idCol: Column,
                          alpha: Double = 0.5, copyCol: String = "copy"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    require(!df.columns.contains(copyCol),
      s"temperatureResample adds a $copyCol column; the input already has one — rename it first")
    val nPow: Column => Column =
      if (alpha == 0.5) n => sqrt(n.cast("double"))
      else n => pow(n.cast("double"), lit(alpha))
    val counts = df.groupBy(stratumCol.as("__graft_s")).agg(count(lit(1)).as("__graft_n"))
    val tot = counts.agg(
      sum(col("__graft_n")).cast("double").as("__graft_bigN"),
      sum(nPow(col("__graft_n")).cast("decimal(38,10)")).cast("double").as("__graft_z"))
    val factors = counts.crossJoin(broadcast(tot))
      .select(col("__graft_s"),
        round(col("__graft_bigN") / (col("__graft_z") / nPow(col("__graft_n")))
          / col("__graft_n") * 16).cast("long").as("__graft_f16"))
    df.join(broadcast(factors), stratumCol <=> col("__graft_s"))
      .withColumn("__graft_dig",
        conv(substring(md5(idCol.cast("string")), 1, 1), 16, 10).cast("long"))
      .withColumn("__graft_copies",
        (floor(col("__graft_f16") / 16.0) +
          when(col("__graft_dig") < pmod(col("__graft_f16"), lit(16)), 1L).otherwise(0L))
          .cast("long"))
      .withColumn(copyCol, explode(when(col("__graft_copies") > 0,
        sequence(lit(0L), col("__graft_copies") - 1)).otherwise(array().cast("array<long>"))))
      .drop("__graft_s", "__graft_n", "__graft_f16", "__graft_dig", "__graft_copies")
  }

  /** Per-stratum quality-percentile filter: keep each stratum's top
    * `keepFraction` of rows by `scoreCol` (ties broken by (md5(id), id)
    * so the kept set is a pure deterministic function of the data —
    * replayable in any engine). Keeps ceil(keepFraction·n) rows per
    * stratum, so no stratum is emptied by rounding. The standard
    * quality-gate step of a training pipeline (score with q33-style
    * heuristics or a model, then keep the best X% per language).
    *
    * Shape: one window (rank + count) per stratum partition. A dominant
    * stratum serializes through one partition — at 100 TB compute the
    * per-stratum score THRESHOLD instead (percentile_approx over an
    * aggregate, broadcast back, row-local filter ≥ threshold): one
    * scan + one tiny broadcast, approximate at the boundary only.
    * This exact-rank form is the verification-oracle twin of that path.
    */
  def topFractionByScore(df: DataFrame, stratumCol: Column, scoreCol: Column,
                         idCol: Column, keepFraction: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0, 1]")
    val w = Window.partitionBy(stratumCol)
      .orderBy(scoreCol.desc, md5(idCol.cast("string")), idCol)
    val wAll = Window.partitionBy(stratumCol)
    df.withColumn("__graft_rn", row_number().over(w))
      .withColumn("__graft_cnt", count(lit(1)).over(wAll))
      .filter(col("__graft_rn") <= ceil(col("__graft_cnt") * keepFraction))
      .drop("__graft_rn", "__graft_cnt")
  }

  /** CCNet-style quality bucketing (Wenzek et al. 2020, arXiv:1911.00359
    * — the head/middle/tail corpus split that feeds mixture weights and
    * curriculum schedules downstream): divide each stratum into `n`
    * equal-count buckets by a quality score, bucket 1 = best. Ordering
    * is (score asc, id) — CCNet ranks by LM perplexity ascending, and
    * the id tiebreak makes membership a PURE function of the input, so
    * any engine replays the ntile assignment bit-exactly (q130 pairs it
    * with the integer `rarity` score from [[graft.functions
    * .TextFunctions.corpusFrequencyScores]] — hash-exact, unlike the
    * float cross-entropy twin). One window per stratum (the
    * [[topFractionByScore]] shape); at 100 TB swap in
    * [[qualityBucketsApprox]] — same bucketing, broadcast cut points,
    * no window.
    */
  def qualityBuckets(df: DataFrame, stratumCol: Column, scoreCol: Column,
                     idCol: Column, n: Int = 3,
                     bucketCol: String = "bucket"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, "need at least 2 buckets")
    val w = Window.partitionBy(stratumCol).orderBy(scoreCol.asc, idCol.asc)
    df.withColumn(bucketCol, ntile(n).over(w))
  }

  /** The 100 TB form of [[qualityBuckets]] (the [[topFractionByScoreApprox]]
    * pattern applied to bucketing): compute each stratum's n−1 bucket
    * boundaries as the k/n score quantiles with ONE `percentile_approx`
    * aggregate (GK sketch, map-side combinable — a few KB per stratum
    * regardless of row count), broadcast the tiny stratum→cut-points
    * table back, and assign the bucket with a row-local first-match
    * CASE (`score ≤ cut_k → bucket k`, else n). One scan + one small
    * aggregate + one broadcast — NO per-stratum sort, NO window, so a
    * dominant stratum never serializes through a single partition and
    * the op is skew-immune at any scale.
    *
    * Approximate only at the boundaries: a row whose score sits within
    * the sketch's rank error (±1/accuracy of the stratum's row count)
    * of a cut point may land in the adjacent bucket, and ties AT a cut
    * all take the lower bucket (where ntile splits a tie run by the id
    * ordering). Away from the cut points assignments agree with
    * [[qualityBuckets]] exactly. Use the exact window form when
    * membership must be reproducible row-for-row (it is the
    * verification oracle of this path, q130).
    */
  def qualityBucketsApprox(df: DataFrame, stratumCol: Column, scoreCol: Column,
                           n: Int = 3, bucketCol: String = "bucket",
                           accuracy: Int = 10000): DataFrame = {
    require(n >= 2, "need at least 2 buckets")
    val pcts = array((1 until n).map(k => lit(k.toDouble / n)): _*)
    val cuts = df.groupBy(stratumCol.as("__graft_s"))
      .agg(percentile_approx(scoreCol, pcts, lit(accuracy)).as("__graft_cuts"))
    val assigned = (1 until n).foldLeft(Option.empty[Column]) { case (acc, k) =>
      val cond = scoreCol <= element_at(col("__graft_cuts"), k)
      Some(acc.fold(when(cond, k))(_.when(cond, k)))
    }.fold(lit(n).cast("int"))(_.otherwise(n))
    df.join(broadcast(cuts), stratumCol <=> col("__graft_s"))
      .withColumn(bucketCol, assigned)
      .drop("__graft_s", "__graft_cuts")
  }

  /** The 100 TB form of [[topFractionByScore]]: compute each stratum's
    * (1−keepFraction) score quantile with `percentile_approx`
    * (GK-sketch aggregate, map-side combinable), broadcast the tiny
    * threshold table back, and filter row-locally — one scan + one
    * small aggregate, NO per-stratum window, skew-immune. Approximate
    * only at the boundary: rows within the sketch's rank error of the
    * threshold may land on either side (kept fraction ≈ keepFraction ±
    * 1/accuracy), and ties AT the threshold are all kept. Use the exact
    * window form when the cut must be reproducible row-for-row.
    */
  def topFractionByScoreApprox(df: DataFrame, stratumCol: Column, scoreCol: Column,
                               keepFraction: Double, accuracy: Int = 10000): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0, 1]")
    if (keepFraction == 1.0) return df
    val thr = df.groupBy(stratumCol.as("__graft_s"))
      .agg(percentile_approx(scoreCol, lit(1 - keepFraction), lit(accuracy))
        .as("__graft_thr"))
    df.join(broadcast(thr), stratumCol <=> col("__graft_s"))
      .filter(scoreCol >= col("__graft_thr"))
      .drop("__graft_s", "__graft_thr")
  }

  /** Deterministic train/val/test (or any n-way) split: assigns each
    * row a split label from the same md5 first-hex-digit bucket its
    * sampling uses, with weights in sixteenths summing to 16 — e.g.
    * `Seq("train" -> 14, "val" -> 1, "test" -> 1)`. Membership is a
    * pure function of the id: stable across runs, engines, and pipeline
    * versions (a doc can never silently migrate from test into train
    * when the corpus grows — the leakage mode seeded RNG splits have),
    * and portable (DuckDB reproduces the identical assignment from the
    * same expression). Row-local; no shuffle.
    */
  def split(df: DataFrame, idCol: Column,
            weights: Seq[(String, Int)], outCol: String = "split"): DataFrame = {
    require(weights.map(_._2).sum == 16 && weights.forall(_._2 > 0),
      "weights are positive sixteenths summing to 16")
    val digit = substring(md5(idCol.cast("string")), 1, 1)
    val hex = "0123456789abcdefg"
    // first-match-wins when-chain over cumulative upper bounds: label i
    // covers digits [cum_{i-1}, cum_i)
    val bounds = weights.scanLeft(0) { case (cum, (_, w)) => cum + w }.tail
    val assigned = weights.zip(bounds).init
      .foldLeft(Option.empty[Column]) { case (acc, ((label, _), hi)) =>
        val cond = digit < lit(hex.charAt(hi).toString)
        Some(acc.fold(when(cond, label))(_.when(cond, label)))
      }
      .fold(lit(weights.last._1))(_.otherwise(weights.last._1))
    df.withColumn(outCol, assigned)
  }

  /** DSIR hashed n-gram doc features + importance scores (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling", arXiv:2302.03169): represent every document as a bag
    * of hashed word uni+bigrams, fit bucket unigram distributions on a
    * TARGET corpus (the distribution you want more of — e.g. curated
    * English) and on the raw SOURCE corpus, and score each source doc
    * by its log importance weight
    * `logw = Σ_grams [ln((t_b+1)/(T+B)) − ln((s_b+1)/(S+B))]`
    * (add-one smoothed; t_b/s_b the bucket's target/source gram counts,
    * T/S the totals, B the bucket count). High logw ⇔ the doc's n-gram
    * profile looks more target- than source-like.
    *
    * Buckets are PORTABLE md5 prefixes (`conv(substr(md5(gram),1,8),
    * 16,10) % buckets` — the [[stratifiedSample]] trick at 8 hex
    * digits), so an external engine replays the featurization
    * bit-for-bit: the q112 gate checks the INTEGER columns (n_grams +
    * the doc's Σ t_b / Σ s_b — every moving part: tokenization, bigram
    * construction, hashing, both count tables, the join back) while the
    * transcendental logw stays out of the hash (tests assert its
    * behavior, the q97 cross_entropy precedent).
    *
    * Returns (doc, n_grams, sum_t, sum_s, logw).
    *
    * 100 TB shape: two explodes (source + target featurization), two
    * bucket-key counts — both partial-aggregated and BOUNDED at
    * `buckets` rows — then one broadcast join back (the bucket table is
    * ≤ buckets rows by construction, never corpus-sized) and one
    * per-doc aggregate. The only corpus-sized shuffle is the per-doc
    * groupBy on the doc id.
    */
  /** Declarative reference twin of the native `dsir_buckets`
    * expression: uni+bigram bag of a whitespace-tokenized text column,
    * md5-prefix-bucketed. Bigrams are zip_with over two pre-sliced
    * token arrays so the split is evaluated ONCE per row — the
    * transform/element_at formulation re-evaluates the split subtree
    * per element when interpreted (the ShingleStrings lesson: 4+ s vs
    * ~0.3 s on the sf0.1 corpus). Tests assert bucket-for-bucket
    * equality with the native expression; the operators below run the
    * native one (another ~5× on the featurization scan, and zero gram
    * strings materialized).
    */
  def uniBigramBucketsReference(text: Column, buckets: Int): Column = {
    val tok = TextFunctions.tokens(text)
    val bigrams = when(size(tok) >= 2,
      zip_with(slice(tok, lit(1), size(tok) - 1), slice(tok, lit(2), size(tok) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    transform(concat(tok, bigrams),
      g => conv(substring(md5(g), 1, 8), 16, 10).cast("long") % buckets)
  }

  def dsirScores(corpus: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 8192): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    graft.functions.expressions.GraftFunctions.register(corpus.sparkSession)
    def docFeats(df: DataFrame) =
      df.select(col(idCol).as("doc"),
          explode(call_function("dsir_buckets", col(textCol), lit(buckets)))
            .as("b"))
        .groupBy(col("doc"), col("b")).agg(count(lit(1)).as("c"))
    // the corpus is featurized ONCE: the sparse per-doc bucket vectors
    // feed the source count table AND the final join back
    val src = docFeats(corpus)
    val srcCnt = src.groupBy(col("b")).agg(sum(col("c")).as("s_cnt"))
    val tgtCnt = docFeats(target).groupBy(col("b")).agg(sum(col("c")).as("t_cnt"))
    // FULL outer: an external target's grams can land in buckets no
    // source doc touches — a left join would drop them from t_total,
    // underestimating T and inflating every per-gram log-ratio by a
    // constant that scales with doc length (review r8 #5). Target-only
    // rows contribute to the totals and then drop out of the join back
    // (no source gram carries their bucket).
    val table = srcCnt.join(tgtCnt, Seq("b"), "full")
      .na.fill(0L, Seq("t_cnt", "s_cnt"))
    dsirTail(src, table, buckets)
  }

  /** [[dsirScores]] for the self-target case — the target corpus is a
    * PREDICATE over the source corpus (a curated slice: language, a
    * quality flag), the common practical DSIR setup and q112's shape.
    * The generic entry featurizes source and target in two text scans
    * (they are different tables in general); here ONE featurization
    * pass carries a per-doc target flag and both count tables reduce
    * from the same sparse (doc, bucket) exchange — the r12-verdict #4
    * fusion. Filtering the doc-level predicate before or after the
    * explode is equivalent, so results are identical to
    * `dsirScores(corpus, corpus.filter(isTarget), ...)`.
    */
  def dsirScoresSelf(corpus: DataFrame, isTarget: Column, idCol: String,
                     textCol: String, buckets: Int = 8192): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    graft.functions.expressions.GraftFunctions.register(corpus.sparkSession)
    // Fusion mechanics (measured, r13): the flag must ride as a
    // GROUPING key (doc-constant, so groups are unchanged) — as an
    // aggregate expression it was column-pruned from the source-count
    // branch, splitting the consumers into non-identical subtrees that
    // each re-scanned the corpus. And the target count must come from
    // CONDITIONAL aggregation, not `filter(__is_t)` — Catalyst pushes
    // that filter through the explode into a second scan branch,
    // silently re-deriving the two-scan plan this method exists to
    // avoid. With both in place the final plan holds ONE featurization
    // exchange, reused by the count table and the join back.
    // narrow-input guard: featurization costs ~100× the text bytes, so
    // when the corpus arrives in fewer splits than the cluster has
    // cores (single-file extracts; a one-row-group parquet cannot be
    // split by files.minPartitionNum), one cheap shuffle of the raw
    // text unlocks full parallelism for the md5 gram hashing. Corpora
    // already wider than the cluster skip it — at production SF this
    // branch never fires and no text is reshuffled.
    val spark = corpus.sparkSession
    val wide =
      if (corpus.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
        corpus.repartition(spark.sessionState.conf.numShufflePartitions)
      else corpus
    val feats = wide.select(col(idCol).as("doc"),
        coalesce(isTarget, lit(false)).as("__is_t"),
        explode(call_function("dsir_buckets", col(textCol), lit(buckets)))
          .as("b"))
      .groupBy(col("doc"), col("b"), col("__is_t"))
      .agg(count(lit(1)).as("c"))
    // target ⊆ source here, so the generic path's full-outer count
    // join degenerates to one conditional aggregate: t_cnt sums only
    // target docs' counts, and no target-only bucket can exist
    val table = feats.groupBy(col("b")).agg(
      sum(col("c")).as("s_cnt"),
      sum(when(col("__is_t"), col("c")).otherwise(0L)).as("t_cnt"))
    // c > 0 is vacuously true (c = count(1) ≥ 1) but unprovable to the
    // optimizer, so it PINS c in the join-back branch: under an
    // aggregate-only action (bench's count()) column pruning would
    // otherwise drop c from this branch while the count-table branch
    // keeps it, splitting the two consumers into non-identical
    // featurization subtrees and re-running the corpus scan (measured)
    dsirTail(feats.drop("__is_t").filter(col("c") > 0), table, buckets)
  }

  /** Joined (b, s_cnt, t_cnt) count table → smoothed log-ratio table →
    * per-doc scores (shared by [[dsirScores]] and [[dsirScoresSelf]]).
    */
  private def dsirTail(src: DataFrame, table: DataFrame,
                       buckets: Int): DataFrame = {
    // totals as a single-partition WINDOW over the count table, not an
    // aggregate: an agg-over-agg merges back into a second raw-corpus
    // scan (Catalyst collapses sum-of-group-sums into one pass over the
    // ungrouped data, killing the featurization-exchange reuse —
    // measured as a full duplicate explode stage, r13), while a window
    // must consume the table's exchange as-is. The frame is bounded at
    // `buckets` rows by construction, so the unpartitioned window is a
    // ≤8192-row single-task sort, not a scale hazard. Totals run over
    // ALL buckets (before the s_cnt filter), as before.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val enriched = table
      .withColumn("t_total", sum(col("t_cnt")).over(w))
      .withColumn("s_total", sum(col("s_cnt")).over(w))
      .filter(col("s_cnt") > 0)
      .withColumn("log_ratio",
        log((col("t_cnt") + 1).cast("double") /
            (col("t_total") + buckets).cast("double")) -
        log((col("s_cnt") + 1).cast("double") /
            (col("s_total") + buckets).cast("double")))
    src.join(broadcast(enriched), "b")
      .groupBy(col("doc"))
      .agg(sum(col("c")).as("n_grams"),
        sum(col("c") * col("t_cnt")).as("sum_t"),
        sum(col("c") * col("s_cnt")).as("sum_s"),
        sum(col("c") * col("log_ratio")).as("logw"))
  }

  /** DSIR selection: Gumbel top-fraction resampling on [[dsirScores]]'
    * log weights — `key = logw + Gumbel(md5(doc))` implements sampling
    * WITHOUT replacement ∝ exp(logw) (the Gumbel-top-k identity), with
    * the noise a pure function of the doc id (portable md5-uniform →
    * −ln(−ln u)): the same docs are selected by any engine on any run.
    * Selection is a broadcast percentile_approx threshold on the key —
    * the skew-immune one-pass form ([[topFractionByScoreApprox]]'s
    * rationale); `exact = true` switches to a global
    * TakeOrderedAndProject for oracle-sized corpora.
    */
  def dsirResample(corpus: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, keepFraction: Double,
                   buckets: Int = 8192, exact: Boolean = false): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0, 1]")
    val u = (conv(substring(md5(concat(col("doc").cast("string"),
      lit(":gumbel"))), 1, 8), 16, 10).cast("double") + 1.0) / 4294967297.0
    val keyed = dsirScores(corpus, target, idCol, textCol, buckets)
      .withColumn("key", col("logw") - log(-log(u)))
    if (exact) {
      // size k from the SELECTABLE population (distinct scored docs):
      // null-text rows produce no score row (explode of a null gram
      // array) and duplicate ids collapse in the per-doc aggregate, so
      // a bare row count would overshoot and limit(k) would silently
      // under-deliver. Still a scan + a key-only distinct — never the
      // two-pass featurization keyed.count() would re-execute.
      val k = math.ceil(corpus.filter(col(textCol).isNotNull)
        .select(col(idCol)).distinct().count() * keepFraction).toLong
      require(k <= Int.MaxValue,
        s"dsirResample(exact=true) is the oracle-sized path (global " +
          s"TakeOrdered of $k rows) — use the percentile-threshold " +
          "default for corpora this large")
      keyed.orderBy(col("key").desc, col("doc")).limit(k.toInt)
        .drop("key")
    } else {
      val thr = keyed.agg(
        percentile_approx(col("key"), lit(1 - keepFraction), lit(10000))
          .as("__graft_thr"))
      keyed.crossJoin(broadcast(thr))
        .filter(col("key") >= col("__graft_thr"))
        .drop("key", "__graft_thr")
    }
  }
}
