package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.expressions.{BigramPerplexityBroadcast, GraftFunctions, NbLogScoresBroadcast, NbModel}

/** Model-based text classification for quality/domain filtering — the
  * supervised member of the scoring family (the CCNet/GPT-3 pipelines
  * train a "looks like the trusted corpus?" classifier and filter on
  * its score; the reference consumes such scores as opaque columns
  * through its SQL passthrough, `/root/reference/filefilter.py:340-342`
  * — this operator PRODUCES them in-engine). Multinomial Naive Bayes
  * with add-one smoothing is the deliberately chosen model: training is
  * PURE COUNTING (one (label, token) shuffle, map-side combined) and
  * scoring is sums of logs of count ratios, the same
  * integer-exact-then-log structure that lets the LM gates (q147/q149)
  * replay bit-for-bit to milli precision in DuckDB — a
  * gradient-trained logistic regression would compound float
  * nondeterminism through every iteration and be unverifiable by the
  * oracle.
  *
  * Capacity bounds mirror [[NgramLm]]: vocabulary capped to the
  * `maxVocab` most frequent tokens (count-desc, token-asc ties), tail
  * folded into the shared UNK symbol; the collected model is
  * (maxVocab+1)·nClasses longs, broadcast once — documents never
  * shuffle to score. Class count is validated small (labels are
  * strata like language/source, not ids).
  *
  * At 100 TB: train on the labeled slice (trusted corpus vs random
  * crawl — the GPT-3 recipe), broadcast the capped model, score
  * everything row-locally.
  */
object TextClassifier {

  /** Train an [[NbModel]] from (label, token-array) rows. NULL labels
    * are rejected loudly — silently dropping them would skew priors.
    */
  def trainNaiveBayes(df: DataFrame, labelCol: Column, tokensCol: Column,
                      maxVocab: Int = 65536,
                      maxClasses: Int = 100): NbModel = {
    require(maxVocab >= 1, "maxVocab >= 1")
    val base = df.select(labelCol.cast("string").as("lbl"), tokensCol.as("ts"))
    // one bounded collect serves the NULL-label guard AND the class
    // list: a NULL label surfaces as the null group of the SAME
    // count aggregate the classes come from (the old separate
    // `filter(isNull).isEmpty` probe paid a full corpus pass for a
    // check this collect already answers — r18 job shave), and the
    // ≤ maxClasses rows sort DRIVER-side in UTF-8 byte order, which is
    // exactly Spark's binary string sort, so `classes` (and with it
    // the class-aligned output arrays) is unchanged.
    val docCounts0 = base.groupBy(col("lbl")).agg(count(lit(1)).as("n"))
      .collect()
    require(!docCounts0.exists(_.isNullAt(0)),
      "trainNaiveBayes: NULL labels (drop or impute them first)")
    val docCounts = docCounts0.sortWith { (a, b) =>
      val x = a.getString(0).getBytes("UTF-8")
      val y = b.getString(0).getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
    }
    require(docCounts.nonEmpty, "empty training set")
    require(docCounts.length <= maxClasses,
      s"${docCounts.length} classes > maxClasses=$maxClasses — labels " +
        "should be bounded strata (language, source), not ids")
    val classes = docCounts.map(_.getString(0))
    val classIdx = classes.zipWithIndex.toMap
    val nDocs = docCounts.map(_.getLong(1)).sum
    // (label, token) counts; vocabulary elected on the CLASS-SUMMED
    // totals (the LM election rule), tail folded into UNK per class
    val ltok = base.select(col("lbl"), explode(col("ts")).as("w"))
      .groupBy(col("lbl"), col("w")).agg(count(lit(1)).as("c"))
    val vocabRows = ltok.groupBy(col("w")).agg(sum(col("c")).as("tc"))
      .orderBy(col("tc").desc, col("w")).limit(maxVocab).collect()
    val unk = BigramPerplexityBroadcast.Unk
    // UNK-fold DISTRIBUTIVELY before collecting — the collected relation
    // is ≤ (maxVocab+1)·nClasses rows by construction, never the raw
    // zipf token space (the NgramLm count-then-map discipline)
    val vocabDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(vocabRows.map(r => Row(r.getString(0))): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vw",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val mapped = ltok
      .join(broadcast(vocabDf), col("w") === col("vw"), "left")
      .select(col("lbl"), coalesce(col("vw"), lit(unk)).as("wm"), col("c"))
      .groupBy(col("lbl"), col("wm")).agg(sum(col("c")).as("c"))
      .collect()
    val counts = new java.util.HashMap[String, Array[Long]]()
    val tokTotals = new Array[Long](classes.length)
    mapped.foreach { r =>
      val ci = classIdx(r.getString(0))
      val row = counts.computeIfAbsent(r.getString(1),
        _ => new Array[Long](classes.length))
      row(ci) += r.getLong(2)
      tokTotals(ci) += r.getLong(2)
    }
    val v = counts.size().toLong // vocab kept + UNK iff any tail existed
    new NbModel(classes, docCounts.map(_.getLong(1)), nDocs, tokTotals, v, counts)
  }

  /** Per-class log-likelihood column (array<double> aligned with
    * `model.classes`) over a token-array column.
    */
  def nbLogScores(df: DataFrame, model: NbModel, tokensCol: Column): Column = {
    GraftFunctions.register(df.sparkSession)
    val bc = df.sparkSession.sparkContext.broadcast(model)
    org.apache.spark.sql.GraftColumnBridge.column(
      NbLogScoresBroadcast(bc,
        org.apache.spark.sql.GraftColumnBridge.expression(tokensCol)))
  }

  /** Predicted class label column (argmax of [[nbLogScores]]; ties to
    * the earlier class in sorted-label order — a pure function of the
    * input). NULL for empty token arrays.
    */
  def nbPredict(df: DataFrame, model: NbModel, tokensCol: Column): Column = {
    val scores = nbLogScores(df, model, tokensCol)
    val labels = array(model.classes.map(lit(_)): _*)
    element_at(labels, array_position(scores, array_max(scores)).cast("int"))
  }
}
