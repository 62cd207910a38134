package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The broadcast payload of a trained capacity-bounded bigram LM
  * ([[graft.functions.NgramLm.trainBigramLm]]): unigram counts over the
  * UNK-mapped token stream, pruned bigram counts as a nested map (w1 →
  * (w2 → count) — no per-token key concatenation at score time), and
  * the (N, V) normalization constants. Sizes are bounded by the
  * training caps (maxVocab + maxBigrams entries), NOT by the corpus —
  * this is the CCNet deployment shape: the model ships to every
  * executor once, documents never shuffle to score.
  */
final class BigramLmModel(
    val uni: java.util.HashMap[String, Long],
    val bi: java.util.HashMap[String, java.util.HashMap[String, Long]],
    val nTokens: Long,
    val vSize: Long,
    /** Pruned trigram counts tri(w1)(w2)(w3) — EMPTY for a bigram-only
      * model (order 3 engages only when [[BigramPerplexityBroadcast]]'s
      * lambda3 > 0 and the map is populated; r13 trigram upgrade).
      */
    val tri: java.util.HashMap[String,
      java.util.HashMap[String, java.util.HashMap[String, Long]]],
    /** Pruned 4-gram counts keyed by the JOINED context
      * `w1␂w2␂w3` → (w4 → count) ([[BigramLmModel.CtxSep]]; flat-keyed
      * — four nested levels stop paying for themselves). EMPTY below
      * order 4 (engages when lambda4 > 0; r13 quadgram upgrade).
      */
    val quad: java.util.HashMap[String, java.util.HashMap[String, Long]])
  extends Serializable {
  def this(uni: java.util.HashMap[String, Long],
           bi: java.util.HashMap[String, java.util.HashMap[String, Long]],
           nTokens: Long, vSize: Long) =
    this(uni, bi, nTokens, vSize,
      new java.util.HashMap[String,
        java.util.HashMap[String, java.util.HashMap[String, Long]]](),
      new java.util.HashMap[String, java.util.HashMap[String, Long]]())
  def this(uni: java.util.HashMap[String, Long],
           bi: java.util.HashMap[String, java.util.HashMap[String, Long]],
           nTokens: Long, vSize: Long,
           tri: java.util.HashMap[String,
             java.util.HashMap[String, java.util.HashMap[String, Long]]]) =
    this(uni, bi, nTokens, vSize, tri,
      new java.util.HashMap[String, java.util.HashMap[String, Long]]())
}

object BigramLmModel {
  /** Join separator for flat context keys: U+0002 can't appear in
    * space-split tokens (the UNK symbol already claims U+0001).
    */
  val CtxSep = "\u0002"
}

/** bigram_perplexity: per-document perplexity under a broadcast
  * [[BigramLmModel]] — the CCNet quality signal (Wenzek et al. 2020,
  * arXiv:1911.00359 §3.3: rank pages by the perplexity of a small LM
  * trained on trusted text; low = fluent). Per token, Jelinek-Mercer
  * interpolation with add-one unigram smoothing:
  *
  *   pUni(w)      = (c1(map(w)) + 1) / (N + V)
  *   pBi(w2 | w1) = λ·c2(w1,w2)/c1(w1) + (1−λ)·pUni(w2)   [c1 > 0]
  *                = pUni(w2)                                [else]
  *   ppl(doc)     = exp(−(ln pUni(t1) + Σ_{i≥2} ln pBi(ti|ti−1)) / T)
  *
  * map(w) sends out-of-vocabulary tokens to the UNK symbol; pruned or
  * unseen bigrams read c2 = 0, so the λ-mix floors every probability at
  * (1−λ)·pUni > 0 — no −∞ anywhere. The scan is row-local: two hash
  * lookups per token against the broadcast maps, sequential in document
  * order (deterministic float fold). NULL for an empty token array.
  *
  * Codegen: one static call (the [[CosineSimilarity]] strategy), so the
  * scorer stays inside WholeStageCodegen.
  */
case class BigramPerplexityBroadcast(
    model: Broadcast[BigramLmModel],
    lambda: Double,
    child: Expression,
    /** Trigram interpolation weight (r13): at position i ≥ 3,
      *   p3(w|u,v) = λ3·c(u,v,w)/c(u,v) + (1−λ3)·p2(w|v)   [c(u,v) > 0
      *             = p2(w|v)                                 in the PRUNED
      *                                                       bigram table]
      * — recursive Jelinek-Mercer with backoff through the lower
      * orders, the KenLM interpolated shape at order 3. lambda3 = 0
      * (the default) is the pure bigram model.
      */
    lambda3: Double = 0.0,
    /** 4-gram interpolation weight (r13): at position i ≥ 4,
      *   p4(w|t,u,v) = λ4·c(t,u,v,w)/c(t,u,v) + (1−λ4)·p3(w|u,v)
      *                                           [c(t,u,v) > 0 in the
      *                                            PRUNED trigram table]
      *               = p3(w|u,v)                  [else]
      * — one more recursive level, backing off through the pruned
      * trigram table exactly as order 3 backs off through the bigrams.
      */
    lambda4: Double = 0.0)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bigram_perplexity needs array<string> tokens, got $t")
    }

  override def nullSafeEval(tokens: Any): Any = {
    val r = BigramPerplexityBroadcast.ppl(
      tokens.asInstanceOf[ArrayData], model.value, lambda, lambda3, lambda4)
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val mCls = classOf[BigramLmModel].getName
    val bcRef = ctx.addReferenceObj("graftLmBc", model, bcCls)
    val mVar = ctx.addMutableState(mCls, "graftLm",
      v => s"$v = ($mCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("ppl")
      s"""
         double $tmp = graft.functions.expressions.BigramPerplexityBroadcast.ppl(
           $c, $mVar, $lambda, $lambda3, $lambda4);
         if (Double.isNaN($tmp)) { ${ev.isNull} = true; }
         else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramPerplexityBroadcast {
  /** The UNK symbol: U+0001 never appears in space-split natural text
    * (it is `chr(1)` in the DuckDB replay). The empty string is NOT
    * usable here: double spaces make "" a legitimate token.
    */
  val Unk = "\u0001"

  /** NaN encodes NULL (empty token array) across the codegen boundary. */
  def ppl(tokens: ArrayData, m: BigramLmModel, lambda: Double,
          lambda3: Double = 0.0, lambda4: Double = 0.0): Double = {
    val t = tokens.numElements()
    if (t == 0) return Double.NaN
    val denom = (m.nTokens + m.vSize).toDouble
    var logp = 0.0
    var prev: String = null
    var prev2: String = null
    var prev3: String = null
    var i = 0
    while (i < t) {
      val raw = tokens.getUTF8String(i).toString
      val w = if (m.uni.containsKey(raw)) raw else Unk
      val c1w = m.uni.getOrDefault(w, 0L)
      val pU = (c1w + 1).toDouble / denom
      if (i == 0) logp += math.log(pU)
      else {
        val c1p = m.uni.getOrDefault(prev, 0L)
        val p2 =
          if (c1p > 0) {
            val inner = m.bi.get(prev)
            val c2 = if (inner == null) 0L else inner.getOrDefault(w, 0L)
            lambda * c2.toDouble / c1p + (1.0 - lambda) * pU
          } else pU
        val p3 =
          if (i >= 2 && lambda3 > 0) {
            // context-pair count from the PRUNED bigram table — an
            // absent/pruned context backs off to the bigram estimate,
            // exactly what the oracle replays
            val biPrev2 = m.bi.get(prev2)
            val c12 = if (biPrev2 == null) 0L else biPrev2.getOrDefault(prev, 0L)
            if (c12 > 0) {
              val t1 = m.tri.get(prev2)
              val t2 = if (t1 == null) null else t1.get(prev)
              val c123 = if (t2 == null) 0L else t2.getOrDefault(w, 0L)
              lambda3 * c123.toDouble / c12 + (1.0 - lambda3) * p2
            } else p2
          } else p2
        // order 4 (r13): context-TRIPLE count from the PRUNED trigram
        // table; an absent/pruned triple backs off to the order-3 form
        val p =
          if (i >= 3 && lambda4 > 0) {
            val t1 = m.tri.get(prev3)
            val t2 = if (t1 == null) null else t1.get(prev2)
            val c123ctx = if (t2 == null) 0L else t2.getOrDefault(prev, 0L)
            if (c123ctx > 0) {
              val qInner = m.quad.get(
                prev3 + BigramLmModel.CtxSep + prev2 + BigramLmModel.CtxSep + prev)
              val c4 = if (qInner == null) 0L else qInner.getOrDefault(w, 0L)
              lambda4 * c4.toDouble / c123ctx + (1.0 - lambda4) * p3
            } else p3
          } else p3
        logp += math.log(p)
      }
      prev3 = prev2
      prev2 = prev
      prev = w
      i += 1
    }
    math.exp(-logp / t)
  }
}

/** Kneser-Ney statistics derived from a trained [[BigramLmModel]]'s
  * PRUNED bigram table (Kneser & Ney 1995; the interpolated form of
  * Chen & Goodman 1998 §2.7 — the smoothing KenLM ships by default):
  * per-context fanout N1+(v,·), per-word continuation counts N1+(·,w),
  * and the total surviving-pair mass N1+(·,·). Derived driver-side from
  * the already-collected (capacity-bounded) pair table — no extra
  * corpus pass, sizes bounded by the training caps exactly like the
  * base model.
  */
final class KnModel(
    val base: BigramLmModel,
    val fanout: java.util.HashMap[String, Long],
    val cont: java.util.HashMap[String, Long],
    val pairCount: Long) extends Serializable

/** kn_perplexity: per-document perplexity under interpolated Kneser-Ney
  * smoothing over the broadcast [[KnModel]] — the absolute-discount
  * counterpart of [[BigramPerplexityBroadcast]]'s Jelinek-Mercer mix.
  * With discount D over the PRUNED pair table:
  *
  *   pCont(w)   = (N1+(·,w) + 1) / (N1+(·,·) + V)        [add-one over
  *                                                        vocab+UNK]
  *   pKN(w | v) = max(c2(v,w) − D, 0)/c1(v)
  *              + D·N1+(v,·)/c1(v) · pCont(w)     [c1(v) > 0, N1+(v,·) > 0]
  *              = pCont(w)                        [else — contextless
  *                                                backoff]
  *   ppl(doc)   = exp(−(ln pCont(t1) + Σ_{i≥2} ln pKN(ti|ti−1)) / T)
  *
  * The continuation distribution is add-one smoothed so words with no
  * surviving continuation mass (or UNK when absent from the pair table)
  * still score finite; a pruned pair reads c2 = 0 and the max(·,0)
  * floor keeps the discounted term at zero rather than negative. All
  * inputs are exact integer counts — the q151 DuckDB oracle replays the
  * whole construction (election, fold, prune+cap, fanout/continuation
  * counting, this exact probability) term for term.
  */
case class KnPerplexityBroadcast(
    model: Broadcast[KnModel],
    discount: Double,
    child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"kn_perplexity needs array<string> tokens, got $t")
    }

  override def nullSafeEval(tokens: Any): Any = {
    val r = KnPerplexityBroadcast.ppl(
      tokens.asInstanceOf[ArrayData], model.value, discount)
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val mCls = classOf[KnModel].getName
    val bcRef = ctx.addReferenceObj("graftKnBc", model, bcCls)
    val mVar = ctx.addMutableState(mCls, "graftKn",
      v => s"$v = ($mCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("ppl")
      s"""
         double $tmp = graft.functions.expressions.KnPerplexityBroadcast.ppl(
           $c, $mVar, $discount);
         if (Double.isNaN($tmp)) { ${ev.isNull} = true; }
         else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KnPerplexityBroadcast {
  /** NaN encodes NULL (empty token array) across the codegen boundary.
    * Evaluation order mirrors the q151 oracle's SQL term for term
    * (left-to-right `D·fanout/c1·pCont`), so the milli-rounded fold
    * hash-matches; the integer cast absorbs the residual ≤1-ulp ln/exp
    * divergence exactly as q147's does.
    */
  def ppl(tokens: ArrayData, m: KnModel, d: Double): Double = {
    val t = tokens.numElements()
    if (t == 0) return Double.NaN
    val base = m.base
    val pv = m.pairCount.toDouble + base.vSize.toDouble
    var logp = 0.0
    var prev: String = null
    var i = 0
    while (i < t) {
      val raw = tokens.getUTF8String(i).toString
      val w = if (base.uni.containsKey(raw)) raw else BigramPerplexityBroadcast.Unk
      val pc = (m.cont.getOrDefault(w, 0L) + 1.0) / pv
      if (i == 0) logp += math.log(pc)
      else {
        val c1p = base.uni.getOrDefault(prev, 0L)
        val fo = m.fanout.getOrDefault(prev, 0L)
        val p =
          if (c1p > 0 && fo > 0) {
            val inner = base.bi.get(prev)
            val c2 = if (inner == null) 0L else inner.getOrDefault(w, 0L)
            math.max(c2.toDouble - d, 0.0) / c1p + d * fo.toDouble / c1p * pc
          } else pc
        logp += math.log(p)
      }
      prev = w
      i += 1
    }
    math.exp(-logp / t)
  }
}

/** The broadcast payload of a trained multinomial Naive Bayes text
  * classifier ([[graft.functions.TextClassifier.trainNaiveBayes]]):
  * per-token per-class counts over the UNK-mapped stream (token →
  * long[nClasses], one map entry per vocab word — bounded by the
  * training caps), per-class token totals and document counts, and the
  * shared vocabulary size. Class order is fixed (sorted labels) and
  * positions in every array align with it.
  */
final class NbModel(
    val classes: Array[String],
    val docsPerClass: Array[Long],
    val nDocs: Long,
    val tokTotals: Array[Long],
    val vSize: Long,
    val counts: java.util.HashMap[String, Array[Long]]) extends Serializable

/** nb_log_scores: per-class multinomial Naive Bayes log-likelihoods of
  * a token array under a broadcast [[NbModel]] — the model-based
  * quality/domain classifier of the CCNet/GPT-3 pipeline family, in its
  * exactly-countable form (training is pure counting, scoring is sums
  * of logs of count ratios — the same integer-exact-then-log structure
  * that lets the q147/q149 LM oracles replay bit-for-bit to milli
  * precision):
  *
  *   score_c(doc) = ln(docs_c / nDocs)
  *                + Σ_i ln((cnt(map(w_i), c) + 1) / (tokTotal_c + V))
  *
  * with add-one smoothing over the shared vocabulary (+UNK). Output is
  * the nClasses-length double array aligned with the model's class
  * order; argmax is the prediction, differences are log-odds. Row-local
  * (one hash lookup per token), NULL for an empty token array.
  */
case class NbLogScoresBroadcast(
    model: Broadcast[NbModel],
    child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nb_log_scores needs array<string> tokens, got $t")
    }

  override def nullSafeEval(tokens: Any): Any =
    NbLogScoresBroadcast.scores(tokens.asInstanceOf[ArrayData], model.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val mCls = classOf[NbModel].getName
    val bcRef = ctx.addReferenceObj("graftNbBc", model, bcCls)
    val mVar = ctx.addMutableState(mCls, "graftNb",
      v => s"$v = ($mCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("nb")
      s"""
         org.apache.spark.sql.catalyst.util.ArrayData $tmp =
           graft.functions.expressions.NbLogScoresBroadcast.scores($c, $mVar);
         if ($tmp == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NbLogScoresBroadcast {
  /** Null (not a zero vector) for empty token arrays. */
  def scores(tokens: ArrayData, m: NbModel): ArrayData = {
    val t = tokens.numElements()
    if (t == 0) return null
    val k = m.classes.length
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      out(c) = math.log(m.docsPerClass(c).toDouble / m.nDocs)
      c += 1
    }
    var i = 0
    while (i < t) {
      val raw = tokens.getUTF8String(i).toString
      val row0 = m.counts.get(raw)
      val row = if (row0 != null) row0
        else m.counts.get(BigramPerplexityBroadcast.Unk)
      c = 0
      while (c < k) {
        val cnt = if (row == null) 0L else row(c)
        out(c) += math.log((cnt + 1).toDouble / (m.tokTotals(c) + m.vSize))
        c += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
