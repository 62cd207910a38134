package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the DuckDB string-similarity family. All four
  * metrics operate on UTF-8 BYTES, exactly like DuckDB (probed duckdb
  * 1.0.0: `hamming('âb','ab')` errors on unequal BYTE length though the
  * codepoint counts match; `damerau_levenshtein('âa','aâ')` = 2, the
  * byte answer, not the codepoint transposition's 1). These back the
  * fuzzy near-dup / entity-matching half of the dedup surface (the
  * MinHash/SimHash operators handle document scale; these are the
  * row-local pair scorers).
  */
object TextSim {
  /** Character(byte)-SET Jaccard, DuckDB semantics: `jaccard('aab',
    * 'ab')` = 1.0 (sets, not multisets); an empty argument errors like
    * DuckDB's "argument too short".
    */
  def jaccard(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    if (x.length == 0 || y.length == 0)
      throw new IllegalArgumentException(
        "jaccard: an argument is too short (DuckDB errors on empty strings too)")
    val sa = new Array[Boolean](256); val sb = new Array[Boolean](256)
    var i = 0
    while (i < x.length) { sa(x(i) & 0xff) = true; i += 1 }
    i = 0
    while (i < y.length) { sb(y(i) & 0xff) = true; i += 1 }
    var inter = 0; var union = 0
    i = 0
    while (i < 256) {
      if (sa(i) && sb(i)) inter += 1
      if (sa(i) || sb(i)) union += 1
      i += 1
    }
    inter.toDouble / union
  }

  /** Hamming distance over bytes; unequal (or zero) lengths error like
    * DuckDB's Mismatch Function.
    */
  def hamming(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    if (x.length != y.length || x.length == 0)
      throw new IllegalArgumentException(
        "hamming/mismatches: strings must be of equal non-zero length (DuckDB errors too)")
    var d = 0L; var i = 0
    while (i < x.length) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  /** Jaro similarity over bytes (match window ⌊max/2⌋−1, standard
    * transposition count).
    */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    if (x.length == 0 && y.length == 0) return 1.0
    if (x.length == 0 || y.length == 0) return 0.0
    val window = math.max(math.max(x.length, y.length) / 2 - 1, 0)
    val xm = new Array[Boolean](x.length)
    val ym = new Array[Boolean](y.length)
    var matches = 0
    var i = 0
    while (i < x.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(y.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!ym(j) && x(i) == y(j)) { xm(i) = true; ym(j) = true; matches += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < x.length) {
      if (xm(i)) {
        while (!ym(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // DuckDB (rapidfuzz) FLOORS the transposition count: t = ⌊diff/2⌋,
    // not the textbook diff/2.0 (probed: jaro('NATION_0','NOTION_0')
    // = 0.869048 — 3 mismatched positions counted as ONE transposition)
    (m / x.length + m / y.length + (m - t / 2) / m) / 3.0
  }

  /** Jaro-Winkler over bytes: the prefix boost (ℓ ≤ 4, p = 0.1) applies
    * only above the standard 0.7 threshold (probed: jw of a 0.477-jaro
    * pair with a common prefix is unchanged).
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val x = a.getBytes; val y = b.getBytes
    var l = 0
    val max = math.min(4, math.min(x.length, y.length))
    while (l < max && x(l) == y(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** FULL Damerau-Levenshtein over bytes (unrestricted transpositions —
    * probed: `damerau_levenshtein('CA','ABC')` = 2, where the
    * restricted OSA variant would say 3). Classic da[alphabet]
    * algorithm; alphabet = the 256 byte values.
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    val n = x.length; val m = y.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = da(y(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (x(i - 1) == y(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da(x(i - 1) & 0xff) = i
      i += 1
    }
    d(n + 1)(m + 1).toLong
  }

  /** DuckDB strip_accents: NFD-decompose then drop combining marks. */
  def stripAccents(s: UTF8String): UTF8String = UTF8String.fromString(
    java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", ""))

  /** DuckDB nfc_normalize: Unicode NFC composition. */
  def nfcNormalize(s: UTF8String): UTF8String = UTF8String.fromString(
    java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
}

/** Binary string-metric expression: codegen emits one static [[TextSim]]
  * call, so the whole family stays inside whole-stage codegen.
  */
abstract class TextSimBinary extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two strings, got (${left.dataType}, ${right.dataType})")
  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.TextSim.$kernel($a, $b)")
}

case class JaccardSim(left: Expression, right: Expression) extends TextSimBinary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextSim.jaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

case class HammingDist(left: Expression, right: Expression) extends TextSimBinary {
  override def dataType: DataType = LongType
  override protected def kernel: String = "hamming"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextSim.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist =
    copy(left = l, right = r)
}

case class JaroSim(left: Expression, right: Expression) extends TextSimBinary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "jaro"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextSim.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSim =
    copy(left = l, right = r)
}

case class JaroWinklerSim(left: Expression, right: Expression) extends TextSimBinary {
  override def dataType: DataType = DoubleType
  override protected def kernel: String = "jaroWinkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
}

case class DamerauLevenshteinDist(left: Expression, right: Expression) extends TextSimBinary {
  override def dataType: DataType = LongType
  override protected def kernel: String = "damerauLevenshtein"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextSim.damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshteinDist =
    copy(left = l, right = r)
}

/** Unary unicode-normalization expression, codegen'd the same way. */
abstract class TextNormUnary extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${child.dataType}")
  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.TextSim.$kernel($a)")
}

case class StripAccents(child: Expression) extends TextNormUnary {
  override protected def kernel: String = "stripAccents"
  override protected def nullSafeEval(a: Any): Any =
    TextSim.stripAccents(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

case class NfcNormalize(child: Expression) extends TextNormUnary {
  override protected def kernel: String = "nfcNormalize"
  override protected def nullSafeEval(a: Any): Any =
    TextSim.nfcNormalize(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
