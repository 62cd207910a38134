package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the shingling/minhash/fingerprint hot loops.
  * The higher-order-function formulation (transform + concat_ws +
  * element_at + array_min) evaluates interpreted AND re-evaluates the
  * token-split subtree per element — O(shingles × k) string splits per
  * row. These run one tight loop per row instead, and codegen as a
  * single static call (see VectorExpressions' scaladoc for why that
  * beats CodegenFallback).
  */
private object ShingleUtil {
  /** 64-bit hash of the k-token window starting at i: xxhash of each
    * token chained through the seed — injective on the token tuple like
    * hashing the joined string, but allocation-free (UTF8String views
    * only, no StringBuilder), which keeps GC flat on wide scans.
    */
  def windowHash(tok: ArrayData, i: Int, k: Int, seed: Long): Long = {
    var h = seed
    var j = 0
    while (j < k) {
      h = XxHash64Function.hash(tok.getUTF8String(i + j), StringType, h)
      j += 1
    }
    h
  }
}

/** shingle_hashes(tokens, k): distinct 64-bit hashes of the k-token
  * shingles of a document. Identity-equivalent to hashing the joined
  * shingle strings — set operations (Jaccard, inverted index joins)
  * behave exactly as with string shingles, at 8 bytes a key.
  */
case class ShingleHashes(child: Expression, kExpr: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val k = kExpr.eval().asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    ShingleHashes.compute(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      boolean ${ev.isNull} = ${c.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.expressions.ShingleHashes.compute(${c.value}, $k);
      }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), kExpr = cs(1))
}

object ShingleHashes {
  def compute(tok: ArrayData, k: Int): ArrayData = {
    val n = tok.numElements()
    if (n < k) return ArrayData.toArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n - k + 1)
    var m = 0
    var i = 0
    while (i <= n - k) {
      val h = ShingleUtil.windowHash(tok, i, k, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, m))
  }
}

/** shingle_strings(tokens, k): distinct k-token shingle STRINGS
  * (space-joined) in one pass per row — the oracle-comparable sibling
  * of [[ShingleHashes]] for operators whose output must be
  * reproducible in SQL (e.g. contamination screening, q86). The
  * declarative transform/concat_ws formulation re-evaluates the
  * token-split subtree per element when interpreted (measured 4+ s on
  * the sf0.1 corpus vs ~0.3 s here).
  */
case class ShingleStrings(child: Expression, kExpr: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private lazy val k = kExpr.eval().asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    ShingleStrings.compute(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      boolean ${ev.isNull} = ${c.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.expressions.ShingleStrings.compute(${c.value}, $k);
      }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), kExpr = cs(1))
}

object ShingleStrings {
  private val Space = UTF8String.fromString(" ")

  def compute(tok: ArrayData, k: Int): ArrayData = {
    val n = tok.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    // first-occurrence order, distinct by value — identical to
    // array_distinct(shingles) in the declarative form
    val seen = new java.util.LinkedHashSet[UTF8String]((n - k + 1) * 2)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = tok.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** norm_fingerprint(text): md5 hex of the canonical document form —
  * lowercase, strip leading/trailing spaces, collapse whitespace runs to
  * a single space. Exactly equivalent to
  * `md5(regexp_replace(trim(lower(text)), "\\s+", " "))` (and to the
  * DuckDB spelling with the 'g' flag), but in one allocation-light byte
  * pass instead of a java.util.regex scan per document — the regex path
  * was 26× the oracle on long documents.
  *
  * Whitespace here is java-regex `\s` = [ \t\n\x0B\f\r]; all are
  * single-byte in UTF-8, so the byte-level pass never splits a
  * multi-byte code point.
  */
case class NormFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"norm_fingerprint needs a string arg, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    NormFingerprint.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.NormFingerprint.compute($s)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NormFingerprint {
  /** Per-thread digest: Expression instances are shared across local-mode
    * tasks, so instance state would race.
    */
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".getBytes

  def compute(v: UTF8String): UTF8String = {
    // Same lowercase as Spark's Lower (UTF8String.toLowerCase).
    val bytes = v.toLowerCase.getBytes
    // trim() parity: strip 0x20 only at the ends; interior (and non-space
    // leading/trailing) whitespace is handled by the collapse below.
    var start = 0
    var end = bytes.length
    while (start < end && bytes(start) == 0x20) start += 1
    while (end > start && bytes(end - 1) == 0x20) end -= 1
    val out = new Array[Byte](end - start)
    var m = 0
    var i = start
    var inWs = false
    while (i < end) {
      val b = bytes(i)
      val ws = b == 0x20 || (b >= 0x09 && b <= 0x0D)
      if (ws) {
        if (!inWs) { out(m) = 0x20; m += 1; inWs = true }
      } else { out(m) = b; m += 1; inWs = false }
      i += 1
    }
    val md = digests.get()
    md.reset()
    md.update(out, 0, m)
    UTF8String.fromBytes(hex(md.digest()))
  }

  private def hex(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    out
  }
}

/** deflate_ratio(text): DEFLATE-compressed size over raw UTF-8 size —
  * the gzip-compression-ratio quality signal of modern pretraining
  * pipelines (Dolma, Soldaini et al. 2024 §C; RefinedWeb): highly
  * repetitive or templated pages compress far below natural prose
  * (~0.3–0.6), while random/binary-ish content sits near (or just
  * above) 1. Deterministic (java.util.zip.Deflater, fixed level 6,
  * no header variance), row-local, codegen'd via one static call;
  * per-thread Deflater reuse — expression instances are shared across
  * local-mode tasks. Empty text → 1.0 (nothing to compress).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio needs a string arg, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    DeflateRatio.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.DeflateRatio.compute($s)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object DeflateRatio {
  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6, false))
  private val bufs = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  def compute(v: UTF8String): Double = {
    val bytes = v.getBytes
    if (bytes.isEmpty) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = bufs.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

/** minhash_signature(tokens, k, numHashes): the full MinHash signature
  * in one pass — for each seed s, min over distinct shingles of
  * hash(shingle, seed=s). No explode, no shuffle, no per-element
  * expression evaluation.
  */
case class MinhashSignature(child: Expression, kExpr: Expression, numExpr: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(child, kExpr, numExpr)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val k = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val num = numExpr.eval().asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    MinhashSignature.compute(v.asInstanceOf[ArrayData], k, num)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      boolean ${ev.isNull} = ${c.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.expressions.MinhashSignature.compute(${c.value}, $k, $num);
      }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), kExpr = cs(1), numExpr = cs(2))
}

/** simhash_sig(tokens, mode): 'md5' → the engine-portable 60-bit
  * SimHash (per distinct token, low 60 bits of md5 = first 15 hex
  * chars; bit b of the signature is the sign of Σ±1 over tokens'
  * bit b) — bit-for-bit equal to the DuckDB SQL recomputation in
  * TextQueries.simhashOracle. 'xx' → the fast 64-bit variant hashing
  * tokens with xxhash64(seed 42), identical values to
  * xxhash64(token) in Spark SQL. One tight loop per row replaces the
  * 64-conditional-sum groupBy formulation (explode + wide aggregate →
  * row-local projection, no shuffle at all).
  */
case class SimHashSig(child: Expression, modeExpr: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, modeExpr)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = LongType
  private lazy val md5Mode: Boolean =
    modeExpr.eval().asInstanceOf[UTF8String].toString == "md5"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    SimHashSig.compute(v.asInstanceOf[ArrayData], md5Mode)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      boolean ${ev.isNull} = ${c.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.expressions.SimHashSig.compute(${c.value}, $md5Mode);
      }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), modeExpr = cs(1))
}

object SimHashSig {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Low 60 bits of md5(token) — the value of the first 15 hex chars of
    * the digest, i.e. big-endian first-8-bytes >>> 4 (matches DuckDB's
    * CAST('0x' || substr(md5(t),1,15) AS UBIGINT) and Spark SQL's
    * conv(substring(md5(t),1,15),16,10) exactly).
    */
  private def md5Low60(t: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(t.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  def compute(tok: ArrayData, md5Mode: Boolean): Long = {
    val n = tok.numElements()
    val bits = if (md5Mode) 60 else 64
    val counts = new Array[Int](bits)
    // distinct by token VALUE (matches array_distinct ∘ split and the
    // oracle's SELECT DISTINCT), not by hash
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val t = tok.getUTF8String(i)
      if (seen.add(t)) {
        val h =
          if (md5Mode) md5Low60(t)
          else XxHash64Function.hash(t, StringType, 42L)
        var b = 0
        while (b < bits) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}

object MinhashSignature {
  def compute(tok: ArrayData, k: Int, num: Int): ArrayData = {
    val n = tok.numElements()
    val sig = Array.fill(num)(Long.MaxValue)
    if (n >= k) {
      val seen = new java.util.HashSet[java.lang.Long](n * 2)
      var i = 0
      while (i <= n - k) {
        val base = ShingleUtil.windowHash(tok, i, k, 42L)
        if (seen.add(base)) {
          var s = 0
          while (s < num) {
            // per-seed rehash of the shingle hash (cheap long mix)
            val h = XxHash64Function.hash(base, LongType, s.toLong)
            if (h < sig(s)) sig(s) = h
            s += 1
          }
        }
        i += 1
      }
    }
    ArrayData.toArrayData(sig)
  }
}

/** sorted_intersect_count(a, b): |A ∩ B| for two ASCENDING-sorted
  * distinct long arrays, by a single allocation-free merge pass —
  * the row-local verification step of the PPJoin-filtered exact
  * Jaccard ([[graft.functions.Dedup.jaccardPairsPrefix]]). Replaces
  * a per-candidate shingle-join + group-by (a shuffle over Σ|S|
  * rows) with O(|A|+|B|) work inside the candidate row. Inputs MUST
  * be sorted (array_sort upstream); unsorted input silently
  * undercounts, so keep construction to the Dedup operators.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs array<bigint> args, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** dsir_buckets(text, buckets): the DSIR hashed uni+bigram feature bag
  * (Xie et al. 2023) in one pass per row — bucket ids (with
  * multiplicity) of every whitespace token and every adjacent token
  * pair, where bucket = first-8-hex-chars of md5(gram) mod `buckets`,
  * bit-for-bit the portable construction
  * `conv(substr(md5(g),1,8),16,10) % buckets` that the q112 DuckDB
  * oracle replays. Tokenization matches `split(text, ' ')` exactly
  * (every single space splits; empty tokens kept). Because the
  * separator IS the single space, a bigram's md5 input is exactly the
  * original text's byte range spanning the two tokens — the loop
  * digests slices of the row's backing bytes and never materializes a
  * gram string. Unigram buckets first, then bigrams, matching
  * `concat(tokens, zip_with-bigrams)` order for the equality spec.
  */
case class DsirBuckets(child: Expression, bucketsExpr: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, bucketsExpr)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // mirror of TokenGrams (ADVICE r8 #2): without this, a non-foldable
  // buckets arg hit bucketsExpr.eval() unbound (opaque
  // UnsupportedOperationException at planning), buckets = 0 divided by
  // zero per row, and a non-string child ClassCastExceptioned at eval
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"dsir_buckets needs a string text column, got ${child.dataType}")
    else if (!bucketsExpr.foldable ||
        !(bucketsExpr.dataType == IntegerType || bucketsExpr.dataType == LongType ||
          bucketsExpr.dataType == ShortType || bucketsExpr.dataType == ByteType))
      TypeCheckFailure("dsir_buckets needs a literal integer bucket count")
    else bucketsExpr.eval() match {
      case i: Number if i.intValue() > 0 => TypeCheckSuccess
      case other => TypeCheckFailure(s"dsir_buckets needs a positive bucket count, got $other")
    }
  }

  private lazy val buckets = bucketsExpr.eval().asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    DsirBuckets.compute(v.asInstanceOf[UTF8String], buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      boolean ${ev.isNull} = ${c.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.expressions.DsirBuckets.compute(${c.value}, $buckets);
      }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), bucketsExpr = cs(1))
}

object DsirBuckets {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes as an unsigned 32-bit value (= the first 8 hex
    * chars), mod buckets.
    */
  private def bucketOf(md: java.security.MessageDigest, bytes: Array[Byte],
                       off: Int, len: Int, buckets: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    v % buckets
  }

  def compute(text: UTF8String, buckets: Int): ArrayData = {
    val bytes = text.getBytes
    // token ranges under split-on-every-space, empties kept: n spaces →
    // n+1 tokens
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val md = digests.get()
    val out = new Array[Long](nTok + (if (nTok >= 2) nTok - 1 else 0))
    i = 0
    while (i < nTok) {
      out(i) = bucketOf(md, bytes, starts(i), ends(i) - starts(i), buckets)
      i += 1
    }
    // bigram "tok_i tok_{i+1}" == the original bytes [starts(i), ends(i+1))
    i = 0
    while (i < nTok - 1) {
      out(nTok + i) = bucketOf(md, bytes, starts(i), ends(i + 1) - starts(i), buckets)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** token_grams(text, n): the whitespace n-gram bag (n = 1 tokens,
  * n = 2 adjacent pairs) as STRINGS in one pass per row — the
  * string-returning sibling of [[DsirBuckets]] for operators that must
  * surface the grams themselves (heavy hitters). Tokenization matches
  * `split(text, ' ')` exactly (every single space splits, empties
  * kept); because the separator IS the split character, every gram —
  * unigram or bigram — is a contiguous byte range of the original
  * text, so the output strings are built with UTF8String.fromBytes
  * over those ranges: no regex scan, no per-gram concat, one byte-copy
  * per gram. The declarative twin (split / zip_with-over-slices) is
  * asserted equal in UtilOpsSpec.
  */
case class TokenGrams(child: Expression, nExpr: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, nExpr)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"token_grams needs a string text column, got ${child.dataType}")
    else if (!nExpr.foldable ||
        !(nExpr.dataType == IntegerType || nExpr.dataType == LongType ||
          nExpr.dataType == ShortType || nExpr.dataType == ByteType))
      TypeCheckFailure("token_grams needs a literal integer n (1 = tokens, 2 = bigrams)")
    else nExpr.eval() match {
      case i: Number if i.intValue() == 1 || i.intValue() == 2 => TypeCheckSuccess
      case other => TypeCheckFailure(s"token_grams supports n = 1 or 2, got $other")
    }
  }

  private lazy val n = nExpr.eval().asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    TokenGrams.compute(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = c.code + code"""
      boolean ${ev.isNull} = ${c.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.expressions.TokenGrams.compute(${c.value}, $n);
      }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), nExpr = cs(1))
}

object TokenGrams {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val out: Array[Any] =
      if (n == 1) {
        val a = new Array[Any](nTok)
        i = 0
        while (i < nTok) {
          a(i) = UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i))
          i += 1
        }
        a
      } else {
        val m = if (nTok >= 2) nTok - 1 else 0
        val a = new Array[Any](m)
        i = 0
        while (i < m) {
          // bigram "tok_i tok_{i+1}" == original bytes [starts(i), ends(i+1))
          a(i) = UTF8String.fromBytes(bytes, starts(i), ends(i + 1) - starts(i))
          i += 1
        }
        a
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** remove_covered_tokens: drop every token covered by any of the
  * k-wide marked windows — the rebuild half of [[graft.functions.Dedup
  * .dedupSubstrings]] (Lee et al. 2022 "Deduplicating Training Data
  * Makes Language Models Better", the ExactSubstr pass). left = the
  * doc's token array, right = the SORTED-ascending 1-based start
  * positions of its marked (non-first duplicate) windows; token j
  * survives iff no start s satisfies s <= j < s + k. Two-pointer sweep
  * — O(T + M) per row, not the O(T·M) an exists()-in-filter() HOF pair
  * would pay — as one codegen'd static call. A NULL/empty start list
  * keeps every token.
  */
case class RemoveCoveredTokens(k: Int, left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"remove_covered_tokens needs (array<string>, array<int>), got ($l, $r)")
    }

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return null
    val s = right.eval(input)
    RemoveCoveredTokens.kept(t.asInstanceOf[ArrayData],
      if (s == null) null else s.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = ${leftGen.isNull};
      $arrCls ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.expressions.RemoveCoveredTokens.kept(
          ${leftGen.value}, ${rightGen.isNull} ? null : ${rightGen.value}, $k);
      }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object RemoveCoveredTokens {
  def kept(toks: ArrayData, starts: ArrayData, k: Int): ArrayData = {
    val t = toks.numElements()
    if (starts == null || starts.numElements() == 0) return toks.copy()
    val m = starts.numElements()
    val out = new Array[AnyRef](t)
    var n = 0
    var p = 0
    var maxEnd = 0 // exclusive end of the furthest-reaching window so far
    var j = 1
    while (j <= t) {
      while (p < m && starts.getInt(p) <= j) {
        val e = starts.getInt(p) + k
        if (e > maxEnd) maxEnd = e
        p += 1
      }
      if (j >= maxEnd) { out(n) = toks.getUTF8String(j - 1); n += 1 }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, n))
  }
}

/** regexp_replace with DuckDB 1.0 semantics (probed): replaces only
  * the FIRST match unless the options string carries `g` — Spark's
  * builtin always replaces all, a silent-wrong divergence for any
  * multi-match input. Options: `g` global, `i` case-insensitive, `c`
  * case-sensitive (position-ordered, later wins), `s` dot-matches-
  * newline, `l` literal pattern, `m`/`n`/`p` accepted as no-ops
  * (newline-sensitive matching IS Java's default: probed `.` skips
  * `\n` and `^` anchors only at string start), anything else errors
  * like DuckDB ("Unrecognized Regex option"). The replacement string
  * uses RE2 rewrite rules: `\1`-`\9` and `\0` are backrefs, `\\` a
  * literal backslash, `$` LITERAL (translated to Java Matcher form
  * per row — the strings are tiny next to the regex work). NULL in
  * any argument → NULL. The compiled Pattern is memoized per thread
  * on (pattern, flags) — one compile per task for the
  * constant-pattern shape every real query has.
  */
case class DuckRegexpReplace(str: Expression, regex: Expression,
    rep: Expression, flags: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def first: Expression = str
  override def second: Expression = regex
  override def third: Expression = rep
  override def fourth: Expression = flags
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(c => c.dataType == StringType || c.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"regexp_replace needs string args, got ${children.map(_.dataType).mkString(", ")}")

  override def nullSafeEval(s: Any, p: Any, r: Any, f: Any): Any =
    DuckRegexpReplace.compute(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], f.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, r, f) =>
      s"${ev.value} = graft.functions.expressions.DuckRegexpReplace.compute($s, $p, $r, $f);")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(str = a, regex = b, rep = c, flags = d)
}

object DuckRegexpReplace {
  import java.util.regex.{Matcher, Pattern}

  /** (pattern, flags) → compiled Pattern + global?, memoized per thread. */
  private val cache = new ThreadLocal[(String, String, Pattern, Boolean)]

  private def compile(pat: String, opts: String): (Pattern, Boolean) = {
    var jf = 0
    var global = false
    var i = 0
    while (i < opts.length) {
      opts.charAt(i) match {
        case 'g' => global = true
        case 'i' => jf |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
        case 'c' => jf &= ~(Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)
        case 's' => jf |= Pattern.DOTALL
        case 'l' => jf |= Pattern.LITERAL
        case 'm' | 'n' | 'p' => // newline-sensitive: Java's default
        case other => throw new DuckDialectException(
          s"Unrecognized Regex option $other (regexp_replace options are g/i/c/s/l/m/n/p)")
      }
      i += 1
    }
    (Pattern.compile(pat, jf), global)
  }

  /** RE2 rewrite string → Java Matcher replacement: `\N` → `$N`,
    * `\\` → literal backslash, `$` → literal, lone `\x` kept literal.
    */
  private def toJavaRewrite(r: String): String = {
    val sb = new java.lang.StringBuilder(r.length + 8)
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '\\' && i + 1 < r.length) {
        val n = r.charAt(i + 1)
        if (n >= '0' && n <= '9') { sb.append('$').append(n); i += 2 }
        else if (n == '\\') { sb.append("\\\\"); i += 2 }
        else { sb.append("\\\\").append(n); i += 2 }
      } else if (c == '\\') { sb.append("\\\\"); i += 1 }
      else if (c == '$') { sb.append("\\$"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def compute(str: UTF8String, pattern: UTF8String, rep: UTF8String,
      flags: UTF8String): UTF8String = {
    val pat = pattern.toString
    val opts = flags.toString
    var entry = cache.get()
    if (entry == null || entry._1 != pat || entry._2 != opts) {
      val (p, g) = compile(pat, opts)
      entry = (pat, opts, p, g)
      cache.set(entry)
    }
    val m = entry._3.matcher(str.toString)
    val rw = toJavaRewrite(rep.toString)
    UTF8String.fromString(if (entry._4) m.replaceAll(rw) else m.replaceFirst(rw))
  }
}
