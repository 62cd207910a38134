package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the shingling/minhash hot loops. The
  * higher-order-function formulation (transform + concat_ws + element_at
  * + array_min) evaluates interpreted AND re-evaluates the token-split
  * subtree per element — O(shingles × k) string splits per row. These
  * run one tight loop per row instead.
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
case class ShingleHashes(child: Expression, kExpr: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val k = kExpr.eval().asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val tok = v.asInstanceOf[ArrayData]
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
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), kExpr = cs(1))
}

/** minhash_signature(tokens, k, numHashes): the full MinHash signature
  * in one pass — for each seed s, min over distinct shingles of
  * hash(shingle, seed=s). No explode, no shuffle, no per-element
  * expression evaluation.
  */
case class MinhashSignature(child: Expression, kExpr: Expression, numExpr: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child, kExpr, numExpr)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val k = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val num = numExpr.eval().asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val tok = v.asInstanceOf[ArrayData]
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
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), kExpr = cs(1), numExpr = cs(2))
}
