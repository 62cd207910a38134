package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `product(x)` aggregate (skips NULLs, DOUBLE result, NULL on
  * zero rows — probed duckdb 1.0.0). Declarative — partial-aggregates
  * map-side and stays inside whole-stage codegen like Sum; the
  * reference surface reaches it only through SQL passthrough
  * (filefilter.py:340-342), so the Spark re-expression is an exact
  * aggregate, not exp(sum(ln)) (which breaks on zeros/negatives).
  */
case class GraftProduct(child: Expression) extends DeclarativeAggregate
    with UnaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "product"

  private lazy val prod = AttributeReference("prod", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))
  private lazy val childD = Cast(child, DoubleType)
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(childD), prod,
      Multiply(Coalesce(Seq(prod, Literal(1.0d))), childD)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(prod.right), prod.left,
      Multiply(Coalesce(Seq(prod.left, Literal(1.0d))), prod.right)))
  override lazy val evaluateExpression: Expression = prod
  override protected def withNewChildInternal(newChild: Expression): GraftProduct =
    copy(child = newChild)
}

/** DuckDB's `entropy(x)` aggregate: Shannon entropy (log base 2) of the
  * VALUE DISTRIBUTION, NULLs skipped (probed duckdb 1.0.0 — uniform 4
  * values → 2.0). The builder casts the child to STRING so the count
  * buffer keys one representation per distinct input value; memory is
  * bounded by the column's distinct count, the same cost DuckDB pays.
  * Mergeable (count maps union), so it partial-aggregates map-side.
  */
case class GraftEntropy(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "entropy"

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[UTF8String, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(buf: scala.collection.mutable.HashMap[UTF8String, Long],
                      input: InternalRow): scala.collection.mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // MUST copy: an UnsafeRow-backed UTF8String is a reused buffer —
      // keeping the reference collapses every key onto the last row
      val k = v.asInstanceOf[UTF8String].clone()
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.HashMap[UTF8String, Long],
                     other: scala.collection.mutable.HashMap[UTF8String, Long]): scala.collection.mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    buf
  }

  override def eval(buf: scala.collection.mutable.HashMap[UTF8String, Long]): Any = {
    if (buf.isEmpty) return null
    val n = buf.valuesIterator.sum.toDouble
    var h = 0.0
    buf.valuesIterator.foreach { c =>
      val p = c / n
      h -= p * (math.log(p) / math.log(2.0))
    }
    h
  }

  override def serialize(buf: scala.collection.mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftEntropy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftEntropy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GraftEntropy =
    copy(child = newChild)
}
