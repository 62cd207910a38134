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

/** DuckDB's `histogram(x)` aggregate: a MAP from each distinct value to
  * its count, KEYS SORTED ascending, NULLs skipped (probed duckdb
  * 1.0.0: histogram over (2,1,2,NULL) = {1=1, 2=2}). Same mergeable
  * count-table shape as [[GraftEntropy]] (memory bounded by the
  * column's distinct count — DuckDB pays the same); keys keep the
  * child's type. Atomic key types only.
  */
case class GraftHistogram(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] {
  override def dataType: DataType = MapType(child.dataType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "histogram"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | DoubleType | FloatType |
           BooleanType | ShortType | ByteType | DateType | TimestampType |
           TimestampNTZType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _: DecimalType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"histogram needs an atomic key type, got $other")
    }

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[Any, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(buf: scala.collection.mutable.HashMap[Any, Long],
                      input: InternalRow): scala.collection.mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UnsafeRow-backed strings are reused buffers — copy the key
      val k = v match {
        case s: UTF8String => s.clone()
        case other => other
      }
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.HashMap[Any, Long],
                     other: scala.collection.mutable.HashMap[Any, Long]): scala.collection.mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    buf
  }

  @transient private lazy val keyOrdering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(child.dataType)

  override def eval(buf: scala.collection.mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return null
    val sorted = buf.toArray.sortBy(_._1)(keyOrdering)
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sorted.map(_._1)),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sorted.map(_._2)))
  }

  // serialize by the child's type: a tagged little protocol beats
  // dragging a generic serializer into the agg hot path
  override def serialize(buf: scala.collection.mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      k match {
        case s: UTF8String =>
          val b = s.getBytes
          out.writeByte(0); out.writeInt(b.length); out.write(b)
        case l: Long => out.writeByte(1); out.writeLong(l)
        case i: Int => out.writeByte(2); out.writeInt(i)
        case d: Double => out.writeByte(3); out.writeDouble(d)
        case f: Float => out.writeByte(4); out.writeFloat(f)
        case b: Boolean => out.writeByte(5); out.writeBoolean(b)
        case s: Short => out.writeByte(6); out.writeShort(s)
        case b: Byte => out.writeByte(7); out.writeByte(b)
        case d: org.apache.spark.sql.types.Decimal =>
          val str = d.toString
          out.writeByte(8); out.writeInt(d.precision); out.writeInt(d.scale)
          out.writeUTF(str)
        case other => throw new DuckDialectException(
          s"histogram: unsupported key runtime type ${other.getClass.getName}")
      }
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val k: Any = in.readByte() match {
        case 0 => val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
        case 1 => in.readLong()
        case 2 => in.readInt()
        case 3 => in.readDouble()
        case 4 => in.readFloat()
        case 5 => in.readBoolean()
        case 6 => in.readShort()
        case 7 => in.readByte()
        case 8 => val p = in.readInt(); val s = in.readInt()
          org.apache.spark.sql.types.Decimal(BigDecimal(in.readUTF()), p, s)
      }
      buf.update(k, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GraftHistogram =
    copy(child = newChild)
}

/** DuckDB's `mad(x)` aggregate — median absolute deviation: the
  * INTERPOLATED median of |x − median(x)| with the median itself
  * interpolated, NULLs skipped, NULL on zero rows, DOUBLE result
  * (probed duckdb 1.0.0: mad over (1,2,4,10) = 1.5 — median 3.0,
  * deviations (2,1,1,7) → median 1.5). The builder casts the child to
  * DOUBLE (DuckDB returns DECIMAL for decimal input — cast explicitly
  * where that matters; temporal mad returns an interval and stays a
  * guided error). Buffered as a (value → count) table, so memory is
  * bounded by the column's DISTINCT count — strictly below DuckDB's
  * all-values quantile buffer — and it partial-aggregates map-side
  * (count maps union).
  */
case class GraftMad(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[Double, Long]]
    with UnaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "mad"

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[Double, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(buf: scala.collection.mutable.HashMap[Double, Long],
                      input: InternalRow): scala.collection.mutable.HashMap[Double, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      buf.update(d, buf.getOrElse(d, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.HashMap[Double, Long],
                     other: scala.collection.mutable.HashMap[Double, Long]): scala.collection.mutable.HashMap[Double, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    buf
  }

  /** Interpolated median over a sorted weighted value table: the mean
    * of the two middle order statistics for even n, the middle one for
    * odd — identical to DuckDB's `median` on numerics.
    */
  private def weightedMedian(sorted: Array[(Double, Long)], n: Long): Double = {
    def kth(k: Long): Double = {
      var acc = 0L
      var i = 0
      while (i < sorted.length) {
        acc += sorted(i)._2
        if (acc > k) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
    if (n % 2 == 1) kth(n / 2)
    else (kth(n / 2 - 1) + kth(n / 2)) / 2.0
  }

  override def eval(buf: scala.collection.mutable.HashMap[Double, Long]): Any = {
    if (buf.isEmpty) return null
    val n = buf.valuesIterator.sum
    val sorted = buf.toArray.sortBy(_._1)
    val med = weightedMedian(sorted, n)
    val devs = scala.collection.mutable.HashMap.empty[Double, Long]
    sorted.foreach { case (v, c) =>
      val d = math.abs(v - med)
      devs.update(d, devs.getOrElse(d, 0L) + c)
    }
    weightedMedian(devs.toArray.sortBy(_._1), n)
  }

  override def serialize(buf: scala.collection.mutable.HashMap[Double, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeDouble(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[Double, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[Double, Long]
    var i = 0
    while (i < n) {
      buf.update(in.readDouble(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftMad =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftMad =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GraftMad =
    copy(child = newChild)
}
