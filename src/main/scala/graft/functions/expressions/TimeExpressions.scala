package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static kernels for DuckDB's `time_bucket` (probed duckdb 1.0.0):
  * fixed-width buckets anchored at ORIGIN 2000-01-03 00:00:00 (a
  * Monday — aligns week buckets to ISO weeks; probed: the 7-hour
  * bucket of the origin is itself, pre-origin timestamps floor into
  * negative buckets exactly), month-width buckets anchored at 2000-01
  * (probed: 2-month bucket of 2024-02-15 is 2024-01-01). DATE inputs
  * bucket their midnight and return the bucket start's DATE.
  * Timestamps are treated as NAIVE (micros since epoch), matching
  * DuckDB's TIMESTAMP; the harness runs session tz UTC.
  */
object TimeBucketKernel {
  final val OriginUs: Long = 946857600000000L // 2000-01-03T00:00:00Z
  final val DayUs: Long = 86400000000L

  def bucketMicros(us: Long, w: Long): Long =
    Math.floorDiv(us - OriginUs, w) * w + OriginUs

  def bucketDays(days: Int, w: Long): Int =
    Math.toIntExact(Math.floorDiv(bucketMicros(days * DayUs, w), DayUs))

  /** months since 2000-01 → bucketed month start as (year, month0). */
  private def bucketMonth(totalMonths: Long, wm: Int): Long =
    Math.floorDiv(totalMonths, wm) * wm

  def bucketMonthsTs(us: Long, wm: Int): Long = {
    val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(us, DayUs))
    val m = bucketMonth((d.getYear - 2000L) * 12 + (d.getMonthValue - 1), wm)
    val b = java.time.LocalDate.of((2000 + Math.floorDiv(m, 12)).toInt,
      (Math.floorMod(m, 12) + 1).toInt, 1)
    b.toEpochDay * DayUs
  }

  def bucketMonthsDays(days: Int, wm: Int): Int =
    Math.toIntExact(bucketMonthsTs(days * DayUs, wm) / DayUs)
}

/** DuckDB `time_bucket(width_interval, ts_or_date)` — the log/event
  * pipeline's histogram primitive. `width` must be a FOLDABLE interval
  * (day-time → fixed micro width; year-month → month arithmetic);
  * non-literal widths or the 3-arg origin/offset forms keep a guided
  * error. Codegen'd via the static [[TimeBucketKernel]].
  */
case class TimeBucket(width: Expression, child: Expression)
    extends BinaryExpression {
  override def left: Expression = width
  override def right: Expression = child
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "time_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def fail(msg: String) =
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(msg)
    if (!width.foldable)
      fail("time_bucket's width must be an interval LITERAL")
    else if (!width.dataType.isInstanceOf[DayTimeIntervalType] &&
      !width.dataType.isInstanceOf[YearMonthIntervalType])
      fail(s"time_bucket's width must be an interval, got ${width.dataType}")
    else child.dataType match {
      case TimestampType | DateType | TimestampNTZType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => fail(s"time_bucket needs a timestamp or date, got $t")
    }
  }

  private lazy val isMonths = width.dataType.isInstanceOf[YearMonthIntervalType]
  private lazy val widthVal: Long = width.eval(null) match {
    case l: Long => l // DayTimeIntervalType: micros
    case i: Int => i.toLong // YearMonthIntervalType: months
    case other => throw new IllegalArgumentException(
      s"time_bucket: unsupported width value $other")
  }
  private lazy val isDate = child.dataType == DateType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    if (isMonths) {
      if (isDate) TimeBucketKernel.bucketMonthsDays(v.asInstanceOf[Int], widthVal.toInt)
      else TimeBucketKernel.bucketMonthsTs(v.asInstanceOf[Long], widthVal.toInt)
    } else {
      if (isDate) TimeBucketKernel.bucketDays(v.asInstanceOf[Int], widthVal)
      else TimeBucketKernel.bucketMicros(v.asInstanceOf[Long], widthVal)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = "graft.functions.expressions.TimeBucketKernel"
    // the width is a foldable literal captured as a codegen constant;
    // defineCodeGen's first argument (the evaluated width) is unused
    defineCodeGen(ctx, ev, (_, c) =>
      if (isMonths && isDate) s"$k.bucketMonthsDays($c, (int) ${widthVal}L)"
      else if (isMonths) s"$k.bucketMonthsTs($c, (int) ${widthVal}L)"
      else if (isDate) s"$k.bucketDays($c, ${widthVal}L)"
      else s"$k.bucketMicros($c, ${widthVal}L)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TimeBucket =
    copy(width = l, child = r)
}

/** Static kernels for DuckDB's small math functions. */
object MathKernel {
  def gcd(a: Long, b: Long): Long = {
    var x = Math.abs(a); var y = Math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L else Math.abs(a / gcd(a, b) * b)
  /** Round AWAY from zero to the next even number (probed: even(2.5) =
    * 4, even(-2.5) = -4, even(2) = 2, even(3) = 4).
    */
  def even(x: Double): Double =
    math.signum(x) * 2.0 * math.ceil(math.abs(x) / 2.0)
}

case class GcdExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "greatest_common_divisor"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType == LongType || e.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs integers, got (${left.dataType}, ${right.dataType})")
  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MathKernel.gcd(asLong(a), asLong(b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.MathKernel.gcd((long) $a, (long) $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GcdExpr =
    copy(left = l, right = r)
}

case class LcmExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "least_common_multiple"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType == LongType || e.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs integers, got (${left.dataType}, ${right.dataType})")
  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MathKernel.lcm(asLong(a), asLong(b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.MathKernel.lcm((long) $a, (long) $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LcmExpr =
    copy(left = l, right = r)
}

case class EvenExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "even"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"even needs a number, got $t")
    }
  override protected def nullSafeEval(a: Any): Any =
    MathKernel.even(a match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
    })
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.MathKernel.even((double) $a)")
  override protected def withNewChildInternal(newChild: Expression): EvenExpr =
    copy(child = newChild)
}
