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

  /** Calendar month add on naive micros: the DATE part shifts with
    * day-of-month clamping (LocalDate.plusMonths — DuckDB's interval
    * arithmetic), time-of-day rides along unchanged.
    */
  def addMonthsUs(us: Long, months: Long): Long = {
    if (months == 0) return us
    val days = Math.floorDiv(us, DayUs)
    val rem = us - days * DayUs
    java.time.LocalDate.ofEpochDay(days).plusMonths(months).toEpochDay * DayUs + rem
  }

  /** 3-arg OFFSET form (probed duckdb 1.0.0): shift-bucket-unshift —
    * `time_bucket(w, ts, off) = time_bucket(w, ts - off) + off`, with
    * interval subtraction applying months (clamped) then micros and the
    * unshift inverting in the opposite order.
    */
  def bucketOffsetUs(us: Long, isMonths: Boolean, w: Long,
                     offMonths: Long, offUs: Long): Long = {
    val shifted = addMonthsUs(us, -offMonths) - offUs
    val b = if (isMonths) bucketMonthsTs(shifted, w.toInt) else bucketMicros(shifted, w)
    addMonthsUs(b, offMonths) + offUs
  }

  private def monthIdx(us: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(us, DayUs))
    (d.getYear - 2000L) * 12 + (d.getMonthValue - 1)
  }

  private def monthStartUs(m: Long): Long =
    java.time.LocalDate.of((2000 + Math.floorDiv(m, 12)).toInt,
      (Math.floorMod(m, 12) + 1).toInt, 1).toEpochDay * DayUs

  /** 3-arg ORIGIN form (probed duckdb 1.0.0): fixed widths floor in
    * pure micros from the origin (the origin's time-of-day survives in
    * every bucket); month widths use month-INDEX arithmetic from the
    * origin's month — its day and time are DISCARDED and buckets start
    * on day 1 (probed: origin 2000-06-15 07:30 buckets 2024-03-08 to
    * 2024-03-01 00:00).
    */
  def bucketOriginUs(us: Long, originUs: Long, isMonths: Boolean, w: Long): Long =
    if (!isMonths) Math.floorDiv(us - originUs, w) * w + originUs
    else {
      val mo = monthIdx(originUs)
      monthStartUs(Math.floorDiv(monthIdx(us) - mo, w) * w + mo)
    }
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

/** DuckDB `time_bucket(width, ts, offset_interval)` (r14): buckets
  * shifted by a FOLDABLE interval offset — shift-bucket-unshift via
  * [[TimeBucketKernel.bucketOffsetUs]]. Result keeps the input's type
  * (DATE in → DATE out, truncating like DuckDB's cast — probed:
  * time_bucket('1 day', DATE '2024-03-08', '3 hours') = 2024-03-07).
  */
case class TimeBucketOffset(width: Expression, child: Expression, offset: Expression)
    extends TernaryExpression {
  override def first: Expression = width
  override def second: Expression = child
  override def third: Expression = offset
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
    else if (!offset.foldable)
      fail("time_bucket's offset must be an interval LITERAL")
    else child.dataType match {
      case TimestampType | DateType | TimestampNTZType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => fail(s"time_bucket needs a timestamp or date, got $t")
    }
  }

  private lazy val isMonths = width.dataType.isInstanceOf[YearMonthIntervalType]
  private lazy val widthVal: Long = width.eval(null) match {
    case l: Long => l
    case i: Int => i.toLong
    case other => throw new IllegalArgumentException(
      s"time_bucket: unsupported width value $other")
  }
  private lazy val offParts: (Long, Long) = offset.eval(null) match {
    case i: Int => (i.toLong, 0L) // YearMonthIntervalType: months
    case l: Long => (0L, l) // DayTimeIntervalType: micros
    case c: org.apache.spark.unsafe.types.CalendarInterval =>
      (c.months.toLong, c.days * TimeBucketKernel.DayUs + c.microseconds)
    case other => throw new IllegalArgumentException(
      s"time_bucket: unsupported offset value $other")
  }
  private def offMonths: Long = offParts._1
  private def offUs: Long = offParts._2
  private lazy val isDate = child.dataType == DateType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val us = if (isDate) v.asInstanceOf[Int] * TimeBucketKernel.DayUs
             else v.asInstanceOf[Long]
    val res = TimeBucketKernel.bucketOffsetUs(us, isMonths, widthVal, offMonths, offUs)
    if (isDate) Math.toIntExact(Math.floorDiv(res, TimeBucketKernel.DayUs)) else res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = "graft.functions.expressions.TimeBucketKernel"
    val day = s"${TimeBucketKernel.DayUs}L"
    defineCodeGen(ctx, ev, (_, c, _) => {
      val in = if (isDate) s"((long) $c) * $day" else s"(long) $c"
      val res = s"$k.bucketOffsetUs($in, $isMonths, ${widthVal}L, ${offMonths}L, ${offUs}L)"
      if (isDate) s"(int) java.lang.Math.floorDiv($res, $day)" else res
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): TimeBucketOffset =
    copy(width = f, child = s, offset = t)
}

/** DuckDB `time_bucket(width, ts, origin)` (r14): buckets anchored at a
  * per-row timestamp/date origin — [[TimeBucketKernel.bucketOriginUs]].
  * Result type: DATE only when BOTH input and origin are dates (probed:
  * a timestamp origin promotes a DATE input to TIMESTAMP).
  */
case class TimeBucketOrigin(width: Expression, child: Expression, anchor: Expression)
    extends TernaryExpression {
  override def first: Expression = width
  override def second: Expression = child
  override def third: Expression = anchor
  override def dataType: DataType =
    if (child.dataType == DateType && anchor.dataType == DateType) DateType
    else if (child.dataType == TimestampType || anchor.dataType == TimestampType) TimestampType
    else TimestampNTZType
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
    else (child.dataType, anchor.dataType) match {
      case (TimestampType | DateType | TimestampNTZType,
            TimestampType | DateType | TimestampNTZType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (c, o) => fail(s"time_bucket's 3rd argument must be an interval " +
        s"LITERAL offset or a timestamp/date origin, got ($c, $o)")
    }
  }

  private lazy val isMonths = width.dataType.isInstanceOf[YearMonthIntervalType]
  private lazy val widthVal: Long = width.eval(null) match {
    case l: Long => l
    case i: Int => i.toLong
    case other => throw new IllegalArgumentException(
      s"time_bucket: unsupported width value $other")
  }
  private lazy val childIsDate = child.dataType == DateType
  private lazy val originIsDate = anchor.dataType == DateType

  override protected def nullSafeEval(w: Any, c: Any, o: Any): Any = {
    val us = if (childIsDate) c.asInstanceOf[Int] * TimeBucketKernel.DayUs
             else c.asInstanceOf[Long]
    val ous = if (originIsDate) o.asInstanceOf[Int] * TimeBucketKernel.DayUs
              else o.asInstanceOf[Long]
    val res = TimeBucketKernel.bucketOriginUs(us, ous, isMonths, widthVal)
    if (dataType == DateType) Math.toIntExact(Math.floorDiv(res, TimeBucketKernel.DayUs))
    else res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = "graft.functions.expressions.TimeBucketKernel"
    val day = s"${TimeBucketKernel.DayUs}L"
    defineCodeGen(ctx, ev, (_, c, o) => {
      val in = if (childIsDate) s"((long) $c) * $day" else s"(long) $c"
      val oin = if (originIsDate) s"((long) $o) * $day" else s"(long) $o"
      val res = s"$k.bucketOriginUs($in, $oin, $isMonths, ${widthVal}L)"
      if (dataType == DateType) s"(int) java.lang.Math.floorDiv($res, $day)" else res
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): TimeBucketOrigin =
    copy(width = f, child = s, anchor = t)
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

  // Lanczos approximation (g = 7, 9 terms — the standard public
  // coefficients; ~15 significant digits, within a few ulp of libm's
  // tgamma/lgamma). DuckDB's gamma/lgamma are libm, so oracle gates
  // compare through round(·, 6) rather than bitwise.
  private val LanczosCoef = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  private def lanczosSum(z: Double): Double = {
    var a = LanczosCoef(0)
    var i = 1
    while (i < LanczosCoef.length) { a += LanczosCoef(i) / (z + i); i += 1 }
    a
  }

  private def gammaPole(x: Double, what: String): Unit =
    if (x == 0.0 || (x < 0 && x == math.floor(x)))
      throw new ArithmeticException(
        s"cannot take $what of zero or a negative integer (got $x)")

  /** Γ(x) — DuckDB `gamma` (libm tgamma; errors on poles, probed). */
  def gammaFn(x: Double): Double = {
    gammaPole(x, "gamma")
    if (x < 0.5) math.Pi / (math.sin(math.Pi * x) * gammaFn(1 - x))
    else {
      val z = x - 1
      val t = z + 7.5
      math.sqrt(2 * math.Pi) * math.pow(t, z + 0.5) * math.exp(-t) * lanczosSum(z)
    }
  }

  /** log|Γ(x)| — DuckDB `lgamma` (libm; log-abs on the negative axis,
    * probed: lgamma(-0.5) = 1.2655…).
    */
  def lgammaFn(x: Double): Double = {
    gammaPole(x, "log gamma")
    if (x < 0.5)
      math.log(math.Pi / math.abs(math.sin(math.Pi * x))) - lgammaFn(1 - x)
    else {
      val z = x - 1
      val t = z + 7.5
      0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t +
        math.log(lanczosSum(z))
    }
  }
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

case class GammaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gamma"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gamma needs a number, got $t")
    }
  override protected def nullSafeEval(a: Any): Any =
    MathKernel.gammaFn(a.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.MathKernel.gammaFn($a)")
  override protected def withNewChildInternal(newChild: Expression): GammaExpr =
    copy(child = newChild)
}

case class LGammaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lgamma"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lgamma needs a number, got $t")
    }
  override protected def nullSafeEval(a: Any): Any =
    MathKernel.lgammaFn(a.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.MathKernel.lgammaFn($a)")
  override protected def withNewChildInternal(newChild: Expression): LGammaExpr =
    copy(child = newChild)
}

/** DuckDB `nextafter(a, b)` — IEEE-754 nextafter, bit-identical to
  * libm's (java.lang.Math.nextAfter implements the same standard).
  */
case class NextAfterExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nextafter"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nextafter needs doubles, got (${left.dataType}, ${right.dataType})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.nextAfter($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NextAfterExpr =
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
    defineCodeGen(ctx, ev, a => child.dataType match {
      // Decimal carries no implicit double conversion in generated Java
      // — a bare (double) cast was a janino CompileException and the
      // whole projection fell back to interpreter mode (found via q160:
      // `(count(*) % 7) + 0.5` types DECIMAL(21,1))
      case _: DecimalType =>
        s"graft.functions.expressions.MathKernel.even($a.toDouble())"
      case _ => s"graft.functions.expressions.MathKernel.even((double) $a)"
    })
  override protected def withNewChildInternal(newChild: Expression): EvenExpr =
    copy(child = newChild)
}
