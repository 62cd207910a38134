package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Raised when a user `sql` stage uses a DuckDB construct graft cannot
  * rewrite — the message names the construct and its nearest Spark
  * equivalent (the PythonMigrate error pattern, reference O12:
  * filefilter.py:340-342 hands user SQL to DuckDB verbatim, so a
  * migrating user's config may carry any DuckDB-ism).
  */
final class DuckDialectException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** DuckDB `len()` is polymorphic (strings AND lists); Spark's builtin
  * `len` aliases `length` (strings/binary only). This expression
  * dispatches on the resolved child type so `len(arr)` works like
  * DuckDB's: arrays/maps → element count, else character/byte length.
  * Codegen'd both ways (dispatch happens at plan time, not per row).
  */
case class DuckLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private lazy val isContainer: Boolean = child.dataType match {
    case _: ArrayType | _: MapType => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType | _: MapType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"len needs string, binary, array or map, got $t")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case _: ArrayType => v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements()
    case _: MapType => v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData].numElements()
    case StringType => v.asInstanceOf[UTF8String].numChars()
    case BinaryType => v.asInstanceOf[Array[Byte]].length
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case _: ArrayType | _: MapType => s"${ev.value} = $c.numElements();"
      case StringType => s"${ev.value} = $c.numChars();"
      case BinaryType => s"${ev.value} = $c.length;"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DuckDB `//` division semantics (backs [[graft.operators
  * .GraftSqlParser.rewriteIntDiv]]), probed on duckdb 1.0.0: when BOTH
  * inputs are integral, integer division truncating toward zero
  * (`7 // 2` = 3, `-7 // 2` = −3, result BIGINT); when either side is
  * fractional (double/float/decimal), plain DOUBLE division
  * (`7.5 // 2` = 3.75 — DuckDB does NOT floor there). Type dispatch
  * happens at plan time ([[DuckLen]] pattern); divide-by-zero yields
  * NULL — probed: DuckDB's `7 // 0` is NULL too, so the paths agree.
  *
  */
case class DuckDiv(left: Expression, right: Expression) extends BinaryExpression {
  private lazy val integral: Boolean = Seq(left.dataType, right.dataType).forall {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  /** DuckDB keeps the operands' COMMON integer type (probed 1.0.0:
    * `typeof(-30 // 13)` = INTEGER, TINYINT//SMALLINT = SMALLINT,
    * INT//BIGINT = BIGINT) — the width feeds printf's unsigned
    * conversions, where an INT32 argument renders 'fffffffe' but a
    * BIGINT renders 'fffffffffffffffe' (r18, fuzz template 65).
    * MIN // -1 overflow: DuckDB raises, this wraps (JVM semantics) —
    * a loud-vs-wrap edge, never a silent value divergence on queries
    * both engines execute.
    */
  override def dataType: DataType = if (integral) {
    def rank(t: DataType): Int = t match {
      case ByteType => 0
      case ShortType => 1
      case IntegerType => 2
      case _ => 3
    }
    if (rank(left.dataType) >= rank(right.dataType)) left.dataType
    else right.dataType
  } else DoubleType
  override def nullable: Boolean = true

  private def narrow(v: Long): Any = dataType match {
    case ByteType => v.toByte
    case ShortType => v.toShort
    case IntegerType => v.toInt
    case _ => v
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left.dataType, right.dataType).forall(_.isInstanceOf[NumericType]))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_ddiv needs numeric inputs, got ${left.dataType} and ${right.dataType}")

  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case n: Number => n.doubleValue()
  }
  private def toL(v: Any): Long = v.asInstanceOf[Number].longValue()

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    if (integral) {
      val rl = toL(r)
      if (rl == 0L) null else narrow(toL(l) / rl)
    } else {
      val rd = toD(r)
      // DuckDB probe: 7.5 // 0 (and 7.5::DOUBLE // 0) is NULL, same as
      // the integral path — never Infinity/NaN (ADVICE r10).
      if (rd == 0.0d) null else toD(l) / rd
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val jt = CodeGenerator.javaType(dataType)
    def cast(src: Expression, v: String): String = src.dataType match {
      case _: DecimalType => s"$v.toDouble()"
      case _ if integral => s"(long)($v)"
      case _ => s"(double)($v)"
    }
    val rTmp = ctx.freshName("ddivR")
    val divExpr =
      if (integral)
        s"long $rTmp = ${cast(right, rg.value)}; " +
          s"if ($rTmp == 0L) { ${ev.isNull} = true; } " +
          s"else { ${ev.value} = ($jt)(${cast(left, lg.value)} / $rTmp); }"
      else
        s"double $rTmp = ${cast(right, rg.value)}; " +
          s"if ($rTmp == 0.0d) { ${ev.isNull} = true; } " +
          s"else { ${ev.value} = ${cast(left, lg.value)} / $rTmp; }"
    ev.copy(code = lg.code + rg.code + code"""
      boolean ${ev.isNull} = true;
      $jt ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${lg.isNull} && !${rg.isNull}) {
        ${ev.isNull} = false;
        $divExpr
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** DuckDB slice semantics for lists AND strings — 1-based INCLUSIVE
  * `[begin, end]`, begin clamped up to 1 (0 and over-negative indices
  * included), end clamped down to the length, negative index i counting
  * from the back as len+i+1, begin > end → empty (all verified against
  * duckdb 1.0.0). Backs both the `l[begin:end]` bracket rewrite
  * ([[graft.operators.GraftSqlParser.rewriteSlice]], `nullBoundIsOpen =
  * true`: a missing bound means 1 / len) and the `list_slice` /
  * `array_slice` function aliases (`nullBoundIsOpen = false`: a NULL
  * bound nulls the result, exactly as DuckDB's function form does).
  * Dispatch on the child type happens at plan time, like [[DuckLen]];
  * codegen calls one static helper per row.
  */
case class DuckSlice(child: Expression, beginE: Expression, endE: Expression,
                     nullBoundIsOpen: Boolean) extends Expression {
  override def children: Seq[Expression] = Seq(child, beginE, endE)
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  private def intish(t: DataType): Boolean = t match {
    case IntegerType | LongType | ShortType | ByteType | NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType | StringType =>
        if (intish(beginE.dataType) && intish(endE.dataType))
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"slice bounds must be integers, got ${beginE.dataType} / ${endE.dataType}")
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"slicing needs a list or string, got $t")
    }

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val bv = beginE.eval(input)
    val ev = endE.eval(input)
    if (!nullBoundIsOpen && (bv == null || ev == null)) return null
    child.dataType match {
      case _: ArrayType =>
        DuckSlice.sliceArray(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
          elemType, bv, ev)
      case _ =>
        DuckSlice.sliceString(v.asInstanceOf[UTF8String], bv, ev)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val b = beginE.genCode(ctx)
    val e = endE.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    val etRef = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    // Janino has no boxing conversion on casts — `(Object) intExpr`
    // fails to compile ("binary numeric promotion not possible"), which
    // silently dropped every bracket-slice projection to the
    // interpreted fallback. Box through the wrapper's valueOf instead.
    def box(bound: Expression,
            code: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): String =
      bound.dataType match {
        case NullType => "null"
        case dt =>
          val bt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(dt)
          s"(${code.isNull} ? null : (Object) $bt.valueOf(${code.value}))"
      }
    val bBox = box(beginE, b)
    val eBox = box(endE, e)
    val nullBound =
      if (nullBoundIsOpen) "false" else s"(${b.isNull} || ${e.isNull})"
    val call = child.dataType match {
      case _: ArrayType =>
        s"graft.functions.expressions.DuckSlice.sliceArray(${c.value}, $etRef, $bBox, $eBox)"
      case _ =>
        s"graft.functions.expressions.DuckSlice.sliceString(${c.value}, $bBox, $eBox)"
    }
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = c.code + b.code + e.code + code"""
      boolean ${ev.isNull} = ${c.isNull} || $nullBound;
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = ($javaType) $call;
      }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), beginE = cs(1), endE = cs(2))
}

object DuckSlice {
  /** (begin, end) resolved to 1-based inclusive positions; null bound =
    * open. Over-range begin clamps to 1, end to len; a back-counted end
    * before the start yields begin > end → caller emits empty.
    */
  private def bounds(len: Int, bv: Any, ev: Any): (Int, Int) = {
    val b0 = if (bv == null) 1 else bv.asInstanceOf[Number].intValue()
    val e0 = if (ev == null) len else ev.asInstanceOf[Number].intValue()
    val b = if (b0 < 0) math.max(1, len + b0 + 1) else math.max(1, b0)
    val e = if (e0 < 0) len + e0 + 1 else math.min(len, e0)
    (b, e)
  }

  def sliceArray(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                 et: DataType, bv: Any, ev: Any): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (b, e) = bounds(arr.numElements(), bv, ev)
    if (b > e) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](e - b + 1)
      var i = 0
      while (i < out.length) { out(i) = arr.get(b - 1 + i, et); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  def sliceString(s: UTF8String, bv: Any, ev: Any): UTF8String = {
    val (b, e) = bounds(s.numChars(), bv, ev)
    if (b > e) UTF8String.EMPTY_UTF8
    else s.substringSQL(b, e - b + 1)
  }
}

/** DuckDB scalar subscript `base[i]` semantics (probed duckdb 1.0.0) —
  * Spark's native subscript is 0-based on arrays, the classic silent
  * off-by-one for migrating SQL. Backs `graft_bracket_get` (wired by
  * [[graft.operators.GraftSqlParser.rewriteSubscript]]):
  *  - list: 1-based; negative counts from the end (`[-1]` last);
  *    `[0]` and out-of-range → NULL
  *  - map: LIST-shaped result — `[v]` on a hit, `[]` on a miss (DuckDB
  *    1.0's map extract; same shape as the MAP-literal rewrite)
  *  - struct: plain field access
  *  - string: one 1-based character; `[0]`/out-of-range → '' (DuckSlice
  *    with both bounds = the index)
  * RuntimeReplaceable: the replacement composes existing codegen'd
  * expressions once the base's type is resolved.
  */
/** DuckDB's `map(keys_list, values_list)` two-list constructor vs
  * Spark's variadic `map(k1, v1, ...)` pairs form — same name, silently
  * different semantics (found by FuzzDiff r16: the two-list form built
  * a one-entry map of array→array and the subsequent subscript died as
  * an unresolvable cast). Only the ambiguous TWO-ARG call needs the
  * post-analysis dispatch (both array-typed → DuckDB's constructor →
  * MapFromArrays; else one Spark pair — a single entry needs no
  * cross-entry coercion, so the replacement always resolves). Calls of
  * any other arity return a RAW CreateMap from the builder — a
  * RuntimeReplaceable's replacement skips the analyzer's implicit
  * casts, which a multi-entry pairs call (`map('a', 1, 'b', id)`)
  * relies on to unify value types.
  */
case class DuckMapConstructor(children: Seq[Expression])
    extends RuntimeReplaceable {
  override lazy val replacement: Expression = children match {
    case Seq(k, v) if k.dataType.isInstanceOf[ArrayType] &&
      v.dataType.isInstanceOf[ArrayType] => MapFromArrays(k, v)
    case es => CreateMap(es)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** DuckDB rounds EVERY fractional→integral cast HALF AWAY FROM ZERO
  * (probed 1.0.0: CAST(2.5 AS BIGINT) = 3, CAST(-2.5 AS BIGINT) = -3,
  * CAST(22287.9999 AS BIGINT) = 22288, DECIMAL sources round too)
  * where Spark's cast truncates toward zero — a silent off-by-one on
  * any fractional value in passthrough SQL (found by FuzzDiff r17
  * template 57). [[graft.operators.GraftSqlParser]]'s integral-cast
  * rewrite wraps every CAST/TRY_CAST source whose target is an
  * integral type in this expression: IDENTITY on everything except
  * Double/Float/Decimal, which round at scale 0 first (Spark's Round
  * is HALF_UP = half away from zero on both signs, matching DuckDB).
  * STRING sources stay on Spark's native cast — DuckDB rounds
  * fractional strings ('12.7' → 13) but routing strings through
  * DOUBLE would corrupt 19-digit integer strings, the worse trade
  * (documented divergence, COVERAGE.md).
  */
case class DuckIntRound(child: Expression) extends RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(child)
  override lazy val replacement: Expression = child.dataType match {
    case DoubleType | FloatType | _: DecimalType => Round(child, Literal(0))
    case _ => child
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

case class DuckBracketGet(base: Expression, key: Expression)
    extends RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(base, key)
  override lazy val replacement: Expression = base.dataType match {
    case ArrayType(et, _) =>
      if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType, NullType)
        .contains(key.dataType))
        throw new DuckDialectException(
          s"list subscript must be an integer, got ${key.dataType} " +
            "(DuckDB rejects fractional subscripts too)")
      val idx = Cast(key, IntegerType)
      If(Or(EqualTo(idx, Literal(0)), GreaterThan(Abs(idx), Size(base))),
        Literal.create(null, et), ElementAt(base, idx))
    case MapType(kt, vt, _) =>
      val k = Cast(key, kt)
      If(ArrayContains(MapKeys(base), k),
        CreateArray(Seq(ElementAt(base, k))),
        Literal.create(Seq.empty[Any], ArrayType(vt, containsNull = true)))
    case _: StructType =>
      ExtractValue(base, key,
        org.apache.spark.sql.catalyst.analysis.caseInsensitiveResolution)
    case StringType => DuckSlice(base, key, key, nullBoundIsOpen = true)
    case other => throw new DuckDialectException(
      s"[] subscript on $other isn't supported (lists, maps, structs, strings)")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(base = newChildren(0), key = newChildren(1))
}

/** DuckDB list_sort with its FULL order surface (probed duckdb 1.0.0):
  * the DEFAULT is ASC **NULLS LAST** — Spark's sort_array(asc) puts
  * nulls FIRST, a silent divergence on null-bearing arrays — plus
  * 'ASC'/'DESC' and 'NULLS FIRST'/'NULLS LAST' modifier args. One
  * generic interpreted sort on the element ordering (reference-object
  * codegen: one static call per row, no per-element virtual dispatch
  * beyond the ordering itself — these are list utilities, not scan
  * hot paths).
  */
case class GraftListSort(child: Expression, asc: Boolean, nullsFirst: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(et, _)
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(et) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"list_sort needs an array of orderable elements, got $other")
    }
  @transient private lazy val elementType =
    child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val ordering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(elementType)

  override def nullSafeEval(v: Any): Any =
    GraftListSort.compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      elementType, ordering, asc, nullsFirst)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val etRef = ctx.addReferenceObj("et", elementType)
    val ordRef = ctx.addReferenceObj("ord", ordering)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.GraftListSort.compute($c, $etRef, " +
        s"(scala.math.Ordering) $ordRef, $asc, $nullsFirst);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** DuckDB `list_grade_up(l)`: the 1-BASED indices that would sort the
  * list ascending — with NULL elements graded FIRST (probed duckdb
  * 1.0.0: [30,NULL,20] → [2,3,1]), unlike list_sort's nulls-last
  * default. Stable on ties (original order).
  */
case class GraftGradeUp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(et, _)
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(et) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"list_grade_up needs an array of orderable elements, got $other")
    }
  @transient private lazy val elementType =
    child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val ordering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(elementType)

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val idx = (0 until n).toArray
    val vals = idx.map(i => if (arr.isNullAt(i)) null else arr.get(i, elementType))
    val sorted = idx.sortBy(identity)(Ordering.fromLessThan { (a, b) =>
      val (x, y) = (vals(a), vals(b))
      if (x == null && y == null) a < b
      else if (x == null) true
      else if (y == null) false
      else { val c = ordering.compare(x, y); if (c != 0) c < 0 else a < b }
    })
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sorted.map(_ + 1))
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gradeUp", this,
      "graft.functions.expressions.GraftGradeUp")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object GraftListSort {
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData, et: DataType,
      ord: Ordering[Any], asc: Boolean, nullsFirst: Boolean):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val vals = new java.util.ArrayList[Any](n)
    var nulls = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1
      else vals.add(arr.get(i, et))
      i += 1
    }
    val sorted: Array[AnyRef] = vals.toArray
    val cmp = (if (asc) ord else ord.reverse).asInstanceOf[java.util.Comparator[AnyRef]]
    java.util.Arrays.sort(sorted, cmp)
    val out = new Array[Any](n)
    val off = if (nullsFirst) nulls else 0
    System.arraycopy(sorted, 0, out, off, sorted.length)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** DuckDB-dialect compatibility for user `sql` stages (VERDICT r4 #1).
  *
  * Three layers, in order of preference:
  *  1. [[aliases]] — DuckDB function names Spark lacks, built directly as
  *     Catalyst expressions (codegen'd, work in subqueries/CTEs, no
  *     string munging). Registered by [[GraftFunctions.register]] and
  *     [[GraftExtensions]].
  *  2. parser rewrites ([[graft.operators.GraftSqlParser]]):
  *     `* EXCLUDE(...)` → `* EXCEPT(...)`, `QUALIFY <pred>` → a ranked
  *     subquery (wrap for alias predicates, helper-column injection for
  *     inline windows), `struct_pack(a := x)` → `named_struct('a', x)`,
  *     and `USING SAMPLE n%/n ROWS` → a TABLESAMPLE over the block,
  *     with `reservoir(n ROWS)` as a deterministic-hash top-n (r15) and
  *     `reservoir(n%)` resolved by one base-relation count at SqlStage
  *     level (r16); exact-n samples under a WHERE attach to the base
  *     relation (DuckDB 1.0.0 draws BEFORE the filter, probed), and
  *     sampled aggregation/DISTINCT blocks without a WHERE refuse
  *     loudly naming the FROM-subquery form.
  *  3. [[fnHints]]/[[constructHints]] — DuckDB-isms with no faithful
  *     Spark rewrite raise [[DuckDialectException]] naming the construct
  *     and the nearest Spark equivalent instead of a raw Catalyst error.
  *
  * The alias set is the function-pair mapping the repo's own oracle
  * corpus proves out (every `oracleSql` entry is the DuckDB spelling of
  * a Spark query — see Verify.scala).
  */
object DuckDialect {

  private def lit(s: String): Literal = Literal(UTF8String.fromString(s), StringType)

  /** Regex-quote a separator expression: literal separators are quoted
    * at build time, dynamic ones via \Q...\E wrapping (DuckDB's
    * string_split takes a LITERAL separator; Spark's split takes a
    * regex).
    */
  private def quotedSep(sep: Expression): Expression = sep match {
    case Literal(s: UTF8String, StringType) if s != null =>
      lit(java.util.regex.Pattern.quote(s.toString))
    case e => Concat(Seq(lit("\\Q"), e, lit("\\E")))
  }

  private def nArgs(name: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n)
      throw new DuckDialectException(
        s"$name expects $n argument(s), got ${es.length}")

  /** epoch_ms/epoch_us are type-overloaded (numeric → construct a
    * timestamp, temporal → extract the count). Spark's analyzer invokes
    * function builders only once the argument is resolved, so the type
    * is normally known here — but if a caller ever hands us an
    * unresolved argument, refuse loudly instead of silently picking the
    * extraction arm (which would misread a ms-count column as seconds).
    */
  private def epochOverload(name: String, arg: Expression,
      numeric: => Expression, temporal: => Expression): Expression = {
    if (!arg.resolved)
      throw new DuckDialectException(
        s"$name: argument type cannot be determined before resolution; " +
        s"CAST the argument explicitly (numeric → builds a timestamp, " +
        s"timestamp/date → extracts the epoch count)")
    if (arg.dataType.isInstanceOf[NumericType]) numeric else temporal
  }

  /** Normalize a DuckDB datepart name (plural and common abbreviated
    * forms) for date_diff/date_sub; unknown parts keep a guided error.
    */
  private def literalUnit(name: String, e: Expression): String = {
    val raw = e match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString.toLowerCase
      case _ => throw new DuckDialectException(
        s"$name needs a LITERAL datepart string as its first argument")
    }
    raw.stripSuffix("s") match {
      case "year" | "yr" | "y" => "year"
      case "quarter" => "quarter"
      case "month" | "mon" => "month"
      case "week" => "week"
      case "day" | "d" => "day"
      case "hour" | "hr" | "h" => "hour"
      case "minute" | "min" => "minute"
      case "second" | "sec" => "second"
      case "millisecond" | "msec" | "ms" => "millisecond"
      case "microsecond" | "usec" | "us" => "microsecond"
      case other => throw new DuckDialectException(
        s"$name: datepart '$other' isn't translated — use year/quarter/month/" +
          "week/day/hour/minute/second/millisecond/microsecond")
    }
  }

  /** DuckDB date_diff(part, a, b): BOUNDARY CROSSINGS between a and b
    * (probed: one month from 01-31 to 02-01, negative when b < a) — the
    * truncate-then-subtract identity per part. Returns BIGINT like
    * DuckDB. week boundaries are Mondays (Spark trunc 'week' agrees).
    */
  private def boundaryDiff(name: String, es: Seq[Expression]): Expression = {
    val a = es(1); val b = es(2)
    def d(e: Expression) = Cast(e, DateType)
    def yearL(e: Expression) = Cast(Year(d(e)), LongType)
    def ymL(e: Expression) = Add(Multiply(yearL(e), Literal(12L)),
      Cast(Subtract(Month(d(e)), Literal(1)), LongType))
    def qL(e: Expression) = Add(Multiply(yearL(e), Literal(4L)),
      Cast(Subtract(Quarter(d(e)), Literal(1)), LongType))
    def floorEpochDiv(e: Expression, unitSecs: Long) =
      Cast(Floor(Divide(Cast(UnixSeconds(Cast(e, TimestampType)), DoubleType),
        Literal(unitSecs.toDouble))), LongType)
    literalUnit(name, es(0)) match {
      case "year" => Subtract(yearL(b), yearL(a))
      case "quarter" => Subtract(qL(b), qL(a))
      case "month" => Subtract(ymL(b), ymL(a))
      case "week" =>
        // Monday-truncated date difference is an exact multiple of 7
        Cast(IntegralDivide(
          Cast(DateDiff(TruncDate(d(b), lit("week")), TruncDate(d(a), lit("week"))), LongType),
          Literal(7L)), LongType)
      case "day" => Cast(DateDiff(d(b), d(a)), LongType)
      case "hour" => Subtract(floorEpochDiv(b, 3600L), floorEpochDiv(a, 3600L))
      case "minute" => Subtract(floorEpochDiv(b, 60L), floorEpochDiv(a, 60L))
      case "second" => Subtract(floorEpochDiv(b, 1L), floorEpochDiv(a, 1L))
      case "millisecond" => Subtract(
        Cast(UnixMillis(Cast(b, TimestampType)), LongType),
        Cast(UnixMillis(Cast(a, TimestampType)), LongType))
      case "microsecond" => Subtract(
        Cast(UnixMicros(Cast(b, TimestampType)), LongType),
        Cast(UnixMicros(Cast(a, TimestampType)), LongType))
    }
  }

  /** DuckDB date_sub(part, a, b): COMPLETE intervals between a and b —
    * exactly Spark's timestampdiff (probed: 0 hours from 00:59 to
    * 01:01).
    */
  private def completeDiff(name: String, es: Seq[Expression]): Expression =
    TimestampDiff(literalUnit(name, es(0)).toUpperCase,
      Cast(es(1), TimestampType), Cast(es(2), TimestampType))

  /** quantile_disc/quantile: ANSI percentile_disc takes a scalar
    * fraction — DuckDB's list-of-fractions form keeps a guided error
    * naming the per-fraction route.
    */
  private def quantileDisc(es: Seq[Expression]): Expression = es(1) match {
    case CreateArray(_, _) => throw new DuckDialectException(
      "quantile_disc/quantile with a LIST of fractions isn't translated — " +
        "call it once per fraction, or use quantile_cont(x, [..]) for the " +
        "interpolated form (Spark's exact Percentile takes fraction arrays)")
    case p => aggregate.PercentileDisc(es(0), p)
  }

  /** DuckDB unicode()/ord(): codepoint of the first character, '' → -1
    * (probed duckdb 1.0.0); Spark's ascii('') is 0, hence the guard.
    */
  private def duckUnicode(s: Expression): Expression =
    If(EqualTo(Length(s), Literal(0)), Literal(-1), Ascii(s))

  /** Scalar-position `range`/`generate_series` → Sequence over BIGINT
    * with DuckDB's emptiness semantics (probed duckdb 1.0.0): a span
    * opposing the step's sign yields [], range is end-EXCLUSIVE
    * (stop = b - sign(step)), generate_series end-INCLUSIVE. Spark's
    * Sequence alone would throw on e.g. sequence(4, 1, 1).
    */
  private def seriesExpr(name: String, es: Seq[Expression],
                         exclusive: Boolean): Expression = {
    if (es.isEmpty || es.length > 3)
      throw new DuckDialectException(s"$name takes 1-3 arguments, got ${es.length}")
    val (a, b, s) =
      if (es.length == 1) (Literal(0L), Cast(es(0), LongType), Literal(1L))
      else (Cast(es(0), LongType), Cast(es(1), LongType),
        if (es.length == 3) Cast(es(2), LongType) else Literal(1L))
    val sign = Signum(Cast(s, DoubleType))
    val span = Multiply(Cast(Subtract(b, a), DoubleType), sign)
    val emptyCond =
      if (exclusive) LessThanOrEqual(span, Literal(0.0))
      else LessThan(span, Literal(0.0))
    val stop = if (exclusive) Subtract(b, Cast(sign, LongType)) else b
    If(emptyCond, Cast(CreateArray(Nil), ArrayType(LongType)),
      new Sequence(a, stop, Some(s)))
  }

  /** [[DuckSweep]] static-method invocation (codegen'd, null-propagating). */
  private def sweepInvoke(dt: DataType, method: String, args: Seq[Expression],
      inputTypes: Seq[DataType]): Expression =
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      DuckSweep.getClass, dt, method, args, inputTypes = inputTypes)

  /** `graft_fmt_spec('<spec>', x)` — the rewrite target for a format()
    * placeholder CARRYING a fmt spec (`{:.2f}`, `{:>8}` …); plain
    * `{}`/`{n}` stay on the concat+CAST path. Dispatch is on the
    * RESOLVED argument type, mirroring DuckDB's fmt dispatch (probed):
    * integrals (and BOOLEAN under an integer type char — '{:d}' of
    * true → '1') format as int; FLOAT/DOUBLE/DECIMAL as float;
    * everything else stringifies first (DuckDB itself feeds dates,
    * hugeint … to fmt as strings — '{:d}' on them names "type
    * string"). The spec is validated HERE with a zero-value dry run so
    * spec/type mismatches ("precision not allowed…", "Invalid type
    * specifier…") surface at analysis, not mid-job; the kernels in
    * [[DuckSweep]] re-raise the same messages at runtime.
    */
  private def fmtSpecBuilder(es: Seq[Expression],
                             allowSignComma: Boolean = false): Expression = {
    nArgs("graft_fmt_spec", es, 2)
    val spec = es.head match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString
      case other => throw new DuckDialectException(
        s"format: internal spec argument must be a string literal, got $other")
    }
    val v = es(1)
    if (!v.resolved)
      throw new DuckDialectException(
        s"format('{:$spec}', …): the argument type cannot be determined " +
          "before resolution; CAST the argument explicitly")
    def guard[A](dryRun: => A): Unit =
      try { dryRun; () } catch {
        case e: IllegalArgumentException =>
          throw new DuckDialectException(s"format('{:$spec}', …): ${e.getMessage}")
      }
    def call(method: String, arg: Expression, argType: DataType): Expression =
      sweepInvoke(StringType, method,
        Seq(Literal(UTF8String.fromString(spec), StringType), arg),
        Seq(StringType, argType))
    val f = try DuckSweep.parseFmtSpec(spec) catch {
      case e: IllegalArgumentException =>
        throw new DuckDialectException(s"format('{:$spec}', …): ${e.getMessage}")
    }
    // the brace grammar keeps sign and ',' mutually exclusive (DuckDB:
    // "missing '}'"); printf allows both ('%+,d' → '+42', probed)
    if (f.comma && f.sign != 0.toChar && !allowSignComma)
      throw new DuckDialectException(
        s"format('{:$spec}', …): a sign cannot combine with the thousands " +
          "separator in a brace format spec (DuckDB rejects it; printf allows it)")
    val intTyp = f.typ != 0.toChar && "dboxX".indexOf(f.typ) >= 0
    v.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        guard(DuckSweep.fmtLong(spec, 0L))
        call("fmtSpecLong", Cast(v, LongType), LongType)
      case BooleanType if intTyp =>
        guard(DuckSweep.fmtLong(spec, 0L))
        call("fmtSpecLong", Cast(v, LongType), LongType)
      case FloatType =>
        guard(DuckSweep.fmtDouble(spec, 0.0))
        call("fmtSpecFloat", v, FloatType)
      case DoubleType | _: DecimalType =>
        guard(DuckSweep.fmtDouble(spec, 0.0))
        call("fmtSpecDouble", Cast(v, DoubleType), DoubleType)
      case StringType =>
        guard(DuckSweep.fmtStr(spec, ""))
        call("fmtSpecString", v, StringType)
      case _ =>
        guard(DuckSweep.fmtStr(spec, ""))
        call("fmtSpecString", Cast(v, StringType), StringType)
    }
  }

  /** Cast every argument to BIGINT when ALL are resolved integral
    * types — the shape under which DuckDB binds its BIGINT overload of
    * least/greatest (r18). Any non-integral (or unresolved) argument
    * leaves the list untouched.
    */
  private def widenIntegralArgs(es: Seq[Expression]): Seq[Expression] =
    if (es.forall(_.resolved) && es.forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })) es.map(e => if (e.dataType == LongType) e else Cast(e, LongType))
    else es

  /** `graft_printf_radix('<spec>', x)` — rewrite target for printf's
    * unsigned conversions (%x/%X/%o/%b/%u): two's-complement at the
    * argument's STORAGE width, 64 bits for BIGINT, 32 otherwise (C
    * default promotion, probed). Non-integral arguments raise DuckDB's
    * own binder message.
    */
  private def printfRadixBuilder(es: Seq[Expression]): Expression = {
    nArgs("graft_printf_radix", es, 2)
    val spec = es.head match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString
      case other => throw new DuckDialectException(
        s"printf: internal spec argument must be a string literal, got $other")
    }
    val v = es(1)
    if (!v.resolved)
      throw new DuckDialectException(
        s"printf('%$spec', …): the argument type cannot be determined " +
          "before resolution; CAST the argument explicitly")
    val typ = spec.last
    val bits = v.dataType match {
      case LongType => 64
      case ByteType | ShortType | IntegerType | BooleanType => 32
      case FloatType | DoubleType | _: DecimalType =>
        throw new DuckDialectException(
          s"""printf: Invalid type specifier "$typ" for formatting a value of type float""")
      case _ =>
        throw new DuckDialectException(
          s"""printf: Invalid type specifier "$typ" for formatting a value of type string""")
    }
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      DuckSweep.getClass, StringType, "printfRadix",
      Seq(Literal(UTF8String.fromString(spec), StringType),
        Cast(v, LongType), Literal(bits)),
      inputTypes = Seq(StringType, LongType, IntegerType))
  }

  /** `graft_printf_int('<spec>', x)` — printf's `%d`/`%i` carrying a
    * PRECISION (C min-digits, which the shared brace-grammar kernel
    * rejects — see [[DuckSweep.printfIntStr]]). Type dispatch mirrors
    * DuckDB's binder (probed: '%.2d' of 1.5 / 'x' raise the same
    * "Invalid type specifier" as the no-precision form; BOOLEAN
    * formats as 0/1 — '%.2d' of true → '01').
    */
  private def printfIntBuilder(es: Seq[Expression]): Expression = {
    nArgs("graft_printf_int", es, 2)
    val spec = es.head match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString
      case other => throw new DuckDialectException(
        s"printf: internal spec argument must be a string literal, got $other")
    }
    val v = es(1)
    if (!v.resolved)
      throw new DuckDialectException(
        s"printf('%$spec', …): the argument type cannot be determined " +
          "before resolution; CAST the argument explicitly")
    v.dataType match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType =>
        sweepInvoke(StringType, "printfInt",
          Seq(Literal(UTF8String.fromString(spec), StringType), Cast(v, LongType)),
          Seq(StringType, LongType))
      case FloatType | DoubleType | _: DecimalType =>
        throw new DuckDialectException(
          """printf: Invalid type specifier "d" for formatting a value of type float""")
      case _ =>
        throw new DuckDialectException(
          """printf: Invalid type specifier "d" for formatting a value of type string""")
    }
  }

  /** `graft_printf_dyn('<flags>', '<typ>', w, p, x)` — printf specs
    * carrying a dynamic `'*'` width and/or precision (r18). `flags` is
    * the literal `[align][sign][,][#][0]` prefix; `w`/`p` are the
    * consumed arguments (integral only — DuckDB raises "width is not
    * integer"/"precision is not integer" otherwise, probed; BOOLEAN
    * promotes to 0/1, probed '%*d' of true). A static width/precision
    * mixed with a dynamic partner rides in as a Literal (absent width
    * = 0; precision-slot presence is a trailing '.' on `flags`, since
    * dynamic negatives clamp to 0 and block a numeric sentinel).
    * The spec string is composed per row and runs the SAME kernels as
    * the literal forms; NULL in any slot → NULL (StaticInvoke null
    * propagation), matching DuckDB's NULL row.
    */
  private def printfDynBuilder(es: Seq[Expression]): Expression = {
    nArgs("graft_printf_dyn", es, 5)
    def lit(i: Int, what: String): String = es(i) match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString
      case other => throw new DuckDialectException(
        s"printf: internal $what argument must be a string literal, got $other")
    }
    val flags = lit(0, "flags")
    val typ = lit(1, "conversion").head
    def dynInt(e: Expression, what: String): Expression = {
      if (!e.resolved)
        throw new DuckDialectException(
          s"printf('%*$typ', …): the $what type cannot be determined " +
            "before resolution; CAST the argument explicitly")
      e.dataType match {
        case ByteType | ShortType | IntegerType | LongType | BooleanType =>
          Cast(e, LongType)
        case _ => throw new DuckDialectException(s"printf: $what is not integer")
      }
    }
    val w = dynInt(es(2), "width")
    val p = dynInt(es(3), "precision")
    val v = es(4)
    if (!v.resolved)
      throw new DuckDialectException(
        s"printf('%*$typ', …): the argument type cannot be determined " +
          "before resolution; CAST the argument explicitly")
    val flagsL = Literal(UTF8String.fromString(flags), StringType)
    val typL = Literal(UTF8String.fromString(typ.toString), StringType)
    def longCall(bits: Int): Expression =
      sweepInvoke(StringType, "printfDynLong",
        Seq(flagsL, typL, w, p, Cast(v, LongType), Literal(bits)),
        Seq(StringType, StringType, LongType, LongType, LongType, IntegerType))
    def dblCall: Expression =
      sweepInvoke(StringType, "printfDynDouble",
        Seq(flagsL, typL, w, p, Cast(v, DoubleType)),
        Seq(StringType, StringType, LongType, LongType, DoubleType))
    def strCall(cast: Boolean): Expression =
      sweepInvoke(StringType, "printfDynStr",
        Seq(flagsL, typL, w, p, if (cast) Cast(v, StringType) else v),
        Seq(StringType, StringType, LongType, LongType, StringType))
    def mismatch(tn: String): Nothing = throw new DuckDialectException(
      s"""printf: Invalid type specifier "$typ" for formatting a value of type $tn""")
    (typ, v.dataType) match {
      case ('d' | 'i' | 'u' | 'x' | 'X' | 'o' | 'b' | 'c',
            ByteType | ShortType | IntegerType | BooleanType) => longCall(32)
      case ('d' | 'i' | 'u' | 'x' | 'X' | 'o' | 'b' | 'c', LongType) => longCall(64)
      case ('d' | 'i' | 'u' | 'x' | 'X' | 'o' | 'b' | 'c',
            FloatType | DoubleType | _: DecimalType) => mismatch("float")
      case ('d' | 'i' | 'u' | 'x' | 'X' | 'o' | 'b' | 'c', _) => mismatch("string")
      case (_, ByteType | ShortType | IntegerType | LongType) =>
        if (typ == 's') mismatch("int") else longCall(64) // fmtLong raises for f/e/g
      case (_, FloatType | DoubleType | _: DecimalType) =>
        if (typ == 's') mismatch("float") else dblCall
      case (_, StringType) => strCall(cast = false)
      // bools, dates etc stringify (probed '%5s' of DATE; '%s' of true →
      // 'true' — the static fmtSpecBuilder's own fallthrough)
      case _ => strCall(cast = true)
    }
  }

  /** `graft_printf_char('<spec>', x)` — printf's %c over a codepoint;
    * int-typed arguments only (probed: '%c' of a string is DuckDB's
    * "Invalid type specifier" error).
    */
  private def printfCharBuilder(es: Seq[Expression]): Expression = {
    nArgs("graft_printf_char", es, 2)
    val spec = es.head match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString
      case other => throw new DuckDialectException(
        s"printf: internal spec argument must be a string literal, got $other")
    }
    val v = es(1)
    if (!v.resolved)
      throw new DuckDialectException(
        "printf('%c', …): the argument type cannot be determined " +
          "before resolution; CAST the argument explicitly")
    v.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        sweepInvoke(StringType, "printfChar",
          Seq(Literal(UTF8String.fromString(spec), StringType), Cast(v, LongType)),
          Seq(StringType, LongType))
      case FloatType | DoubleType | _: DecimalType =>
        throw new DuckDialectException(
          """printf: Invalid type specifier "c" for formatting a value of type float""")
      case _ =>
        throw new DuckDialectException(
          """printf: Invalid type specifier "c" for formatting a value of type string""")
    }
  }

  private def makeTimestampBuilder(name: String, es: Seq[Expression]): Expression =
    es.length match {
      // 1-arg = micros since epoch (probed); 6-arg = calendar parts
      case 1 => MicrosToTimestamp(Cast(es(0), LongType))
      case 6 => MakeTimestamp(es(0), es(1), es(2), es(3), es(4), es(5), None)
      case n => throw new DuckDialectException(
        s"$name expects 1 (micros) or 6 (parts) args, got $n")
    }

  /** millisecond/microsecond dispatch DATE/TIME/TIMESTAMP at plan time;
    * an unresolved argument refuses loudly (the [[epochOverload]]
    * treatment) rather than guessing an arm.
    */
  private def subMinuteBuilder(name: String, arg: Expression,
                               unitMicros: Long): Expression = {
    if (!arg.resolved)
      throw new DuckDialectException(
        s"$name: argument type cannot be determined before resolution; " +
          "CAST the argument explicitly (timestamp, time or date)")
    arg.dataType match {
      case TimestampType | TimestampNTZType | DateType | _: TimeType =>
        SubMinutePart(arg, unitMicros)
      case StringType => SubMinutePart(Cast(arg, TimestampType), unitMicros)
      case t => throw new DuckDialectException(
        s"$name needs a timestamp, time or date argument, got $t")
    }
  }

  private def arrayResizeBuilder(es: Seq[Expression]): Expression = {
    if (es.length != 2 && es.length != 3)
      throw new DuckDialectException("array_resize/list_resize takes (list, size[, fill])")
    val l = es(0)
    val n = Cast(es(1), IntegerType)
    val fill = if (es.length == 3) es(2) else Literal(null)
    If(LessThanOrEqual(n, Size(l)),
      Slice(l, Literal(1), Greatest(Seq(n, Literal(0)))),
      Concat(Seq(l, ArrayRepeat(fill, Subtract(n, Size(l))))))
  }

  /** like_escape family (r15, probed): LIKE/ILIKE with an explicit
    * escape character — the escape must be a one-character literal
    * (Catalyst's Like bakes it into the compiled pattern). A LITERAL
    * pattern is re-escaped onto '\' up front: DuckDB lets the escape
    * precede ANY character (it just means "that char, literally") while
    * Spark's Like rejects an escape before an ordinary character, so
    * translating the pattern — escaped wildcards stay escaped, escaped
    * ordinary chars drop the escape — preserves DuckDB's semantics. A
    * non-literal pattern passes through with the user's escape char
    * (well-formed patterns behave identically).
    */
  private def likeEscapeBuilder(name: String, es: Seq[Expression],
                                insensitive: Boolean, negate: Boolean): Expression = {
    nArgs(name, es, 3)
    val esc = es(2) match {
      case Literal(s: UTF8String, StringType) if s != null && s.numChars == 1 =>
        s.toString.charAt(0)
      case other => throw new DuckDialectException(
        s"$name: the escape must be a single-character string literal, got $other")
    }
    def reEscape(p: String): String = {
      val sb = new StringBuilder
      def putLiteral(c: Char): Unit = c match {
        case '%' | '_' => sb += '\\' += c
        case '\\' => sb ++= "\\\\"
        case o => sb += o
      }
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        if (c == esc && i + 1 < p.length) { putLiteral(p.charAt(i + 1)); i += 2 }
        else if (c == esc) // DuckDB 1.0.0 (probed): trailing escape errors
          throw new DuckDialectException(
            s"$name: Like pattern must not end with escape character!")
        else if (c == '%' || c == '_') { sb += c; i += 1 }
        else { putLiteral(c); i += 1 }
      }
      sb.toString
    }
    val like: Expression = es(1) match {
      case Literal(p: UTF8String, StringType) if p != null =>
        val rp = lit(reEscape(p.toString))
        if (insensitive) ILike(es(0), rp, '\\') else Like(es(0), rp, '\\')
      case p =>
        if (insensitive) ILike(es(0), p, esc) else Like(es(0), p, esc)
    }
    if (negate) Not(like) else like
  }

  /** list_where (r14, probed): keep elements whose mask slot is TRUE;
    * a shorter mask truncates (positional filter — the pad-null slots
    * evaluate false). DuckDB errors on NULL mask slots; here they
    * filter out (permissive divergence, documented).
    */
  private def listWhereBuilder(es: Seq[Expression]): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("__graft_lw_x"))
    val i = UnresolvedNamedLambdaVariable(Seq("__graft_lw_i"))
    // Spark's filter index is 0-based; mask lookup is 1-based get
    ArrayFilter(es(0), LambdaFunction(
      EqualTo(GetArrayItem(es(1), i, failOnError = false), Literal(true)),
      Seq(x, i)))
  }

  /** list_select (r14, probed): 1-based gather; 0/out-of-range/negative
    * indexes yield NULL elements, duplicates allowed.
    */
  private def listSelectBuilder(es: Seq[Expression]): Expression = {
    val i = UnresolvedNamedLambdaVariable(Seq("__graft_ls_i"))
    ArrayTransform(es(1), LambdaFunction(
      GetArrayItem(es(0), Subtract(Cast(i, IntegerType), Literal(1)),
        failOnError = false),
      Seq(i)))
  }

  /** Pairwise fold over two DOUBLE[] lists (zip_with + the [[listSum]]
    * sequential fold — DuckDB's evaluation order): the dot-product /
    * distance / cosine builders' shared shape. Casts make DECIMAL list
    * literals behave like DuckDB's.
    */
  private def listPairFold(es: Seq[Expression],
      f: (Expression, Expression) => Expression,
      divideByNorms: Boolean): Expression = {
    def cast(e: Expression) = Cast(e, ArrayType(DoubleType))
    def fold(x: Expression, y: Expression,
             g: (Expression, Expression) => Expression): Expression = {
      val l = UnresolvedNamedLambdaVariable(Seq("__graft_pa"))
      val r = UnresolvedNamedLambdaVariable(Seq("__graft_pb"))
      listSum(ZipWith(cast(x), cast(y), LambdaFunction(g(l, r), Seq(l, r))))
    }
    val dot = fold(es(0), es(1), f)
    if (!divideByNorms) dot
    else Divide(dot, Multiply(
      Sqrt(fold(es(0), es(0), (a, b) => Multiply(a, b))),
      Sqrt(fold(es(1), es(1), (a, b) => Multiply(a, b)))))
  }

  /** Σ over a list as a higher-order aggregate (codegen'd by Catalyst;
    * the analyzer binds the unresolved lambda variables exactly as it
    * does for parsed `aggregate(l, 0D, (acc, x) -> acc + x)`).
    */
  private def listSum(l: Expression): Expression = {
    val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    val accF = UnresolvedNamedLambdaVariable(Seq("acc"))
    ArrayAggregate(l, Literal(0.0d),
      LambdaFunction(Add(acc, Cast(x, DoubleType)), Seq(acc, x)),
      LambdaFunction(accF, Seq(accF)))
  }

  /** NULL on an empty list (DuckDB's list_avg), not an ANSI
    * divide-by-zero error.
    */
  private def listAvg(l: Expression): Expression =
    If(EqualTo(Size(l), Literal(0)), Literal.create(null, DoubleType),
      Divide(listSum(l), Cast(Size(l), DoubleType)))

  private def literalFormat(name: String, e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) if s != null => s.toString
    case _ => throw new DuckDialectException(
      s"$name: the format must be a string literal (graft translates the " +
        "%-codes to a java.time pattern at plan time)")
  }

  /** DuckDB/C strftime %-codes → java.time DateTimeFormatter pattern.
    * Unknown codes raise with the java.time pointer rather than passing
    * through silently wrong.
    */
  def cFormatToJava(fmt: String): String = {
    val out = new StringBuilder
    val text = new StringBuilder
    def flush(): Unit = if (text.nonEmpty) {
      out.append('\'').append(text.toString.replace("'", "''")).append('\'')
      text.clear()
    }
    def mapped(code: Char, padded: Boolean): String = code match {
      case 'Y' => "yyyy"
      case 'y' => "yy"
      case 'm' => if (padded) "MM" else "M"
      case 'd' => if (padded) "dd" else "d"
      case 'H' => if (padded) "HH" else "H"
      case 'I' => if (padded) "hh" else "h"
      case 'M' => if (padded) "mm" else "m"
      case 'S' => if (padded) "ss" else "s"
      case 'g' => "SSS"    // DuckDB: millisecond, zero-padded
      case 'f' => "SSSSSS" // DuckDB: microsecond, zero-padded
      case 'p' => "a"
      case 'j' => "DDD"
      case 'a' => "EEE"
      case 'A' => "EEEE"
      case 'b' | 'h' => "MMM"
      case 'B' => "MMMM"
      case 'Z' => "zzz"
      case 'z' => "xx"
      case other => throw new DuckDialectException(
        s"strftime/strptime code %$other has no Spark equivalent — use a " +
          "java.time DateTimeFormatter pattern with date_format/to_timestamp")
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val (code, skip) =
          if (fmt.charAt(i + 1) == '-' && i + 2 < fmt.length) (fmt.charAt(i + 2), 3)
          else (fmt.charAt(i + 1), 2)
        if (code == '%') text.append('%')
        else { flush(); out.append(mapped(code, padded = skip == 2)) }
        i += skip
      } else {
        text.append(c)
        i += 1
      }
    }
    flush()
    out.toString
  }

  /** DuckDB function names Spark lacks, as direct Catalyst builders.
    * Registered alongside the graft natives by GraftFunctions/
    * GraftExtensions, so they resolve in any `sql` stage, subquery or
    * CTE with zero text rewriting.
    */
  /** Two-param HOF lambdas: DuckDB's index variable is 1-BASED,
    * Spark's 0-based — rewrite every reference to the second lambda
    * parameter as (i + 1). One-param lambdas pass through.
    */
  private def shiftLambdaIndex(lam: Expression): Expression = lam match {
    case LambdaFunction(body, args, hidden) if args.length == 2 =>
      args(1) match {
        case iv: UnresolvedNamedLambdaVariable =>
          // Manual recursion (not transformUp): a nested lambda whose own
          // argument list rebinds the same name SHADOWS this index var, so
          // its subtree must be left alone — the inner lambda gets its own
          // shift when its builder runs.
          def shift(e: Expression): Expression = e match {
            case v: UnresolvedNamedLambdaVariable if v.nameParts == iv.nameParts =>
              Add(v, Literal(1))
            case inner: LambdaFunction if inner.arguments.exists {
              case a: UnresolvedNamedLambdaVariable => a.nameParts == iv.nameParts
              case _ => false
            } => inner
            case other => other.mapChildren(shift)
          }
          LambdaFunction(shift(body), args, hidden)
        case _ => lam
      }
    case other => other
  }

  /** DuckDB `epoch`: DOUBLE seconds including the fraction (probed). */
  private def epochSeconds(e: Expression): Expression =
    Divide(Cast(UnixMicros(Cast(e, TimestampType)), DoubleType), Literal(1e6))

  private def extractOnePart(part: String, source: Expression): Expression =
    part.toUpperCase match {
      case "EPOCH" => epochSeconds(source)
      case "ISODOW" => DatePart.parseExtractField("DOW_ISO", source)
      case p => DatePart.parseExtractField(p, source)
    }

  /** date_part / datepart builder: scalar field → Spark's own extract
    * parser; a LITERAL LIST of fields → a struct of the parts (DuckDB's
    * polymorphic form, probed `{'year': 2024, 'month': 3}`).
    */
  private def datePartBuilder(es: Seq[Expression]): Expression = {
    nArgs("date_part", es, 2)
    es(0) match {
      case Literal(s: UTF8String, StringType) if s != null =>
        extractOnePart(s.toString, es(1))
      case CreateArray(parts, _) =>
        val fields = parts.map {
          case Literal(p: UTF8String, StringType) if p != null => p.toString
          case other => throw new DuckDialectException(
            s"date_part list entries must be string literals, got $other")
        }
        CreateNamedStruct(fields.flatMap(p =>
          Seq(Literal(p), extractOnePart(p, es(1)))))
      case other => throw new DuckDialectException(
        s"date_part field must be a string literal or a literal list, got $other")
    }
  }

  val aliases: Seq[(String, Seq[Expression] => Expression)] =
    baseAliases ++ icuCollateAliases

  private def baseAliases: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // --- string splitting (DuckDB separator is literal; Spark's is regex)
    "string_split" -> (es => { nArgs("string_split", es, 2); StringSplit(es(0), quotedSep(es(1)), Literal(-1)) }),
    "str_split" -> (es => { nArgs("str_split", es, 2); StringSplit(es(0), quotedSep(es(1)), Literal(-1)) }),
    "string_to_array" -> (es => { nArgs("string_to_array", es, 2); StringSplit(es(0), quotedSep(es(1)), Literal(-1)) }),
    "string_split_regex" -> (es => { nArgs("string_split_regex", es, 2); StringSplit(es(0), es(1), Literal(-1)) }),
    "str_split_regex" -> (es => { nArgs("str_split_regex", es, 2); StringSplit(es(0), es(1), Literal(-1)) }),
    "regexp_split_to_array" -> (es => { nArgs("regexp_split_to_array", es, 2); StringSplit(es(0), es(1), Literal(-1)) }),
    "to_base" -> (es => { nArgs("to_base", es, 2); Conv(es(0), Literal(10), es(1)) }),
    // --- list_* family → array_* equivalents
    // two-param lambdas carry the element INDEX — 1-BASED in DuckDB
    // (probed list_transform([1,2], (e,i) -> e*i) = [1,4]), 0-based in
    // Spark: shift every index-variable reference by one
    "list_transform" -> (es => { nArgs("list_transform", es, 2)
      ArrayTransform(es(0), shiftLambdaIndex(es(1))) }),
    "list_filter" -> (es => { nArgs("list_filter", es, 2)
      ArrayFilter(es(0), shiftLambdaIndex(es(1))) }),
    "list_contains" -> (es => { nArgs("list_contains", es, 2); ArrayContains(es(0), es(1)) }),
    "list_has" -> (es => { nArgs("list_has", es, 2); ArrayContains(es(0), es(1)) }),
    "list_distinct" -> (es => { nArgs("list_distinct", es, 1); ArrayDistinct(es(0)) }),
    // DuckDB default is ASC **NULLS LAST** (probed — Spark's
    // sort_array(asc) is nulls-first); 2/3-arg order/nulls modifiers
    "list_sort" -> (es => {
      if (es.isEmpty || es.length > 3) throw new DuckDialectException(
        s"list_sort expects (list[, order[, null order]]), got ${es.length} args")
      def flag(e: Expression, what: String): String = e match {
        case Literal(s: UTF8String, StringType) if s != null =>
          s.toString.trim.toUpperCase.replaceAll(raw"\s+", " ")
        case _ => throw new DuckDialectException(
          s"list_sort $what must be a string literal")
      }
      val asc = if (es.length < 2) true else flag(es(1), "order") match {
        case "ASC" | "ASCENDING" => true
        case "DESC" | "DESCENDING" => false
        case o => throw new DuckDialectException(s"list_sort order '$o' (ASC/DESC)")
      }
      val nullsFirst = if (es.length < 3) false else flag(es(2), "null order") match {
        case "NULLS FIRST" => true
        case "NULLS LAST" => false
        case o => throw new DuckDialectException(s"list_sort null order '$o' (NULLS FIRST/LAST)")
      }
      GraftListSort(es(0), asc, nullsFirst)
    }),
    // = list_sort(l, 'DESC') — DESC NULLS LAST (probed)
    "list_reverse_sort" -> (es => { nArgs("list_reverse_sort", es, 1); SortArray(es(0), Literal(false)) }),
    // 1-based ascending sort indices, NULL elements graded FIRST (probed)
    "list_grade_up" -> (es => { nArgs("list_grade_up", es, 1); GraftGradeUp(es(0)) }),
    // list_where (r14, probed): keep elements whose mask slot is TRUE;
    // a shorter mask truncates (positional filter — the pad-null slots
    // evaluate false). DuckDB errors on NULL mask slots; here they
    // filter out (permissive divergence, documented).
    "list_where" -> (es => { nArgs("list_where", es, 2); listWhereBuilder(es) }),
    // list_select (r14, probed): 1-based gather; 0/out-of-range/negative
    // indexes yield NULL elements (NOT the bracket-get neg-from-end),
    // duplicates allowed
    "list_select" -> (es => { nArgs("list_select", es, 2); listSelectBuilder(es) }),
    // array_resize/list_resize (r14/r15, probed): truncate or pad with
    // fill (NULL default) to exactly n elements
    "array_resize" -> (es => arrayResizeBuilder(es)),
    "list_resize" -> (es => arrayResizeBuilder(es)),
    // array_cross_product (r15, probed): 3-d cross product, DOUBLE[3].
    // One static kernel rather than a CreateArray∘ElementAt composition:
    // Spark's ElementAt codegen loses its isNull declaration when
    // subexpression elimination splits the projection (janino "not an
    // rvalue"), and the kernel is also one pass instead of six gets.
    "array_cross_product" -> (es => {
      nArgs("array_cross_product", es, 2)
      sweepInvoke(ArrayType(DoubleType, containsNull = false), "crossProduct",
        Seq(Cast(es(0), ArrayType(DoubleType)), Cast(es(1), ArrayType(DoubleType))),
        Seq(ArrayType(DoubleType), ArrayType(DoubleType))) }),
    // nextafter (r14): IEEE-defined, bit-identical to DuckDB's libm
    "nextafter" -> (es => { nArgs("nextafter", es, 2)
      NextAfterExpr(Cast(es(0), DoubleType), Cast(es(1), DoubleType)) }),
    // list_reduce: no-init fold (probed [1,2,3] + → 6) = aggregate over
    // the tail with the head as zero; the lambda arrives two-param
    // (accumulator first, like DuckDB's)
    "list_reduce" -> (es => { nArgs("list_reduce", es, 2)
      val id = UnresolvedNamedLambdaVariable(Seq("__graft_acc"))
      ArrayAggregate(
        Slice(es(0), Literal(2), Greatest(Seq(Subtract(Size(es(0)), Literal(1)), Literal(0)))),
        ElementAt(es(0), Literal(1)),
        es(1), LambdaFunction(id, Seq(id))) }),
    // list_median: NULLs dropped, interpolated even-count midpoint
    // (probed [1,2,3,10] → 2.5), DOUBLE
    "list_median" -> (es => { nArgs("list_median", es, 1)
      val sorted = GraftListSort(ArrayCompact(es(0)), asc = true, nullsFirst = false)
      val n = Size(sorted)
      def at(i: Expression) = Cast(ElementAt(sorted, i), DoubleType)
      If(EqualTo(n, Literal(0)), Literal.create(null, DoubleType),
        If(EqualTo(Pmod(n, Literal(2)), Literal(1)),
          at(Cast(Divide(Add(n, Literal(1)), Literal(2)), IntegerType)),
          Divide(Add(at(Cast(Divide(n, Literal(2)), IntegerType)),
            at(Add(Cast(Divide(n, Literal(2)), IntegerType), Literal(1)))), Literal(2.0)))) }),
    "array_pop_back" -> (es => { nArgs("array_pop_back", es, 1)
      Slice(es(0), Literal(1), Greatest(Seq(Subtract(Size(es(0)), Literal(1)), Literal(0)))) }),
    "array_pop_front" -> (es => { nArgs("array_pop_front", es, 1)
      Slice(es(0), Literal(2), Greatest(Seq(Subtract(Size(es(0)), Literal(1)), Literal(0)))) }),
    "list_reverse" -> (es => { nArgs("list_reverse", es, 1); Reverse(es(0)) }),
    "list_concat" -> (es => Concat(es)),
    "list_append" -> (es => { nArgs("list_append", es, 2); ArrayAppend(es(0), es(1)) }),
    "list_prepend" -> (es => { nArgs("list_prepend", es, 2); ArrayPrepend(es(1), es(0)) }),
    "list_position" -> (es => { nArgs("list_position", es, 2); ArrayPosition(es(0), es(1)) }),
    "list_indexof" -> (es => { nArgs("list_indexof", es, 2); ArrayPosition(es(0), es(1)) }),
    // DuckDB's two-list map constructor vs Spark's variadic pairs —
    // post-analysis dispatch for the ambiguous 2-arg call only (see
    // DuckMapConstructor); other arities stay Spark's native CreateMap
    "map" -> (es => if (es.length == 2) DuckMapConstructor(es) else CreateMap(es)),
    // internal: emitted by the integral-cast rewrite only (DuckDB's
    // round-not-truncate fractional→integral cast semantics)
    "duck_iround" -> (es => DuckIntRound(es.head)),
    // full DuckDB subscript semantics ([0]/out-of-range → NULL, strings)
    "list_extract" -> (es => { nArgs("list_extract", es, 2); DuckBracketGet(es(0), es(1)) }),
    "array_extract" -> (es => { nArgs("array_extract", es, 2); DuckBracketGet(es(0), es(1)) }),
    "list_min" -> (es => { nArgs("list_min", es, 1); ArrayMin(es(0)) }),
    "list_max" -> (es => { nArgs("list_max", es, 1); ArrayMax(es(0)) }),
    "list_unique" -> (es => { nArgs("list_unique", es, 1)
      // count of distinct NON-NULL elements (probed: [1,1,2,NULL] -> 2)
      Size(ArrayDistinct(ArrayCompact(es(0)))) }),
    "array_unique" -> (es => { nArgs("array_unique", es, 1)
      Size(ArrayDistinct(ArrayCompact(es(0)))) }),
    "array_cat" -> (es => Concat(es)),
    "array_concat" -> (es => Concat(es)),
    "list_cat" -> (es => Concat(es)),
    "array_has" -> (es => { nArgs("array_has", es, 2); ArrayContains(es(0), es(1)) }),
    "array_indexof" -> (es => { nArgs("array_indexof", es, 2); ArrayPosition(es(0), es(1)) }),
    "array_grade_up" -> (es => { nArgs("array_grade_up", es, 1); GraftGradeUp(es(0)) }),
    "grade_up" -> (es => { nArgs("grade_up", es, 1); GraftGradeUp(es(0)) }),
    "array_reverse_sort" -> (es => { nArgs("array_reverse_sort", es, 1)
      GraftListSort(es(0), asc = false, nullsFirst = false) }),
    "array_select" -> (es => { nArgs("array_select", es, 2); listSelectBuilder(es) }),
    "array_where" -> (es => { nArgs("array_where", es, 2); listWhereBuilder(es) }),
    "list_element" -> (es => { nArgs("list_element", es, 2); DuckBracketGet(es(0), es(1)) }),
    // DuckDB array_to_string ≡ list_aggr(l, 'string_agg', sep): joins the
    // NON-NULL elements cast to VARCHAR, and is NULL when none remain
    // (string_agg over zero values — probed duckdb 1.0.0: [] → NULL,
    // [NULL] → NULL, [1,2] → '1,2'); Spark's array_join returns '' for
    // those, hence the size guard
    "array_to_string" -> (es => { nArgs("array_to_string", es, 2)
      val arr = ArrayCompact(Cast(es(0), ArrayType(StringType)))
      If(LessThanOrEqual(Size(arr), Literal(0)),
        Literal.create(null, StringType), ArrayJoin(arr, es(1), None)) }),
    // 1-based inclusive [begin, end] with DuckDB's full clamp/negative
    // semantics, on lists AND strings (DuckSlice); a NULL bound nulls
    // the result, as DuckDB's function form does
    "list_slice" -> (es => { nArgs("list_slice", es, 3); DuckSlice(es(0), es(1), es(2), nullBoundIsOpen = false) }),
    "array_slice" -> (es => { nArgs("array_slice", es, 3); DuckSlice(es(0), es(1), es(2), nullBoundIsOpen = false) }),
    // target of the `l[begin:end]` bracket rewrite (GraftSqlParser.
    // rewriteSlice): open bounds arrive as NULL literals meaning 1 / len
    "graft_bracket_slice" -> (es => { nArgs("graft_bracket_slice", es, 3); DuckSlice(es(0), es(1), es(2), nullBoundIsOpen = true) }),
    // list folds (elements cast to double — DuckDB's integer list_sum
    // returns HUGEINT; documented dialect divergence)
    "list_sum" -> (es => { nArgs("list_sum", es, 1); listSum(es(0)) }),
    "list_avg" -> (es => { nArgs("list_avg", es, 1); listAvg(es(0)) }),
    "list_aggregate" -> (es => {
      nArgs("list_aggregate", es, 2)
      es(1) match {
        case Literal(s: UTF8String, StringType) if s != null => s.toString.toLowerCase match {
          case "sum" => listSum(es(0))
          case "avg" | "mean" => listAvg(es(0))
          case "min" => ArrayMin(es(0))
          case "max" => ArrayMax(es(0))
          case "count" => Size(es(0))
          case other => throw new DuckDialectException(
            s"list_aggregate('$other') isn't translated — sum/avg/min/max/count are; " +
              "use aggregate(list, init, (acc, x) -> ...) for anything else")
        }
        case _ => throw new DuckDialectException(
          "list_aggregate needs a literal aggregate name ('sum'/'avg'/'min'/'max'/'count')")
      }
    }),
    // --- argmax family (DuckDB arg_max(arg, val) == Spark max_by —
    // same argument order; the analyzer wraps the raw AggregateFunction)
    "arg_max" -> (es => { nArgs("arg_max", es, 2); aggregate.MaxBy(es(0), es(1)) }),
    "arg_min" -> (es => { nArgs("arg_min", es, 2); aggregate.MinBy(es(0), es(1)) }),
    "argmax" -> (es => { nArgs("argmax", es, 2); aggregate.MaxBy(es(0), es(1)) }),
    "argmin" -> (es => { nArgs("argmin", es, 2); aggregate.MinBy(es(0), es(1)) }),
    // --- r13 probe-batch closures (graft.tools.Probe found these as
    // raw UNRESOLVED_ROUTINE errors; every semantic below probed
    // against duckdb 1.0.0)
    // quantile_cont == Spark's exact interpolating Percentile (scalar
    // AND list-of-fractions forms); quantile_disc / quantile (its
    // DuckDB alias) == ANSI percentile_disc (scalar fraction only;
    // returns DOUBLE where DuckDB keeps the element type — CAST in
    // cross-engine SQL)
    "quantile_cont" -> (es => { nArgs("quantile_cont", es, 2); new aggregate.Percentile(es(0), es(1)) }),
    "quantile_disc" -> (es => { nArgs("quantile_disc", es, 2); quantileDisc(es) }),
    "quantile" -> (es => { nArgs("quantile", es, 2); quantileDisc(es) }),
    // product / entropy aggregates (AggExpressions natives: NULL-skip,
    // DOUBLE; entropy is Shannon log2 over the value distribution)
    "product" -> (es => { nArgs("product", es, 1); GraftProduct(es(0)) }),
    "entropy" -> (es => { nArgs("entropy", es, 1); GraftEntropy(Cast(es(0), StringType)) }),
    // mad: exact interpolated-median absolute deviation (r14; DOUBLE —
    // DuckDB's DECIMAL-in/DECIMAL-out and temporal forms stay out)
    "mad" -> (es => { nArgs("mad", es, 1); GraftMad(Cast(es(0), DoubleType)) }),
    // Kahan-compensated sums: DOUBLE result (probed); Spark's DOUBLE
    // sum is plain but the values agree wherever an oracle rounds
    // map value→count, keys sorted, NULLs skipped (probed)
    "histogram" -> (es => { nArgs("histogram", es, 1); GraftHistogram(es(0)) }),
    "fsum" -> (es => { nArgs("fsum", es, 1); aggregate.Sum(Cast(es(0), DoubleType)) }),
    "sumkahan" -> (es => { nArgs("sumkahan", es, 1); aggregate.Sum(Cast(es(0), DoubleType)) }),
    "kahan_sum" -> (es => { nArgs("kahan_sum", es, 1); aggregate.Sum(Cast(es(0), DoubleType)) }),
    "favg" -> (es => { nArgs("favg", es, 1); aggregate.Average(Cast(es(0), DoubleType)) }),
    // JSON aggregates: to_json over the collected list / entry map.
    // DuckDB aggregates in its (single-threaded) input order; Spark's
    // collect order is partition-dependent — pair with an in-call
    // ORDER BY or a single-partition frame when the order matters
    "json_group_array" -> (es => { nArgs("json_group_array", es, 1)
      StructsToJson(Map.empty[String, String],
        aggregate.CollectList(es(0)).toAggregateExpression()) }),
    "json_group_object" -> (es => { nArgs("json_group_object", es, 2)
      StructsToJson(Map.empty[String, String], MapFromArrays(
        aggregate.CollectList(Cast(es(0), StringType)).toAggregateExpression(),
        aggregate.CollectList(es(1)).toAggregateExpression())) }),
    // list_intersect: element ORDER is hash order in DuckDB and
    // first-array order in Spark — sort before comparing engines
    "list_intersect" -> (es => { nArgs("list_intersect", es, 2); ArrayIntersect(es(0), es(1)) }),
    // list_zip pads to the longest with NULLs in both engines; field
    // names pinned to DuckDB's list_1, list_2, ...
    "list_zip" -> (es => ArraysZip(es,
      es.indices.map(i => Literal(UTF8String.fromString(s"list_${i + 1}"), StringType)))),
    "from_base64" -> (es => { nArgs("from_base64", es, 1); UnBase64(es(0)) }),
    // unicode/ord: codepoint of the FIRST character; '' → -1 (probed)
    "unicode" -> (es => { nArgs("unicode", es, 1); duckUnicode(es(0)) }),
    "ord" -> (es => { nArgs("ord", es, 1); duckUnicode(es(0)) }),
    // fdiv = true floor division, fmod = FLOORED modulo (probed:
    // fmod(-7.5, 2.0) = 0.5, NOT C's -1.5): x - floor(x/y)*y, DOUBLE
    "fdiv" -> (es => { nArgs("fdiv", es, 2)
      Cast(Floor(Divide(Cast(es(0), DoubleType), Cast(es(1), DoubleType))), DoubleType) }),
    "fmod" -> (es => { nArgs("fmod", es, 2)
      val x = Cast(es(0), DoubleType); val y = Cast(es(1), DoubleType)
      Subtract(x, Multiply(Cast(Floor(Divide(x, y)), DoubleType), y)) }),
    // scalar-position range/generate_series → Sequence with DuckDB's
    // emptiness (wrong-direction → [], probed: range end-exclusive,
    // generate_series end-inclusive, both honoring negative steps)
    "range" -> (es => seriesExpr("range", es, exclusive = true)),
    "generate_series" -> (es => seriesExpr("generate_series", es, exclusive = false)),
    // --- r13 second probe sweep: date/time + small math
    // time_bucket → the codegen'd TimeBucket native (origin 2000-01-03
    // for fixed widths / 2000-01 for month widths, probed); the 3-arg
    // origin/offset forms keep a guided error
    "time_bucket" -> (es => {
      if (es.length != 2 && es.length != 3) throw new DuckDialectException(
        "time_bucket takes (width, ts[, origin/offset])")
      if (es.length == 2) TimeBucket(es(0), es(1))
      else {
        // r14: the 3-arg forms execute — a FOLDABLE interval third arg
        // is the OFFSET form (shift-bucket-unshift), anything else is
        // the ORIGIN form (TimeBucketOrigin's type check names the
        // contract if a non-temporal lands there)
        val third = es(2)
        val isInterval = third.resolved && (
          third.dataType.isInstanceOf[DayTimeIntervalType] ||
          third.dataType.isInstanceOf[YearMonthIntervalType] ||
          third.dataType == CalendarIntervalType)
        if (isInterval && third.foldable) TimeBucketOffset(es(0), es(1), third)
        else TimeBucketOrigin(es(0), es(1), third)
      }
    }),
    // date_diff/datediff with a QUOTED datepart arrive as
    // graft_date_diff (GraftSqlParser.rewriteDateDiffFn — Spark's
    // parser special-cases the original names): DuckDB counts BOUNDARY
    // CROSSINGS (probed: date_diff('month', '2024-01-31', '2024-02-01')
    // = 1 — NOT timestampdiff's full-interval count)
    "graft_date_diff" -> (es => { nArgs("graft_date_diff", es, 3)
      boundaryDiff("date_diff", es) }),
    // date_sub/datesub 3-arg: DuckDB's COMPLETE-interval count ==
    // timestampdiff; the 2-arg form stays Spark's native date_sub(d, n)
    // (q65 uses it — replacing the builtin outright broke it, caught by
    // the gate)
    "date_sub" -> (es => if (es.length == 3) completeDiff("date_sub", es)
      else { nArgs("date_sub", es, 2); DateSub(es(0), es(1)) }),
    "datesub" -> (es => { nArgs("datesub", es, 3); completeDiff("datesub", es) }),
    // dayname/monthname: DuckDB returns FULL names (Spark's own dayname
    // is abbreviated — hence date_format)
    "dayname" -> (es => { nArgs("dayname", es, 1)
      DateFormatClass(Cast(es(0), TimestampType), lit("EEEE")) }),
    "monthname" -> (es => { nArgs("monthname", es, 1)
      DateFormatClass(Cast(es(0), TimestampType), lit("MMMM")) }),
    // isodow: Monday=1..Sunday=7 (probed) = Spark weekday + 1
    "isodow" -> (es => { nArgs("isodow", es, 1)
      Cast(Add(WeekDay(Cast(es(0), DateType)), Literal(1)), LongType) }),
    "epoch_ns" -> (es => { nArgs("epoch_ns", es, 1)
      Multiply(UnixMicros(Cast(es(0), TimestampType)), Literal(1000L)) }),
    // small math natives (probed: gcd sign-insensitive, lcm(0, x) = 0,
    // even rounds AWAY from zero to the next even)
    "greatest_common_divisor" -> (es => { nArgs("greatest_common_divisor", es, 2); GcdExpr(es(0), es(1)) }),
    "gcd" -> (es => { nArgs("gcd", es, 2); GcdExpr(es(0), es(1)) }),
    "least_common_multiple" -> (es => { nArgs("least_common_multiple", es, 2); LcmExpr(es(0), es(1)) }),
    "lcm" -> (es => { nArgs("lcm", es, 2); LcmExpr(es(0), es(1)) }),
    "even" -> (es => { nArgs("even", es, 1); EvenExpr(es(0)) }),
    // --- r14 sixth probe sweep (all probed duckdb 1.0.0)
    "week" -> (es => { nArgs("week", es, 1)
      Cast(WeekOfYear(Cast(es(0), DateType)), LongType) }),
    "weekofyear" -> (es => { nArgs("weekofyear", es, 1)
      Cast(WeekOfYear(Cast(es(0), DateType)), LongType) }),
    "isoyear" -> (es => { nArgs("isoyear", es, 1)
      Cast(DatePart.parseExtractField("YEAROFWEEK", Cast(es(0), DateType)), LongType) }),
    // yearweek = isoyear·100 + iso week (probed 2023-01-01 → 202252)
    "yearweek" -> (es => { nArgs("yearweek", es, 1)
      val d = Cast(es(0), DateType)
      Cast(Add(Multiply(DatePart.parseExtractField("YEAROFWEEK", d), Literal(100)),
        WeekOfYear(d)), LongType) }),
    // Julian Day as DOUBLE, midnight = .0 (probed: 1970-01-01 → 2440588.0)
    "julian" -> (es => { nArgs("julian", es, 1)
      sweepInvoke(DoubleType, "julianUs",
        Seq(UnixMicros(Cast(es(0), TimestampType))), Seq(LongType)) }),
    // era: 1 for year ≥ 1, 0 before (probed across the AD/BC boundary)
    "era" -> (es => { nArgs("era", es, 1)
      Cast(If(GreaterThanOrEqual(Year(Cast(es(0), DateType)), Literal(1)),
        Literal(1), Literal(0)), LongType) }),
    "today" -> (es => { nArgs("today", es, 0); CurrentDate() }),
    "get_current_timestamp" -> (es => { nArgs("get_current_timestamp", es, 0); Now() }),
    "transaction_timestamp" -> (es => { nArgs("transaction_timestamp", es, 0); Now() }),
    "current_localtimestamp" -> (es => { nArgs("current_localtimestamp", es, 0)
      LocalTimestamp() }),
    "regexp_escape" -> (es => { nArgs("regexp_escape", es, 1)
      sweepInvoke(StringType, "regexpEscape", Seq(Cast(es(0), StringType)),
        Seq(StringType)) }),
    // round(DOUBLE/FLOAT[, p]) → exact-binary half-away kernel (r18 —
    // Spark's Round rounds the shortest-decimal repr instead; see
    // [[DuckSweep.duckRound]]). Ints/decimals keep Spark's native
    // Round (HALF_UP = DuckDB's half-away on exact decimal values).
    "round" -> (es => {
      if (es.isEmpty || es.length > 2) throw new DuckDialectException(
        s"round takes 1 or 2 arguments, got ${es.length}")
      val x = es(0)
      val p = if (es.length == 2) es(1) else Literal(0)
      if (x.resolved && (x.dataType == DoubleType || x.dataType == FloatType)) {
        val call = sweepInvoke(DoubleType, "duckRound",
          Seq(Cast(x, DoubleType), Cast(p, IntegerType)),
          Seq(DoubleType, IntegerType))
        if (x.dataType == FloatType) Cast(call, FloatType) else call
      } else Round(x, p)
    }),
    "format_bytes" -> (es => { nArgs("format_bytes", es, 1)
      sweepInvoke(StringType, "formatBytes", Seq(Cast(es(0), LongType)), Seq(LongType)) }),
    // internal targets of the format()/printf() spec rewrites
    // (GraftSqlParser.rewriteFormatFn/rewritePrintfFn) — not DuckDB names
    "graft_fmt_spec" -> (es => fmtSpecBuilder(es)),
    "graft_printf_spec" -> (es => fmtSpecBuilder(es, allowSignComma = true)),
    "graft_printf_radix" -> (es => printfRadixBuilder(es)),
    "graft_printf_int" -> (es => printfIntBuilder(es)),
    "graft_printf_dyn" -> (es => printfDynBuilder(es)),
    "graft_printf_char" -> (es => printfCharBuilder(es)),
    "formatreadablesize" -> (es => { nArgs("formatReadableSize", es, 1)
      sweepInvoke(StringType, "formatBytes", Seq(Cast(es(0), LongType)), Seq(LongType)) }),
    "formatreadabledecimalsize" -> (es => { nArgs("formatReadableDecimalSize", es, 1)
      sweepInvoke(StringType, "formatBytesDecimal", Seq(Cast(es(0), LongType)),
        Seq(LongType)) }),
    "isfinite" -> (es => { nArgs("isfinite", es, 1)
      val d = Cast(es(0), DoubleType)
      And(Not(IsNaN(d)), LessThan(Abs(d), Literal(Double.PositiveInfinity))) }),
    "isinf" -> (es => { nArgs("isinf", es, 1)
      EqualTo(Abs(Cast(es(0), DoubleType)), Literal(Double.PositiveInfinity)) }),
    "signbit" -> (es => { nArgs("signbit", es, 1)
      sweepInvoke(BooleanType, "signbit", Seq(Cast(es(0), DoubleType)),
        Seq(DoubleType)) }),
    // 1-arg greatest/least are identity in DuckDB. Integer args bind
    // DuckDB's BIGINT overload regardless of input width (probed 1.0.0:
    // typeof(least(1::SMALLINT, 2::SMALLINT)) = BIGINT) — the width
    // feeds printf's unsigned conversions (r18, fuzz template 65), so
    // widen to LongType to keep the argument-width contract; DOUBLE /
    // VARCHAR / HUGEINT mixes keep Spark's native promotion (matches).
    "greatest" -> (es =>
      if (es.length == 1) es(0) else Greatest(widenIntegralArgs(es))),
    "least" -> (es =>
      if (es.length == 1) es(0) else Least(widenIntegralArgs(es))),
    // 1-arg trunc = truncate toward zero (DOUBLE here; DuckDB keeps the
    // input's numeric type — cast where the width matters); 2-arg stays
    // Spark's date trunc
    "trunc" -> (es => es.length match {
      case 1 =>
        val d = Cast(es(0), DoubleType)
        Cast(If(GreaterThanOrEqual(d, Literal(0.0)), Floor(d), Ceil(d)), DoubleType)
      case 2 => TruncDate(es(0), es(1))
      case n => throw new DuckDialectException(s"trunc expects 1 or 2 args, got $n")
    }),
    "strlen" -> (es => { nArgs("strlen", es, 1); OctetLength(Cast(es(0), StringType)) }),
    // chr is CODE-POINT based in DuckDB (probed via chr(769) = U+0301);
    // Spark's builtin is mod-256 ASCII
    "chr" -> (es => { nArgs("chr", es, 1)
      sweepInvoke(StringType, "chrCodepoint", Seq(Cast(es(0), IntegerType)),
        Seq(IntegerType)) }),
    // grapheme-cluster family (probed; UAX#29 segmentation)
    "length_grapheme" -> (es => { nArgs("length_grapheme", es, 1)
      sweepInvoke(IntegerType, "lengthGrapheme", Seq(Cast(es(0), StringType)),
        Seq(StringType)) }),
    "left_grapheme" -> (es => { nArgs("left_grapheme", es, 2)
      sweepInvoke(StringType, "leftGrapheme",
        Seq(Cast(es(0), StringType), Cast(es(1), IntegerType)),
        Seq(StringType, IntegerType)) }),
    "right_grapheme" -> (es => { nArgs("right_grapheme", es, 2)
      sweepInvoke(StringType, "rightGrapheme",
        Seq(Cast(es(0), StringType), Cast(es(1), IntegerType)),
        Seq(StringType, IntegerType)) }),
    "substring_grapheme" -> (es => {
      if (es.length != 2 && es.length != 3)
        throw new DuckDialectException("substring_grapheme takes (s, start[, len])")
      val len = if (es.length == 3) Cast(es(2), IntegerType) else Literal(-1)
      sweepInvoke(StringType, "substringGrapheme",
        Seq(Cast(es(0), StringType), Cast(es(1), IntegerType), len),
        Seq(StringType, IntegerType, IntegerType)) }),
    // binary/hex/base64 family (probed; BLOB maps onto Spark BINARY —
    // the ::BLOB/AS BLOB type spelling rewrites in rewriteBlobType)
    "to_hex" -> (es => { nArgs("to_hex", es, 1); Hex(es(0)) }),
    "from_hex" -> (es => { nArgs("from_hex", es, 1); Unhex(es(0)) }),
    "to_base64" -> (es => { nArgs("to_base64", es, 1); Base64(Cast(es(0), BinaryType)) }),
    "base64" -> (es => { nArgs("base64", es, 1); Base64(Cast(es(0), BinaryType)) }),
    "from_base64" -> (es => { nArgs("from_base64", es, 1); UnBase64(es(0)) }),
    "encode" -> (es => { nArgs("encode", es, 1); Cast(es(0), BinaryType) }),
    "decode" -> (es => { nArgs("decode", es, 1); Cast(es(0), StringType) }),
    // md5 as unsigned 64-bit halves (probed: LITTLE-endian; lower =
    // the digest's LAST 8 bytes, upper = the FIRST 8) — DECIMAL(20,0)
    // carries DuckDB's UBIGINT range
    "md5_number_lower" -> (es => { nArgs("md5_number_lower", es, 1)
      sweepInvoke(DecimalType(20, 0), "md5NumberLower",
        Seq(Cast(es(0), StringType)), Seq(StringType)) }),
    "md5_number_upper" -> (es => { nArgs("md5_number_upper", es, 1)
      sweepInvoke(DecimalType(20, 0), "md5NumberUpper",
        Seq(Cast(es(0), StringType)), Seq(StringType)) }),
    // full md5_number (r16): DuckDB's HUGEINT is int128 — graft renders
    // the decimal digits (see [[DuckSweep.md5Number]]); the _lower/_upper
    // halves above stay the numeric route
    "md5_number" -> (es => { nArgs("md5_number", es, 1)
      sweepInvoke(StringType, "md5Number",
        Seq(Cast(es(0), StringType)), Seq(StringType)) }),
    // age (r16): Postgres-style symbolic calendar subtraction, rendered
    // in DuckDB's INTERVAL→VARCHAR form (see [[DuckSweep.ageInterval]]);
    // the 1-arg anchor is now() (probed — NOT Postgres's current_date)
    "age" -> (es => {
      if (es.isEmpty || es.length > 2)
        throw new DuckDialectException(
          s"age takes 1 or 2 timestamp arguments, got ${es.length}")
      val a = if (es.length == 2) Cast(es(0), TimestampType) else Now()
      val b = Cast(es.last, TimestampType)
      sweepInvoke(StringType, "ageInterval",
        Seq(UnixMicros(a), UnixMicros(b)), Seq(LongType, LongType)) }),
    // gen_random_uuid (r16): DuckDB's uuid() synonym — resolve through
    // Spark's own uuid so the analyzer assigns its per-query seed
    "gen_random_uuid" -> (es => { nArgs("gen_random_uuid", es, 0)
      org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        "uuid", Nil, isDistinct = false) }),
    // unpivot_list (r16, probed): list_value's UNPIVOT-helper twin —
    // builds a list from its arguments ('SELECT unpivot_list()' → [])
    "unpivot_list" -> (es => CreateArray(es)),
    // setseed (r16): registers the seed in a session registry consumed
    // by SqlStage's random()/rand() rewrite (rand(seed) — deterministic
    // per row like DuckDB's reseeded stream is per call; the VALUES
    // differ from DuckDB's serial global RNG, which a distributed plan
    // cannot replay). Returns NULL like DuckDB (probed); the [-1, 1]
    // range check mirrors DuckDB's error text. Analysis may rebuild the
    // expression — the registry put is idempotent.
    "setseed" -> (es => { nArgs("setseed", es, 1)
      val d = es(0) match {
        case e if e.resolved && e.foldable && e.dataType.isInstanceOf[NumericType] =>
          Cast(e, DoubleType).eval() match {
            case x: java.lang.Double => x.doubleValue
            case _ => throw new DuckDialectException(
              "setseed takes a literal numeric seed")
          }
        case _ => throw new DuckDialectException(
          "setseed takes a literal numeric seed (DuckDB seeds a session " +
            "RNG — a per-row seed has no meaning)")
      }
      if (d < -1.0 || d > 1.0)
        throw new DuckDialectException(
          "SETSEED accepts seed values between -1.0 and 1.0, inclusive")
      org.apache.spark.sql.SparkSession.getActiveSession.foreach(s =>
        graft.operators.GraftSqlParser.registerSeed(s, d))
      Literal(null, IntegerType) }),
    "try_strptime" -> (es => {
      nArgs("try_strptime", es, 2)
      def one(f: Expression): Expression =
        org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
          Seq("try_to_timestamp"),
          Seq(es(0), lit(cFormatToJava(literalFormat("try_strptime", f)))),
          isDistinct = false)
      es(1) match {
        // format-LIST overload (r15, probed): first matching format
        // wins, NULL when none do
        case CreateArray(fs, _) if fs.nonEmpty => Coalesce(fs.map(one))
        case f => one(f)
      } }),
    // LIKE with an explicit escape char (r15, probed 1.0.0)
    "like_escape" -> (es => likeEscapeBuilder("like_escape", es, insensitive = false, negate = false)),
    "ilike_escape" -> (es => likeEscapeBuilder("ilike_escape", es, insensitive = true, negate = false)),
    "not_like_escape" -> (es => likeEscapeBuilder("not_like_escape", es, insensitive = false, negate = true)),
    "not_ilike_escape" -> (es => likeEscapeBuilder("not_ilike_escape", es, insensitive = true, negate = true)),
    "array_length" -> (es => { nArgs("array_length", es, 1)
      Cast(Size(es(0)), LongType) }),
    // 1-arg overloads probed 1.0.0: add(x) = x, subtract(x) = -x
    "add" -> (es => es.length match {
      case 1 => es(0)
      case 2 => Add(es(0), es(1))
      case n => throw new DuckDialectException(s"add expects 1 or 2 arguments, got $n")
    }),
    "subtract" -> (es => es.length match {
      case 1 => UnaryMinus(es(0))
      case 2 => Subtract(es(0), es(1))
      case n => throw new DuckDialectException(s"subtract expects 1 or 2 arguments, got $n")
    }),
    "multiply" -> (es => { nArgs("multiply", es, 2); Multiply(es(0), es(1)) }),
    // constant_or_null(v, check…): NULL if ANY check is NULL (probed)
    "constant_or_null" -> (es => {
      if (es.length < 2)
        throw new DuckDialectException("constant_or_null takes (value, check, ...)")
      val anyNull = es.tail.map(e => IsNull(e): Expression).reduce(Or)
      If(anyNull, Literal(null), es(0)) }),
    // vector similarity/distance scalars over DOUBLE[] (the oracle-side
    // names; casts make DECIMAL literals work like DuckDB's)
    "list_distance" -> (es => { nArgs("list_distance", es, 2)
      Sqrt(listPairFold(es, (x, y) => {
        val d = Subtract(x, y); Multiply(d, d)
      }, divideByNorms = false)) }),
    // path utilities ('/' AND '\' separators, DuckDB's 'both' default)
    "parse_path" -> (es => { nArgs("parse_path", es, 1)
      sweepInvoke(ArrayType(StringType, containsNull = false), "parsePath",
        Seq(Cast(es(0), StringType)), Seq(StringType)) }),
    "parse_dirname" -> (es => { nArgs("parse_dirname", es, 1)
      sweepInvoke(StringType, "parseDirname", Seq(Cast(es(0), StringType)),
        Seq(StringType)) }),
    "parse_dirpath" -> (es => { nArgs("parse_dirpath", es, 1)
      sweepInvoke(StringType, "parseDirpath", Seq(Cast(es(0), StringType)),
        Seq(StringType)) }),
    "parse_filename" -> (es => {
      if (es.isEmpty || es.length > 2)
        throw new DuckDialectException("parse_filename takes (path[, trim_extension])")
      val trim = if (es.length == 2) Cast(es(1), BooleanType) else Literal(false)
      sweepInvoke(StringType, "parseFilename",
        Seq(Cast(es(0), StringType), trim), Seq(StringType, BooleanType)) }),
    // json utilities (probed duckdb 1.0.0); json_extract* are TEXTUAL
    // rewrites onto the arrow machinery (GraftSqlParser
    // .rewriteJsonExtractFns)
    "json_keys" -> (es => { nArgs("json_keys", es, 1)
      // non-object json yields [] (probed); Spark's native gives NULL
      Coalesce(Seq(JsonObjectKeys(Cast(es(0), StringType)),
        Literal.create(Array.empty[String], ArrayType(StringType)))) }),
    "json_valid" -> (es => { nArgs("json_valid", es, 1)
      IsNotNull(org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        Seq("try_parse_json"), Seq(Cast(es(0), StringType)), isDistinct = false)) }),
    "json_type" -> (es => { nArgs("json_type", es, 1)
      sweepInvoke(StringType, "duckJsonType", Seq(Cast(es(0), StringType)),
        Seq(StringType)) }),
    // typed rendering via named_struct (probed: null fields KEPT;
    // zero args → '{}', r15)
    "json_object" -> (es => {
      if (es.length % 2 != 0)
        throw new DuckDialectException("json_object takes (key, value, ...) pairs")
      if (es.isEmpty) lit("{}")
      else StructsToJson(Map("ignoreNullFields" -> "false"), CreateNamedStruct(es)) }),
    // json_array (r15, probed): heterogeneous args render element-wise —
    // each element through to_json(named_struct('x', e)) with the
    // '{"x":' wrapper stripped, so string escaping/number rendering is
    // Catalyst's own JSON writer (nulls KEPT, like json_object's)
    "json_array" -> (es => {
      if (es.isEmpty) lit("[]")
      else {
        val rendered = es.map { e =>
          val wrapped = StructsToJson(Map("ignoreNullFields" -> "false"),
            CreateNamedStruct(Seq(lit("x"), e)))
          Substring(wrapped, Literal(6),
            Subtract(Length(wrapped), Literal(6))): Expression
        }
        Concat(Seq(lit("["),
          ConcatWs(lit(",") +: rendered),
          lit("]")))
      } }),
    // json_structure / json_contains (r15): Jackson-backed kernels,
    // probed semantics in [[DuckSweep.jsonStructure]]/[[DuckSweep.jsonContains]]
    "json_structure" -> (es => { nArgs("json_structure", es, 1)
      sweepInvoke(StringType, "jsonStructure", Seq(Cast(es(0), StringType)),
        Seq(StringType)) }),
    "json_contains" -> (es => { nArgs("json_contains", es, 2)
      sweepInvoke(BooleanType, "jsonContains",
        Seq(Cast(es(0), StringType), Cast(es(1), StringType)),
        Seq(StringType, StringType)) }),
    // bar chart string (r15, probed) — see DuckSweep.bar
    "bar" -> (es => {
      if (es.length != 3 && es.length != 4)
        throw new DuckDialectException("bar takes (value, min, max[, width])")
      val w = if (es.length == 4) Cast(es(3), DoubleType) else Literal(80.0)
      sweepInvoke(StringType, "bar",
        Seq(Cast(es(0), DoubleType), Cast(es(1), DoubleType),
          Cast(es(2), DoubleType), w),
        Seq(DoubleType, DoubleType, DoubleType, DoubleType)) }),
    // gamma/lgamma (r14): Lanczos kernels within a few ulp of DuckDB's
    // libm — oracle gates compare through round(·, 6)
    "gamma" -> (es => { nArgs("gamma", es, 1); GammaExpr(Cast(es(0), DoubleType)) }),
    "lgamma" -> (es => { nArgs("lgamma", es, 1); LGammaExpr(Cast(es(0), DoubleType)) }),
    // string-similarity family → codegen'd TextSimilarity natives (all
    // byte-based like DuckDB, probed; the row-local pair scorers
    // complementing the MinHash/SimHash document-scale dedup)
    "jaccard" -> (es => { nArgs("jaccard", es, 2); JaccardSim(es(0), es(1)) }),
    "hamming" -> (es => { nArgs("hamming", es, 2); HammingDist(es(0), es(1)) }),
    "mismatches" -> (es => { nArgs("mismatches", es, 2); HammingDist(es(0), es(1)) }),
    "jaro_similarity" -> (es => { nArgs("jaro_similarity", es, 2); JaroSim(es(0), es(1)) }),
    "jaro_winkler_similarity" -> (es => { nArgs("jaro_winkler_similarity", es, 2); JaroWinklerSim(es(0), es(1)) }),
    "damerau_levenshtein" -> (es => { nArgs("damerau_levenshtein", es, 2); DamerauLevenshteinDist(es(0), es(1)) }),
    "strip_accents" -> (es => { nArgs("strip_accents", es, 1); StripAccents(es(0)) }),
    "nfc_normalize" -> (es => { nArgs("nfc_normalize", es, 1); NfcNormalize(es(0)) }),
    // --- list set predicates (probed against duckdb 1.0.0:
    // has_all(l, []) = true — array_except([] , l) is empty → size 0)
    "list_has_any" -> (es => { nArgs("list_has_any", es, 2); ArraysOverlap(es(0), es(1)) }),
    "array_has_any" -> (es => { nArgs("array_has_any", es, 2); ArraysOverlap(es(0), es(1)) }),
    "list_has_all" -> (es => { nArgs("list_has_all", es, 2); EqualTo(Size(ArrayExcept(es(1), es(0))), Literal(0)) }),
    "array_has_all" -> (es => { nArgs("array_has_all", es, 2); EqualTo(Size(ArrayExcept(es(1), es(0))), Literal(0)) }),
    // --- list constructors
    "list_value" -> (es => CreateArray(es)),
    "list_pack" -> (es => CreateArray(es)),
    // --- vector ops → graft natives (codegen'd; see VectorExpressions)
    // DOUBLE[] casts make DECIMAL list literals work like DuckDB's (r14)
    "list_cosine_similarity" -> (es => { nArgs("list_cosine_similarity", es, 2)
      CosineSimilarity(Cast(es(0), ArrayType(DoubleType)), Cast(es(1), ArrayType(DoubleType))) }),
    "list_dot_product" -> (es => { nArgs("list_dot_product", es, 2)
      DotProduct(Cast(es(0), ArrayType(DoubleType)), Cast(es(1), ArrayType(DoubleType))) }),
    "list_inner_product" -> (es => { nArgs("list_inner_product", es, 2)
      DotProduct(Cast(es(0), ArrayType(DoubleType)), Cast(es(1), ArrayType(DoubleType))) }),
    // --- regex
    // DuckDB 1.0 regexp_replace semantics: FIRST match only unless the
    // 'g' option is present (probed — Spark's builtin always replaces
    // all, silent-wrong on multi-match input), options string as 4th
    // arg (Spark's 4th is a position int). Registered under a graft
    // name and TEXT-renamed by GraftSqlParser.rewriteRegexpReplaceFn:
    // overriding the builtin name would hijack Scala-level
    // functions.regexp_replace too (Spark 4's functions API resolves
    // through the registry via Column.fn), breaking every internal
    // quality operator that wants Spark semantics.
    "duck_regexp_replace" -> (es => {
      if (es.length != 3 && es.length != 4) throw new DuckDialectException(
        s"regexp_replace expects (string, pattern, replacement[, options]), got ${es.length} args")
      DuckRegexpReplace(es(0), es(1), es(2),
        if (es.length == 4) es(3) else lit(""))
    }),
    "regexp_matches" -> (es => {
      if (es.length == 3) throw new DuckDialectException(
        "regexp_matches with an options argument isn't supported — inline " +
          "the flag into the pattern, e.g. (?i) for case-insensitive")
      nArgs("regexp_matches", es, 2); RLike(es(0), es(1))
    }),
    "regexp_full_match" -> (es => {
      nArgs("regexp_full_match", es, 2)
      es(1) match {
        case Literal(p: UTF8String, StringType) if p != null => RLike(es(0), lit(s"^(?:${p.toString})$$"))
        case p => RLike(es(0), Concat(Seq(lit("^(?:"), p, lit(")$"))))
      }
    }),
    // --- polymorphic len/length (string AND list, like DuckDB)
    "len" -> (es => { nArgs("len", es, 1); DuckLen(es(0)) }),
    "length" -> (es => { nArgs("length", es, 1); DuckLen(es(0)) }),
    // backs the `a // b` rewrite (GraftSqlParser.rewriteIntDiv)
    "graft_ddiv" -> (es => { nArgs("graft_ddiv", es, 2); DuckDiv(es(0), es(1)) }),
    // backs the scalar-subscript rewrite (GraftSqlParser.rewriteSubscript)
    "graft_bracket_get" -> (es => { nArgs("graft_bracket_get", es, 2); DuckBracketGet(es(0), es(1)) }),
    // struct field by name (same resolver as the [] subscript)
    "struct_extract" -> (es => { nArgs("struct_extract", es, 2); DuckBracketGet(es(0), es(1)) }),
    // backs rewriteStructInsert: (struct, 'name', value, ...) pairs
    // fold into UpdateFields — append or overwrite (probed)
    "graft_struct_insert" -> (es => {
      if (es.length < 3 || es.length % 2 == 0) throw new DuckDialectException(
        "struct_insert expects (struct, name := value, ...)")
      es.drop(1).grouped(2).foldLeft(es(0)) { case (acc, Seq(name, value)) =>
        name match {
          case Literal(n: UTF8String, StringType) if n != null =>
            UpdateFields(acc, n.toString, value)
          case other => throw new DuckDialectException(
            s"struct_insert field names must be identifiers, got $other")
        }
      }
    }),
    // scalar-list form like range/generate_series (set-returning in
    // DuckDB; compose with unnest for rows)
    "generate_subscripts" -> (es => {
      if (es.length < 1 || es.length > 2) throw new DuckDialectException(
        "generate_subscripts expects (list[, dim])")
      es.lift(1).foreach {
        case Literal(v, _) if v != null && v.toString == "1" =>
        case other => throw new DuckDialectException(
          s"generate_subscripts: only dimension 1 exists for lists (got $other)")
      }
      Sequence(Literal(1), Size(es(0)), None)
    }),
    "sha256" -> (es => { nArgs("sha256", es, 1); Sha2(es(0), Literal(256)) }),
    // calendar parts Spark's extract lacks (probed: 2024 → 21/202/3)
    "century" -> (es => { nArgs("century", es, 1)
      Cast(Ceil(Divide(Cast(Year(es(0)), DoubleType), Literal(100.0))), LongType) }),
    "decade" -> (es => { nArgs("decade", es, 1)
      Cast(Floor(Divide(Cast(Year(es(0)), DoubleType), Literal(10.0))), LongType) }),
    "millennium" -> (es => { nArgs("millennium", es, 1)
      Cast(Ceil(Divide(Cast(Year(es(0)), DoubleType), Literal(1000.0))), LongType) }),
    // divide(a, b) is DuckDB's // operator as a function (probed:
    // divide(7,2)=3 integer, divide(7.5,2)=3.75)
    "divide" -> (es => { nArgs("divide", es, 2); DuckDiv(es(0), es(1)) }),
    // DuckDB's 1-arg log is LOG10 (Spark's is ln); 2-arg log(base, x)
    // agrees across engines — backs GraftSqlParser.rewriteLogFn
    "duck_log" -> (es => es.length match {
      case 1 => Log10(es(0))
      case 2 => Logarithm(es(0), es(1))
      case n => throw new DuckDialectException(s"log expects 1 or 2 args, got $n")
    }),
    // bitwise XOR as a function (DuckDB's ^ operator is EXPONENT —
    // rewritten to power() by rewriteCaret)
    "xor" -> (es => { nArgs("xor", es, 2); BitwiseXor(es(0), es(1)) }),
    // DuckDB left/right accept NEGATIVE lengths: drop |n| chars from
    // the other end (probed left('abcd',-1)='abc'); Spark returns ''
    "left" -> (es => { nArgs("left", es, 2)
      val n = Cast(es(1), IntegerType)
      If(GreaterThanOrEqual(n, Literal(0)),
        Substring(es(0), Literal(1), n),
        Substring(es(0), Literal(1),
          Greatest(Seq(Add(Length(es(0)), n), Literal(0))))) }),
    "right" -> (es => { nArgs("right", es, 2)
      val n = Cast(es(1), IntegerType)
      If(GreaterThanOrEqual(n, Literal(0)),
        If(EqualTo(n, Literal(0)), Literal(""),
          Substring(es(0), UnaryMinus(n), Literal(Int.MaxValue))),
        Substring(es(0), Subtract(Literal(1), n), Literal(Int.MaxValue))) }),
    // --- string predicates
    "starts_with" -> (es => { nArgs("starts_with", es, 2); StartsWith(es(0), es(1)) }),
    "ends_with" -> (es => { nArgs("ends_with", es, 2); EndsWith(es(0), es(1)) }),
    // strpos(s, sub) = 1-based position, 0 when absent — Spark's instr
    "strpos" -> (es => { nArgs("strpos", es, 2); StringInstr(es(0), es(1)) }),
    "prefix" -> (es => { nArgs("prefix", es, 2); StartsWith(es(0), es(1)) }),
    "suffix" -> (es => { nArgs("suffix", es, 2); EndsWith(es(0), es(1)) }),
    "editdist3" -> (es => { nArgs("editdist3", es, 2); Levenshtein(es(0), es(1)) }),
    // --- time (literal formats converted %-code → java.time at plan time)
    "strftime" -> (es => {
      nArgs("strftime", es, 2)
      // DuckDB overloads BOTH argument orders (probed: strftime('%Y',
      // ts) == strftime(ts, '%Y')); the format is whichever side is
      // the string literal
      def isStrLit(e: Expression): Boolean = e match {
        case Literal(_: UTF8String, StringType) => true
        case _ => false
      }
      val (ts, fmt) =
        if (isStrLit(es(1)) || !isStrLit(es(0))) (es(0), es(1)) else (es(1), es(0))
      DateFormatClass(ts, lit(cFormatToJava(literalFormat("strftime", fmt))))
    }),
    "strptime" -> (es => {
      nArgs("strptime", es, 2)
      ParseToTimestamp(es(0), Some(lit(cFormatToJava(literalFormat("strptime", es(1))))), TimestampType)
    }),
    // DOUBLE seconds incl. the fraction (probed: epoch(ts'…01.5') =
    // …01.5, DATE input casts through midnight) — not Spark's LONG
    "epoch" -> (es => { nArgs("epoch", es, 1)
      Divide(Cast(UnixMicros(Cast(es(0), TimestampType)), DoubleType), Literal(1e6)) }),
    // OVERLOADED like DuckDB's (probed): a numeric argument converts
    // TO a timestamp (epoch_ms(1704067201001) = ts), a temporal one
    // extracts the epoch count (DATE casts through midnight)
    "epoch_ms" -> (es => { nArgs("epoch_ms", es, 1)
      epochOverload("epoch_ms", es(0),
        numeric = MillisToTimestamp(Cast(es(0), LongType)),
        temporal = UnixMillis(Cast(es(0), TimestampType))) }),
    "epoch_us" -> (es => { nArgs("epoch_us", es, 1)
      epochOverload("epoch_us", es(0),
        numeric = MicrosToTimestamp(Cast(es(0), LongType)),
        temporal = UnixMicros(Cast(es(0), TimestampType))) }),
    "make_timestamp" -> (es => makeTimestampBuilder("make_timestamp", es)),
    // make_timestamptz (r15): same parts/micros forms, interpreted in
    // the SESSION zone — exactly what MakeTimestamp/MicrosToTimestamp
    // already do for TimestampType (graft sessions default to UTC)
    "make_timestamptz" -> (es => makeTimestampBuilder("make_timestamptz", es)),
    // sub-minute components INCLUDING seconds (r15, probed:
    // millisecond('…13:30:05.123456') = 5123) — see [[SubMinutePart]]
    "millisecond" -> (es => { nArgs("millisecond", es, 1)
      subMinuteBuilder("millisecond", es(0), unitMicros = 1000L) }),
    "microsecond" -> (es => { nArgs("microsecond", es, 1)
      subMinuteBuilder("microsecond", es(0), unitMicros = 1L) }),
    // session-zone UTC offset parts (r15, probed) — see [[TzOffsetPart]];
    // deliberate divergence: graft's single TimestampType takes DuckDB's
    // TIMESTAMPTZ branch (session offset), never the naive-TIMESTAMP 0
    "timezone" -> (es => { nArgs("timezone", es, 1)
      TzOffsetPart(Cast(es(0), TimestampType), "seconds") }),
    "timezone_hour" -> (es => { nArgs("timezone_hour", es, 1)
      TzOffsetPart(Cast(es(0), TimestampType), "hour") }),
    "timezone_minute" -> (es => { nArgs("timezone_minute", es, 1)
      TzOffsetPart(Cast(es(0), TimestampType), "minute") }),
    // current session-zone TIME (r15; DuckDB types both as TIME) —
    // non-deterministic like now(), so oracle-checked queries avoid it
    "current_localtime" -> (es => { nArgs("current_localtime", es, 0)
      new CurrentTime() }),
    "get_current_time" -> (es => { nArgs("get_current_time", es, 0)
      new CurrentTime() }),
    "regexp_extract" -> (es => es.length match {
      // DuckDB's 2-arg form extracts GROUP 0 (the whole match); Spark's
      // default idx = 1 errors on group-less patterns (probed)
      case 2 => RegExpExtract(es(0), es(1), Literal(0))
      case 3 => RegExpExtract(es(0), es(1), es(2))
      case n => throw new DuckDialectException(
        s"regexp_extract expects 2 or 3 args, got $n (the name-list and options forms are not claimed)")
    }),
    "regexp_extract_all" -> (es => es.length match {
      case 2 => RegExpExtractAll(es(0), es(1), Literal(0))
      case 3 => RegExpExtractAll(es(0), es(1), es(2))
      case n => throw new DuckDialectException(
        s"regexp_extract_all expects 2 or 3 args, got $n")
    }),
    // interval constructors (to_days(5) = INTERVAL 5 DAYS etc., probed
    // TIMESTAMP '2024-01-02' + to_hours(3) = …T03:00) — year/month
    // parts build a year-month interval, the rest day-time
    "to_years" -> (es => { nArgs("to_years", es, 1)
      MakeYMInterval(Cast(es(0), IntegerType), Literal(0)) }),
    "to_decades" -> (es => { nArgs("to_decades", es, 1)
      MakeYMInterval(Multiply(Cast(es(0), IntegerType), Literal(10)), Literal(0)) }),
    "to_centuries" -> (es => { nArgs("to_centuries", es, 1)
      MakeYMInterval(Multiply(Cast(es(0), IntegerType), Literal(100)), Literal(0)) }),
    "to_millennia" -> (es => { nArgs("to_millennia", es, 1)
      MakeYMInterval(Multiply(Cast(es(0), IntegerType), Literal(1000)), Literal(0)) }),
    "to_months" -> (es => { nArgs("to_months", es, 1)
      MakeYMInterval(Literal(0), Cast(es(0), IntegerType)) }),
    "to_quarters" -> (es => { nArgs("to_quarters", es, 1)
      MakeYMInterval(Literal(0), Multiply(Cast(es(0), IntegerType), Literal(3))) }),
    "to_weeks" -> (es => { nArgs("to_weeks", es, 1)
      MakeDTInterval(Multiply(Cast(es(0), IntegerType), Literal(7)),
        Literal(0), Literal(0), Cast(Literal(0), DecimalType(18, 6))) }),
    "to_days" -> (es => { nArgs("to_days", es, 1)
      MakeDTInterval(Cast(es(0), IntegerType),
        Literal(0), Literal(0), Cast(Literal(0), DecimalType(18, 6))) }),
    "to_hours" -> (es => { nArgs("to_hours", es, 1)
      MakeDTInterval(Literal(0), Cast(es(0), IntegerType),
        Literal(0), Cast(Literal(0), DecimalType(18, 6))) }),
    "to_minutes" -> (es => { nArgs("to_minutes", es, 1)
      MakeDTInterval(Literal(0), Literal(0), Cast(es(0), IntegerType),
        Cast(Literal(0), DecimalType(18, 6))) }),
    "to_seconds" -> (es => { nArgs("to_seconds", es, 1)
      MakeDTInterval(Literal(0), Literal(0), Literal(0),
        Cast(es(0), DecimalType(18, 6))) }),
    "to_milliseconds" -> (es => { nArgs("to_milliseconds", es, 1)
      MakeDTInterval(Literal(0), Literal(0), Literal(0),
        Cast(Divide(Cast(es(0), DoubleType), Literal(1e3)), DecimalType(18, 6))) }),
    "to_microseconds" -> (es => { nArgs("to_microseconds", es, 1)
      MakeDTInterval(Literal(0), Literal(0), Literal(0),
        Cast(Divide(Cast(es(0), DoubleType), Literal(1e6)), DecimalType(18, 6))) }),
    // date_part with DuckDB's LIST form: date_part(['year','month'], d)
    // returns a STRUCT of the parts (probed); the scalar form delegates
    // to Spark's own extract-field parser (identical semantics), plus
    // the 'epoch' part Spark's parser lacks (DOUBLE seconds, probed)
    "date_part" -> (es => datePartBuilder(es)),
    "datepart" -> (es => datePartBuilder(es)),
    // --- table-in-select
    "unnest" -> (es => { nArgs("unnest", es, 1); Explode(es(0)) })
  )

  /** The 130 `icu_collate_<locale>` collators in DuckDB 1.0.0's catalog
    * (r15) plus `icu_sort_key(s, 'locale')`: a hex-encoded collation
    * sort key whose ORDERING is the locale's collation. DuckDB renders
    * ICU keys, graft renders `java.text.Collator` keys — the BYTES
    * differ by design (different libraries; only ordering is the
    * contract, which q183 pins per locale against DuckDB on the
    * locale's own alphabet). Known ordering divergences, documented:
    * the JDK's French-family collators keep legacy backward-accent
    * secondaries (côte < coté where CLDR says coté < côte), and foreign
    * exotic codepoints (dotless ı in a Latin battery) can rank
    * differently. 71 of the 130 tags have no JDK tailoring and fall
    * back to ROOT collation — which matches ICU for CLDR-untailored
    * locales (probed identical orderings for sw/zu/yo/fil/ta/km);
    * only tailored-in-CLDR-but-missing-in-JDK locales can diverge.
    */
  // a def, not a val: `aliases` initializes earlier in the object body
  private def icuTags = Seq(
    "af", "am", "ar", "ar_sa", "as", "az", "be", "bg", "bn", "bo", "br",
    "bs", "ca", "ceb", "chr", "cs", "cy", "da", "de", "de_at", "dsb", "dz",
    "ee", "el", "en", "en_us", "eo", "es", "et", "fa", "fa_af", "ff", "fi",
    "fil", "fo", "fr", "fr_ca", "fy", "ga", "gl", "gu", "ha", "haw", "he",
    "he_il", "hi", "hr", "hsb", "hu", "hy", "id", "id_id", "ig", "is", "it",
    "ja", "ka", "kk", "kl", "km", "kn", "ko", "kok", "ku", "ky", "lb",
    "lkt", "ln", "lo", "lt", "lv", "mk", "ml", "mn", "mr", "ms", "mt", "my",
    "nb", "nb_no", "ne", "nl", "nn", "om", "or", "pa", "pa_in", "pl", "ps",
    "pt", "ro", "ru", "sa", "se", "si", "sk", "sl", "smn", "sq", "sr",
    "sr_ba", "sr_me", "sr_rs", "sv", "sw", "ta", "te", "th", "tk", "to",
    "tr", "ug", "uk", "ur", "uz", "vi", "wae", "wo", "xh", "yi", "yo",
    "yue", "yue_cn", "zh", "zh_cn", "zh_hk", "zh_mo", "zh_sg", "zh_tw", "zu")

  private def icuCollateAliases: Seq[(String, Seq[Expression] => Expression)] =
    icuTags.map { t =>
      s"icu_collate_$t" -> ((es: Seq[Expression]) => {
        nArgs(s"icu_collate_$t", es, 1)
        sweepInvoke(StringType, "icuCollateKey",
          Seq(Cast(es(0), StringType), lit(t)), Seq(StringType, StringType))
      })
    } :+ ("icu_sort_key" -> ((es: Seq[Expression]) => {
      nArgs("icu_sort_key", es, 2)
      sweepInvoke(StringType, "icuCollateKey",
        Seq(Cast(es(0), StringType), Cast(es(1), StringType)),
        Seq(StringType, StringType))
    }))

  /** DuckDB functions with no faithful expression rewrite → the hint a
    * raised error carries. Checked when a `sql` stage fails analysis
    * with an unresolved function.
    */
  val fnHints: Map[String, String] = Map(
    // the single-literal forms read_csv_auto('p') / read_parquet('p') /
    // read_json_auto('p') EXECUTE inside sql stages (r9, rewriteReadFns:
    // session temp views over the Spark readers); these hints fire only
    // outside a sql stage, where no session rewrite runs
    "read_csv_auto" -> "read_csv_auto('path') runs inside graft sql stages; here declare the file as a pipeline `input` (reference O1) or read it with spark.read.csv and register a view",
    "read_csv" -> "read_csv('path') runs inside graft sql stages; here declare the file as a pipeline `input` or use spark.read.csv",
    "read_parquet" -> "read_parquet('path') runs inside graft sql stages; here declare the file as a pipeline `input` or use spark.read.parquet",
    "read_json_auto" -> "read_json_auto('path') runs inside graft sql stages; here declare the file as a pipeline `input` or use spark.read.json",
    "struct_pack" -> "use named_struct('a', expr1, 'b', expr2)",
    // json_structure / json_contains / json_array EXECUTE since r15
    // (Jackson kernels + element-wise rendering) — no hints needed
    "group_concat" -> "use string_agg(expr, sep) (both engines support it)",
    "date_add" -> "Spark's date_add(date, days) takes days only — for other units use dateadd(unit, n, ts)",
    // age / md5_number / gen_random_uuid / setseed / unpivot_list
    // EXECUTE since r16 (builders above) — no hints needed
    // --- the sweep-8 EXCLUSION TABLE (r16, terminal — COVERAGE.md):
    // the 13 catalog functions graft deliberately does not implement.
    // Four need the BIT/TIMETZ types Spark lacks; nine observe
    // DuckDB-process state (query text, storage stats, vectorization,
    // AST serialization, MVCC ids, catalog search path) that has no
    // meaning inside a distributed Spark plan. Each raises this guided
    // error naming the nearest real alternative.
    "get_bit" -> "Spark has no BIT (bitstring) type — keep bits in BIGINT and use Spark's getbit(x, pos) / bitwise &, |, <<",
    "set_bit" -> "Spark has no BIT (bitstring) type — keep bits in BIGINT and set with x | (1 << pos) or clear with x & ~(1 << pos)",
    "bit_position" -> "Spark has no BIT (bitstring) type — for single-bit search in a BIGINT combine getbit(x, pos) with a generated position sequence",
    "timetz_byte_comparable" -> "Spark has no TIMETZ type — store TIME plus a separate offset column; ordering keys can concatenate both",
    "current_query" -> "DuckDB session-meta: the executing statement's text is not observable inside a distributed plan — the pipeline config (stage `code`) already carries it",
    "current_schemas" -> "DuckDB catalog search path — use current_database()/current_schema() (both execute here); Spark has a single active schema, not a path",
    "in_search_path" -> "DuckDB catalog search path — compare against current_database()/current_schema() directly",
    "stats" -> "DuckDB storage-statistics debug helper — use DESCRIBE <table> (executes here), SUMMARIZE, or the Spark UI's scan metrics",
    "vector_type" -> "DuckDB-internal vectorization debug helper (FLAT/CONSTANT/DICTIONARY vector layout) — Spark's execution layout is Tungsten rows/columnar batches; inspect plans with EXPLAIN",
    "json_serialize_sql" -> "DuckDB-internal AST serialization — Spark has no SQL-to-JSON AST surface; EXPLAIN (or df.queryExecution in code) exposes the plan",
    "json_serialize_plan" -> "DuckDB-internal AST serialization — Spark has no SQL-to-JSON AST surface; EXPLAIN (or df.queryExecution in code) exposes the plan",
    "json_deserialize_sql" -> "DuckDB-internal AST serialization — there is no AST JSON to deserialize here; keep the SQL text itself",
    "txid_current" -> "no MVCC transactions in a Spark batch plan — derive a run id with uuid() or key on the pipeline's stage/run identifier",
    "alias" -> "DuckDB debug helper returning an expression's rendered name — inline the name as a string literal (column names are static in a Spark plan)",
    // lambda/computed COLUMNS() forms parse as a normal call and fail
    // ANALYSIS (the expandable shapes were already rewritten in SqlStage)
    "columns" -> "this COLUMNS(...) shape isn't expandable (COLUMNS outside a select list or WHERE clause, or a name function beyond len/lower/upper/substring/substr/replace; *, 'regex', ['list'], boolean name-lambdas of LIKE/SIMILAR TO/IN/=/<> with AND/OR/NOT plus those name transforms, whole-item expressions and AND-replicated WHERE predicates DO expand) — list the columns, or use * EXCEPT(...) / * EXCLUDE(...) to subtract"
  )

  /** Syntax-level DuckDB-isms Spark's parser rejects — scanned (on a
    * string-literal-masked copy) when a `sql` stage fails to PARSE, so
    * the user sees the construct named with its Spark equivalent instead
    * of a bare ANTLR error. Order matters: first hit wins.
    */
  /** DuckDB joins Spark's parser ACCEPTS with different semantics —
    * `t ASOF JOIN u` parses as table t aliased "ASOF", silently becoming
    * an inner join. These must be rejected up front, not on parse
    * failure (there is none).
    */
  val silentTrapHints: Seq[(scala.util.matching.Regex, String)] = Seq(
    // ASOF JOIN is normally auto-rewritten (GraftSqlParser.rewriteAsof)
    // — this trap only fires if a shape slipped past the rewrite, since
    // bare Spark would silently parse `t ASOF JOIN u` as table t aliased
    // "ASOF" + inner join.
    raw"(?i)\bASOF\s+(LEFT\s+)?JOIN\b".r ->
      "this ASOF JOIN shape couldn't be auto-rewritten — use graft's as-of join operator (graft.queries.CoreQueries.asOfJoin) or a windowed validity-interval join (lead/lag of the timestamp over the equality keys)",
    // POSITIONAL JOIN between subqueries with explicit ORDER BYs is
    // auto-rewritten (GraftSqlParser.rewritePositional); this trap fires
    // only for shapes that slipped past it — bare Spark would silently
    // parse `t POSITIONAL JOIN u` as table t aliased "POSITIONAL".
    raw"(?i)\bPOSITIONAL\s+JOIN\b".r ->
      "this POSITIONAL JOIN shape couldn't be auto-rewritten (each side must be a subquery with a top-level ORDER BY — a distributed scan has no deterministic row order) — or add an explicit index with row_number() OVER (ORDER BY <deterministic key>) on both sides and equi-join on it"
  )

  val constructHints: Seq[(scala.util.matching.Regex, String)] = silentTrapHints ++ Seq(
    // WITH RECURSIVE is reachable through the reference's verbatim SQL
    // passthrough (VERDICT r8 missing #2). Standard linear-recursion
    // CTEs execute NATIVELY on Spark 4.x (DialectSpec + gate q117 run
    // identical text on both engines) — this hint fires only when a
    // recursive shape still fails to parse, naming the iterative
    // operator for closure-shaped uses instead of a bare ANTLR error.
    // window frame EXCLUDE (DuckDB: EXCLUDE CURRENT ROW | GROUP | TIES)
    // — Spark frames have no exclusion clause; for algebraic aggregates
    // the subtraction identity is exact
    raw"(?i)\bEXCLUDE\s+(CURRENT\s+ROW|GROUP|TIES|NO\s+OTHERS)\b".r ->
      "window frame EXCLUDE isn't supported by Spark frames — for sum/count/avg subtract the excluded rows' contribution from the full-frame aggregate (e.g. sum(x) OVER w - x for EXCLUDE CURRENT ROW); for min/max restructure with two frames or a self-join",
    raw"(?i)\bWITH\s+RECURSIVE\b".r ->
      "this WITH RECURSIVE shape couldn't be parsed — standard linear-recursion CTEs run natively on Spark 4; for transitive-closure / reachability shapes graft's iterative connected-components operator (graft.functions.Dedup.connectedComponents: path doubling, O(log diameter) rounds) is the scale path; bounded-depth recursion can be unrolled with UNION ALL",
    // DuckDB bracket slicing `l[begin:end]` is normally auto-rewritten
    // (GraftSqlParser.rewriteSlice → graft_bracket_slice); this hint
    // fires only for shapes the backward base-expression scan could not
    // claim. Scanned on the quote-MASKED text, so a ':' inside a map
    // key string never matches.
    raw"\[[^\]']*:[^\]]*\]".r ->
      "this list[begin:end] slice shape couldn't be auto-rewritten — use the registered list_slice(l, begin, end) (1-based inclusive, DuckDB semantics) or Spark's slice(l, start, length); open ends: 1 / size(l), negatives: size(l)+1+n",
    // QUALIFY is normally rewritten automatically (GraftSqlParser.
    // rewriteQualify) — this hint is the fallback for shapes the rewrite
    // could not handle (e.g. a parse failure after rewriting).
    raw"(?i)\bQUALIFY\b".r ->
      "this QUALIFY shape couldn't be auto-rewritten — compute the window column in a subquery and filter it outside: SELECT * FROM (SELECT ..., row_number() OVER (...) AS rn FROM t) WHERE rn = 1",
    // plain n% / n ROWS, seeded bernoulli/system percentages,
    // reservoir(n ROWS) and (r16) percentage reservoir(n%) forms all
    // execute; this hint fires only for leftover method specs
    raw"(?i)\bUSING\s+SAMPLE\b".r ->
      "this USING SAMPLE form couldn't be auto-rewritten — use n% / n ROWS / reservoir(n ROWS) / reservoir(n%), or TABLESAMPLE: SELECT ... FROM t TABLESAMPLE (10 PERCENT) or TABLESAMPLE (100 ROWS)",
    // BIT / TIMETZ are DuckDB-only types (sweep-8 exclusion table,
    // COVERAGE.md): a '::BIT' cast fails Spark's parser — name the
    // missing type instead of a bare ANTLR error
    raw"(?i)::\s*BIT\b|\bAS\s+BIT\s*\)".r ->
      "Spark has no BIT (bitstring) type — keep bit sets in BIGINT (getbit/bitwise ops) or BOOLEAN arrays",
    raw"(?i)::\s*TIMETZ\b|\bAS\s+TIMETZ\s*\)|\bTIMETZ\s*'".r ->
      "Spark has no TIMETZ type — store TIME (supported since r15) plus a separate UTC-offset column",
    // DuckDB's SUMMARIZE statement (per-column stats of a relation) —
    // graft `sql` stages execute it (GraftSqlParser.summarize, one
    // single-pass aggregate with DuckDB's exact output shape); this
    // hint fires only OUTSIDE a sql stage, where plain spark.sql can't
    // return the custom relation
    raw"(?is)^\s*SUMMARIZE\b".r ->
      "DuckDB's SUMMARIZE runs inside graft sql stages (per-column stats, DuckDB's output shape); in plain Spark SQL use DESCRIBE table for schema, per-column aggregates, or the Dataset API df.summary()",
    // DISTINCT ON is normally rewritten automatically (GraftSqlParser.
    // rewriteDistinctOn → QUALIFY); this hint fires if a shape slipped
    // past the rewrite and Spark's parser rejected it
    raw"(?i)\bDISTINCT\s+ON\s*\(".r ->
      "this DISTINCT ON shape couldn't be auto-rewritten — use row_number(): SELECT ... FROM (SELECT *, row_number() OVER (PARTITION BY keys ORDER BY ord) AS rn FROM t) WHERE rn = 1",
    // `* REPLACE (...)` is expanded in sql stages (schema in hand); this
    // hint fires outside a sql stage, where no schema is available. The
    // select-item context guard keeps multiplication by the string
    // function replace() (`a * replace(b, 'x', 'y')`) from matching.
    raw"(?i)(?:\bSELECT\s+|[,(]\s*)\*\s*(?:(?:EXCLUDE|EXCEPT)\s*\([^)]*\)\s*)?REPLACE\s*\(".r ->
      "DuckDB's * REPLACE (expr AS col) isn't Spark SQL — in a graft sql stage it expands against the stage schema; elsewhere list the columns, substituting the replaced expressions",
    // bare COLUMNS('regex')/COLUMNS(*) and one-function wraps are
    // expanded in sql stages (schema in hand); this hint fires for
    // lambda/arithmetic forms or COLUMNS outside a sql stage
    raw"(?i)\bCOLUMNS\s*\(".r ->
      "this COLUMNS(...) shape isn't expandable (bare regex, *, fn() wraps and boolean name-lambdas — LIKE/SIMILAR TO/IN/=/<> with AND/OR/NOT, len()/lower()/upper() of the variable — do expand) — list the columns, or use * EXCEPT(...) / * EXCLUDE(...) to subtract",
    // DuckDB's top-level PIVOT/UNPIVOT STATEMENTS (`PIVOT t ON col`) —
    // keyword followed by a relation name; Spark's own clause forms
    // (`FROM t PIVOT (agg FOR col IN (...))`, keyword followed by '(')
    // parse fine and never reach these hints (q47 uses one)
    raw"(?i)\bPIVOT\s+[A-Za-z_`]".r ->
      "DuckDB's PIVOT statement (PIVOT t ON col [USING agg]) isn't Spark SQL — use Spark's pivot clause with the values listed explicitly: SELECT * FROM t PIVOT (agg(expr) FOR col IN ('v1', 'v2'))",
    raw"(?i)\bUNPIVOT\s+[A-Za-z_`]".r ->
      "DuckDB's UNPIVOT statement (UNPIVOT t ON cols INTO NAME n VALUE v) isn't Spark SQL — use Spark's unpivot clause: SELECT * FROM t UNPIVOT (v FOR n IN (c1, c2)), or stack(): SELECT stack(2, 'c1', c1, 'c2', c2) AS (n, v) FROM t",
    // DuckDB CREATE MACRO runs inside graft sql stages (VERDICT r8
    // missing #4: GraftSqlParser.registerMacro/expandMacros — scalar
    // and AS TABLE forms, default params, multi-statement batches);
    // this hint fires only OUTSIDE a sql stage, where plain spark.sql
    // has no macro registry. Must precede the `:=` hint: macros
    // commonly carry default parameters (a := 1), and the macro-level
    // message is the useful one.
    raw"(?i)\bCREATE\s+(OR\s+REPLACE\s+)?(TEMP(ORARY)?\s+)?MACRO\b".r ->
      "DuckDB CREATE MACRO runs inside graft sql stages (CREATE MACRO f(a, n := 1) AS expr | AS TABLE query; registered per session, expanded at later call sites); in plain Spark SQL use SQL UDFs (CREATE TEMPORARY FUNCTION f(x INT) RETURNS INT RETURN x + 1) or TEMP VIEWs for table macros",
    // DuckDB database-file statements — the engine's storage model is
    // parquet/csv directories, not a .db file; EXPORT/IMPORT DATABASE,
    // CHECKPOINT (r14) and ATTACH/DETACH of EXPORT-DATABASE directories
    // (r15) all EXECUTE as SqlStage routes; this hint fires only for
    // the shapes those routes don't claim (a .db storage file)
    raw"(?i)^\s*ATTACH\b".r ->
      "graft's ATTACH mounts EXPORT DATABASE directories (ATTACH 'dir' AS alias, then alias.tbl), not .db storage files — EXPORT DATABASE the source first, or read the data files directly (read_parquet/read_csv_auto, Sources loaders)",
    raw":=".r ->
      "named-argument syntax (a := 1) isn't Spark SQL — struct_pack(a := 1) becomes named_struct('a', 1)",
    raw"(?i)\[\s*[\w.]+\s+for\s+\w+\s+in\b".r ->
      "this list-comprehension shape couldn't be rewritten — [expr FOR x IN list [IF cond]] auto-rewrites to list_transform/list_filter (r10); for anything fancier use transform(list, x -> expr) and filter(list, x -> pred) directly",
    raw"->>".r ->
      "this ->> JSON chain couldn't be rewritten — j [-> 'k']* ->> 'k' auto-rewrites to get_json_object (r10); for quoted/complex keys or JSON-typed intermediate results use get_json_object(col, '$.path') or from_json with a schema",
    raw"(?i)(?<![\w.])\d+\s*//\s*\d+".r ->
      "this // division shape couldn't be rewritten — a // b auto-rewrites to graft's native DuckDiv (r10: integer truncating division, double division on fractional inputs); write a div b or floor(a / b) directly for anything fancier",
    raw"\*\*".r ->
      "this ** exponent shape couldn't be rewritten — a ** b auto-rewrites to power(a, b) (r10); note ^ is bitwise XOR in Spark, not exponent",
    // quantified comparisons parse in DuckDB but not Spark; the
    // aggregate rewrite is the standard route (NULL semantics differ
    // from the aggregate form only when the subquery yields NULLs)
    // quantified comparisons EXECUTE since r14 (rewriteQuantified) for
    // identifier/number/call/parenthesized left operands; this trap
    // names the remaining unclaimed operand shapes
    raw"(?i)[<>=!]=?\s*(ALL|ANY|SOME)\s*\(\s*SELECT\b".r ->
      "this quantified comparison's LEFT OPERAND shape isn't claimed (supported: column/number/function-call/parenthesized) — wrap the operand in parentheses, or rewrite with an aggregate (x > (SELECT max(...)) for > ALL)"
  )

  /** Enrich a failed `sql`-stage error with the dialect hint, if one of
    * the known DuckDB-isms is present. `masked` must be the
    * string-literal-masked SQL (GraftSqlParser.maskQuotes) so literals
    * can't false-positive.
    */
  def hintFor(masked: String): Option[String] =
    constructHints.collectFirst { case (re, hint) if re.findFirstIn(masked).isDefined => hint }

  /** Raise on constructs Spark would silently misparse (ASOF/POSITIONAL
    * joins). Run on the masked SQL BEFORE handing it to spark.sql.
    */
  def rejectSilentTraps(masked: String): Unit =
    silentTrapHints.foreach { case (re, hint) =>
      if (re.findFirstIn(masked).isDefined)
        throw new DuckDialectException(s"DuckDB-dialect construct in sql stage: $hint")
    }

  /** Unresolved-function hint: Spark 4 reports UNRESOLVED_ROUTINE with
    * the name backtick-quoted in the message.
    */
  def fnHintFor(errorMessage: String): Option[String] = {
    val lower = errorMessage.toLowerCase
    fnHints.collectFirst {
      case (fn, hint) if lower.contains(s"`$fn`") => s"DuckDB's $fn: $hint"
    }
  }
}
