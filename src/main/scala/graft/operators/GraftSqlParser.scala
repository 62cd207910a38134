package graft.operators

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Dialect shim as a real parser extension (SURVEY §7 step 3 "v2"):
  * DuckDB's `SELECT * EXCLUDE(a, b)` star modifier is rewritten to
  * Spark's native `* EXCEPT (a, b)` before delegating to the stock
  * parser — so the construct works anywhere in a statement (subqueries,
  * CTEs), not just at the outer projection like the string shim in
  * [[SqlStage]]. Installed by [[graft.functions.expressions.GraftExtensions]]
  * via injectParser.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private def rewrite(sql: String): String = GraftSqlParser.rewriteAll(sql)

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.withDialectHint(sqlText)(delegate.parsePlan(rewrite(sqlText)))
  override def parseQuery(sqlText: String): LogicalPlan =
    GraftSqlParser.withDialectHint(sqlText)(delegate.parseQuery(rewrite(sqlText)))
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** All DuckDB-dialect text rewrites in one call, the order chosen so
    * later rewrites see earlier output: EXCLUDE → EXCEPT, struct_pack
    * named args, QUALIFY → ranked subquery, USING SAMPLE → TABLESAMPLE.
    */
  def rewriteAll(sql: String): String =
    rewriteSample(rewriteQualify(rewriteStructPack(rewriteExclude(sql))))

  private val ExcludeRe = raw"(?is)\*\s+EXCLUDE\s*\(([^)]*)\)".r

  /** Rewrite every `* EXCLUDE(a, b)` into native `* EXCEPT (a, b)` —
    * matching against a copy with string-literal contents masked, so a
    * literal like `'* EXCLUDE(a)'` inside the query is never touched.
    * (A `)` inside a quoted column name within the EXCLUDE list remains
    * unsupported — document as a dialect edge.)
    */
  def rewriteExclude(sql: String): String = {
    val ms = ExcludeRe.findAllMatchIn(maskQuotes(sql)).toList
    if (ms.isEmpty) sql
    else {
      val sb = new StringBuilder
      var last = 0
      for (m <- ms) {
        sb.append(sql.substring(last, m.start))
        sb.append("* EXCEPT (").append(sql.substring(m.start(1), m.end(1))).append(")")
        last = m.end
      }
      sb.append(sql.substring(last))
      sb.toString
    }
  }

  private val QualifyRe = raw"(?i)\bQUALIFY\b".r

  /** Rewrite DuckDB/Snowflake `QUALIFY <pred>` (VERDICT r5 #6) into the
    * ranked-subquery form Spark understands. Two shapes:
    *
    *  - window-free predicate (the common `QUALIFY rn = 1` over a
    *    SELECT-list alias): the block wraps —
    *    `SELECT * FROM (<block sans QUALIFY>) WHERE (<pred>)`;
    *  - inline window (`QUALIFY row_number() OVER (...) = 1`): the
    *    predicate is computed as a `__graft_qualify` column inside the
    *    block (where window functions are legal), filtered outside, and
    *    dropped via `* EXCEPT` — window evaluation order (after
    *    WHERE/GROUP/HAVING, over the block's input rows) is preserved.
    *
    * Scanning runs on the string-literal-masked copy at the QUALIFY's
    * own paren depth, so subqueries, CTEs and a trailing ORDER BY/LIMIT
    * (which stays outside the wrap) are handled; a bare identifier
    * spelled `qualify` (column/alias position) is left alone via a
    * neighbor-token heuristic. Documented edges: QUALIFY + DISTINCT
    * with an inline window raises (the rewrite would change DISTINCT's
    * input), and a predicate referencing columns the SELECT list drops
    * fails analysis as unresolved.
    */
  def rewriteQualify(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = QualifyRe.findAllMatchIn(masked).find(m => isQualifyClause(masked, m.start, m.end))
    m match {
      case None => sql
      case Some(q) => rewriteQualify(rewriteOneQualify(sql, masked, q.start, q.end))
    }
  }

  /** Heuristic: a QUALIFY token in identifier position (right after
    * SELECT/comma/operator, or followed by an operator/comma/close)
    * is a column named "qualify", not the clause.
    */
  private def isQualifyClause(masked: String, start: Int, end: Int): Boolean = {
    val opChars = ",(.=<>+-*/|&".toSet
    val prevIdx = (start - 1 to 0 by -1).find(i => !masked.charAt(i).isWhitespace)
    val prevOk = prevIdx match {
      case None => false // query can't start with QUALIFY
      case Some(i) if opChars.contains(masked.charAt(i)) => false
      case Some(i) =>
        val w = wordEndingAt(masked, i)
        !Set("SELECT", "DISTINCT", "ALL", "BY", "AS", "ON", "AND", "OR", "NOT",
          "WHERE", "WHEN", "THEN", "ELSE", "CASE", "FROM", "JOIN").contains(w)
    }
    val nextIdx = (end until masked.length).find(i => !masked.charAt(i).isWhitespace)
    val nextOk = nextIdx match {
      case None => false // trailing identifier
      case Some(i) => !",.)=<>+-*/|&".toSet.contains(masked.charAt(i))
    }
    prevOk && nextOk
  }

  private def wordEndingAt(s: String, last: Int): String = {
    if (!s.charAt(last).isLetter) return ""
    var b = last
    while (b > 0 && (s.charAt(b - 1).isLetterOrDigit || s.charAt(b - 1) == '_')) b -= 1
    s.substring(b, last + 1).toUpperCase
  }

  private def wordStartingAt(s: String, first: Int): String = {
    var e = first
    while (e < s.length && (s.charAt(e).isLetterOrDigit || s.charAt(e) == '_')) e += 1
    s.substring(first, e).toUpperCase
  }

  private def rewriteOneQualify(sql: String, masked: String, qStart: Int, qEnd: Int): String = {
    // block start = position after the '(' enclosing the QUALIFY (or 0)
    val stack = scala.collection.mutable.Stack[Int]()
    var i = 0
    while (i < qStart) {
      masked.charAt(i) match {
        case '(' => stack.push(i + 1)
        case ')' => if (stack.nonEmpty) stack.pop()
        case _ =>
      }
      i += 1
    }
    val blockStart = if (stack.isEmpty) 0 else stack.top
    // predicate runs to the next same-depth clause terminator / ')'
    val terminators = Set("ORDER", "LIMIT", "OFFSET", "WINDOW", "UNION", "INTERSECT", "EXCEPT", "MINUS")
    var predEnd = masked.length
    var dd = 0
    i = qEnd
    var scanning = true
    while (i < masked.length && scanning) {
      val c = masked.charAt(i)
      if (c == '(') { dd += 1; i += 1 }
      else if (c == ')') {
        if (dd == 0) { predEnd = i; scanning = false } else { dd -= 1; i += 1 }
      } else if (dd == 0 && c.isLetter &&
        (i == 0 || (!masked.charAt(i - 1).isLetterOrDigit && masked.charAt(i - 1) != '_'))) {
        val w = wordStartingAt(masked, i)
        if (terminators.contains(w)) { predEnd = i; scanning = false }
        else i += math.max(w.length, 1)
      } else i += 1
    }
    val pred = sql.substring(qEnd, predEnd).trim
    val head = sql.substring(blockStart, qStart).trim
    if (pred.isEmpty)
      throw new graft.functions.expressions.DuckDialectException(
        "QUALIFY with an empty predicate")
    val maskedPred = masked.substring(qEnd, predEnd)
    val hasWindow = raw"(?i)\bOVER\b".r.findFirstIn(maskedPred).isDefined
    val replacement =
      if (!hasWindow) s"SELECT * FROM ( $head ) WHERE ( $pred ) "
      else {
        if (raw"(?is)^\s*SELECT\s+DISTINCT\b".r
            .findFirstIn(masked.substring(blockStart, qStart)).isDefined)
          throw new graft.functions.expressions.DuckDialectException(
            "QUALIFY with an inline window over SELECT DISTINCT has no mechanical " +
              "rewrite (the window must run before DISTINCT) — compute the window " +
              "column in a subquery, filter, then SELECT DISTINCT outside")
        // inject the predicate as a column before the block's own FROM
        var j = blockStart
        var df = 0
        var fromPos = -1
        while (j < qStart && fromPos < 0) {
          val c = masked.charAt(j)
          if (c == '(') df += 1
          else if (c == ')') df -= 1
          else if (df == 0 && c.isLetter &&
            (j == 0 || (!masked.charAt(j - 1).isLetterOrDigit && masked.charAt(j - 1) != '_'))) {
            val w = wordStartingAt(masked, j)
            if (w == "FROM") fromPos = j
            else j += math.max(w.length, 1) - 1
          }
          j += 1
        }
        if (fromPos < 0)
          throw new graft.functions.expressions.DuckDialectException(
            "QUALIFY: could not locate the block's FROM clause for the window rewrite")
        val head2 = sql.substring(blockStart, fromPos) +
          s", ( $pred ) AS __graft_qualify " + sql.substring(fromPos, qStart)
        s"SELECT * EXCEPT (__graft_qualify) FROM ( $head2 ) WHERE __graft_qualify "
      }
    sql.substring(0, blockStart) + replacement + sql.substring(predEnd)
  }

  private val StructPackRe = raw"(?i)\bstruct_pack\s*\(".r

  /** Rewrite DuckDB `struct_pack(a := 1, b := x)` into Spark
    * `named_struct('a', 1, 'b', x)`: the function name maps directly and
    * each named argument `ident :=` becomes the quoted-name element
    * `'ident',`. Scoped to the struct_pack(...) span (paren-matched on
    * the literal-masked copy), so `:=` anywhere else still raises the
    * guided named-argument error instead of being silently mangled.
    */
  def rewriteStructPack(sql: String): String = {
    val masked = maskQuotes(sql)
    StructPackRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) =>
        // matching close paren of the argument list
        var i = m.end
        var d = 1
        while (i < masked.length && d > 0) {
          masked.charAt(i) match {
            case '(' => d += 1
            case ')' => d -= 1
            case _ =>
          }
          i += 1
        }
        if (d != 0) sql // unbalanced — leave for the parser to report
        else {
          val inner = sql.substring(m.end, i - 1)
          val innerMasked = masked.substring(m.end, i - 1)
          // replace ident := at THIS call's top level only (depth 0 in
          // the span) — a nested struct_pack is handled by recursion
          val argRe = raw"(?s)([A-Za-z_][A-Za-z_0-9]*)\s*:=".r
          val sb = new StringBuilder
          var last = 0
          for (am <- argRe.findAllMatchIn(innerMasked)) {
            val depth = innerMasked.substring(0, am.start)
              .count(_ == '(') - innerMasked.substring(0, am.start).count(_ == ')')
            if (depth == 0) {
              sb.append(inner.substring(last, am.start))
              sb.append("'").append(am.group(1)).append("',")
              last = am.end
            }
          }
          sb.append(inner.substring(last))
          val rewritten = sql.substring(0, m.start) + "named_struct(" +
            sb.toString + sql.substring(i - 1)
          rewriteStructPack(rewritten)
        }
    }
  }

  private val SampleRe =
    raw"(?i)\bUSING\s+SAMPLE\s+(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS\b)?".r

  /** Rewrite DuckDB `USING SAMPLE n% / n PERCENT / n [ROWS]` into Spark
    * `TABLESAMPLE`, wrapping the block so the sample applies AFTER the
    * block's WHERE — DuckDB's documented semantics, and the opposite of
    * raw TABLESAMPLE (which samples the table before filters):
    * `SELECT * FROM ( <block sans sample> ) TABLESAMPLE (spec)`.
    * Method forms (`reservoir(...)`, `(bernoulli)`) keep the guided
    * error — Spark's sampler is Bernoulli and pretending otherwise
    * would silently change statistics.
    */
  def rewriteSample(sql: String): String = {
    val masked = maskQuotes(sql)
    SampleRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) =>
        // a method suffix like 'reservoir(' or '(system)' → not rewritten
        val after = masked.substring(m.end).dropWhile(_.isWhitespace)
        if (after.startsWith("(") || raw"(?i)^[a-z_]+\s*\(".r.findFirstIn(after).isDefined)
          return sql
        val spec = m.group(2) match {
          case s if s != null && (s == "%" || s.equalsIgnoreCase("percent")) =>
            s"${m.group(1)} PERCENT"
          case _ => s"${m.group(1)} ROWS"
        }
        // block start (same scan as QUALIFY)
        val stack = scala.collection.mutable.Stack[Int]()
        var i = 0
        while (i < m.start) {
          masked.charAt(i) match {
            case '(' => stack.push(i + 1)
            case ')' => if (stack.nonEmpty) stack.pop()
            case _ =>
          }
          i += 1
        }
        val blockStart = if (stack.isEmpty) 0 else stack.top
        val head = sql.substring(blockStart, m.start).trim
        rewriteSample(sql.substring(0, blockStart) +
          s"SELECT * FROM ( $head ) TABLESAMPLE ($spec) " + sql.substring(m.end))
    }
  }

  private val ColumnsRe = raw"(?i)\bCOLUMNS\s*\(".r

  /** Expand DuckDB's `COLUMNS(...)` star pattern against a KNOWN schema
    * — callable only where the input columns are at hand (SqlStage; the
    * parser extension has no schema and leaves the construct to the
    * guided error). Supported shapes:
    *
    *  - bare `COLUMNS('regex')` / `COLUMNS(*)` in a select list → the
    *    matching columns, original names (regex is RE2-style SEARCH
    *    over the column name, like DuckDB's);
    *  - one wrapping call `fn(COLUMNS(...))` → `fn(c) AS `fn(c)`` per
    *    matching column (DuckDB names these `fn(t.c)`; the table
    *    prefix is dropped here).
    *
    * Lambda forms (`COLUMNS(c -> ...)`) and arithmetic over the
    * expansion keep the guided error. A pattern matching zero columns
    * raises, naming the available columns.
    */
  def rewriteColumns(sql: String, cols: Seq[String]): String = {
    val masked = maskQuotes(sql)
    ColumnsRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) =>
        // close paren of COLUMNS(...)
        var i = m.end
        var d = 1
        while (i < masked.length && d > 0) {
          masked.charAt(i) match {
            case '(' => d += 1
            case ')' => d -= 1
            case _ =>
          }
          i += 1
        }
        if (d > 0) return sql // unbalanced — let the parser report it
        val argRaw = sql.substring(m.end, i - 1).trim
        val matched: Seq[String] =
          if (argRaw == "*") cols
          else if (argRaw.length >= 2 && (argRaw.head == '\'' || argRaw.head == '"')
            && argRaw.last == argRaw.head) {
            val re = argRaw.substring(1, argRaw.length - 1).r
            cols.filter(c => re.findFirstIn(c).isDefined)
          } else return sql // lambda / computed arg → guided error path
        if (matched.isEmpty)
          throw new graft.functions.expressions.DuckDialectException(
            s"COLUMNS($argRaw) matches no column of [${cols.mkString(", ")}]")
        // wrapping single function call? fn ( COLUMNS(...) )
        val beforeIdx = (m.start - 1 to 0 by -1).find(j => !masked.charAt(j).isWhitespace)
        val wrap = beforeIdx.filter(j => masked.charAt(j) == '(').flatMap { open =>
          val fnEnd = (open - 1 to 0 by -1).find(j => !masked.charAt(j).isWhitespace)
          fnEnd.flatMap { fe =>
            val fn = wordEndingAt(masked, fe)
            val afterIdx = (i until masked.length).find(j => !masked.charAt(j).isWhitespace)
            (fn, afterIdx) match {
              case (f, Some(close)) if f.nonEmpty && masked.charAt(close) == ')' &&
                !Set("AND", "OR", "NOT", "WHERE", "ON", "IN", "SELECT", "FROM").contains(f) =>
                Some((fe - f.length + 1, close, f))
              case _ => None
            }
          }
        }
        val rewritten = wrap match {
          case Some((fnStart, close, _)) =>
            val fnName = sql.substring(fnStart, sql.indexOf('(', fnStart)).trim
            val expansion = matched
              .map(c => s"$fnName(`$c`) AS `$fnName($c)`").mkString(", ")
            sql.substring(0, fnStart) + expansion + sql.substring(close + 1)
          case None =>
            val expansion = matched.map(c => s"`$c`").mkString(", ")
            sql.substring(0, m.start) + expansion + sql.substring(i)
        }
        rewriteColumns(rewritten, cols)
    }
  }

  /** Run a parse, converting a bare ANTLR failure on a known DuckDB-ism
    * into a [[graft.functions.expressions.DuckDialectException]] that
    * names the construct and its Spark equivalent (VERDICT r4 #1 —
    * reference O12 hands user SQL to DuckDB verbatim, so migrating
    * configs may carry any DuckDB syntax).
    */
  def withDialectHint[A](sql: String)(parse: => A): A =
    try parse
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        graft.functions.expressions.DuckDialect.hintFor(maskQuotes(sql)) match {
          case Some(hint) => throw new graft.functions.expressions.DuckDialectException(
            s"DuckDB-dialect construct in sql stage: $hint", e)
          case None => throw e
        }
    }

  /** Replace the contents of single-quoted literals with '_' in place
    * (positions preserved; '' escapes handled).
    */
  private[graft] def maskQuotes(s: String): String = {
    val a = s.toCharArray
    var i = 0
    var inQ = false
    while (i < a.length) {
      val c = a(i)
      if (inQ) {
        if (c == '\'') {
          if (i + 1 < a.length && a(i + 1) == '\'') { a(i) = '_'; a(i + 1) = '_'; i += 1 }
          else inQ = false
        } else a(i) = '_'
      } else if (c == '\'') inQ = true
      i += 1
    }
    new String(a)
  }
}
