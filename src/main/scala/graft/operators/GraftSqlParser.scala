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
    * later rewrites see earlier output: POSITIONAL JOIN → indexed full
    * outer join, ASOF JOIN → validity-interval join, EXCLUDE → EXCEPT,
    * struct_pack named args, DISTINCT ON → QUALIFY (which the next
    * rewrite then lowers), QUALIFY → ranked subquery, USING SAMPLE →
    * TABLESAMPLE.
    */
  def rewriteAll(sql: String,
      resolve: String => Option[Seq[String]] = _ => None): String =
    // the outer rename wrap re-applies the idempotent fn renames to
    // text REWRITTEN BY rewriteDotCall (x.log() emits log(x), which the
    // inner rename pass has already run past). `resolve` (relation →
    // columns, session-backed where the caller has one) feeds the
    // grouping-alias shadowing check only.
    rewriteGroupingAliases(resolve = resolve, depth = 0, sql = rewriteDateDiffFn(rewriteRegexpReplaceFn(rewriteLogFn(
    rewriteDotCall(rewriteMixedIntervalFrame(rewriteFrameExclude(rewriteNamedWindows(rewriteDateDiffFn(rewriteRegexpReplaceFn(rewriteExtractEpoch(rewriteFormatFn(rewritePrintfFn(rewriteIgnoreNulls(rewriteAggOrderBy(rewriteSample(rewriteQuantified(rewriteQualify(
      rewriteDistinctOn(rewriteStructPack(rewriteStructInsert(
        rewriteExclude(rewriteAsof(rewritePositional(rewriteSubscript(rewriteSlice(
          rewriteGlob(rewriteSimilarTo(rewriteDecimalDivLiterals(rewriteIntDiv(rewritePow(rewriteCaret(rewriteLogFn(rewriteFilterOver(rewriteJsonOps(rewriteJsonExtractFns(rewriteIntegralCastRound(rewriteBlobType(
            rewriteListLiteral(rewriteStructLiteral(rewriteComprehension(
              rewriteFromFirst(rewriteRawLiterals(sql)))))))))))))))))))))))))))))))))))))))))))

  /** DuckDB single-quoted string literals are RAW — no backslash
    * escapes (`'\d'` is backslash-d) — while Spark's parser unescapes
    * them (`'\d'` reaches the plan as `d`, `'\2'` as an octal char):
    * any regex or backref literal in passthrough SQL silently changes
    * meaning. Running FIRST in the rewrite chain, this doubles every
    * backslash inside single-quoted literals, so Spark's unescape
    * reproduces exactly the DuckDB-raw characters. Invariant for the
    * later rewrites: a literal's TEXT is the Spark-escaped form of the
    * raw original — rewrites that move literal text verbatim stay
    * correct; only one (GLOB) interprets backslashes inside literal
    * content, where glob patterns don't carry them in practice.
    * Comments and quote-doubling (`''`) are tracked like maskQuotes.
    */
  def rewriteRawLiterals(sql: String): String = {
    if (sql.indexOf('\\') < 0) return sql
    val sb = new java.lang.StringBuilder(sql.length + 16)
    var i = 0
    var inQ = false
    var inLine = false
    var inBlock = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      val next = if (i + 1 < sql.length) sql.charAt(i + 1) else '\u0000'
      if (inQ) {
        if (c == '\\') { sb.append("\\\\"); i += 1 }
        else if (c == '\'' && next == '\'') { sb.append("''"); i += 2 }
        else {
          if (c == '\'') inQ = false
          sb.append(c); i += 1
        }
      } else if (inLine) {
        if (c == '\n' || c == '\r') inLine = false
        sb.append(c); i += 1
      } else if (inBlock) {
        if (c == '*' && next == '/') { sb.append("*/"); inBlock = false; i += 2 }
        else { sb.append(c); i += 1 }
      } else if (c == '-' && next == '-') { sb.append("--"); inLine = true; i += 2 }
      else if (c == '/' && next == '*') { sb.append("/*"); inBlock = true; i += 2 }
      else {
        if (c == '\'') inQ = true
        sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private val FrameExcludeRe =
    raw"(?is)\s*EXCLUDE\s+(CURRENT\s+ROW|NO\s+OTHERS|GROUP|TIES)\s*\)".r

  private def frameExcludeFail(why: String): Nothing =
    throw new graft.functions.expressions.DuckDialectException(
      s"window frame EXCLUDE couldn't be auto-rewritten ($why) — EXCLUDE " +
        "CURRENT ROW is translated for sum/count/avg over an inline OVER " +
        "(the subtraction identity: full-frame aggregate minus the current " +
        "row's contribution), EXCLUDE GROUP/TIES for RANGE frames and " +
        "ROWS UNBOUNDED-both (peer group fully contained there, computed " +
        "via RANGE BETWEEN CURRENT ROW AND CURRENT ROW); for min/max " +
        "restructure with two frames or a self-join, for narrow ROWS " +
        "frames the peer group is only partially in-frame — use RANGE")

  /** DuckDB window frames support an exclusion clause Spark's don't.
    * `EXCLUDE NO OTHERS` is the default — dropped. `EXCLUDE CURRENT
    * ROW` over `sum`/`count`/`avg` rewrites to the exact subtraction
    * identity (probed duckdb 1.0.0: empty-after-exclusion sum is NULL,
    * count is 0, the identity holds through RANGE peer frames since
    * only the row itself is removed); when the frame provably cannot
    * CONTAIN the current row (both bounds PRECEDING or both FOLLOWING)
    * the exclusion is a no-op and the clause is simply dropped (probed).
    * `EXCLUDE GROUP`/`TIES` subtract the PEER-GROUP aggregate (the
    * `RANGE BETWEEN CURRENT ROW AND CURRENT ROW` window) — sound
    * exactly when the frame fully contains the peer group: any RANGE
    * frame containing offset 0, or ROWS UNBOUNDED-both (probed: a
    * narrow ROWS frame excludes only frame∩peers, NOT the identity,
    * so those keep the guided error). Other aggregates error.
    */
  private val QuantOpRe =
    raw"(?i)(=|<>|!=|<=|>=|<|>)\s*(ALL|ANY|SOME)\s*\(".r

  /** Execute quantified comparisons (r14): `x op ALL/ANY/SOME
    * (subquery)` lowers to Spark-expressible forms with DuckDB's exact
    * 3VL (probed 1.0.0): `= ANY` → IN, `<>/!= ALL` → NOT IN (identical
    * 3VL natively), and the ordered/remaining forms → a CASE over
    * aggregate scalar subqueries — empty set → TRUE (ALL) / FALSE
    * (ANY) even for a NULL operand; a counterexample/witness decides
    * even when NULLs are present; otherwise NULLs in the set or a NULL
    * operand → NULL. The subquery text is spliced into up to three
    * scalar subqueries — fine for the claimed (deterministic,
    * uncorrelated-or-Spark-supported) surface; a correlated shape
    * Spark can't plan fails loudly in analysis. Claimed left operands:
    * identifiers/qualified names/numbers/function calls/parenthesized
    * expressions — anything else keeps the guided error.
    */
  def rewriteQuantified(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = QuantOpRe.findAllMatchIn(masked).find { mm =>
      // require a subquery head inside the paren
      raw"(?is)^\s*(SELECT|WITH|FROM)\b".r
        .findFirstIn(masked.substring(mm.end)).isDefined
    }.getOrElse(return sql)
    // subquery extent: balance from the open paren at m.end - 1
    var d = 1
    var i = m.end
    while (i < masked.length && d > 0) {
      masked.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      i += 1
    }
    if (d != 0) return sql
    val subq = sql.substring(m.end, i - 1).trim
    // left operand extent (backward scan)
    var ls = m.start - 1
    while (ls >= 0 && masked.charAt(ls).isWhitespace) ls -= 1
    if (ls < 0) return sql
    def identStart(k0: Int): Int = {
      var k = k0
      while (k >= 0 && (masked.charAt(k).isLetterOrDigit ||
        masked.charAt(k) == '_' || masked.charAt(k) == '.')) k -= 1
      k + 1
    }
    val leftStart: Int =
      if (masked.charAt(ls) == ')') {
        var d2 = 1
        var k = ls - 1
        while (k >= 0 && d2 > 0) {
          masked.charAt(k) match {
            case ')' => d2 += 1
            case '(' => d2 -= 1
            case _ =>
          }
          if (d2 > 0) k -= 1
        }
        if (d2 != 0) return sql
        identStart(k - 1) // include a function-name chain, if any
      } else if (masked.charAt(ls).isLetterOrDigit || masked.charAt(ls) == '_') {
        identStart(ls)
      } else return sql // unsupported operand shape → guided error stays
    // The backward scan claims ONE term; if the char before it is an
    // expression-continuing operator (`a || b > ALL …`, `a + b > ALL …`)
    // the true left operand is the whole compound and claiming just `b`
    // would rewrite silently wrong (e.g. `a || (CASE …)` string-concats
    // a boolean). Those shapes keep the guided error.
    val beforeLeft: Int = {
      var p = leftStart - 1
      while (p >= 0 && masked.charAt(p).isWhitespace) p -= 1
      p
    }
    if (beforeLeft >= 0 && "|+-*/%^&<>=!~:".indexOf(masked.charAt(beforeLeft)) >= 0)
      return sql
    val x = sql.substring(leftStart, m.start).trim
    val op = m.group(1) match { case "!=" => "<>"; case o => o }
    val isAll = m.group(2).equalsIgnoreCase("ALL")
    def cnt(where: String = "") =
      s"(SELECT count(*) FROM ( $subq ) __graft_qa(__graft_qc)$where)"
    // ONE uncorrelated stats subquery, repeated VERBATIM per CASE branch
    // — the references canonicalize identically, so Spark's
    // ReuseSubquery executes the set scan ONCE (a 3-4× scan saving at
    // scale over per-branch count/extreme/null subqueries)
    val st = s"(SELECT named_struct('n', count(*), " +
      s"'nn', count(CASE WHEN __graft_qc IS NULL THEN 1 END), " +
      s"'mx', max(__graft_qc), 'mn', min(__graft_qc)) " +
      s"FROM ( $subq ) __graft_qa(__graft_qc))"
    val nEmpty = s"$st.n = 0"
    val nullCnt = s"$st.nn"
    val replacement = (op, isAll) match {
      // NOT the tempting IN/NOT IN mapping: Spark's IN-subquery outside
      // a WHERE collapses NULL to FALSE (probed), so the 3VL-exact CASE
      // runs everywhere
      // the equality witness WHERE stays a separate (possibly
      // correlated) count — Spark allows equality correlation in a
      // subquery WHERE but not inside aggregate expressions
      case ("=", false) =>
        s"(CASE WHEN $nEmpty THEN FALSE " +
          s"WHEN ${cnt(s" WHERE __graft_qc = ($x)")} > 0 THEN TRUE " +
          s"WHEN $nullCnt > 0 THEN NULL " +
          s"WHEN ($x) IS NULL THEN NULL ELSE FALSE END)"
      case ("<>", true) =>
        s"(CASE WHEN $nEmpty THEN TRUE " +
          s"WHEN ${cnt(s" WHERE __graft_qc = ($x)")} > 0 THEN FALSE " +
          s"WHEN $nullCnt > 0 THEN NULL " +
          s"WHEN ($x) IS NULL THEN NULL ELSE TRUE END)"
      case ("=", true) =>
        s"(CASE WHEN $nEmpty THEN TRUE " +
          s"WHEN ${cnt(s" WHERE __graft_qc <> ($x)")} > 0 THEN FALSE " +
          s"WHEN $nullCnt > 0 THEN NULL " +
          s"WHEN ($x) IS NULL THEN NULL ELSE TRUE END)"
      case ("<>", false) =>
        s"(CASE WHEN $nEmpty THEN FALSE " +
          s"WHEN ${cnt(s" WHERE __graft_qc <> ($x)")} > 0 THEN TRUE " +
          s"WHEN $nullCnt > 0 THEN NULL " +
          s"WHEN ($x) IS NULL THEN NULL ELSE FALSE END)"
      case (o, all) =>
        // ALL: counterexample against the adverse extreme; ANY: witness
        // against the favorable one
        val extSub = s"$st." + ((o.startsWith(">"), all) match {
          case (true, true) => "mx"
          case (true, false) => "mn"
          case (false, true) => "mn"
          case (false, false) => "mx"
        })
        if (all)
          s"(CASE WHEN $nEmpty THEN TRUE " +
            s"WHEN NOT (($x) $o $extSub) THEN FALSE " +
            s"WHEN $nullCnt > 0 THEN NULL " +
            s"WHEN ($x) IS NULL THEN NULL ELSE TRUE END)"
        else
          s"(CASE WHEN $nEmpty THEN FALSE " +
            s"WHEN ($x) $o $extSub THEN TRUE " +
            s"WHEN $nullCnt > 0 THEN NULL " +
            s"WHEN ($x) IS NULL THEN NULL ELSE FALSE END)"
    }
    rewriteQuantified(sql.substring(0, leftStart) + replacement + sql.substring(i))
  }

  /** Inline NAMED windows that carry a frame-EXCLUDE clause (r14):
    * `WINDOW w AS (spec … EXCLUDE x)` + `OVER w` becomes the inline
    * `OVER (spec … EXCLUDE x)` form [[rewriteFrameExclude]] already
    * lowers (subtraction identities). Only EXCLUDE-bearing definitions
    * inline — plain named windows stay on Spark's native WINDOW
    * clause. Claimed surface: independent definitions (`w2 AS (w1
    * …)` window inheritance is not claimed and fails loudly once the
    * clause is consumed).
    *
    * r16 (found by FuzzDiff): DuckDB also accepts a named-window
    * EXTENSION reference — `OVER (w ROWS BETWEEN …)` adds a frame to
    * the base definition — which Spark's grammar rejects (it parses
    * only `OVER w`, `OVER (w)` and full inline specs). Those
    * references inline the definition textually: `OVER ( <spec>
    * <extension> )`. Extensions carrying their own parens are not
    * claimed (none of the frame grammar needs them).
    */
  /** Parse the SELECT-level `WINDOW name AS ( … )[, …]` clause into
    * (name, spec) pairs — positions-free twin of the EXCLUDE flow's
    * inline parse, shared by the r16 extension-reference inlining.
    */
  private def namedWindowDefs(sql: String, masked: String): Seq[(String, String)] = {
    val wm = raw"(?i)\bWINDOW\s+".r.findAllMatchIn(masked).toSeq
      .find { m =>
        val before = masked.substring(0, m.start)
        !raw"(?i)(OVER|AS)\s*$$".r.findFirstIn(before).isDefined
      }.getOrElse(return Nil)
    var pos = wm.end
    val defs = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val DefHead = raw"(?is)^([A-Za-z_]\w*)\s+AS\s*\(".r
    var ok = true
    while (ok) {
      DefHead.findFirstMatchIn(masked.substring(pos)) match {
        case Some(dm) =>
          var d = 1
          var i = pos + dm.end
          while (i < masked.length && d > 0) {
            masked.charAt(i) match {
              case '(' => d += 1
              case ')' => d -= 1
              case _ =>
            }
            i += 1
          }
          if (d != 0) return Nil
          defs += ((dm.group(1), sql.substring(pos + dm.end, i - 1).trim))
          val rest = masked.substring(i)
          val comma = raw"^\s*,\s*".r.findFirstMatchIn(rest)
          if (comma.isDefined) pos = i + comma.get.end else ok = false
        case None => return defs.toSeq
      }
    }
    defs.toSeq
  }

  def rewriteNamedWindows(sql: String): String = {
    val masked0 = maskQuotes(sql)
    // named-window EXTENSION references: inline `OVER ( name ext )`
    // for every SELECT-level WINDOW definition
    if (raw"(?i)\bWINDOW\s+[A-Za-z_]\w*\s+AS\s*\(".r.findFirstIn(masked0).isDefined) {
      namedWindowDefs(sql, masked0).foreach { case (n, s) =>
        val extRe =
          (raw"(?is)\bOVER\s*\(\s*" + java.util.regex.Pattern.quote(n) +
            raw"\s+([^()]*[^()\s])\s*\)").r
        extRe.findFirstMatchIn(masked0).foreach { em =>
          val ext = sql.substring(em.start(1), em.end(1))
          return rewriteNamedWindows(sql.substring(0, em.start) +
            s"OVER ( $s $ext )" + sql.substring(em.end))
        }
      }
    }
    val masked = masked0
    if (raw"(?i)\bEXCLUDE\s+(CURRENT\s+ROW|GROUP|TIES)\b".r
        .findFirstIn(masked).isEmpty) return sql
    val wm = raw"(?i)\bWINDOW\s+".r.findAllMatchIn(masked).toSeq
      .find { m =>
        // the SELECT-level WINDOW clause, not a function named window
        val before = masked.substring(0, m.start)
        !raw"(?i)(OVER|AS)\s*$$".r.findFirstIn(before).isDefined
      }.getOrElse(return sql)
    // parse `name AS ( … ) [, name AS ( … )]*`
    var pos = wm.end
    val defs = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val DefHead = raw"(?is)^([A-Za-z_]\w*)\s+AS\s*\(".r
    var ok = true
    var clauseEnd = pos
    while (ok) {
      DefHead.findFirstMatchIn(masked.substring(pos)) match {
        case Some(dm) =>
          var d = 1
          var i = pos + dm.end
          while (i < masked.length && d > 0) {
            masked.charAt(i) match {
              case '(' => d += 1
              case ')' => d -= 1
              case _ =>
            }
            i += 1
          }
          if (d != 0) return sql // unbalanced — leave for Spark's parser
          defs += ((dm.group(1), sql.substring(pos + dm.end, i - 1).trim))
          clauseEnd = i
          val rest = masked.substring(i)
          val comma = raw"^\s*,\s*".r.findFirstMatchIn(rest)
          if (comma.isDefined) pos = i + comma.get.end else ok = false
        case None => return sql
      }
    }
    val (inlined, kept) = defs.partition(d =>
      raw"(?i)\bEXCLUDE\s+(CURRENT\s+ROW|GROUP|TIES|NO\s+OTHERS)\b".r
        .findFirstIn(maskQuotes(d._2)).isDefined)
    if (inlined.isEmpty) return sql
    val newClause =
      if (kept.isEmpty) ""
      else " WINDOW " + kept.map { case (n, s) => s"$n AS ($s)" }.mkString(", ") + " "
    var out = sql.substring(0, wm.start) + newClause + sql.substring(clauseEnd)
    inlined.foreach { case (n, s) =>
      out = raw"(?i)\bOVER\s+${java.util.regex.Pattern.quote(n)}\b".r
        .replaceAllIn(out,
          java.util.regex.Matcher.quoteReplacement(s"OVER ( $s )"))
    }
    rewriteNamedWindows(out)
  }

  private val MixedIntervalFrameRe =
    (raw"(?i)\bRANGE\s+BETWEEN\s+INTERVAL\s+'?(\d+)'?\s+" +
      raw"(DAY|HOUR|MINUTE|SECOND|YEAR|MONTH)S?\s+(PRECEDING|FOLLOWING)\s+" +
      raw"AND\s+INTERVAL\s+'?(\d+)'?\s+" +
      raw"(DAY|HOUR|MINUTE|SECOND|YEAR|MONTH)S?\s+(PRECEDING|FOLLOWING)").r

  /** DuckDB accepts window RANGE frames whose two INTERVAL bounds carry
    * DIFFERENT units (`RANGE BETWEEN INTERVAL 9 MINUTE PRECEDING AND
    * INTERVAL 2 HOUR FOLLOWING`); Spark types each bound by its unit
    * and rejects the pair (DATATYPE_MISMATCH.SPECIFIED_WINDOW_FRAME_
    * DIFF_TYPES — FuzzDiff r17 template 57, seed 1801). Normalize both
    * bounds of a mixed pair to one unit: day-time units to total
    * SECONDs, year-month units to total MONTHs — value-identical,
    * Spark-typable. A pair mixing the two interval CLASSES (month +
    * hour) is unrepresentable as one Spark bound type and stays loud.
    */
  def rewriteMixedIntervalFrame(sql: String): String = {
    val masked = maskQuotes(sql)
    val daySecs = Map("DAY" -> 86400L, "HOUR" -> 3600L, "MINUTE" -> 60L, "SECOND" -> 1L)
    val ymMonths = Map("YEAR" -> 12L, "MONTH" -> 1L)
    val sb = new StringBuilder
    var last = 0
    for (m <- MixedIntervalFrameRe.findAllMatchIn(masked)) {
      val (n1, u1, d1) = (m.group(1).toLong, m.group(2).toUpperCase, m.group(3).toUpperCase)
      val (n2, u2, d2) = (m.group(4).toLong, m.group(5).toUpperCase, m.group(6).toUpperCase)
      val repl: Option[String] =
        if (u1 == u2) None
        else if (daySecs.contains(u1) && daySecs.contains(u2))
          Some(s"RANGE BETWEEN INTERVAL '${n1 * daySecs(u1)}' SECOND $d1 " +
            s"AND INTERVAL '${n2 * daySecs(u2)}' SECOND $d2")
        else if (ymMonths.contains(u1) && ymMonths.contains(u2))
          Some(s"RANGE BETWEEN INTERVAL '${n1 * ymMonths(u1)}' MONTH $d1 " +
            s"AND INTERVAL '${n2 * ymMonths(u2)}' MONTH $d2")
        else None // class mix — no single Spark bound type; stays loud
      repl.foreach { r =>
        sb.append(sql.substring(last, m.start)).append(r)
        last = m.end
      }
    }
    if (last == 0) sql else { sb.append(sql.substring(last)); sb.toString }
  }

  def rewriteFrameExclude(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = FrameExcludeRe.findFirstMatchIn(masked).getOrElse(return sql)
    val mode = m.group(1).toUpperCase.replaceAll(raw"\s+", " ")
    if (mode == "NO OTHERS") // the default, in both engines
      return rewriteFrameExclude(sql.substring(0, m.start) + ")" + sql.substring(m.end))
    val close = m.end - 1
    // backward to the OVER-paren's open
    var d = 1
    var i = close - 1
    while (i >= 0 && d > 0) {
      masked.charAt(i) match {
        case ')' => d += 1
        case '(' => d -= 1
        case _ =>
      }
      if (d > 0) i -= 1
    }
    if (d != 0) frameExcludeFail("unbalanced window parens")
    val specOpen = i
    val spec = sql.substring(specOpen + 1, m.start).trim
    // the word before the open paren must be OVER (named windows keep
    // the guided error — the clause lives in a WINDOW definition there)
    var j = specOpen - 1
    while (j >= 0 && masked.charAt(j).isWhitespace) j -= 1
    if (j < 3 || !wordEndingAt(masked, j).equalsIgnoreCase("OVER"))
      frameExcludeFail("not an inline OVER (...) window")
    j -= "OVER".length
    while (j >= 0 && masked.charAt(j).isWhitespace) j -= 1
    if (j < 0 || masked.charAt(j) != ')')
      frameExcludeFail("no aggregate call before OVER")
    val argsClose = j
    d = 1; j -= 1
    while (j >= 0 && d > 0) {
      masked.charAt(j) match {
        case ')' => d += 1
        case '(' => d -= 1
        case _ =>
      }
      if (d > 0) j -= 1
    }
    if (d != 0) frameExcludeFail("unbalanced aggregate parens")
    val argsOpen = j
    val args = sql.substring(argsOpen + 1, argsClose).trim
    var k = argsOpen - 1
    while (k >= 0 && masked.charAt(k).isWhitespace) k -= 1
    if (k < 0 || !(masked.charAt(k).isLetterOrDigit || masked.charAt(k) == '_'))
      frameExcludeFail("no aggregate name before the argument list")
    var b = k
    while (b >= 0 && (masked.charAt(b).isLetterOrDigit || masked.charAt(b) == '_')) b -= 1
    val fn = sql.substring(b + 1, k + 1).toLowerCase
    val fnStart = b + 1
    // frame analysis: can it contain the current row / the peer group?
    val specMasked = maskQuotes(spec)
    val frameM = raw"(?is)\b(ROWS|RANGE|GROUPS)\s+(?:BETWEEN\s+(.*?)\s+AND\s+(.*)|(.*))$$".r
      .findFirstMatchIn(specMasked)
    def frameBounds(fm: scala.util.matching.Regex.Match): (String, String) = {
      val start = Option(fm.group(2)).getOrElse(Option(fm.group(4)).getOrElse(""))
        .trim.toUpperCase.replaceAll(raw"\s+", " ")
      val end = Option(fm.group(3)).getOrElse("CURRENT ROW")
        .trim.toUpperCase.replaceAll(raw"\s+", " ")
      (start, end)
    }
    def offsetZeroOutsideFrame(fm: scala.util.matching.Regex.Match): Boolean = {
      val (start, end) = frameBounds(fm)
      (start.endsWith("PRECEDING") && end.endsWith("PRECEDING") &&
        !end.startsWith("0")) ||
        (start.endsWith("FOLLOWING") && end.endsWith("FOLLOWING") &&
          !start.startsWith("0"))
    }
    val dropped = sql.substring(0, m.start) + ")" + sql.substring(m.end)
    val nn = s"(CASE WHEN ($args) IS NULL THEN 0 ELSE 1 END)"
    val replacement: String = if (mode == "CURRENT ROW") {
      // both-PRECEDING / both-FOLLOWING frames can't contain the
      // current row — exclusion is a no-op there, probed
      if (frameM.exists(offsetZeroOutsideFrame)) return rewriteFrameExclude(dropped)
      fn match {
        case "count" =>
          if (args == "*") s"(count(*) OVER ($spec) - 1)"
          else s"(count($args) OVER ($spec) - $nn)"
        case "sum" =>
          s"(CASE WHEN count($args) OVER ($spec) <= $nn " +
            s"THEN NULL ELSE sum($args) OVER ($spec) - COALESCE(($args), 0) END)"
        case "avg" =>
          s"(CAST(CASE WHEN count($args) OVER ($spec) <= $nn " +
            s"THEN NULL ELSE sum($args) OVER ($spec) - COALESCE(($args), 0) END AS DOUBLE) / " +
            s"NULLIF(count($args) OVER ($spec) - $nn, 0))"
        case other => frameExcludeFail(s"aggregate '$other'")
      }
    } else { // GROUP | TIES: subtract the peer-group window's aggregate
      val fm = frameM.getOrElse(
        frameExcludeFail(s"EXCLUDE $mode without an explicit frame"))
      val ftype = fm.group(1).toUpperCase
      val (start, end) = frameBounds(fm)
      val peersContained = ftype match {
        case "RANGE" =>
          // peers sit at value-offset 0: outside a both-PRECEDING /
          // both-FOLLOWING RANGE frame the exclusion is a no-op
          if (offsetZeroOutsideFrame(fm)) return rewriteFrameExclude(dropped)
          true
        case "ROWS" => // only unbounded-both contains the peer group
          start == "UNBOUNDED PRECEDING" && end == "UNBOUNDED FOLLOWING"
        case _ => false // GROUPS frames don't execute in Spark at all
      }
      if (!peersContained)
        frameExcludeFail(s"EXCLUDE $mode over a $ftype frame that may " +
          "only partially contain the peer group")
      if (!raw"(?is)\bORDER\s+BY\b".r.findFirstIn(specMasked.substring(0, fm.start)).isDefined)
        frameExcludeFail(s"EXCLUDE $mode without ORDER BY")
      val peer = spec.substring(0, fm.start).trim +
        " RANGE BETWEEN CURRENT ROW AND CURRENT ROW"
      val tieN = if (mode == "TIES") s" + $nn" else ""
      val tieS = if (mode == "TIES") s" + COALESCE(($args), 0)" else ""
      def cntExpr(a: String, tie: String) =
        s"(count($a) OVER ($spec) - count($a) OVER ($peer)$tie)"
      fn match {
        case "count" =>
          if (args == "*") cntExpr("*", if (mode == "TIES") " + 1" else "")
          else cntExpr(args, tieN)
        case "sum" =>
          s"(CASE WHEN ${cntExpr(args, tieN)} = 0 THEN NULL ELSE " +
            s"sum($args) OVER ($spec) - COALESCE(sum($args) OVER ($peer), 0)$tieS END)"
        case "avg" =>
          s"(CAST(CASE WHEN ${cntExpr(args, tieN)} = 0 THEN NULL ELSE " +
            s"sum($args) OVER ($spec) - COALESCE(sum($args) OVER ($peer), 0)$tieS END AS DOUBLE) / " +
            s"NULLIF(${cntExpr(args, tieN)}, 0))"
        case other => frameExcludeFail(s"aggregate '$other'")
      }
    }
    rewriteFrameExclude(sql.substring(0, fnStart) + replacement + sql.substring(close + 1))
  }

  private val DateDiffFnRe = raw"(?i)(?<![\w.])(date_diff|datediff)\s*\(\s*'".r

  /** DuckDB's `date_diff('part', a, b)` carries the datepart as a
    * QUOTED string — Spark's PARSER special-cases these names and
    * demands an unquoted unit keyword, so the call never reaches the
    * function registry. Rename quoted-part calls to the registered
    * `graft_date_diff` (DuckDB's boundary-crossing semantics); Spark's
    * own unquoted forms (`date_diff(DAY, a, b)`) pass through native.
    */
  def rewriteDateDiffFn(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = DateDiffFnRe.findFirstMatchIn(masked).getOrElse(return sql)
    rewriteDateDiffFn(sql.substring(0, m.start(1)) + "graft_date_diff" +
      sql.substring(m.end(1)))
  }

  private val DotCallRe = raw"\.\s*([A-Za-z_]\w*)\s*\(".r

  /** DuckDB's method-call syntax `expr.fn(args)` = `fn(expr, args)`
    * (function chaining, probed: `('  a ').trim().len()` → 1). Claims a
    * dot followed by `ident(` whose base is a claimable primary — a
    * paren/bracket group, string literal, or (possibly qualified)
    * identifier; leftmost-first rescan makes chains compose (the inner
    * call becomes the next base). A qualified FUNCTION name
    * (`schema.fn(x)`) is indistinguishable at text level and would be
    * claimed as a dot-call — DuckDB has the same ambiguity and our
    * dialect surface has no qualified function calls (macros register
    * bare names); documented edge.
    */
  def rewriteDotCall(sql: String): String = {
    val masked = maskQuotes(sql)
    DotCallRe.findAllMatchIn(masked).foreach { m =>
      sliceBaseStart(masked, m.start).foreach { bs =>
        // a bare-identifier base that is PART of the dotted name
        // (x.y.fn()) claims the whole qualified chain via the base
        // scan, so nothing special needed; but skip when the "base"
        // IS a keyword-ish token that can't be an expression head
        // (e.g. `OVER (...)`, handled by requiring the char before
        // '(' to be the match's ident, which it is by construction)
        val base = sql.substring(bs, m.start).trim
        if (base.nonEmpty) {
          val fn = m.group(1)
          // find the call's matching close paren
          var d = 1
          var j = m.end
          while (j < masked.length && d > 0) {
            masked.charAt(j) match {
              case '(' => d += 1
              case ')' => d -= 1
              case _ =>
            }
            if (d > 0) j += 1
          }
          if (d == 0) {
            val args = sql.substring(m.end, j).trim
            val call =
              if (args.isEmpty) s"$fn($base)" else s"$fn($base, $args)"
            return rewriteDotCall(sql.substring(0, bs) + call + sql.substring(j + 1))
          }
        }
      }
    }
    sql
  }

  private val RegexpReplaceFnRe = raw"(?i)(?<![\w.])regexp_replace\s*\(".r

  /** DuckDB's regexp_replace replaces the FIRST match only unless the
    * options string carries 'g' — Spark's builtin always replaces all
    * (and its 4th arg is a position int, not options), a silent-wrong
    * divergence for any multi-match input. Rename EVERY call in the
    * dialect surface to the registered `duck_regexp_replace` native
    * ([[graft.functions.expressions.DuckRegexpReplace]]). A rename,
    * not a registry override: Spark 4's Scala `functions` API resolves
    * through the registry too, so overriding the name would change
    * semantics under every internal quality operator.
    */
  def rewriteRegexpReplaceFn(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = RegexpReplaceFnRe.findFirstMatchIn(masked).getOrElse(return sql)
    rewriteRegexpReplaceFn(sql.substring(0, m.start) + "duck_regexp_replace(" +
      sql.substring(m.end))
  }

  private val ExtractEpochRe = raw"(?i)(?<![\w.])EXTRACT\s*\(\s*EPOCH\s+FROM\b".r

  /** `EXTRACT(epoch FROM x)` — Spark's parser rejects the field
    * (INVALID_EXTRACT_FIELD) before any registry lookup; rewrite the
    * head to the registered `epoch(` (DOUBLE seconds, DuckDB's type),
    * leaving the operand and closing paren in place.
    */
  def rewriteExtractEpoch(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = ExtractEpochRe.findFirstMatchIn(masked).getOrElse(return sql)
    rewriteExtractEpoch(sql.substring(0, m.start) + "epoch(" + sql.substring(m.end))
  }

  private val IgnoreNullsInsideRe = raw"(?is)\b(IGNORE|RESPECT)\s+NULLS\s*\)".r

  /** DuckDB writes the null-treatment modifier INSIDE the window
    * function's argument list — `lag(v IGNORE NULLS) OVER (…)` — where
    * Spark wants it between the call and OVER: `lag(v) IGNORE NULLS
    * OVER (…)`. Move it when the call is immediately followed by OVER;
    * a non-window position is left alone (Spark fails loudly there,
    * same as DuckDB outside window functions).
    */
  def rewriteIgnoreNulls(sql: String): String = {
    val masked = maskQuotes(sql)
    IgnoreNullsInsideRe.findAllMatchIn(masked).foreach { m =>
      val close = m.end - 1 // position of ')'
      var a = close + 1
      while (a < masked.length && masked.charAt(a).isWhitespace) a += 1
      if (a < masked.length && masked.charAt(a).isLetter &&
        wordStartingAt(masked, a).equalsIgnoreCase("OVER")) {
        val modifier = sql.substring(m.start(1), m.end(1)).toUpperCase + " NULLS"
        val rewritten = sql.substring(0, m.start).stripSuffix(" ") +
          ") " + modifier + " " + sql.substring(m.end)
        return rewriteIgnoreNulls(rewritten)
      }
    }
    sql
  }

  private val FormatFnRe = raw"(?i)(?<![\w.])format\s*\(".r

  private def formatFail(why: String): Nothing =
    throw new graft.functions.expressions.DuckDialectException(
      s"format() couldn't be auto-rewritten ($why) — claimed: a LITERAL " +
        "format string with {} / {n} placeholders, with or without a " +
        "fmt spec ({:.2f}, {:>8}, {:,d}, …); dynamic width/precision " +
        "({:{}}) and computed format strings are not translated — " +
        "use printf's %-codes")

  /** DuckDB's `format('{} x {}', a, b)` (the fmt library) → Spark
    * `concat(...)` — numbers, booleans and strings render identically
    * (probed). Plain `{}` (auto-numbered) and positional `{n}`
    * placeholders are claimed for LITERAL format strings; `{{`/`}}`
    * escapes produce literal braces. Since r17 a placeholder carrying
    * a fmt SPEC (`{:.2f}`, `{0:>8}`, `{:,d}` …) compiles to the
    * [[graft.functions.expressions.DuckSweep]] fmt kernels via
    * `graft_fmt_spec` — exact fmt presentation incl. half-even
    * exact-binary rounding, probed corner by corner (see DialectSpec).
    * Every placeholder routes through the kernel dispatch so REAL /
    * DECIMAL / big-magnitude doubles print DuckDB's repr, not Spark's
    * cast ('1e+16' vs '1.0E16'). Dynamic `{:{}}` width and computed
    * format strings still fail with guidance to printf.
    */
  def rewriteFormatFn(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = FormatFnRe.findFirstMatchIn(masked).getOrElse(return sql)
    val close = closeOf(masked, m.end).getOrElse(return sql)
    val inner = sql.substring(m.end, close - 1)
    val innerMasked = masked.substring(m.end, close - 1)
    val args = splitTopLevel(inner, innerMasked).map(_.trim)
    if (args.isEmpty) formatFail("no arguments")
    val fmtM = raw"(?s)^'((?:[^']|'')*)'$$".r.findFirstMatchIn(args.head)
      .getOrElse(formatFail("the format string must be a single literal"))
    val fmt = fmtM.group(1).replace("''", "'")
    val rest = args.tail
    val parts = Seq.newBuilder[String]
    val sb = new StringBuilder
    var auto = 0
    var usedAuto = false
    var usedPos = false
    var i = 0
    def flushLit(): Unit = if (sb.nonEmpty) {
      parts += s"'${sb.toString.replace("'", "''")}'"
      sb.clear()
    }
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '{' && i + 1 < fmt.length && fmt.charAt(i + 1) == '{') { sb.append('{'); i += 2 }
      else if (c == '}' && i + 1 < fmt.length && fmt.charAt(i + 1) == '}') { sb.append('}'); i += 2 }
      else if (c == '{') {
        val end = fmt.indexOf('}', i)
        if (end < 0) formatFail("unbalanced { in the format string")
        val ph = fmt.substring(i + 1, end)
        val colon = ph.indexOf(':')
        val (idPart, spec) =
          if (colon < 0) (ph, "") else (ph.substring(0, colon), ph.substring(colon + 1))
        val idx =
          if (idPart.isEmpty) { usedAuto = true; val k = auto; auto += 1; k }
          else if (idPart.forall(_.isDigit)) { usedPos = true; idPart.toInt }
          else formatFail(s"placeholder '{$ph}'")
        if (usedAuto && usedPos)
          formatFail("mixing {} and {n} placeholders (DuckDB rejects it too)")
        if (idx >= rest.length)
          formatFail(s"placeholder $idx but only ${rest.length} argument(s)")
        if (spec.contains('{'))
          formatFail(s"dynamic width/precision in '{$ph}'")
        flushLit()
        parts += s"graft_fmt_spec('${spec.replace("'", "''")}', (${rest(idx)}))"
        i = end + 1
      } else { sb.append(c); i += 1 }
    }
    flushLit()
    val replacement =
      if (parts.result().isEmpty) "''"
      else s"concat(${parts.result().mkString(", ")})"
    rewriteFormatFn(sql.substring(0, m.start) + replacement + sql.substring(close))
  }

  private val PrintfFnRe = raw"(?i)(?<![\w.])printf\s*\(".r

  private def printfFail(why: String): Nothing =
    throw new graft.functions.expressions.DuckDialectException(
      s"printf() couldn't be auto-rewritten ($why) — claimed: a LITERAL " +
        "format string with %-specs (flags - + space 0 # ',', width, " +
        ".precision, n$ positionals, %% escapes; conversions " +
        "d i u x X o b c s f F e E g G; dynamic '*' width/precision " +
        "consuming sequential arguments). Mixing '*' with n$ positionals, " +
        "length modifiers and %a are not translated. The error is " +
        "deliberate: an untranslated printf would run Spark's Java " +
        "Formatter, which rounds the DECIMAL value HALF_UP where " +
        "DuckDB's fmt rounds the exact BINARY value half-even " +
        "(printf('%.1f', 0.25) is '0.3' there, '0.2' in DuckDB)")

  /** DuckDB's `printf()` (fmt::sprintf) AUTO-REWRITTEN onto the same
    * DuckSweep kernels as [[rewriteFormatFn]] (r17 — previously passed
    * through to Spark's own printf, whose java.util.Formatter rounds
    * ties differently and renders %x of negatives as 64-bit
    * two's-complement regardless of the argument width — a SILENT
    * divergence on the probed surface). Float conversions share the
    * exact-binary half-even kernels (probed identical to format(),
    * including the small-value %g bug); %d/%i/%s map onto the fmt
    * grammar with printf's flag translation ('-' → '<' align, zero
    * beating '-' — probed '%0-8d' → '00000042'); %u/%x/%X/%o/%b use
    * the width-aware two's-complement kernel; %c the codepoint kernel;
    * `n$` positionals execute, and mixing them with sequential specs
    * raises DuckDB's own "cannot switch from manual to automatic
    * argument indexing".
    */
  def rewritePrintfFn(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = PrintfFnRe.findFirstMatchIn(masked).getOrElse(return sql)
    val close = closeOf(masked, m.end).getOrElse(return sql)
    val inner = sql.substring(m.end, close - 1)
    val innerMasked = masked.substring(m.end, close - 1)
    val args = splitTopLevel(inner, innerMasked).map(_.trim)
    if (args.isEmpty) printfFail("no arguments")
    val fmtM = raw"(?s)^'((?:[^']|'')*)'$$".r.findFirstMatchIn(args.head)
      .getOrElse(printfFail("the format string must be a single literal"))
    val fmt = fmtM.group(1).replace("''", "'")
    val rest = args.tail
    val parts = Seq.newBuilder[String]
    val sb = new StringBuilder
    var auto = 0
    var usedAuto = false
    var usedManual = false
    var i = 0
    def flushLit(): Unit = if (sb.nonEmpty) {
      parts += s"'${sb.toString.replace("'", "''")}'"
      sb.clear()
    }
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%') { sb.append(c); i += 1 }
      else if (i + 1 < fmt.length && fmt.charAt(i + 1) == '%') { sb.append('%'); i += 2 }
      else {
        var j = i + 1
        // n$ positional
        var argPos = -1
        val posM = raw"^(\d+)\$$".r.findFirstMatchIn(fmt.substring(j))
        posM.foreach { pm => argPos = pm.group(1).toInt; j += pm.end }
        var alignLeft = false; var sign = ""; var zero = false
        var alt = false; var comma = false
        var inFlags = true
        while (inFlags && j < fmt.length) {
          fmt.charAt(j) match {
            case '-' => alignLeft = true; j += 1
            case '+' => sign = "+"; j += 1
            case ' ' => sign = " "; j += 1
            case '0' => zero = true; j += 1
            case '#' => alt = true; j += 1
            case ',' => comma = true; j += 1
            case '\'' => printfFail("custom thousands-separator flag %'")
            case _ => inFlags = false
          }
        }
        // dynamic '*' width/precision (r18): each '*' CONSUMES the next
        // sequential argument, in C order width-then-precision-then-value
        // (probed '%*.*f' of (10, 2, x)); fmt itself rejects mixing them
        // with n$ positionals ("cannot switch from automatic to manual
        // argument indexing", probed), so the positional+dynamic combo
        // keeps a guided error here
        var widthDyn = false
        if (j < fmt.length && fmt.charAt(j) == '*') {
          if (argPos > 0)
            printfFail("dynamic '*' width combined with an n$ positional " +
              "(DuckDB rejects the mix too)")
          widthDyn = true; j += 1
        }
        var width = ""
        while (j < fmt.length && fmt.charAt(j).isDigit) { width += fmt.charAt(j); j += 1 }
        var prec = ""
        var precDyn = false
        if (j < fmt.length && fmt.charAt(j) == '.') {
          j += 1
          if (j < fmt.length && fmt.charAt(j) == '*') {
            if (argPos > 0)
              printfFail("dynamic '*' precision combined with an n$ positional " +
                "(DuckDB rejects the mix too)")
            precDyn = true; j += 1
          } else {
            prec = "."
            while (j < fmt.length && fmt.charAt(j).isDigit) { prec += fmt.charAt(j); j += 1 }
            if (prec == ".") prec = ".0"
          }
        }
        while (j < fmt.length && "lzjt".indexOf(fmt.charAt(j)) >= 0) j += 1 // inert length mods
        if (j < fmt.length && fmt.charAt(j) == 'h')
          printfFail("length modifier 'h' (16-bit wrap)")
        if (j >= fmt.length) printfFail("truncated %-spec")
        val conv = fmt.charAt(j); j += 1
        def nextAuto(): Int = {
          usedAuto = true; val k = auto; auto += 1
          if (k >= rest.length) printfFail(s"argument index ${k + 1} out of range")
          k
        }
        val wIdx = if (widthDyn) nextAuto() else -1
        val pIdx = if (precDyn) nextAuto() else -1
        val idx =
          if (argPos > 0) { usedManual = true; argPos - 1 }
          else nextAuto()
        if (usedManual && usedAuto)
          printfFail("cannot switch from manual to automatic argument indexing")
        if (idx >= rest.length)
          printfFail(s"argument index ${idx + 1} out of range")
        // sign/'#'/zero flags are INERT on %s in fmt's sprintf (probed:
        // '%+s'/'%#s' → the bare string, '%05s' SPACE-pads) while the
        // shared brace-grammar kernel rejects them — strip before routing
        val sSign = if (conv == 's') "" else sign
        val sAlt = if (conv == 's') false else alt
        val sZero = if (conv == 's') false else zero
        // fmt-spec slot order: [align][sign][,][#][0][width][.prec][typ]
        val align = if (alignLeft) "<" else ">"
        def spec(typ: Char) =
          align + sSign + (if (comma) "," else "") + (if (sAlt) "#" else "") +
            (if (sZero) "0" else "") + width + prec + typ
        val call =
          if (widthDyn || precDyn) {
            if ("disuxXobcfFeEgG".indexOf(conv) < 0)
              printfFail(s"conversion '%$conv'")
            // flags literal = [align][sign][,][#][0] + trailing '.'
            // marker when a precision slot (dynamic or static) exists
            val flags = align + sSign + (if (comma) "," else "") +
              (if (sAlt) "#" else "") + (if (sZero) "0" else "") +
              (if (precDyn || prec.nonEmpty) "." else "")
            val wArg = if (widthDyn) s"(${rest(wIdx)})" else (if (width.isEmpty) "0" else width)
            val pArg = if (precDyn) s"(${rest(pIdx)})" else (if (prec.isEmpty) "0" else prec.substring(1))
            s"graft_printf_dyn('$flags', '$conv', $wArg, $pArg, (${rest(idx)}))"
          } else conv match {
            case 'd' | 'i' if prec.nonEmpty =>
              s"graft_printf_int('${spec('d')}', (${rest(idx)}))"
            case 'd' | 'i' => s"graft_printf_spec('${spec('d')}', (${rest(idx)}))"
            case 's' | 'f' | 'F' | 'e' | 'E' | 'g' | 'G' =>
              s"graft_printf_spec('${spec(conv)}', (${rest(idx)}))"
            case 'u' | 'x' | 'X' | 'o' | 'b' =>
              s"graft_printf_radix('${spec(conv)}', (${rest(idx)}))"
            case 'c' => s"graft_printf_char('${spec('c')}', (${rest(idx)}))"
            case other => printfFail(s"conversion '%$other'")
          }
        flushLit()
        parts += call
        i = j
      }
    }
    flushLit()
    val replacement =
      if (parts.result().isEmpty) "''"
      else s"concat(${parts.result().mkString(", ")})"
    rewritePrintfFn(sql.substring(0, m.start) + replacement + sql.substring(close))
  }

  private val AggOrderByFnRe =
    raw"(?i)(?<![\w.])(string_agg|group_concat|array_agg|list|first|last)\s*\(".r

  private def aggOrderByFail(fn: String, why: String): Nothing =
    throw new graft.functions.expressions.DuckDialectException(
      s"inline ORDER BY inside $fn() couldn't be auto-rewritten ($why) — " +
        "claimed: string_agg/group_concat([DISTINCT] x[, sep] ORDER BY keys) " +
        "→ listagg WITHIN GROUP; array_agg/list(x ORDER BY keys) → " +
        "sorted-struct transform; first/last(x ORDER BY keys) → min_by/" +
        "max_by (or the sorted-struct head/tail for multi-key)")

  /** DuckDB's inline `ORDER BY` modifier INSIDE aggregate calls (r13 —
    * previously a raw Spark parse error): `string_agg(x, sep ORDER BY
    * k)` / `group_concat` → Spark `listagg(...) WITHIN GROUP (ORDER BY
    * ...)` (1-arg forms gain DuckDB's default `','` separator);
    * `array_agg(x ORDER BY keys)` / `list` → `transform(array_sort(
    * array_agg(named_struct(keys…, value)), comparator), s -> s.__v)`
    * with a generated comparator honoring per-key ASC/DESC and DuckDB's
    * NULLS-LAST-in-both-directions default (probed; NULLS FIRST/LAST
    * qualifiers claimed) — the struct wrap also preserves NULL values,
    * which DuckDB's array_agg keeps; `first/last(x ORDER BY k)` →
    * `min_by`/`max_by` (probed equivalence: first = the value at the
    * ordering's minimum), multi-key forms via the sorted-struct path's
    * head/tail. A trailing OVER (window use) keeps a guided error.
    * Ties are engine order in BOTH engines (hash aggregation) — gates
    * must order by total keys, same as any oracle.
    */
  def rewriteAggOrderBy(sql: String): String = {
    val masked = maskQuotes(sql)
    val hit = AggOrderByFnRe.findAllMatchIn(masked).flatMap { m =>
      closeOf(masked, m.end).flatMap { close =>
        val innerMasked = masked.substring(m.end, close - 1)
        // depth-0 ORDER BY inside the call arguments
        var d = 0; var at = -1; var k = 0
        while (k < innerMasked.length && at < 0) {
          val c = innerMasked.charAt(k)
          if (c == '(') { d += 1; k += 1 }
          else if (c == ')') { d -= 1; k += 1 }
          else if (d == 0 && (c == 'O' || c == 'o') &&
            (k == 0 || (!innerMasked.charAt(k - 1).isLetterOrDigit && innerMasked.charAt(k - 1) != '_')) &&
            raw"(?is)^ORDER\s+BY\b".r.findFirstIn(innerMasked.substring(k)).isDefined) at = k
          else k += 1
        }
        if (at < 0) None else Some((m, close, at))
      }
    }.toSeq.headOption
    hit match {
      case None => sql
      case Some((m, close, obAt)) =>
        val fn = sql.substring(m.start(1), m.end(1)).toLowerCase
        val inner = sql.substring(m.end, close - 1)
        val innerMasked = masked.substring(m.end, close - 1)
        // Window (OVER) use is a TERMINAL disposition, not a parity
        // gap: DuckDB 1.0.0 itself rejects the form ("Parser Error:
        // ORDER BY is not implemented for window functions!", probed
        // r17 for first/last/string_agg/array_agg with and without a
        // window-spec ORDER BY) — both engines refuse loudly.
        var a = close
        while (a < masked.length && masked.charAt(a).isWhitespace) a += 1
        if (a < masked.length && masked.charAt(a).isLetter &&
          wordStartingAt(masked, a).equalsIgnoreCase("OVER"))
          aggOrderByFail(fn, "window (OVER) use — DuckDB rejects this too " +
            "(its parser: ORDER BY is not implemented for window functions); " +
            "order inside the window spec")
        var argsPart = inner.substring(0, obAt).trim
        val orderPart = inner.substring(obAt).replaceFirst(raw"(?is)^ORDER\s+BY\s*", "")
        var distinct = false
        raw"(?is)^DISTINCT\s+".r.findFirstMatchIn(argsPart).foreach { dm =>
          distinct = true; argsPart = argsPart.substring(dm.end)
        }
        // per-key (expr, desc, nullsFirst) with DuckDB's NULLS LAST default
        val keys = splitTopLevel(orderPart, maskQuotes(orderPart)).map { it0 =>
          var e = it0.trim; var desc = false; var nullsFirst = false
          raw"(?is)\s+NULLS\s+(FIRST|LAST)\s*$$".r.findFirstMatchIn(e).foreach { nm =>
            nullsFirst = nm.group(1).equalsIgnoreCase("FIRST")
            e = e.substring(0, nm.start)
          }
          raw"(?is)\s+(ASC|DESC)\s*$$".r.findFirstMatchIn(e).foreach { am =>
            desc = am.group(1).equalsIgnoreCase("DESC")
            e = e.substring(0, am.start)
          }
          if (e.trim.isEmpty) aggOrderByFail(fn, "empty ORDER BY key")
          (e.trim, desc, nullsFirst)
        }
        def sortedStruct(value: String, dist: Boolean = false,
                         castStr: Boolean = false): String = {
          val fields = keys.zipWithIndex.map { case ((e, _, _), i) =>
            s"'__o${i + 1}', ($e)" }.mkString(", ")
          val cmp = keys.zipWithIndex.map { case ((_, desc, nullsFirst), i) =>
            val f = s"__o${i + 1}"
            s"WHEN l.$f IS NULL AND r.$f IS NOT NULL THEN ${if (nullsFirst) -1 else 1} " +
              s"WHEN l.$f IS NOT NULL AND r.$f IS NULL THEN ${if (nullsFirst) 1 else -1} " +
              s"WHEN l.$f < r.$f THEN ${if (desc) 1 else -1} " +
              s"WHEN l.$f > r.$f THEN ${if (desc) -1 else 1}"
          }.mkString(" ")
          val v = if (castStr) "CAST(s.__v AS STRING)" else "s.__v"
          s"transform(array_sort(array_agg(${if (dist) "DISTINCT " else ""}" +
            s"named_struct($fields, '__v', ($value)))" +
            s", (l, r) -> CASE $cmp ELSE 0 END), s -> $v)"
        }
        val args = splitTopLevel(argsPart, maskQuotes(argsPart))
        val nArgs = args.size
        val replacement = fn match {
          case "string_agg" | "group_concat" =>
            if (distinct) {
              // Spark's listagg DISTINCT demands order expr == input
              // expr (pre-cast), which DuckDB's implicit string cast
              // breaks — the sorted-struct path sidesteps it; DuckDB
              // itself requires DISTINCT order keys to appear in the
              // argument list, so distinct (keys, value) pairs are
              // distinct values
              if (nArgs > 2) aggOrderByFail(fn, s"expected ≤ 2 arguments, got $nArgs")
              val sep = if (nArgs == 2) args(1).trim else "','"
              s"array_join(${sortedStruct(args.head.trim, dist = true, castStr = true)}, $sep)"
            } else {
              val a = if (nArgs == 1) s"$argsPart, ','" else argsPart
              s"listagg($a) WITHIN GROUP (ORDER BY $orderPart)"
            }
          case "array_agg" | "list" =>
            if (distinct) aggOrderByFail(fn,
              "DISTINCT with ORDER BY — dedup first (a subquery/GROUP BY)")
            if (nArgs != 1) aggOrderByFail(fn, s"expected 1 argument, got $nArgs")
            sortedStruct(argsPart)
          case _ => // first | last
            if (distinct) aggOrderByFail(fn, "DISTINCT with ORDER BY")
            if (nArgs != 1) aggOrderByFail(fn, s"expected 1 argument, got $nArgs")
            val isFirst = fn == "first"
            if (keys.size == 1 && !keys.head._3) {
              val (k0, desc, _) = keys.head
              val pick = if (isFirst != desc) "min_by" else "max_by"
              s"$pick(($argsPart), ($k0))"
            } else
              s"element_at(${sortedStruct(argsPart)}, ${if (isFirst) 1 else -1})"
        }
        rewriteAggOrderBy(sql.substring(0, m.start) + replacement + sql.substring(close))
    }
  }

  /** Words that can legally precede a LITERAL-position bracket — i.e.
    * the bracket after them is a DuckDB list literal, not a subscript
    * on the word (shared discrimination with [[sliceBaseStart]]).
    */
  private val PreLiteralKeywords = Set("SELECT", "WHERE", "WHEN", "THEN",
    "ELSE", "END", "AND", "OR", "NOT", "IN", "ON", "BY", "AS", "UNION",
    "ALL", "DISTINCT", "FROM", "HAVING", "LIMIT", "RETURN", "VALUES",
    "CASE", "BETWEEN", "LIKE", "ILIKE", "IS", "NULL", "TRUE", "FALSE")

  /** Rewrite DuckDB struct LITERALS `{'k1': e1, 'k2': e2, …}` (r10 —
    * previously a guided error) to Spark's `named_struct('k1', e1, …)`,
    * and MAP literals `MAP {k1: v1, …}` (r13 — previously a guided
    * error) to Spark's `map(k1, v1, …)` with arbitrary key EXPRESSIONS
    * (DuckDB allows non-string keys; probed against duckdb 1.0.0).
    * `{` is not valid Spark SQL anywhere else, so a brace group whose
    * top-level items ALL match `'key': value` (struct) or
    * `key_expr: value_expr` (map, when `MAP` immediately precedes as a
    * standalone word) is safely claimable at any nesting depth;
    * anything else (empty bare `{}`, mixed items) is left for the
    * guided error. An IMMEDIATELY-subscripted map literal
    * `MAP {...}[key]` is claimed as one construct with DuckDB 1.0's
    * LIST-shaped result — `[v]` on a hit (`[NULL]` for a present NULL
    * value), `[]` on a miss — via a `map_contains_key` CASE guard
    * (also what keeps Spark's ANSI `element_at` from throwing on a
    * miss); subscripts on anything OTHER than an adjacent map literal
    * keep Spark's native scalar semantics, the documented divergence
    * for plain `l[i]`. Values rewrite recursively via the rescan, so
    * nested structs/lists/maps/comprehensions compose. Braces inside a
    * `read_*` call's argument list are NEVER claimed — `columns = {'k':
    * 'TYPE'}` belongs to [[rewriteReadFns]]' option grammar (which
    * runs before this in a sql stage; skipping here keeps the rewrite
    * an identity on that text in any call order).
    */
  def rewriteStructLiteral(sql: String): String = {
    val masked = maskQuotes(sql)
    val readSpans = ReadFnRe.findAllMatchIn(masked)
      .flatMap(mm => closeOf(masked, mm.end).map(c => (mm.start, c))).toSeq
    var i = 0
    while (i < masked.length) {
      if (masked.charAt(i) == '{' && !readSpans.exists(s => i > s._1 && i < s._2)) {
        var p = i
        while (p > 0 && masked.charAt(p - 1).isWhitespace) p -= 1
        val isMap = p >= 3 && masked.substring(0, p).toUpperCase.endsWith("MAP")
        // a standalone MAP word (not an identifier merely ENDING in
        // "map", e.g. `heatmap {…}` — that shape stays a guided error)
        val isMapWord = isMap && (p == 3 || {
          val ch = masked.charAt(p - 4)
          !ch.isLetterOrDigit && ch != '_' && ch != '.' && ch != '"' && ch != '`'
        })
        var j = i + 1
        var depth = 1
        while (j < masked.length && depth > 0) {
          masked.charAt(j) match {
            case '{' => depth += 1
            case '}' => depth -= 1
            case _ =>
          }
          if (depth > 0) j += 1
        }
        if (depth == 0 && !isMap) {
          val bodyRaw = sql.substring(i + 1, j)
          val bodyMasked = masked.substring(i + 1, j)
          val items = splitReadArgs(bodyRaw, bodyMasked)
          val ItemRe = raw"(?s)^\s*'((?:[^']|'')*)'\s*:\s*(\S.*)$$".r
          val pairs = items.map { it =>
            ItemRe.findFirstMatchIn(it).map(im =>
              (im.group(1).replace("''", "'"), im.group(2).trim))
          }
          if (items.nonEmpty && pairs.forall(_.isDefined)) {
            val args = pairs.flatten
              .map { case (k, v) => s"'${k.replace("'", "''")}', $v" }
              .mkString(", ")
            return rewriteStructLiteral(sql.substring(0, i) +
              s"named_struct($args)" + sql.substring(j + 1))
          }
        }
        if (depth == 0 && isMapWord) {
          val bodyRaw = sql.substring(i + 1, j)
          val bodyMasked = masked.substring(i + 1, j)
          val mapExprOpt: Option[String] =
            if (bodyRaw.trim.isEmpty) Some("map()")
            else splitMapPairs(bodyRaw, bodyMasked).map { prs =>
              "map(" + prs.map { case (k, v) => s"$k, $v" }.mkString(", ") + ")"
            }
          mapExprOpt match {
            case Some(mapExpr) =>
              val wordStart = p - 3
              // immediate index subscript (no top-level slice colon)?
              var q = j + 1
              while (q < masked.length && masked.charAt(q).isWhitespace) q += 1
              val sub: Option[(Int, Int)] =
                if (q < masked.length && masked.charAt(q) == '[') {
                  var m = q + 1
                  var dd = 0
                  var colon = false
                  var close = -1
                  while (m < masked.length && close < 0) {
                    masked.charAt(m) match {
                      case '[' | '(' | '{' => dd += 1
                      case ']' if dd > 0 => dd -= 1
                      case ')' | '}' => dd -= 1
                      case ']' => close = m
                      case ':' if dd == 0 =>
                        val isCast =
                          (m + 1 < masked.length && masked.charAt(m + 1) == ':') ||
                            masked.charAt(m - 1) == ':'
                        if (!isCast) colon = true
                      case _ =>
                    }
                    m += 1
                  }
                  if (close >= 0 && !colon &&
                    sql.substring(q + 1, close).trim.nonEmpty) Some((q, close))
                  else None
                } else None
              val (endPos, newText) = sub match {
                case Some((open, close)) =>
                  val key = sql.substring(open + 1, close).trim
                  (close, s"(CASE WHEN map_contains_key($mapExpr, $key) " +
                    s"THEN array(element_at($mapExpr, $key)) ELSE array() END)")
                case None => (j, mapExpr)
              }
              return rewriteStructLiteral(sql.substring(0, wordStart) +
                newText + sql.substring(endPos + 1))
            case None => // malformed body → guided error
          }
        }
        if (depth == 0) i = j // skip the unclaimed group
      }
      i += 1
    }
    sql
  }

  /** Split a MAP-literal body into (key, value) expression pairs: items
    * at top-level commas, each item at its FIRST top-level `:` (a `::`
    * cast never counts). None when any item carries no top-level colon
    * or an empty side — the caller leaves that text for the guided
    * error. Keys are arbitrary expressions (DuckDB allows `MAP {1:
    * 'x'}`), so no quoting is imposed here.
    */
  private def splitMapPairs(raw: String, masked: String): Option[Seq[(String, String)]] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var d = 0
    var last = 0
    var k = 0
    while (k < masked.length) {
      masked.charAt(k) match {
        case '(' | '{' | '[' => d += 1
        case ')' | '}' | ']' => d -= 1
        case ',' if d == 0 => spans += ((last, k)); last = k + 1
        case _ =>
      }
      k += 1
    }
    spans += ((last, masked.length))
    val pairs = spans.result().map { case (s, e) =>
      var c = -1
      var dd = 0
      var m = s
      while (m < e) {
        masked.charAt(m) match {
          case '(' | '{' | '[' => dd += 1
          case ')' | '}' | ']' => dd -= 1
          case ':' if dd == 0 && c < 0 =>
            val isCast = (m + 1 < e && masked.charAt(m + 1) == ':') ||
              (m > s && masked.charAt(m - 1) == ':')
            if (!isCast) c = m
          case _ =>
        }
        m += 1
      }
      if (c < 0) None
      else {
        val k0 = raw.substring(s, c).trim
        val v0 = raw.substring(c + 1, e).trim
        if (k0.isEmpty || v0.isEmpty) None else Some((k0, v0))
      }
    }
    if (pairs.nonEmpty && pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }

  /** Rewrite DuckDB bare list LITERALS `[e1, e2, …]` (r10 — previously
    * a guided error) to Spark's `array(e1, e2, …)`. A bracket counts as
    * a literal only in literal POSITION — at the start of an
    * expression: after an operator / '(' / ',' / a clause keyword —
    * never as a subscript or slice on a preceding expression (those
    * keep [[rewriteSlice]]'s treatment), and only when its body carries
    * no top-level ':' (a struct-ish shape with no faithful rewrite) and
    * no FOR (comprehensions rewrite FIRST in the chain). Empty `[]`
    * becomes `array()`; nesting handles by rescan.
    */
  def rewriteListLiteral(sql: String): String = {
    val masked = maskQuotes(sql)
    var i = 0
    while (i < masked.length) {
      if (masked.charAt(i) == '[') {
        // literal position?
        var p = i
        while (p > 0 && masked.charAt(p - 1).isWhitespace) p -= 1
        val literalPos =
          if (p == 0) true
          else {
            val c = masked.charAt(p - 1)
            if (c == ')' || c == ']' || c == '\'' || c == '`' || c == '.') false
            else if (c.isLetterOrDigit || c == '_' || c == '$') {
              var w = p - 1
              while (w > 0 && { val x = masked.charAt(w - 1)
                x.isLetterOrDigit || x == '_' || x == '$' }) w -= 1
              PreLiteralKeywords.contains(masked.substring(w, p).toUpperCase)
            } else true // operator / '(' / ',' / etc.
          }
        if (literalPos) {
          // matching ']' by bracket depth
          var j = i + 1
          var depth = 1
          while (j < masked.length && depth > 0) {
            masked.charAt(j) match {
              case '[' => depth += 1
              case ']' => depth -= 1
              case _ =>
            }
            if (depth > 0) j += 1
          }
          if (depth == 0) {
            val body = masked.substring(i + 1, j)
            def topLevelHas(re: scala.util.matching.Regex): Boolean =
              re.findAllMatchIn(body).exists { m =>
                val pre = body.substring(0, m.start)
                pre.count(_ == '(') == pre.count(_ == ')') &&
                  pre.count(_ == '[') == pre.count(_ == ']')
              }
            if (!topLevelHas(raw":".r) && !topLevelHas(raw"(?i)\bFOR\b".r))
              return rewriteListLiteral(sql.substring(0, i) +
                "array(" + sql.substring(i + 1, j) + ")" + sql.substring(j + 1))
          }
        }
      }
      i += 1
    }
    sql
  }

  /** End (exclusive) of the primary expression starting at/after `from`
    * in masked text: optional unary +/-, then a literal / (possibly
    * dotted or backticked) identifier / parenthesized group, plus
    * adjacent postfix call-parens, subscripts and dot-chains. None when
    * nothing parseable starts there.
    */
  private def primaryEnd(masked: String, from: Int): Option[Int] = {
    var i = from
    def ws(): Unit = while (i < masked.length && masked.charAt(i).isWhitespace) i += 1
    ws()
    if (i < masked.length && (masked.charAt(i) == '-' || masked.charAt(i) == '+')) {
      i += 1; ws()
    }
    if (i >= masked.length) return None
    def wordEnd(b: Int): Int = {
      var k = b
      while (k < masked.length && { val c = masked.charAt(k)
        c.isLetterOrDigit || c == '_' || c == '$' }) k += 1
      k
    }
    val c = masked.charAt(i)
    if (c == '(') i = closeOf(masked, i + 1).getOrElse(return None)
    else if (c == '\'') {
      var b = i + 1
      while (b < masked.length && masked.charAt(b) != '\'') b += 1
      if (b >= masked.length) return None
      i = b + 1
    } else if (c == '`') {
      var b = i + 1
      while (b < masked.length && masked.charAt(b) != '`') b += 1
      if (b >= masked.length) return None
      i = b + 1
    } else if (c.isLetterOrDigit || c == '_' || c == '$') {
      i = wordEnd(i)
      // decimal / scientific tail of a number literal
      if (i < masked.length && masked.charAt(i) == '.' &&
        i + 1 < masked.length && masked.charAt(i + 1).isDigit)
        i = wordEnd(i + 1)
    } else return None
    // postfix chain: adjacent '(' call, '[' subscript, '.' member
    var scanning = true
    while (scanning && i < masked.length) {
      masked.charAt(i) match {
        case '(' => i = closeOf(masked, i + 1).getOrElse(return None)
        case '[' =>
          var d = 1
          var b = i + 1
          while (b < masked.length && d > 0) {
            masked.charAt(b) match {
              case '[' => d += 1
              case ']' => d -= 1
              case _ =>
            }
            b += 1
          }
          if (d > 0) return None
          i = b
        case '.' if i + 1 < masked.length && {
          val n = masked.charAt(i + 1)
          n.isLetter || n == '_' || n == '`'
        } =>
          if (masked.charAt(i + 1) == '`') {
            var b = i + 2
            while (b < masked.length && masked.charAt(b) != '`') b += 1
            if (b >= masked.length) return None
            i = b + 1
          } else i = wordEnd(i + 1)
        case _ => scanning = false
      }
    }
    Some(i)
  }

  /** Start of the primary ENDING at `pos` (exclusive), unary +/- sign
    * included when the sign sits in unary position (start of text, or
    * after an operator / '(' / ',' / a clause keyword). Builds on
    * [[sliceBaseStart]]'s backwards primary scan.
    */
  private def primaryStartWithSign(masked: String, pos: Int): Option[Int] = {
    val j = sliceBaseStart(masked, pos).getOrElse(return None)
    var k = j
    while (k > 0 && masked.charAt(k - 1).isWhitespace) k -= 1
    if (k > 0 && (masked.charAt(k - 1) == '-' || masked.charAt(k - 1) == '+')) {
      var p = k - 1
      while (p > 0 && masked.charAt(p - 1).isWhitespace) p -= 1
      val unary = p == 0 || {
        val prev = masked.charAt(p - 1)
        "(,*/%+-<>=|&".contains(prev) || {
          // a word before the sign: unary iff it is a KEYWORD, not an
          // identifier (SELECT -2 vs a - 2)
          prev.isLetterOrDigit && {
            var w = p - 1
            while (w > 0 && { val x = masked.charAt(w - 1)
              x.isLetterOrDigit || x == '_' }) w -= 1
            Set("SELECT", "WHEN", "THEN", "ELSE", "CASE", "AND", "OR",
              "NOT", "IN", "ON", "BY", "WHERE", "HAVING", "RETURN",
              "BETWEEN", "LIMIT", "OFFSET", "AS")
              .contains(masked.substring(w, p).toUpperCase)
          }
        }
      }
      if (unary) return Some(k - 1)
    }
    Some(j)
  }

  /** DuckDB `->` / `->>` JSON extraction (r10; terminal `->` r12 —
    * VERDICT r11 #3): chains like `j -> 'a' ->> 'b'` or `j ->> 'k'`
    * rewrite to `get_json_object(j, '$.a.b')`, whose output matches
    * DuckDB's `->>` exactly (probed on duckdb 1.0.0: VARCHAR, strings
    * unquoted, object/array values re-serialized COMPACT — the same
    * normal form Spark's get_json_object emits — missing path → NULL).
    * Integer arguments index arrays (`-> 0` → `$[0]`).
    *
    * A chain ENDING in `->` returns DuckDB's JSON type, whose text
    * form differs from `->>` on scalars: strings KEEP their quotes,
    * numbers canonicalize (1.50 → 1.5), a JSON `null` value is SQL
    * NULL. The rewrite reproduces it exactly (all probed r12):
    * objects/arrays go through `get_json_object` (Jackson's compact
    * re-serialization is byte-identical to yyjson's — source key order
    * kept, numbers canonicalized), scalars through
    * `to_json(variant_get(parse_json(b), path))` (variant re-quotes
    * strings; variant's SORTED object keys are why objects must NOT
    * take this branch), and `nullif(…, 'null')` maps the JSON-null
    * rendering to SQL NULL — a genuine string "null" renders quoted,
    * so nullif can't touch it. The branch dispatch reads the VARIANT
    * text's first char ({ or [), never the raw value, so a string
    * value that merely starts with '{' stays a quoted scalar.
    *
    * A bare `->` is also Spark's LAMBDA arrow (`transform(l, x -> x +
    * 1)` — DuckDB itself disambiguates by binder context). A bare
    * chain rewrites only when every chain argument is a string literal
    * or integer AND the base does not sit at an argument boundary of a
    * known higher-order function (the lambda position); otherwise it
    * is left untouched for Spark's lambda parser. A `->>` chain keeps
    * the fail-loud guided error on unsupported argument shapes.
    */
  /** Functions whose argument positions are LAMBDA context for the
    * bare-`->` disambiguation above (ADVICE r12 #1). This set must
    * cover every name a lambda can legally follow in either dialect:
    * Spark's higher-order builtins AND DuckDB's list-lambda family
    * including ALL its documented aliases (apply and the array_ /
    * list_ prefixed names each alias the same three core HOFs) —
    * DuckDialect.aliases maps several
    * of these names to Spark equivalents, so when a lambda-capable
    * alias is added THERE it must be added HERE, or a constant-bodied
    * lambda under the new name would be mis-claimed as a JSON chain.
    * An unknown function never silently corrupts: Spark fails loudly
    * on the unresolved name either way — the set only decides which
    * error (or rewrite) the user gets.
    */
  private val lambdaHofs = Set(
    "transform", "filter", "exists", "forall", "aggregate", "reduce",
    "zip_with", "map_filter", "map_zip_with", "transform_keys",
    "transform_values", "array_sort", "list_transform", "list_filter",
    "list_reduce", "list_aggregate", "list_sort", "list_apply",
    // DuckDB's lambda aliases (apply == list_apply == array_apply ==
    // list_transform; list_aggr == array_aggregate == list_aggregate;
    // array_filter == list_filter; array_reduce == list_reduce)
    "apply", "array_apply", "array_transform", "array_filter",
    "array_aggregate", "array_reduce", "list_aggr")

  /** `::BLOB` / `::BYTEA` / `::VARBINARY` cast spellings → Spark's
    * `::BINARY` (r14; the `CAST(x AS BLOB)` form stays loud — `AS blob`
    * is also valid alias syntax, so a textual rewrite there could
    * corrupt a projection).
    */
  def rewriteBlobType(sql: String): String = {
    val masked = maskQuotes(sql)
    // `::TYPE` spellings: BLOB family → BINARY, VARCHAR family → STRING
    // (r15; the parameterized VARCHAR(n) form is Spark's own and stays)
    val re = raw"(?i)::\s*(BLOB|BYTEA|VARBINARY|VARCHAR|BPCHAR)\b(?!\s*\()".r
    val ms = re.findAllMatchIn(masked).toSeq
    val step1 = if (ms.isEmpty) sql else {
      val sb = new StringBuilder
      var pos = 0
      ms.foreach { m =>
        val to = m.group(1).toUpperCase match {
          case "VARCHAR" | "BPCHAR" => "STRING"
          case _ => "BINARY"
        }
        sb.append(sql.substring(pos, m.start)).append("::").append(to)
        pos = m.end
      }
      sb.append(sql.substring(pos)).toString
    }
    rewriteCastTypeNames(step1)
  }

  /** `CAST(expr AS <ducktype>)` with a DuckDB-only type name (r15):
    * rewrite the TYPE TOKEN inside the cast — found as the text after
    * the last TOP-LEVEL ` AS ` of each CAST/TRY_CAST body, so aliases
    * like `SELECT x AS text` (the documents schema!) are never touched.
    * Only single-word names [[duckTypeToSpark]] maps DIFFERENTLY
    * rewrite; anything else (including Spark-native names) passes
    * through untouched. Replacement spans of distinct casts are
    * disjoint (an inner cast closes before an outer cast's type token),
    * so collecting on the original offsets and applying right-to-left
    * is exact.
    */
  /** Type names Spark's parser rejects (or reads differently) that
    * [[duckTypeToSpark]] maps — ONLY these rewrite inside casts, so
    * Spark-valid spellings (INTEGER, LONG, BOOL, REAL, NUMERIC…) never
    * churn and the rewrite stays identity on Spark-clean SQL.
    */
  private val duckOnlyCastTypes = Set(
    "VARCHAR", "TEXT", "BPCHAR", "CHAR", "BLOB", "BYTEA", "VARBINARY",
    "UBIGINT", "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
    "INT1", "INT2", "INT4", "INT8", "SIGNED", "LOGICAL",
    "FLOAT4", "FLOAT8", "DATETIME")

  private def rewriteCastTypeNames(sql: String): String = {
    val masked = maskQuotes(sql)
    val CastRe = raw"(?i)\b(?:TRY_)?CAST\s*\(".r
    // (typeStart, closeParen, replacement)
    val repls = Seq.newBuilder[(Int, Int, String)]
    CastRe.findAllMatchIn(masked).foreach { m =>
      closeOf(masked, m.end).foreach { close =>
        val bodyMasked = masked.substring(m.end, close - 1)
        // last top-level ' AS ' of this cast's body
        var depth = 0
        var asPos = -1
        var i = 0
        while (i < bodyMasked.length) {
          bodyMasked.charAt(i) match {
            case '(' | '[' => depth += 1
            case ')' | ']' => depth -= 1
            case c if depth == 0 && (c == 'A' || c == 'a') &&
              i + 2 < bodyMasked.length &&
              (i == 0 || (!bodyMasked.charAt(i - 1).isLetterOrDigit && bodyMasked.charAt(i - 1) != '_')) &&
              bodyMasked.regionMatches(true, i, "AS", 0, 2) &&
              !bodyMasked.charAt(i + 2).isLetterOrDigit && bodyMasked.charAt(i + 2) != '_' =>
              asPos = i
            case _ =>
          }
          i += 1
        }
        if (asPos >= 0) {
          val typeStart = m.end + asPos + 2
          val typeText = sql.substring(typeStart, close - 1).trim
          if (duckOnlyCastTypes.contains(typeText.toUpperCase)) {
            val mapped = try Some(duckTypeToSpark(typeText))
            catch { case _: graft.functions.expressions.DuckDialectException => None }
            mapped.filter(!_.equalsIgnoreCase(typeText)).foreach { t =>
              repls += ((typeStart, close - 1, " " + t))
            }
          }
        }
      }
    }
    val rs = repls.result()
    if (rs.isEmpty) sql
    else rs.sortBy(-_._1).foldLeft(sql) { case (acc, (a, b, t)) =>
      acc.substring(0, a) + t + acc.substring(b)
    }
  }

  /** Integral-cast target type names (Spark's and DuckDB's spellings —
    * the DuckDB-only ones rewrite to Spark names separately, but this
    * scan runs on pre-rewrite text so both sets match here).
    */
  private val integralCastTypes = Set(
    "BIGINT", "INT", "INTEGER", "SMALLINT", "TINYINT", "LONG", "SHORT",
    "BYTE", "INT1", "INT2", "INT4", "INT8", "SIGNED", "UBIGINT",
    "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER")

  /** DuckDB rounds fractional→integral casts half-away-from-zero where
    * Spark truncates (probed; see [[graft.functions.expressions
    * .DuckIntRound]]). Wrap every CAST/TRY_CAST source whose target
    * type is integral in `duck_iround(...)` — a RuntimeReplaceable
    * that is IDENTITY except on Double/Float/Decimal sources, so
    * integral-source casts (the overwhelmingly common case) are
    * untouched at the plan level. Pure insertions (never replacements),
    * applied right-to-left, so NESTED casts wrap correctly.
    */
  def rewriteIntegralCastRound(sql: String): String = {
    val masked = maskQuotes(sql)
    val CastRe = raw"(?i)\b(?:TRY_)?CAST\s*\(".r
    val inserts = Seq.newBuilder[(Int, String)]
    CastRe.findAllMatchIn(masked).foreach { m =>
      closeOf(masked, m.end).foreach { close =>
        val bodyMasked = masked.substring(m.end, close - 1)
        var depth = 0
        var asPos = -1
        var i = 0
        while (i < bodyMasked.length) {
          bodyMasked.charAt(i) match {
            case '(' | '[' => depth += 1
            case ')' | ']' => depth -= 1
            case c if depth == 0 && (c == 'A' || c == 'a') &&
              i + 2 < bodyMasked.length &&
              (i == 0 || (!bodyMasked.charAt(i - 1).isLetterOrDigit && bodyMasked.charAt(i - 1) != '_')) &&
              bodyMasked.regionMatches(true, i, "AS", 0, 2) &&
              !bodyMasked.charAt(i + 2).isLetterOrDigit && bodyMasked.charAt(i + 2) != '_' =>
              asPos = i
            case _ =>
          }
          i += 1
        }
        if (asPos >= 0) {
          val typeText = sql.substring(m.end + asPos + 2, close - 1).trim
          // idempotency: an expr that is ALREADY exactly one
          // duck_iround(...) call (a prior pass's wrap) skips
          val exprMasked = bodyMasked.substring(0, asPos)
          val alreadyWrapped =
            raw"(?is)^\s*duck_iround\s*\(".r.findFirstMatchIn(exprMasked) match {
              case Some(wm) =>
                closeOf(exprMasked, wm.end)
                  .exists(e => exprMasked.substring(e).trim.isEmpty)
              case None => false
            }
          if (integralCastTypes.contains(typeText.toUpperCase) && !alreadyWrapped) {
            inserts += ((m.end, "duck_iround("))
            inserts += ((m.end + asPos, ") "))
          }
        }
      }
    }
    val ins = inserts.result()
    val step1 =
      if (ins.isEmpty) sql
      else ins.sortBy(-_._1).foldLeft(sql) { case (acc, (p, t)) =>
        acc.substring(0, p) + t + acc.substring(p)
      }
    rewriteIntegralDoubleColon(step1)
  }

  /** The `expr::BIGINT` spelling of the same rounding divergence: wrap
    * the `::`-cast OPERAND (an identifier chain, numeric literal, or a
    * balanced paren/bracket group with an optional function-name head)
    * in duck_iround. String-literal operands skip (string sources stay
    * on Spark's native cast — see [[rewriteIntegralCastRound]]), as do
    * chained casts (`x::INT::BIGINT`, where a textual operand scan
    * would claim the inner type token).
    */
  private def rewriteIntegralDoubleColon(sql: String): String = {
    val masked = maskQuotes(sql)
    val re = (raw"(?i)::\s*(" + integralCastTypes.mkString("|") + raw")\b").r
    val inserts = Seq.newBuilder[(Int, String)]
    re.findAllMatchIn(masked).foreach { m =>
      var e = m.start - 1
      while (e >= 0 && masked.charAt(e).isWhitespace) e -= 1
      if (e >= 0 && masked.charAt(e) != '\'' && masked.charAt(e) != '"') {
        def identStart(k0: Int): Int = {
          var k = k0
          while (k >= 0 && (masked.charAt(k).isLetterOrDigit ||
            masked.charAt(k) == '_' || masked.charAt(k) == '.')) k -= 1
          k + 1
        }
        val start: Int =
          if (masked.charAt(e) == ')' || masked.charAt(e) == ']') {
            val closer = masked.charAt(e)
            val opener = if (closer == ')') '(' else '['
            var d = 1
            var k = e - 1
            while (k >= 0 && d > 0) {
              val c = masked.charAt(k)
              if (c == closer) d += 1 else if (c == opener) d -= 1
              if (d > 0) k -= 1
            }
            if (d != 0) -1 else identStart(k - 1)
          } else if (masked.charAt(e).isLetterOrDigit || masked.charAt(e) == '_')
            identStart(e)
          else -1
        // skip chained casts (`x::INT::BIGINT` backscan would claim the
        // inner type token) and already-wrapped operands (idempotency)
        val alreadyWrapped = start >= 0 &&
          masked.regionMatches(true, start, "duck_iround", 0, 11)
        if (start >= 0 && !alreadyWrapped &&
          !(start >= 1 && masked.charAt(start - 1) == ':')) {
          inserts += ((start, "duck_iround("))
          inserts += ((m.start, ")"))
        }
      }
    }
    val ins = inserts.result()
    if (ins.isEmpty) sql
    else ins.sortBy(-_._1).foldLeft(sql) { case (acc, (p, t)) =>
      acc.substring(0, p) + t + acc.substring(p)
    }
  }

  private val JsonExtractFnRe =
    raw"(?i)\b(json_extract_string|json_extract_path_text|json_extract_path|json_extract)\s*\(".r

  /** DuckDB `json_extract[_string|_path|_path_text](j, path)` (r14) —
    * the named forms of the `->`/`->>` arrows: the LITERAL path
    * decomposes into an arrow chain ([[rewriteJsonOps]] then lowers it
    * with the probed JSON-typed / text-typed rendering). Path forms
    * (probed duckdb 1.0.0): '$.a.b[0]' JSONPath, '/a/b/1' JSON
    * pointer (numeric components index arrays), a BARE key taken
    * verbatim — 'a.b' is the single key "a.b", never a traversal —
    * an integer (array index), and a LITERAL LIST of paths (a list of
    * per-path extractions). Non-literal paths stay unresolved (loud).
    */
  def rewriteJsonExtractFns(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = JsonExtractFnRe.findFirstMatchIn(masked).getOrElse(return sql)
    val close = closeOf(masked, m.end).getOrElse(return sql)
    val argsRaw = sql.substring(m.end, close - 1)
    val args = splitReadArgs(argsRaw, masked.substring(m.end, close - 1))
    if (args.length != 2) return sql
    val fn = m.group(1).toLowerCase
    val textual = fn == "json_extract_string" || fn == "json_extract_path_text"
    val base = args(0).trim
    def quote(k: String): String = "'" + k.replace("'", "''") + "'"
    def stepsOf(path: String): Option[Seq[String]] = {
      if (path.startsWith("$")) {
        // $.key / [n] steps; simple keys only (quoted keys stay loud)
        val StepRe = raw"\.([^.\[\]]+)|\[(\d+)\]".r
        val body = path.substring(1)
        val ms = StepRe.findAllMatchIn(body).toSeq
        if (ms.map(_.matched).mkString != body || ms.isEmpty) None
        else Some(ms.map(s => Option(s.group(1)).map(quote).getOrElse(s.group(2))))
      } else if (path.startsWith("/")) {
        val parts = path.split("/").drop(1).filter(_.nonEmpty).toSeq
        if (parts.isEmpty) None
        else Some(parts.map(p =>
          if (p.forall(_.isDigit)) p else quote(p)))
      } else Some(Seq(quote(path)))
      // a bare key with dots/specials ('a.b' is the literal key "a.b"
      // in DuckDB) can't map onto Spark's JSON path — the arrow
      // machinery raises its guided error (never a silent traversal)
    }
    def pathSteps(arg: String): Option[Seq[String]] = {
      val t = arg.trim
      if (raw"^-?\d+$$".r.findFirstIn(t).isDefined) Some(Seq(t))
      else if (t.length >= 2 && t.head == '\'' && t.last == '\'' &&
        !maskQuotes(t).drop(1).dropRight(1).contains('\''))
        stepsOf(t.substring(1, t.length - 1).replace("''", "'"))
      else None
    }
    def chain(ss: Seq[String]): String = {
      val mid = ss.init.map(s => s"-> $s").mkString(" ")
      s"(( $base ) $mid ${if (textual) "->>" else "->"} ${ss.last})"
    }
    val pathArg = args(1).trim
    // list-of-paths form: both the raw bracket spelling and the
    // array(...) the inner rewriteListLiteral pass already produced
    val listInner: Option[String] =
      if (pathArg.startsWith("[") && pathArg.endsWith("]"))
        Some(pathArg.substring(1, pathArg.length - 1))
      else raw"(?is)^array\s*\((.*)\)$$".r.findFirstMatchIn(pathArg).map(_.group(1))
    val replOpt: Option[String] = listInner match {
      case Some(inner) =>
        val parts = splitReadArgs(inner, maskQuotes(inner))
        val all = parts.map(pathSteps)
        if (all.exists(_.isEmpty) || all.isEmpty) None
        else Some(all.flatten.map(chain).mkString("array(", ", ", ")"))
      case None => pathSteps(pathArg).map(chain)
    }
    replOpt match {
      case Some(repl) =>
        rewriteJsonExtractFns(sql.substring(0, m.start) + repl + sql.substring(close))
      case None => sql
    }
  }

  def rewriteJsonOps(sql: String): String = {
    val masked = maskQuotes(sql)
    def fail(why: String): Nothing =
      throw new graft.functions.expressions.DuckDialectException(
        s"a ->> JSON chain couldn't be rewritten ($why) — use " +
          "get_json_object(col, '$.path') directly (Spark's JSON path form)")
    val ArrowRe = raw"->>?".r
    var searchFrom = 0
    while (searchFrom < masked.length) {
      val m = ArrowRe.findFirstMatchIn(masked.substring(searchFrom))
        .getOrElse(return sql)
      val first = searchFrom + m.start
      // base primary ends just before the first arrow
      var be = first
      while (be > 0 && masked.charAt(be - 1).isWhitespace) be -= 1
      val bs = primaryStartWithSign(masked, be)
      // walk the whole chain: (arrow, arg)*
      var pos = first
      var ops = List.empty[(String, Int, Int)] // (op, argStart, argEnd)
      var chaining = true
      while (chaining) {
        val op = if (masked.startsWith("->>", pos)) "->>" else "->"
        val argStart = pos + op.length
        primaryEnd(masked, argStart) match {
          case Some(ae) =>
            ops :+= ((op, argStart, ae))
            var k = ae
            while (k < masked.length && masked.charAt(k).isWhitespace) k += 1
            if (k < masked.length - 1 && masked.charAt(k) == '-' &&
              masked.charAt(k + 1) == '>') pos = k
            else chaining = false
          case None =>
            // no parseable right operand (e.g. `x -> (expr)` lambda
            // bodies DO parse — but `->` with nothing after is garbage)
            chaining = false
            if (ops.isEmpty) ops :+= ((op, argStart, argStart))
        }
      }
      val hasShovel = ops.exists(_._1 == "->>")
      // every chain argument a string literal / integer? (bare-`->`
      // chains rewrite only then — a lambda body is an expression)
      val argsLiteral = ops.forall { case (_, s0, e0) =>
        val raw0 = sql.substring(s0, e0).trim
        raw0.matches("\\d+") ||
          (raw0.length >= 2 && raw0.head == '\'' && raw0.last == '\'')
      }
      // is the word ending just before '(' at index `paren` a known HOF?
      def hofOwns(paren: Int): Boolean = {
        var k = paren - 1
        while (k >= 0 && masked.charAt(k).isWhitespace) k -= 1
        val e0 = k + 1
        while (k >= 0 && (masked.charAt(k).isLetterOrDigit || masked.charAt(k) == '_')) k -= 1
        k + 1 < e0 && lambdaHofs.contains(masked.substring(k + 1, e0).toLowerCase)
      }
      // lambda position: base starts an argument of a HOF call —
      // `transform(l, x -> 'a')` is a constant-valued lambda, not JSON
      val lambdaContext = bs.exists { b0 =>
        var k = b0 - 1
        while (k >= 0 && masked.charAt(k).isWhitespace) k -= 1
        if (k < 0) false
        else masked.charAt(k) match {
          case '(' => hofOwns(k)
          case ',' =>
            var depth = 0
            var q = k - 1
            var open = -1
            while (open < 0 && q >= 0) {
              masked.charAt(q) match {
                case ')' => depth += 1
                case '(' => if (depth == 0) open = q else depth -= 1
                case _ =>
              }
              q -= 1
            }
            open >= 0 && hofOwns(open)
          case _ => false
        }
      }
      if (hasShovel || (argsLiteral && !lambdaContext)) {
        val base = bs.getOrElse(fail("the left operand couldn't be claimed"))
        val path = ops.map { case (_, s0, e0) =>
          val raw0 = sql.substring(s0, e0).trim
          if (raw0.matches("\\d+")) s"[$raw0]"
          else if (raw0.length >= 2 && raw0.head == '\'' && raw0.last == '\'') {
            val key = raw0.substring(1, raw0.length - 1)
            if (!key.matches("\\w+"))
              fail(s"key '$key' isn't a plain word — Spark JSON paths " +
                "can't quote arbitrary keys")
            s".$key"
          } else fail(s"argument '$raw0' isn't a string literal or integer")
        }.mkString
        val baseTxt = sql.substring(base, be).trim
        val repl =
          if (ops.last._1 == "->>") s"get_json_object($baseTxt, '$$$path')"
          else {
            // terminal `->`: JSON-typed result (see scaladoc)
            val p = s"'$$$path'"
            s"nullif(CASE WHEN left(to_json(variant_get(parse_json($baseTxt), $p)), 1) IN ('{', '[') " +
              s"THEN get_json_object($baseTxt, $p) " +
              s"ELSE to_json(variant_get(parse_json($baseTxt), $p)) END, 'null')"
          }
        return rewriteJsonOps(sql.substring(0, base) + repl +
          sql.substring(ops.last._3))
      }
      // a bare `->` lambda (or non-literal args): leave it for Spark
      searchFrom = ops.lastOption.map(_._2).getOrElse(first + 2)
    }
    sql
  }

  /** Convert a glob pattern to an anchored Java/RE2 regex — `*` → `.*`,
    * `?` → `.`, `[...]` classes verbatim (`[!` negation → `[^`), all
    * other regex metacharacters escaped.
    */
  private def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    var inClass = false
    while (i < glob.length) {
      val c = glob.charAt(i)
      if (inClass) {
        if (c == ']') inClass = false
        sb.append(c)
      } else c match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          inClass = true
          sb.append('[')
          if (i + 1 < glob.length && glob.charAt(i + 1) == '!') {
            sb.append('^'); i += 1
          }
        case ch if "\\.^$+{}()|".contains(ch) => sb.append('\\').append(ch)
        case ch => sb.append(ch)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** DuckDB `expr [NOT] GLOB 'pattern'` (r10 — previously a raw parse
    * error): rewrites to an anchored `[NOT] RLIKE` — case-sensitive
    * FULL match, probed on duckdb 1.0.0 (`'foo.csv' GLOB '*.csv'` true,
    * `'a.b' GLOB 'a.b'` true with the dot literal, `'FOO' GLOB 'foo'`
    * false, NULL input → NULL — all RLIKE's semantics after the
    * conversion). Only a GLOB followed by a string LITERAL is claimed
    * (DuckDB's overwhelmingly common form) — `glob` isn't reserved in
    * Spark, so an identifier use (`SELECT glob FROM files`) or a
    * computed pattern is left untouched for Spark to parse (r11,
    * ADVICE: previously any bare GLOB token was claimed and a
    * non-literal pattern failed valid identifier SQL).
    */
  def rewriteGlob(sql: String): String = {
    val masked = maskQuotes(sql)
    // only claim GLOB when a string literal follows: `glob` is NOT a
    // reserved word in Spark, so `SELECT glob FROM files` must keep
    // parsing as an identifier (ADVICE r10)
    val m = raw"(?i)\b(NOT\s+)?GLOB\b".r.findAllMatchIn(masked).find { cand =>
      var j = cand.end
      while (j < masked.length && masked.charAt(j).isWhitespace) j += 1
      j < masked.length && masked.charAt(j) == '\''
    }.getOrElse(return sql)
    def fail(why: String): Nothing =
      throw new graft.functions.expressions.DuckDialectException(
        s"a GLOB couldn't be rewritten ($why) — convert the glob to a regex " +
          "and use RLIKE '^...$' (star → .*, ? → ., [...] classes verbatim)")
    var lpos = m.start
    while (lpos > 0 && masked.charAt(lpos - 1).isWhitespace) lpos -= 1
    val ls = primaryStartWithSign(masked, lpos).getOrElse(fail("left operand unclaimed"))
    val re = primaryEnd(masked, m.end).getOrElse(fail("no pattern operand"))
    val patRaw = sql.substring(m.end, re).trim
    if (!(patRaw.length >= 2 && patRaw.head == '\'' && patRaw.last == '\'' &&
      !maskQuotes(patRaw).drop(1).dropRight(1).contains('\'')))
      fail("the pattern must be a string literal")
    val pat = patRaw.substring(1, patRaw.length - 1).replace("''", "'")
    // double the regex backslashes: Spark's string literals unescape
    // \x sequences, so '\.' would reach RLIKE as a bare '.'
    val rx = globToRegex(pat).replace("\\", "\\\\").replace("'", "''")
    val neg = if (m.group(1) != null) "NOT " else ""
    val left = sql.substring(ls, lpos).trim
    rewriteGlob(sql.substring(0, ls) + s"$left ${neg}RLIKE '$rx'" + sql.substring(re))
  }

  /** DuckDB `expr [NOT] SIMILAR TO pattern` (r13 — previously a raw
    * parse error): rewrites to `[NOT] regexp_full_match(expr, pattern)`
    * — DuckDB treats the pattern as a REGEX matched against the WHOLE
    * string (probed duckdb 1.0.0: `'abc' SIMILAR TO 'a.c'` true,
    * `'abc' SIMILAR TO 'ab'` false — NOT the SQL-standard `%`/`_`
    * wildcard form: `'abc' SIMILAR TO 'a%'` is FALSE). Literal
    * patterns get their backslashes doubled (Spark's string literals
    * unescape `\x`, DuckDB's don't); computed patterns pass through.
    */
  def rewriteSimilarTo(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = raw"(?i)\b(NOT\s+)?SIMILAR\s+TO\b".r.findFirstMatchIn(masked)
      .getOrElse(return sql)
    def fail(why: String): Nothing =
      throw new graft.functions.expressions.DuckDialectException(
        s"a SIMILAR TO couldn't be rewritten ($why) — use " +
          "regexp_full_match(expr, pattern) directly")
    var lpos = m.start
    while (lpos > 0 && masked.charAt(lpos - 1).isWhitespace) lpos -= 1
    val ls = primaryStartWithSign(masked, lpos).getOrElse(fail("left operand unclaimed"))
    val re = primaryEnd(masked, m.end).getOrElse(fail("no pattern operand"))
    // the pattern text moves VERBATIM — rewriteRawLiterals already ran,
    // so a literal's text is the Spark-escaped form of the raw original
    val pat = sql.substring(m.end, re).trim
    val neg = if (m.group(1) != null) "NOT " else ""
    val left = sql.substring(ls, lpos).trim
    rewriteSimilarTo(sql.substring(0, ls) +
      s"(${neg}regexp_full_match($left, $pat))" + sql.substring(re))
  }

  /** DuckDB `**` exponentiation (r10 — previously a guided error):
    * rewrites each occurrence to Spark's `power(l, r)` (DOUBLE, exactly
    * DuckDB's `**` result type). Semantics probed on duckdb 1.0.0:
    * LEFT-associative (`2 ** 3 ** 2` = 64), binds tighter than `*`/`/`
    * (`3 * 2 ** 2` = 12) and looser than unary minus (`-2 ** 2` = 4 —
    * the sign is part of the left operand). Leftmost-first rescan gives
    * the left associativity; operands are single primaries with the
    * sign attached. An occurrence whose operands can't be claimed
    * raises a guided error rather than mangling the statement.
    */
  def rewritePow(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = raw"\*\*".r.findFirstMatchIn(masked).getOrElse(return sql)
    def fail(): Nothing = throw new graft.functions.expressions.DuckDialectException(
      "a ** exponent operand couldn't be claimed — write power(a, b) directly " +
        "(Spark's ^ is bitwise XOR, not exponent)")
    var lpos = m.start
    while (lpos > 0 && masked.charAt(lpos - 1).isWhitespace) lpos -= 1
    val ls = primaryStartWithSign(masked, lpos).getOrElse(fail())
    val re = primaryEnd(masked, m.end).getOrElse(fail())
    val l = sql.substring(ls, lpos).trim
    val r = sql.substring(m.end, re).trim
    rewritePow(sql.substring(0, ls) + s"power($l, $r)" + sql.substring(re))
  }

  /** DuckDB `^` is EXPONENTIATION — Spark's `^` is bitwise XOR, the
    * worst kind of silent divergence (`2 ^ 3` = 8.0 vs 1). Probed
    * duckdb 1.0.0: DOUBLE result, LEFT-associative (`2 ^ 3 ^ 2` = 64),
    * binds tighter than `*` and looser than unary minus (`-2 ^ 2` = 4)
    * — identical to `**`, so the rewrite mirrors [[rewritePow]].
    * DuckDB's `xor(a, b)` function covers the bitwise meaning.
    */
  def rewriteCaret(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = raw"\^".r.findFirstMatchIn(masked).getOrElse(return sql)
    def fail(): Nothing = throw new graft.functions.expressions.DuckDialectException(
      "a ^ exponent operand couldn't be claimed — write power(a, b) " +
        "(DuckDB's ^ is exponent; for bitwise XOR use xor(a, b))")
    var lpos = m.start
    while (lpos > 0 && masked.charAt(lpos - 1).isWhitespace) lpos -= 1
    val ls = primaryStartWithSign(masked, lpos).getOrElse(fail())
    val re = primaryEnd(masked, m.end).getOrElse(fail())
    val l = sql.substring(ls, lpos).trim
    val r = sql.substring(m.end, re).trim
    rewriteCaret(sql.substring(0, ls) + s"power($l, $r)" + sql.substring(re))
  }

  private val LogFnRe = raw"(?i)(?<![\w.])log\s*\(".r

  /** DuckDB's 1-arg `log(x)` is LOG BASE 10 — Spark's is ln, another
    * silent divergence (probed: `log(100)` = 2.0 vs 4.6). Renamed to
    * the registered `duck_log` (1 arg → log10, 2 args → log(base, x),
    * which the engines already agree on). A rename, not an override:
    * the Scala functions API resolves `log` through the registry too,
    * and internal operators (DSIR, TF-IDF, Gumbel keys) want ln.
    */
  def rewriteLogFn(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = LogFnRe.findFirstMatchIn(masked).getOrElse(return sql)
    rewriteLogFn(sql.substring(0, m.start) + "duck_log(" + sql.substring(m.end))
  }

  private val FilterOverRe = raw"(?is)\bFILTER\s*\(\s*WHERE\b".r

  /** DuckDB allows an aggregate FILTER clause on WINDOW functions —
    * Spark raises "Window aggregate function with filter predicate is
    * not supported yet". Rewrite `agg(x) FILTER (WHERE p) OVER (…)` to
    * `agg(CASE WHEN (p) THEN (x) END) OVER (…)` (NULL rows don't
    * aggregate — exactly the filter semantics; `count(*)` counts a
    * CASE-guarded 1). Plain aggregate FILTER (no OVER) stays native —
    * Spark supports it. Multi-argument aggregates keep a guided error
    * (the CASE wrap covers one argument).
    */
  def rewriteFilterOver(sql: String): String = {
    val masked = maskQuotes(sql)
    FilterOverRe.findAllMatchIn(masked).foreach { m =>
      // find the FILTER(...) close
      var d = 1
      var i = masked.indexOf('(', m.start) + 1
      while (i < masked.length && d > 0) {
        masked.charAt(i) match {
          case '(' => d += 1
          case ')' => d -= 1
          case _ =>
        }
        if (d > 0) i += 1
      }
      if (d == 0) {
        val filterClose = i
        var j = filterClose + 1
        while (j < masked.length && masked.charAt(j).isWhitespace) j += 1
        if (j < masked.length && masked.charAt(j).isLetter &&
          wordStartingAt(masked, j).equalsIgnoreCase("OVER")) {
          def fail(why: String): Nothing =
            throw new graft.functions.expressions.DuckDialectException(
              s"FILTER over a window function couldn't be rewritten ($why) — " +
                "inline the predicate: agg(CASE WHEN pred THEN expr END) OVER (...)")
          val pred = sql.substring(masked.indexOf('(', m.start) + 1, filterClose)
            .replaceAll(raw"(?is)^\s*WHERE\b", "").trim
          // backward: the aggregate call directly before FILTER
          var k = m.start - 1
          while (k >= 0 && masked.charAt(k).isWhitespace) k -= 1
          if (k < 0 || masked.charAt(k) != ')') fail("no aggregate call before FILTER")
          val argsClose = k
          d = 1; k -= 1
          while (k >= 0 && d > 0) {
            masked.charAt(k) match {
              case ')' => d += 1
              case '(' => d -= 1
              case _ =>
            }
            if (d > 0) k -= 1
          }
          if (d != 0) fail("unbalanced aggregate parens")
          val argsOpen = k
          val args = sql.substring(argsOpen + 1, argsClose).trim
          val argsMasked = masked.substring(argsOpen + 1, argsClose)
          // single argument only (no depth-0 comma)
          var dd = 0
          argsMasked.foreach {
            case '(' => dd += 1
            case ')' => dd -= 1
            case ',' if dd == 0 => fail("multi-argument aggregate")
            case _ =>
          }
          val wrapped =
            if (args == "*") s"(CASE WHEN ($pred) THEN 1 END)"
            else s"(CASE WHEN ($pred) THEN ($args) END)"
          return rewriteFilterOver(sql.substring(0, argsOpen + 1) + wrapped +
            ")" + sql.substring(filterClose + 1))
        }
      }
    }
    sql
  }

  /** DuckDB `//` division (r10 — previously a guided error): rewrites
    * each occurrence to the native [[graft.functions.expressions
    * .DuckDiv]] via `graft_ddiv(l, r)`. Semantics probed on duckdb
    * 1.0.0: INTEGER inputs → integer division truncating toward zero
    * (`7 // 2` = 3, `-7 // 2` = −3); any fractional input → plain
    * double division (`7.5 // 2` = 3.75 — DuckDB's actual behavior,
    * not a floor). Same precedence tier as `*`/`/`/`%`, left-assoc
    * (`3 * 5 // 2` = 7 — the LEFT operand is the whole preceding
    * multiplicative chain; `7 // 2 * 3` = 9 — the right operand is one
    * primary). Divide-by-zero is NULL on both engines (probed).
    */
  /** DuckDB's `/` is ALWAYS double division, while Spark keeps DECIMAL
    * division when an operand is DECIMAL-typed (probed 1.0.0:
    * `typeof(41.0 / 640)` = DOUBLE in DuckDB, DecimalType(8,6) in
    * Spark — the VALUES then diverge, 0.0640625 stored binary vs the
    * decimal-exact 0.064063; r18 fuzz seed 112 surfaced it through
    * round()). A decimal LITERAL operand (`\d+.\d+`, the only literal
    * shape both engines type DECIMAL — an exponent makes it DOUBLE
    * everywhere) is syntactically detectable, and ONE double operand
    * makes Spark's division double, so wrap such literals adjacent to
    * `/` in CAST(AS DOUBLE). The no-literal residue (decimal column /
    * decimal column) keeps Spark's decimal result — CAST an operand
    * for exact DuckDB parity there.
    */
  def rewriteDecimalDivLiterals(sql: String): String = {
    if (sql.indexOf('/') < 0) return sql
    val masked = maskQuotes(sql)
    val leftRe = raw"(?<![\w.$$])(\d+\.\d+)(?![\w.]|[eE][+-]?\d)\s*/(?![/*])".r
    val rightRe = raw"/(?![/*])\s*(\d+\.\d+)(?![\w.]|[eE][+-]?\d)".r
    val spans = (leftRe.findAllMatchIn(masked).map(m => (m.start(1), m.end(1))) ++
      rightRe.findAllMatchIn(masked)
        .filter { m =>
          val p = m.start(1) - 1
          p < 0 || { val c = masked.charAt(p)
            !(c.isLetterOrDigit || c == '_' || c == '.' || c == '$') }
        }
        .map(m => (m.start(1), m.end(1)))).toSeq.distinct.sortBy(-_._1)
    spans.foldLeft(sql) { case (acc, (s, e)) =>
      acc.substring(0, s) + s"CAST(${acc.substring(s, e)} AS DOUBLE)" + acc.substring(e)
    }
  }

  def rewriteIntDiv(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = raw"//".r.findFirstMatchIn(masked).getOrElse(return sql)
    def fail(): Nothing = throw new graft.functions.expressions.DuckDialectException(
      "a // division operand couldn't be claimed — write a div b (integer " +
        "truncating division) or floor(a / b) directly")
    var lpos = m.start
    while (lpos > 0 && masked.charAt(lpos - 1).isWhitespace) lpos -= 1
    // left operand: the whole preceding multiplicative chain
    var ls = primaryStartWithSign(masked, lpos).getOrElse(fail())
    var chaining = true
    while (chaining) {
      var k = ls
      while (k > 0 && masked.charAt(k - 1).isWhitespace) k -= 1
      if (k > 0 && "*/%".contains(masked.charAt(k - 1)) &&
        !(k > 1 && masked.charAt(k - 2) == '/')) {
        var q = k - 1
        while (q > 0 && masked.charAt(q - 1).isWhitespace) q -= 1
        primaryStartWithSign(masked, q) match {
          case Some(s) => ls = s
          case None => chaining = false
        }
      } else chaining = false
    }
    val re = primaryEnd(masked, m.end).getOrElse(fail())
    val l = sql.substring(ls, lpos).trim
    val r = sql.substring(m.end, re).trim
    rewriteIntDiv(sql.substring(0, ls) + s"graft_ddiv($l, $r)" + sql.substring(re))
  }

  /** Rewrite DuckDB list comprehensions (r10 — previously a guided
    * error): `[expr FOR v IN list]` → `list_transform(list, v -> expr)`
    * and `[expr FOR v IN list IF cond]` →
    * `list_transform(list_filter(list, v -> cond), v -> expr)` —
    * DuckDB's own desugaring (filter first, then transform), expressed
    * in the list_* aliases the dialect layer already maps to Spark's
    * codegen'd higher-order functions. Pieces are rewritten recursively
    * so nested comprehensions and comprehensions inside the source list
    * compose; scanning is masked-text (brackets in strings are inert)
    * and the FOR/IN/IF keywords must sit at TOP level of the bracket
    * body (a nested `[... FOR ...]` inside a plain list literal doesn't
    * claim the outer bracket). Plain list literals `[1, 2]`, indexing
    * `l[i]` and slices `l[a:b]` never match — no top-level FOR.
    */
  def rewriteComprehension(sql: String): String = {
    val masked = maskQuotes(sql)
    // find the FIRST '[' whose body carries a top-level FOR
    var i = 0
    while (i < masked.length) {
      if (masked.charAt(i) == '[') {
        // matching ']' by bracket depth ('(' depth tracked so a bracket
        // inside a nested call still counts — both are balanced)
        var j = i + 1
        var depth = 1
        while (j < masked.length && depth > 0) {
          masked.charAt(j) match {
            case '[' => depth += 1
            case ']' => depth -= 1
            case _ =>
          }
          if (depth > 0) j += 1
        }
        if (depth == 0) {
          val body = masked.substring(i + 1, j)
          // top-level keyword positions inside the body
          def topLevel(re: scala.util.matching.Regex): List[Int] =
            re.findAllMatchIn(body).filter { m =>
              val pre = body.substring(0, m.start)
              pre.count(_ == '(') == pre.count(_ == ')') &&
                pre.count(_ == '[') == pre.count(_ == ']')
            }.map(_.start).toList
          topLevel(raw"(?i)\bFOR\b".r) match {
            case forPos :: _ =>
              val exprRaw = sql.substring(i + 1, i + 1 + forPos).trim
              val afterFor = body.substring(forPos + 3)
              val inM = raw"(?is)^\s*([A-Za-z_]\w*)\s+IN\b".r
                .findFirstMatchIn(afterFor).getOrElse(
                  throw new graft.functions.expressions.DuckDialectException(
                    "list comprehension couldn't be parsed — expected " +
                      "[expr FOR var IN list [IF cond]]"))
              val v = inM.group(1)
              val restStart = forPos + 3 + inM.end
              val rest = body.substring(restStart) // masked
              val restRaw = sql.substring(i + 1 + restStart, j)
              val ifPos = raw"(?i)\bIF\b".r.findAllMatchIn(rest).find { m =>
                val pre = rest.substring(0, m.start)
                pre.count(_ == '(') == pre.count(_ == ')') &&
                  pre.count(_ == '[') == pre.count(_ == ']')
              }.map(_.start)
              val (listRaw, condRaw) = ifPos match {
                case Some(pos) =>
                  (restRaw.substring(0, pos).trim, Some(restRaw.substring(pos + 2).trim))
                case None => (restRaw.trim, None)
              }
              val expr = rewriteComprehension(exprRaw)
              val lst = rewriteComprehension(listRaw)
              val src = condRaw match {
                case Some(c) =>
                  s"list_filter($lst, $v -> ${rewriteComprehension(c)})"
                case None => lst
              }
              val replacement = s"list_transform($src, $v -> $expr)"
              return rewriteComprehension(
                sql.substring(0, i) + replacement + sql.substring(j + 1))
            case Nil =>
          }
        }
      }
      i += 1
    }
    sql
  }

  private val ClauseKwRe =
    raw"(?i)\b(WHERE|GROUP|HAVING|QUALIFY|WINDOW|ORDER|LIMIT|OFFSET|UNION|INTERSECT|EXCEPT)\b".r

  /** DuckDB's FROM-first statement syntax: `FROM t` (implicit
    * `SELECT *`), `FROM t WHERE ...` and `FROM t SELECT cols ...` all
    * rewrite to standard clause order. Statement-anchored (a FROM-first
    * subquery is rare enough to stay a parse error); the table
    * expression runs to the depth-0 SELECT, whose select list then runs
    * to the next depth-0 clause keyword. Purely textual — joins,
    * sampling and every later rewrite see ordinary SQL.
    */
  def rewriteFromFirst(sql: String): String = {
    val masked = maskQuotes(sql)
    val head = raw"(?is)^\s*FROM\s".r.findFirstMatchIn(masked).getOrElse(return sql)
    // depth-0 SELECT ends the table expression (if present)
    var selPos = -1
    var d = 0
    val SelectRe = raw"(?i)\bSELECT\b".r
    SelectRe.findAllMatchIn(masked).foreach { m =>
      if (selPos < 0) {
        d = masked.substring(0, m.start).count(_ == '(') -
          masked.substring(0, m.start).count(_ == ')')
        if (d == 0) selPos = m.start
      }
    }
    if (selPos < 0) return "SELECT * " + sql.substring(head.start)
    val tableExpr = sql.substring(head.end - 1, selPos).trim
    val after = sql.substring(selPos + "SELECT".length)
    val afterMasked = masked.substring(selPos + "SELECT".length)
    // select list ends at the first depth-0 clause keyword
    var cut = -1
    ClauseKwRe.findAllMatchIn(afterMasked).foreach { m =>
      if (cut < 0) {
        val dd = afterMasked.substring(0, m.start).count(_ == '(') -
          afterMasked.substring(0, m.start).count(_ == ')')
        if (dd == 0) cut = m.start
      }
    }
    val (selectList, tail) =
      if (cut < 0) (after.trim, "")
      else (after.substring(0, cut).trim, after.substring(cut).trim)
    s"SELECT $selectList FROM $tableExpr" + (if (tail.nonEmpty) s" $tail" else "")
  }

  /** Rewrite DuckDB's bracket slicing `expr[begin:end]` (1-based
    * inclusive, open ends, negatives, strings too — exact semantics in
    * [[graft.functions.expressions.DuckSlice]], verified against duckdb
    * 1.0.0) into the registered `graft_bracket_slice(expr, begin|NULL,
    * end|NULL)` call (VERDICT r8 missing #1 — among the most common
    * DuckDB-isms a migrating passthrough user writes; previously a
    * guided error). The base expression is claimed by a backward scan
    * over primary-expression shapes — identifiers (qualified,
    * backquoted), string literals, a closing `)`/`]` group plus any
    * prefix chain — so `l[2:]`, `t.c[:3]`, `f(x)[1:2]`, `'abc'[2:-2]`
    * and chained `l[2:][1:]` all rewrite. Subscripts without a
    * top-level colon (`l[i]`, `m['k']`), casts (`x::INT`) and brackets
    * whose base the scan cannot claim are left alone (→ guided error).
    */
  def rewriteSlice(sql: String): String = {
    val masked = maskQuotes(sql)
    var i = 0
    while (i < masked.length) {
      if (masked.charAt(i) == '[') {
        sliceSpan(masked, i) match {
          case Some((colon, close)) =>
            sliceBaseStart(masked, i) match {
              case Some(bs) =>
                val base = sql.substring(bs, i)
                val bTxt = sql.substring(i + 1, colon).trim
                val eTxt = sql.substring(colon + 1, close).trim
                val b = if (bTxt.isEmpty) "NULL" else bTxt
                val e = if (eTxt.isEmpty) "NULL" else eTxt
                return rewriteSlice(sql.substring(0, bs) +
                  s"graft_bracket_slice($base, $b, $e)" + sql.substring(close + 1))
              case None => // unclaimable base → leave for the guided error
            }
          case None =>
        }
      }
      i += 1
    }
    sql
  }

  /** Rewrite DuckDB's scalar subscript `base[i]` / `m['k']` (r13 —
    * previously left to Spark's native subscript, whose 0-BASED array
    * indexing silently returned the wrong element for every migrated
    * 1-based DuckDB query) into the registered `graft_bracket_get`
    * ([[graft.functions.expressions.DuckBracketGet]]: 1-based, negative
    * from the end, `[0]`/out-of-range NULL, LIST-shaped map gets,
    * struct fields, 1-based string chars). Runs AFTER rewriteSlice, so
    * every remaining claimable `[` with a non-empty colon-free body is
    * a subscript (list LITERALS were already rewritten to `array(…)`
    * and MAP-literal subscripts consumed by rewriteStructLiteral).
    * Type-position brackets are skipped: `CAST(x AS INT[3])` /
    * `x::INT[3]` keep their bare-identifier base when preceded by
    * `AS`/`::` (DuckDB array-type syntax, not a subscript).
    */
  def rewriteSubscript(sql: String): String = {
    val masked = maskQuotes(sql)
    var i = 0
    while (i < masked.length) {
      if (masked.charAt(i) == '[') {
        val span = sliceSpan(masked, i) // colon inside → slice (handled)
        if (span.isEmpty) subscriptClose(masked, i).foreach { close =>
          val body = sql.substring(i + 1, close).trim
          if (body.nonEmpty) sliceBaseStart(masked, i).foreach { bs =>
            // skip type positions: `:: TYPE [n]` and `AS TYPE [n]`
            var p = bs
            while (p > 0 && masked.charAt(p - 1).isWhitespace) p -= 1
            val isCastType = (p >= 2 && masked.charAt(p - 1) == ':' &&
              masked.charAt(p - 2) == ':') ||
              (p >= 2 && wordEndingAt(masked, p - 1).equalsIgnoreCase("AS"))
            if (!isCastType) {
              val base = sql.substring(bs, i)
              return rewriteSubscript(sql.substring(0, bs) +
                s"graft_bracket_get($base, $body)" + sql.substring(close + 1))
            }
          }
        }
      }
      i += 1
    }
    sql
  }

  /** Matching `]` of a bracket opened at `open` (no colon requirement). */
  private def subscriptClose(masked: String, open: Int): Option[Int] = {
    var i = open + 1
    var db = 0
    var dp = 0
    while (i < masked.length) {
      masked.charAt(i) match {
        case '[' => db += 1
        case ']' if db > 0 => db -= 1
        case ']' if dp == 0 => return Some(i)
        case ']' => return None // unbalanced parens inside
        case '(' => dp += 1
        case ')' => dp -= 1
        case _ =>
      }
      i += 1
    }
    None
  }

  /** (colonPos, closePos) of a slice bracket opened at `open`: the
    * matching `]` with ONE top-level `:` inside (a `::` cast never
    * counts; two slice colons — DuckDB's step form — stay unsupported
    * → guided error).
    */
  private def sliceSpan(masked: String, open: Int): Option[(Int, Int)] = {
    var i = open + 1
    var db = 0
    var dp = 0
    var colon = -1
    while (i < masked.length) {
      masked.charAt(i) match {
        case '[' => db += 1
        case ']' if db > 0 => db -= 1
        case ']' => return if (colon >= 0) Some((colon, i)) else None
        case '(' => dp += 1
        case ')' => dp -= 1
        case ':' if db == 0 && dp == 0 =>
          val isCast = (i + 1 < masked.length && masked.charAt(i + 1) == ':') ||
            masked.charAt(i - 1) == ':'
          if (!isCast) {
            if (colon >= 0) return None
            colon = i
          }
        case _ =>
      }
      i += 1
    }
    None
  }

  /** Start of the primary-expression chain ending right before the `[`
    * at `brPos`; None when no sliceable base precedes (list literal,
    * keyword, clause start).
    */
  private def sliceBaseStart(masked: String, brPos: Int): Option[Int] = {
    var j = brPos
    var any = false
    var bareIdentOnly = false
    var scanning = true
    while (scanning && j > 0) {
      val c = masked.charAt(j - 1)
      if (c.isLetterOrDigit || c == '_' || c == '$') {
        var b = j - 1
        while (b > 0 && { val x = masked.charAt(b - 1)
          x.isLetterOrDigit || x == '_' || x == '$' }) b -= 1
        bareIdentOnly = !any
        j = b; any = true
        if (b > 0 && masked.charAt(b - 1) == '.') j = b - 1 else scanning = false
      } else if (c == '`') {
        var b = j - 2
        while (b >= 0 && masked.charAt(b) != '`') b -= 1
        if (b < 0) return None
        bareIdentOnly = false
        j = b; any = true
        if (b > 0 && masked.charAt(b - 1) == '.') j = b - 1 else scanning = false
      } else if (c == '\'') {
        var b = j - 2
        while (b >= 0 && masked.charAt(b) != '\'') b -= 1
        if (b < 0) return None
        j = b; any = true; bareIdentOnly = false; scanning = false
      } else if (c == ')' || c == ']') {
        val openCh = if (c == ')') '(' else '['
        var d = 1
        var b = j - 2
        while (b >= 0 && d > 0) {
          val cc = masked.charAt(b)
          if (cc == c) d += 1 else if (cc == openCh) d -= 1
          b -= 1
        }
        if (d > 0) return None
        // a ']' group is only claimable when its '[' is a SUBSCRIPT on
        // a preceding expression — a bare `[1,2,3]` is a DuckDB list
        // LITERAL, which has no Spark rewrite: leave it unclaimed so
        // the guided construct hint fires instead of a raw parse error
        // on the mangled literal (review r9)
        if (c == ']' && (b < 0 || { val p = masked.charAt(b)
          !(p.isLetterOrDigit || p == '_' || p == '$' || p == '`' ||
            p == ')' || p == ']' || p == '\'') })) return None
        bareIdentOnly = false
        j = b + 1; any = true // keep scanning: fn name / chain before the group
      } else scanning = false
    }
    if (!any) None
    else if (bareIdentOnly && Set("ARRAY", "MAP", "END", "NULL", "TRUE",
        "FALSE", "THEN", "ELSE", "WHEN", "AND", "OR", "NOT", "IN",
        "SELECT", "WHERE", "FROM", "ON", "BY")
        .contains(wordStartingAt(masked, j))) None
    else Some(j)
  }

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

  private val DistinctOnRe = raw"(?is)\bSELECT\s+DISTINCT\s+ON\s*\(".r

  /** Rewrite DuckDB/Postgres `SELECT DISTINCT ON (keys) sel FROM …
    * ORDER BY o` into the QUALIFY form `SELECT sel FROM … QUALIFY
    * row_number() OVER (PARTITION BY keys ORDER BY o) = 1 ORDER BY o`,
    * which [[rewriteQualify]] (running next in [[rewriteAll]]) lowers to
    * a ranked subquery. DuckDB keeps, per distinct key, the first row in
    * the query's ORDER BY — exactly row_number() = 1 over that ordering
    * (duckdb docs: SELECT clause, DISTINCT ON; reference users get the
    * construct via the verbatim passthrough, filefilter.py:340-342).
    *
    * Guided errors for the shapes with no deterministic mechanical
    * rewrite: no ORDER BY (DuckDB picks an arbitrary row — irreproducible
    * on a cluster), ordinal ORDER BY items (`ORDER BY 1` means a constant
    * inside an OVER clause, not the first column), and a top-level set
    * operation before the ORDER BY (the ORDER BY belongs to the combined
    * result, not this SELECT). ORDER BY items must also be visible in the
    * select list (Spark resolves the outer sort against the rewritten
    * subquery's output).
    */
  private val GroupingConstructRe =
    raw"(?i)\bGROUP\s+BY\s+(ROLLUP|CUBE|GROUPING\s+SETS)\s*\(".r

  /** DuckDB resolves select-list ALIASES as ROLLUP/CUBE/GROUPING SETS
    * items AND as `grouping()`/`grouping_id()` arguments in either
    * spelling — `SELECT n AS g, grouping(n) ... GROUP BY ROLLUP (g)`
    * and `grouping(g)` both bind (probed 1.0.0); Spark's analyzer
    * demands the grouping() child match a grouping column EXACTLY
    * (GROUPING_COLUMN_MISMATCH on both shapes, probed). Normalize to
    * the one form both engines execute: construct items that are bare
    * select-list aliases are replaced by their underlying expressions,
    * and grouping()/grouping_id() arguments naming THOSE aliases follow
    * (only those — `grouping(alias)` where the GROUP BY names the raw
    * expression is a Binder error in DuckDB too, and stays loud here).
    * Found by FuzzDiff (r16 template 40).
    *
    * Safety rules (ADVICE r16, all probed on 1.0.0): DuckDB resolves
    * ONLY aliases that form a COMPLETE construct item — `ROLLUP (p *
    * 2)` and `CUBE (abs(p))` with alias p are Binder errors, and `t.p`
    * is a column path — so substitution is delimiter-bounded to bare
    * items; every other occurrence keeps both engines' loud errors.
    * When `resolve` can see the block's source relation, an alias that
    * SHADOWS a real input column is not substituted at all — DuckDB
    * binds the COLUMN there (Postgres precedence), and so does Spark,
    * so the untouched text already agrees (typically a loud
    * ungrouped-expression error on both). Both the explicit `expr AS a`
    * and DuckDB's implicit `expr a` alias forms are collected (quoted
    * aliases are not — they'd be quoted in the construct too, where the
    * identifier scan never matches them, so nothing mis-rewrites; they
    * simply keep Spark's loud GROUPING_COLUMN_MISMATCH).
    */
  def rewriteGroupingAliases(sql: String, depth: Int = 0,
      resolve: String => Option[Seq[String]] = _ => None): String = {
    // depth caps pathological alias cycles (`SELECT b AS a, a AS b ...
    // ROLLUP (a)` would ping-pong forever); real queries settle in 1-2
    if (depth > 8) return sql
    val masked = maskQuotes(sql)
    // try each construct left-to-right; the first that yields a change
    // wins and the result recurses (so every block eventually settles)
    for (m <- GroupingConstructRe.findAllMatchIn(masked)) {
      rewriteOneGroupingConstruct(sql, masked, m, resolve) match {
        case Some(out) => return rewriteGroupingAliases(out, depth + 1, resolve)
        case None =>
      }
    }
    sql
  }

  /** One ROLLUP/CUBE/GROUPING SETS occurrence: None when nothing to
    * change (no enclosing block found, no aliased select items, or no
    * alias used as a construct item). All identifier FINDS run on the
    * quote-masked text (literal content is underscores there) and
    * replacements splice into the raw text by position.
    */
  private def rewriteOneGroupingConstruct(
      sql: String, masked: String,
      m: scala.util.matching.Regex.Match,
      resolve: String => Option[Seq[String]]): Option[String] = {
    // balanced construct span
    val open = m.end - 1
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
    if (d != 0) return None
    val close = i // index AFTER the ')'
    // enclosing SELECT: scan backward from the match at depth 0
    var j = m.start - 1
    var bd = 0
    var selPos = -1
    while (j >= 0 && selPos < 0) {
      val c = masked.charAt(j)
      if (c == ')') bd += 1
      else if (c == '(') bd -= 1
      else if (bd == 0 && c.isLetter && wordStartingAt(masked, j) == "SELECT" &&
        (j == 0 || (!masked.charAt(j - 1).isLetterOrDigit && masked.charAt(j - 1) != '_')))
        selPos = j
      j -= 1
    }
    if (selPos < 0) return None
    // select list = SELECT .. FROM at the same depth
    var k = selPos + 6
    var fd = 0
    var fromPos = -1
    while (k < m.start && fromPos < 0) {
      val c = masked.charAt(k)
      if (c == '(') fd += 1
      else if (c == ')') fd -= 1
      else if (fd == 0 && c.isLetter &&
        (!masked.charAt(k - 1).isLetterOrDigit && masked.charAt(k - 1) != '_') &&
        wordStartingAt(masked, k) == "FROM") fromPos = k
      k += 1
    }
    if (fromPos < 0) return None
    val selText = sql.substring(selPos + 6, fromPos)
    val aliasRe = raw"(?is)^(.*\S)\s+AS\s+([A-Za-z_]\w*)$$".r
    val implicitAliasRe = raw"(?is)^(.*\S)\s+([A-Za-z_]\w*)$$".r
    // words making a trailing identifier part of the EXPRESSION, not an
    // implicit alias (`a AND b`, `x IS NULL`, `EXTRACT(... FROM ts)`)
    val notBeforeAlias = Set("AND", "OR", "NOT", "IS", "LIKE", "ILIKE",
      "GLOB", "SIMILAR", "IN", "BETWEEN", "ESCAPE", "ALL", "ANY", "SOME",
      "DISTINCT", "CASE", "WHEN", "THEN", "ELSE", "COLLATE", "AS", "TO",
      "FROM", "BY", "OVER", "FILTER", "WITHIN", "EXCLUDE", "REPLACE",
      "INTERVAL", "XOR")
    // words that LOOK like a trailing identifier but never alias
    // (literals, CASE END, interval units)
    val notAnAlias = Set("TRUE", "FALSE", "NULL", "END", "ASC", "DESC",
      "DAY", "DAYS", "MONTH", "MONTHS", "YEAR", "YEARS", "HOUR", "HOURS",
      "MINUTE", "MINUTES", "SECOND", "SECONDS", "WEEK", "WEEKS",
      "MILLISECOND", "MILLISECONDS", "MICROSECOND", "MICROSECONDS",
      "QUARTER", "QUARTERS", "DECADE", "DECADES", "CENTURY", "CENTURIES")
    def implicitAlias(item: String): Option[(String, String)] =
      implicitAliasRe.findFirstMatchIn(item).flatMap { im =>
        val e = im.group(1); val a = im.group(2)
        val prevWord = raw"([A-Za-z_]\w*)\s*$$".r.findFirstMatchIn(e)
          .map(_.group(1).toUpperCase)
        if (notAnAlias.contains(a.toUpperCase) ||
          prevWord.exists(notBeforeAlias.contains) ||
          "+-*/%|&^<>=,(~!".indexOf(e.last) >= 0) None
        else Some(a.toLowerCase -> e)
      }
    val aliasMapAll: Map[String, String] =
      splitTopLevel(selText, maskQuotes(selText)).flatMap(_.trim match {
        case aliasRe(e, a) => Some(a.toLowerCase -> e)
        case it => implicitAlias(it)
      }).toMap
    // alias vs real-column shadowing: when the block's source relation
    // resolves and an alias NAMES one of its columns, DuckDB binds the
    // construct item to the COLUMN (Postgres precedence, probed 1.0.0)
    // — and so does Spark, so the untouched text already agrees and
    // substituting the alias expression would silently diverge
    val shadowed: Set[String] =
      blockFromRelation(sql, masked, selPos).flatMap(resolve)
        .getOrElse(Nil).map(_.toLowerCase).toSet
    val aliasMap = aliasMapAll -- shadowed
    if (aliasMap.isEmpty) return None
    // construct items: replace alias tokens that form a COMPLETE item —
    // delimiter-bounded by '('/','/span-start on the left and
    // ','/')'/span-end on the right (found on the MASKED span, spliced
    // into the raw span). DuckDB resolves ONLY bare-item aliases
    // (probed 1.0.0: `ROLLUP (p * 2)` and `CUBE (abs(p))` with alias p
    // are Binder errors, and `t.p` is a column path) — so qualified
    // refs, function calls, and aliases inside larger expressions are
    // never substituted; they stay loud on both engines.
    val spanRaw = sql.substring(open + 1, close - 1)
    val spanMasked = masked.substring(open + 1, close - 1)
    val replaced = scala.collection.mutable.Set[String]()
    val identRe = raw"(?i)\b([A-Za-z_]\w*)\b".r
    def nextNonSpace(s: String, from: Int): Char = {
      var p = from
      while (p < s.length && s.charAt(p).isWhitespace) p += 1
      if (p < s.length) s.charAt(p) else ' '
    }
    def prevNonSpace(s: String, from: Int): Char = {
      var p = from - 1
      while (p >= 0 && s.charAt(p).isWhitespace) p -= 1
      if (p >= 0) s.charAt(p) else ' '
    }
    val sb = new StringBuilder
    var last = 0
    for (mm <- identRe.findAllMatchIn(spanMasked)) {
      val l = prevNonSpace(spanMasked, mm.start)
      val r = nextNonSpace(spanMasked, mm.end)
      val bareItem = (l == ' ' || l == '(' || l == ',') &&
        (r == ' ' || r == ')' || r == ',')
      aliasMap.get(mm.group(1).toLowerCase) match {
        case Some(e) if bareItem =>
          replaced += mm.group(1).toLowerCase
          sb.append(spanRaw.substring(last, mm.start)).append(e)
          last = mm.end
        case _ =>
      }
    }
    if (replaced.isEmpty) return None
    sb.append(spanRaw.substring(last))
    val newSpan = sb.toString
    // grouping()/grouping_id() args over the replaced aliases — block
    // scope: the enclosing SELECT to the end of its balanced region
    var blockEnd = close
    var ed = 0
    while (blockEnd < masked.length && ed >= 0) {
      masked.charAt(blockEnd) match {
        case '(' => ed += 1
        case ')' => ed -= 1
        case _ =>
      }
      if (ed >= 0) blockEnd += 1
    }
    val grRe = raw"(?i)\b(grouping|grouping_id)\s*\(([^()]*)\)".r
    def fixGrouping(raw0: String): String = {
      val msk = maskQuotes(raw0)
      val b = new StringBuilder
      var p = 0
      for (gm <- grRe.findAllMatchIn(msk)) {
        val rawArgs = raw0.substring(gm.start(2), gm.end(2))
        val args = rawArgs.split(",").map(_.trim).map { a =>
          if (replaced.contains(a.toLowerCase)) aliasMap(a.toLowerCase) else a
        }.mkString(", ")
        b.append(raw0.substring(p, gm.start(2))).append(args)
        p = gm.end(2)
      }
      b.append(raw0.substring(p))
      b.toString
    }
    val head = sql.substring(0, selPos)
    val mid0 = sql.substring(selPos, open + 1) + newSpan + sql.substring(close - 1, close)
    val tail0 = sql.substring(close, blockEnd)
    val tailAfter = sql.substring(blockEnd)
    Some(head + fixGrouping(mid0) + fixGrouping(tail0) + tailAfter)
  }

  /** Empty-input grouping-sets parity handle (r17 — closes the r16
    * documented divergence). DuckDB emits one row PER EMPTY grouping
    * set even when the input has ZERO rows — all probed on 1.0.0:
    * `GROUP BY ROLLUP (g)` over an empty relation yields the
    * grand-total row with select expressions evaluated over NULL keys
    * (`coalesce(g,'TOT')` renders 'TOT'), aggregates at their
    * empty-input values (count 0, sum NULL), `grouping()` = 1 /
    * `grouping_id(a,b)` = 3, HAVING applied to that row,
    * `GROUPING SETS ((), ())` yielding TWO rows, and mixed
    * `GROUP BY g, ROLLUP (h)` (no pure-empty set) yielding none.
    * Spark's grouping-sets expansion aggregates WITH keys, so zero
    * input rows always yield zero output rows.
    *
    * [[graft.operators.SqlStage]] closes the gap with the q105 pivot
    * pattern: `probeSql` is a LIMIT-1 emptiness check (CollectLimit
    * early-exits, so the probe is near-free on non-empty inputs — the
    * only case that exists at scale); ONLY when it returns no row is
    * the statement swapped for `buildArm`'s global-aggregate arm, in
    * which every grouping-expression occurrence is substituted by a
    * typed NULL (key expressions then evaluate over NULL exactly like
    * DuckDB's grand-total row, and whatever lands inside aggregate
    * arguments is irrelevant — there are no rows), grouping() /
    * grouping_id() become their all-aggregated constants, the original
    * HAVING is retained, ORDER BY is dropped (the arm emits at most a
    * few identical rows), LIMIT/OFFSET reapply outside, and
    * `count(*) = 0` joins the HAVING to force aggregate context when
    * the select list carries no aggregate of its own. The caller
    * renames/casts the arm to the plain statement's exact schema, so
    * no per-item aliasing is needed here.
    *
    * None = out of scope (no construct, a non-empty-capable construct
    * list, mixed GROUP BY, set ops, DISTINCT, OVER, WITH, or scalar
    * subqueries in the select list) — those keep plain Spark behavior.
    */
  case class EmptyGroupingSpec(
      probeSql: String,
      groupingExprs: Seq[String],
      typeProbe: String => String,
      buildArm: Map[String, String] => String)

  def emptyGroupingSetsSpec(sql0: String): Option[EmptyGroupingSpec] = {
    val sql = {
      val t = sql0.trim
      (if (t.endsWith(";")) t.dropRight(1) else t).trim
    }
    val masked = maskQuotes(sql)
    if (raw"(?is)^SELECT\b".r.findFirstIn(masked).isEmpty) return None
    if (raw"(?is)^SELECT\s+DISTINCT\b".r.findFirstIn(masked).isDefined) return None
    if (raw"(?i)\bOVER\b".r.findFirstIn(masked).isDefined) return None
    if (depth0Find(masked, raw"(?i)\b(UNION|INTERSECT|EXCEPT)\b".r,
      0, masked.length).isDefined) return None
    val gbPos = depth0Find(masked, raw"(?i)\bGROUP\s+BY\b".r, 0, masked.length)
      .getOrElse(return None)
    // the GROUP BY body must be EXACTLY one construct starting right at
    // the GROUP BY (mixed `GROUP BY g, ROLLUP (h)` has no pure-empty
    // set — zero rows on both engines already)
    val cm = GroupingConstructRe.findFirstMatchIn(masked.substring(gbPos))
      .filter(_.start == 0).getOrElse(return None)
    val open = gbPos + cm.end - 1
    var i = open + 1
    var d = 1
    while (i < masked.length && d > 0) {
      masked.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      i += 1
    }
    if (d != 0) return None
    val close = i // index AFTER ')'
    val kind = cm.group(1).toUpperCase.replaceAll(raw"\s+", " ")
    val interior = sql.substring(open + 1, close - 1)
    // grand-total multiplicity: ROLLUP/CUBE always contain the empty
    // set once; explicit GROUPING SETS contain it per literal `()`
    val setItems = splitTopLevel(interior, masked.substring(open + 1, close - 1))
      .map(_.trim)
    val grandTotals =
      if (kind == "ROLLUP" || kind == "CUBE") 1
      else setItems.count(it => it == "()" || it.isEmpty)
    if (grandTotals == 0) return None
    // atomic grouping expressions: composite items `(a, b)` flatten
    val groupingExprs: Seq[String] = setItems.flatMap { it =>
      if (it.startsWith("(") && it.endsWith(")")) {
        val inner = it.substring(1, it.length - 1)
        splitTopLevel(inner, maskQuotes(inner)).map(_.trim).filter(_.nonEmpty)
      } else if (it.nonEmpty) Seq(it) else Nil
    }.distinct
    // clause spans
    val fromPos = depth0Find(masked, raw"(?i)\bFROM\b".r, 0, gbPos)
      .getOrElse(return None)
    val selList = sql.substring(6, fromPos)
    if (raw"(?i)\bSELECT\b".r.findFirstIn(maskQuotes(selList)).isDefined) return None
    val fromWhere = sql.substring(fromPos + 4, gbPos)
    val tailMasked = masked.substring(close)
    def tailFind(re: scala.util.matching.Regex): Option[Int] =
      depth0Find(tailMasked, re, 0, tailMasked.length).map(_ + close)
    val havingPos = tailFind(raw"(?i)\bHAVING\b".r)
    val orderPos = tailFind(raw"(?i)\bORDER\s+BY\b".r)
    val limitPos = Seq(tailFind(raw"(?i)\bLIMIT\b".r),
      tailFind(raw"(?i)\bOFFSET\b".r)).flatten.minOption
    // anything else after the construct (another grouping item, a
    // window clause, …) is out of scope
    val firstTail = Seq(havingPos, orderPos, limitPos).flatten.minOption
      .getOrElse(sql.length)
    if (sql.substring(close, firstTail).trim.nonEmpty) return None
    val having = havingPos.map { hp =>
      val end = Seq(orderPos, limitPos).flatten.filter(_ > hp)
        .minOption.getOrElse(sql.length)
      sql.substring(hp + 6, end)
    }
    val limitTail = limitPos.map(lp => sql.substring(lp))
    // a whitespace-flexible, quote-masked, word-boundary-guarded
    // replace-all of one expression's occurrences
    def replAll(frag: String, find: String, repl: String): String = {
      val chunks = find.trim.split(raw"\s+").map(java.util.regex.Pattern.quote)
      val lead = if (find.trim.head.isLetterOrDigit || find.trim.head == '_') raw"\b" else ""
      val trail = if (find.trim.last.isLetterOrDigit || find.trim.last == '_') raw"\b" else ""
      val p = ("(?i)" + lead + chunks.mkString(raw"\s*") + trail).r
      val msk = maskQuotes(frag)
      val sb = new StringBuilder
      var last = 0
      for (mm <- p.findAllMatchIn(msk)) {
        sb.append(frag.substring(last, mm.start)).append(repl)
        last = mm.end
      }
      sb.append(frag.substring(last))
      sb.toString
    }
    // grouping()/grouping_id() → all-aggregated constants (Spark types:
    // grouping = TINYINT, grouping_id = BIGINT)
    def substGroupingFns(frag0: String): String = {
      var frag = frag0
      var guard = 0
      var done = false
      while (!done && guard < 64) {
        guard += 1
        val msk = maskQuotes(frag)
        raw"(?i)\b(grouping|grouping_id)\s*\(".r.findFirstMatchIn(msk) match {
          case Some(gm) =>
            closeOf(msk, gm.end) match {
              case Some(e) =>
                val nArgs = {
                  val a = frag.substring(gm.end, e - 1).trim
                  if (a.isEmpty) groupingExprs.size
                  else splitTopLevel(a, maskQuotes(a)).size
                }
                val const =
                  if (gm.group(1).equalsIgnoreCase("grouping")) "CAST(1 AS TINYINT)"
                  else s"CAST(${(1L << nArgs) - 1} AS BIGINT)"
                frag = frag.substring(0, gm.start) + const + frag.substring(e)
              case None => done = true
            }
          case None => done = true
        }
      }
      frag
    }
    val spec = EmptyGroupingSpec(
      probeSql = s"SELECT 1 AS __p FROM $fromWhere LIMIT 1",
      groupingExprs = groupingExprs,
      typeProbe = e => s"SELECT ($e) AS __ty FROM $fromWhere LIMIT 0",
      buildArm = types => {
        def substitute(frag0: String): String = {
          var frag = substGroupingFns(frag0)
          for (e <- groupingExprs.sortBy(-_.length)) {
            val t = types.getOrElse(e, "STRING")
            frag = replAll(frag, e, s"CAST(NULL AS $t)")
          }
          frag
        }
        val substSel = substitute(selList)
        val havingArm = having.map(h => s"(${substitute(h)}) AND count(*) = 0")
          .getOrElse("count(*) = 0")
        val base = s"SELECT $substSel FROM $fromWhere HAVING $havingArm"
        val unioned =
          if (grandTotals == 1) base
          else Seq.fill(grandTotals)(s"SELECT * FROM ($base)").mkString(" UNION ALL ")
        limitTail match {
          case Some(t) => s"SELECT * FROM ($unioned) $t"
          case None => unioned
        }
      })
    Some(spec)
  }

  /** Body spans of a NON-RECURSIVE top-level WITH clause:
    * (bodyStart, bodyEnd) with [bodyStart, bodyEnd) the text INSIDE
    * each definition's parentheses, in definition order. Empty for any
    * other statement shape.
    */
  private def cteBodySpans(masked: String): Seq[(Int, Int)] = {
    val wm = raw"(?is)^\s*WITH\s+".r.findFirstMatchIn(masked)
      .getOrElse(return Nil)
    if (raw"(?is)^\s*WITH\s+RECURSIVE\b".r.findFirstIn(masked).isDefined)
      return Nil
    val out = Seq.newBuilder[(Int, Int)]
    var p = wm.end
    var more = true
    while (more) {
      more = false
      val defRe = raw"(?s)^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\([^()]*\)\s*)?(?i:AS)\s*(?:(?i:NOT\s+MATERIALIZED)\s*|(?i:MATERIALIZED)\s*)?\(".r
      defRe.findFirstMatchIn(masked.substring(p)).foreach { dm =>
        closeOf(masked, p + dm.end).foreach { close =>
          out += ((p + dm.end, close - 1))
          var q = close
          while (q < masked.length && masked.charAt(q).isWhitespace) q += 1
          if (q < masked.length && masked.charAt(q) == ',') { p = q + 1; more = true }
        }
      }
    }
    out.result()
  }

  /** CTE-scoped sites of the empty-input grouping-sets parity (r18 —
    * fuzz template 63 found the WITH-wrapped form of the r17
    * divergence: DuckDB's grand-total row materializes inside a CTE
    * too, so `WITH g AS (SELECT ... GROUP BY GROUPING SETS (..., ()))
    * SELECT ... OVER ... FROM g` returns one row over an empty input
    * where plain Spark returns none). Each top-level CTE body that
    * matches [[emptyGroupingSetsSpec]] yields a (bodyStart, bodyEnd,
    * spec) site; [[graft.operators.SqlStage]] probes each and splices
    * an aligned arm view over the span when the body's input is
    * provably empty. The OUTER query's shape is unconstrained (windows
    * over the CTE are fine — parity is restored before it runs); a
    * body referencing an earlier same-statement CTE fails its probe's
    * analysis and falls back to plain Spark behavior.
    */
  def emptyGroupingSetsCteSites(sql: String): Seq[(Int, Int, EmptyGroupingSpec)] = {
    val masked = maskQuotes(sql)
    cteBodySpans(masked).flatMap { case (bs, be) =>
      emptyGroupingSetsSpec(sql.substring(bs, be)).map(spec => (bs, be, spec))
    }
  }

  def rewriteDistinctOn(sql: String): String = {
    val masked = maskQuotes(sql)
    DistinctOnRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) =>
        val keysOpen = m.end - 1
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
        val keysClose = i - 1
        val keys = sql.substring(keysOpen + 1, keysClose).trim
        if (keys.isEmpty)
          throw new graft.functions.expressions.DuckDialectException(
            "DISTINCT ON with an empty key list")
        // scan this block for its top-level ORDER BY; stop at the
        // enclosing ')' or a same-depth set operation
        val setOps = Set("UNION", "INTERSECT", "EXCEPT", "MINUS")
        var j = keysClose + 1
        var depth = 0
        var orderPos = -1
        var scanning = true
        while (j < masked.length && scanning) {
          val c = masked.charAt(j)
          if (c == '(') { depth += 1; j += 1 }
          else if (c == ')') {
            if (depth == 0) scanning = false else { depth -= 1; j += 1 }
          } else if (depth == 0 && c.isLetter &&
            (j == 0 || (!masked.charAt(j - 1).isLetterOrDigit && masked.charAt(j - 1) != '_'))) {
            val w = wordStartingAt(masked, j)
            if (w == "ORDER") { orderPos = j; scanning = false }
            else if (setOps.contains(w))
              throw new graft.functions.expressions.DuckDialectException(
                "DISTINCT ON combined with a set operation has no mechanical " +
                  "rewrite (the ORDER BY orders the combined result, not the " +
                  "DISTINCT ON pick) — wrap the DISTINCT ON SELECT in a subquery " +
                  "with its own ORDER BY")
            else j += math.max(w.length, 1)
          } else j += 1
        }
        if (orderPos < 0)
          throw new graft.functions.expressions.DuckDialectException(
            "DISTINCT ON without ORDER BY picks an arbitrary row per key — " +
              "not reproducible on a distributed engine. Add ORDER BY <keys>, " +
              "<tiebreak> to pin which row survives")
        // ORDER BY list extent: to the next same-depth LIMIT/OFFSET, the
        // enclosing ')', or end of text
        val byM = raw"(?is)\AORDER\s+BY\b".r.findFirstMatchIn(masked.substring(orderPos))
          .getOrElse(throw new graft.functions.expressions.DuckDialectException(
            "DISTINCT ON: malformed ORDER BY clause"))
        val listStart = orderPos + byM.end
        var k = listStart
        depth = 0
        var listEnd = masked.length
        var scanning2 = true
        while (k < masked.length && scanning2) {
          val c = masked.charAt(k)
          if (c == '(') { depth += 1; k += 1 }
          else if (c == ')') {
            if (depth == 0) { listEnd = k; scanning2 = false } else { depth -= 1; k += 1 }
          } else if (depth == 0 && c.isLetter &&
            (!masked.charAt(k - 1).isLetterOrDigit && masked.charAt(k - 1) != '_')) {
            val w = wordStartingAt(masked, k)
            if (w == "LIMIT" || w == "OFFSET") { listEnd = k; scanning2 = false }
            else k += math.max(w.length, 1)
          } else k += 1
        }
        val orderList = sql.substring(listStart, listEnd).trim
        if (orderList.isEmpty)
          throw new graft.functions.expressions.DuckDialectException(
            "DISTINCT ON: empty ORDER BY list")
        val ordinal = raw"(?is)^\d+(\s+(ASC|DESC))?(\s+NULLS\s+(FIRST|LAST))?$$".r
        if (splitTopLevel(orderList, maskQuotes(orderList))
            .exists(item => ordinal.findFirstIn(item.trim).isDefined))
          throw new graft.functions.expressions.DuckDialectException(
            "DISTINCT ON with ordinal ORDER BY items (ORDER BY 1) isn't " +
              "rewritable — inside the generated OVER clause an integer is a " +
              "constant, not a column position. Name the columns")
        val qualify = s" QUALIFY row_number() OVER (PARTITION BY $keys " +
          s"ORDER BY $orderList) = 1 "
        // The OUTER ORDER BY resolves against the rewritten subquery's
        // OUTPUT (the aliased select list), while DuckDB also accepts
        // the pre-projection input names (r16, found by FuzzDiff:
        // `DISTINCT ON (c) c AS g ... ORDER BY c` works in DuckDB but
        // `c` no longer exists after projection here) — map each outer
        // ORDER BY item whose text matches an aliased select expression
        // onto its alias. The OVER clause keeps the original names: it
        // evaluates in the pre-projection scope.
        val outerOrder = {
          def canon(s: String): String = s.trim.toLowerCase.replaceAll("\\s+", " ")
          // select list = text between the key list and the block's FROM
          var j2 = keysClose + 1
          var df2 = 0
          var fromPos2 = -1
          while (j2 < orderPos && fromPos2 < 0) {
            val c = masked.charAt(j2)
            if (c == '(') df2 += 1
            else if (c == ')') df2 -= 1
            else if (df2 == 0 && c.isLetter &&
              (!masked.charAt(j2 - 1).isLetterOrDigit && masked.charAt(j2 - 1) != '_')) {
              val w = wordStartingAt(masked, j2)
              if (w == "FROM") fromPos2 = j2
              else j2 += math.max(w.length, 1) - 1
            }
            j2 += 1
          }
          val aliasRe = raw"(?is)^(.*\S)\s+AS\s+([A-Za-z_]\w*)$$".r
          val aliasMap: Map[String, String] =
            if (fromPos2 < 0) Map.empty
            else {
              val selText = sql.substring(keysClose + 1, fromPos2)
              splitTopLevel(selText, maskQuotes(selText)).flatMap(_.trim match {
                case aliasRe(e, a) => Some(canon(e) -> a)
                case _ => None
              }).toMap
            }
          val itemRe =
            raw"(?is)^(.*?)(\s+(?:ASC|DESC))?(\s+NULLS\s+(?:FIRST|LAST))?$$".r
          splitTopLevel(orderList, maskQuotes(orderList)).map { item =>
            item.trim match {
              case itemRe(core, dir, nulls) =>
                aliasMap.get(canon(core)).map(_ +
                  Option(dir).getOrElse("") + Option(nulls).getOrElse(""))
                  .getOrElse(item.trim)
              case other => other
            }
          }.mkString(", ")
        }
        val rewritten = sql.substring(0, m.start) + "SELECT " +
          sql.substring(keysClose + 1, orderPos) + qualify +
          "ORDER BY " + outerOrder + " " + sql.substring(listEnd)
        rewriteDistinctOn(rewritten)
    }
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

  private val StructInsertRe = raw"(?i)\bstruct_insert\s*\(".r

  /** DuckDB `struct_insert(s, b := 2, ...)` — same named-argument
    * grammar as struct_pack, rewritten to the registered
    * `graft_struct_insert(s, 'b', 2, ...)` (UpdateFields under the
    * hood — appends/overwrites fields on the struct, probed
    * `{'a': 1, 'b': 2}`).
    */
  def rewriteStructInsert(sql: String): String = {
    val masked = maskQuotes(sql)
    StructInsertRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) =>
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
        if (d != 0) sql
        else {
          val inner = sql.substring(m.end, i - 1)
          val innerMasked = masked.substring(m.end, i - 1)
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
          val rewritten = sql.substring(0, m.start) + "graft_struct_insert(" +
            sb.toString + sql.substring(i - 1)
          rewriteStructInsert(rewritten)
        }
    }
  }

  private val SampleRe =
    raw"(?i)\bUSING\s+SAMPLE\s+(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS\b)?".r

  /** Function-style percentage sample (`USING SAMPLE bernoulli(50%)
    * [REPEATABLE (seed)]` — DuckDB's only spelling that takes a
    * REPEATABLE suffix, probed 1.0.0): normalized to the size-first
    * form and re-fed to [[rewriteSample]]. Percentage `reservoir(n%)`
    * bodies deliberately don't match HERE (exact-count percentage needs
    * the table's cardinality, which a pure text rewrite doesn't have) —
    * they resolve at SqlStage level via [[resolvePercentReservoir]]
    * (r16) and re-enter as `reservoir(n ROWS)` via [[RsvFnRe]].
    */
  private val FnSampleRe =
    raw"(?i)\bUSING\s+SAMPLE\s+(bernoulli|system)\s*\(\s*(\d+(?:\.\d+)?)\s*(%|PERCENT\b)\s*\)(?:\s*REPEATABLE\s*\(\s*(\d+)\s*\))?".r

  /** Exact-n reservoir sample (r15, VERDICT r14 missing #3):
    * `USING SAMPLE reservoir(n ROWS) [REPEATABLE (seed)]` and the
    * size-first spelling `USING SAMPLE n [ROWS] (reservoir[, seed])`
    * (both probed 1.0.0; bare `n ROWS REPEATABLE (s)` is a DuckDB
    * parse error, so only these two shapes exist). DuckDB's seeded
    * reservoir is an exact-n deterministic sample; the Spark
    * re-expression is the q68/q171 deterministic-hash pattern — order
    * by a seeded xxhash64 of the whole row and take n
    * (TakeOrderedAndProject: bounded top-n, no global sort). The two
    * engines pick DIFFERENT rows (different RNGs — DuckDB's own docs
    * make no cross-version promise), but the invariants DuckDB
    * guarantees hold identically: exactly n rows, a subset of the
    * input, same seed → same set. r16 correction (probed): DuckDB
    * 1.0.0 draws the sample from the base FROM relation BEFORE the
    * block's WHERE — a seeded `WHERE p USING SAMPLE reservoir(10 ROWS)`
    * returns a deterministic ≤ 10 rows, not 10 — so when a top-level
    * WHERE is present the hash-top-n attaches to the relation
    * ([[sampleSplit]]) instead of wrapping the filtered block.
    */
  private val RsvFnRe =
    raw"(?i)\bUSING\s+SAMPLE\s+reservoir\s*\(\s*(\d+)\s+ROWS\s*\)(?:\s*REPEATABLE\s*\(\s*(\d+)\s*\))?".r
  private val RsvSizeRe =
    raw"(?i)\bUSING\s+SAMPLE\s+(\d+)\s*(?:ROWS\s*)?\(\s*reservoir\s*(?:,\s*(\d+))?\s*\)".r

  private val SampleAggFnRe =
    raw"(?i)\b(count|sum|avg|mean|min|max|median|mad|product|entropy|string_agg|group_concat|listagg|array_agg|list|first|last|bool_and|bool_or|bit_and|bit_or|bit_xor|stddev|stddev_pop|stddev_samp|var_pop|var_samp|variance|corr|covar_pop|covar_samp|approx_count_distinct|approx_quantile|quantile|quantile_cont|quantile_disc|arg_min|arg_max|argmin|argmax|any_value|histogram|mode|skewness|kurtosis)\s*\(".r

  /** DuckDB's USING SAMPLE draws the FROM/WHERE rows BEFORE the select
    * list evaluates (probed 1.0.0: `SELECT count(*) FROM t USING SAMPLE
    * 5 ROWS` = 5; `GROUP BY g USING SAMPLE 10 ROWS` groups the 10
    * sampled rows; `SELECT DISTINCT … USING SAMPLE 6` dedups 6 rows).
    * The wrap rewrite evaluates the whole block FIRST, which would be
    * silently wrong under aggregation/DISTINCT/GROUP BY — refuse loudly
    * and name the FROM-subquery form, which both engines execute
    * identically (the subquery sample applies where written, probed).
    */
  private def guardAggregatedSample(maskedHead: String): Unit = {
    // subquery-paren depth per position: '(' followed by SELECT opens a
    // subquery scope; function/grouping parens don't (so round(sum(x))
    // still counts as a top-level aggregate while (SELECT count(*) …)
    // scalar subqueries don't trigger)
    val subDepth = new Array[Int](maskedHead.length + 1)
    val stack = scala.collection.mutable.Stack[Boolean]()
    var i = 0
    while (i < maskedHead.length) {
      subDepth(i) = stack.count(identity)
      maskedHead.charAt(i) match {
        case '(' =>
          val rest = maskedHead.substring(i + 1).dropWhile(_.isWhitespace)
          stack.push(rest.regionMatches(true, 0, "SELECT", 0, 6))
        case ')' => if (stack.nonEmpty) stack.pop()
        case _ =>
      }
      i += 1
    }
    def topLevel(re: scala.util.matching.Regex, upTo: Int): Boolean =
      re.findAllMatchIn(maskedHead.substring(0, upTo))
        .exists(m => subDepth(m.start) == 0 && !insideParens(m.start))
    // plain paren depth (for GROUP BY: must be this block's clause, not
    // a parenthesized expression's text)
    def insideParens(pos: Int): Boolean = {
      var d = 0
      var j = 0
      while (j < pos) {
        maskedHead.charAt(j) match {
          case '(' => d += 1
          case ')' => d -= 1
          case _ =>
        }
        j += 1
      }
      d > 0
    }
    val grouped = topLevel(raw"(?i)\b(GROUP\s+BY|HAVING)\b".r, maskedHead.length)
    // DISTINCT at the block's own select (subquery-depth 0 — a leading
    // WITH clause must not hide it; CTE-internal DISTINCTs sit at
    // subquery depth > 0 and stay inert)
    val distinct = raw"(?i)\bSELECT\s+DISTINCT\b".r.findAllMatchIn(maskedHead)
      .exists(m => subDepth(m.start) == 0)
    // aggregates AND window functions only matter in the select list
    // (before the top-level FROM) — both evaluate over the SAMPLED rows
    // in DuckDB, while the wrap evaluates the block first, so both
    // refuse
    val fromIdx = raw"(?i)\bFROM\b".r.findAllMatchIn(maskedHead)
      .find(m => subDepth(m.start) == 0 && !insideParens(m.start))
      .map(_.start).getOrElse(maskedHead.length)
    val selList = maskedHead.substring(0, fromIdx)
    val agg = SampleAggFnRe.findAllMatchIn(selList).exists(m => subDepth(m.start) == 0) ||
      raw"(?i)\bOVER\b".r.findAllMatchIn(selList).exists(m => subDepth(m.start) == 0)
    if (grouped || distinct || agg)
      throw new graft.functions.expressions.DuckDialectException(
        "USING SAMPLE under aggregation/DISTINCT/GROUP BY samples the base " +
          "rows BEFORE aggregating in DuckDB, which this block-wrap rewrite " +
          "cannot express — move the sample into a FROM subquery: SELECT " +
          "... FROM (SELECT * FROM t WHERE ... USING SAMPLE <spec>) GROUP BY ...")
  }

  /** Rewrite DuckDB `USING SAMPLE n% / n PERCENT / n [ROWS]` into Spark
    * `TABLESAMPLE`. Sample ORDER (r16 correction, probed 1.0.0): the
    * trailing USING SAMPLE draws from the base FROM relation BEFORE the
    * block's WHERE — `FROM t WHERE p USING SAMPLE 10 ROWS` over a
    * half-passing filter returns ≤ 10 VARIABLE rows (observed 7,4,5,…),
    * where an after-WHERE reading would always return exactly 10. So:
    * exact-n forms with a top-level WHERE attach the sample to the
    * relation ([[sampleSplit]] — raw TABLESAMPLE's pre-filter placement
    * is exactly DuckDB's behavior); percentage forms keep the block
    * wrap, which is distribution-identical (row-independent inclusion
    * commutes with filters; cross-engine row SETS differ by RNG in every
    * form, documented). Percentage METHOD names are claimed too (r13):
    * `(bernoulli)` IS Spark's sampler (independent per-row inclusion),
    * and `(system)` is DuckDB's cheaper vector-granular approximation OF
    * bernoulli — the bare `n%` form already defaults to system in
    * DuckDB, so claiming the explicit name is the same trade the bare
    * claim made. Seeded percentage forms ride through as Spark's
    * REPEATABLE clause (r14); `reservoir(n ROWS)` executes as the
    * deterministic-hash top-n (r15, [[RsvFnRe]]); percentage
    * `reservoir(n%)` resolves at SqlStage level (r16,
    * [[resolvePercentReservoir]]: one base-relation count, then the
    * exact-n path).
    */
  /** First depth-0 occurrence of `re` in masked[from, until) — paren
    * depth measured relative to `from` (a block's own parens balance).
    */
  private def depth0Find(masked: String, re: scala.util.matching.Regex,
                         from: Int, until: Int): Option[Int] = {
    var d = 0
    var i = from
    val hits = re.findAllMatchIn(masked.substring(from, until))
      .map(_.start + from).toList
    if (hits.isEmpty) return None
    val depths = new Array[Int](until - from)
    while (i < until) {
      depths(i - from) = d
      masked.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      i += 1
    }
    hits.find(p => depths(p - from) == 0)
  }

  /** Split a sample-carrying block at its top-level FROM/WHERE (r16):
    * Some((fromIdxAfterKeyword, whereIdx, fromPart, alias)) when the
    * block has a depth-0 WHERE before the sample — the shape where
    * DuckDB 1.0.0's sample order is OBSERVABLE (probed: `FROM t WHERE p
    * USING SAMPLE 10 ROWS` returns ≤ 10 VARIABLE rows — the sample
    * draws from the base relation BEFORE the filter; the docs-implied
    * after-WHERE reading would always return exactly 10). Multi-relation
    * FROMs (depth-0 comma or JOIN) with a WHERE raise a guided error
    * for the exact-n forms — sampling the pre-filter join result needs
    * the FROM-subquery spelling. The derived alias keeps qualified refs
    * (`t.col`) resolving after the relation is wrapped.
    */
  private def sampleSplit(sql: String, masked: String, blockStart: Int,
                          sampleStart: Int): Option[(Int, Int, String, String)] = {
    val fromIdx = depth0Find(masked, raw"(?i)\bFROM\b".r, blockStart, sampleStart)
      .getOrElse(return None)
    val whereIdx = depth0Find(masked, raw"(?i)\bWHERE\b".r, fromIdx + 4, sampleStart)
      .getOrElse(return None)
    val multi = depth0Find(masked, raw",|(?i)\bJOIN\b".r, fromIdx + 4, whereIdx).isDefined
    if (multi) throw new graft.functions.expressions.DuckDialectException(
      "USING SAMPLE (exact-n form) after a WHERE over a multi-relation FROM — " +
        "DuckDB draws the sample from the pre-filter join result, which this " +
        "rewrite can't attach to a join; move the sample into a FROM subquery: " +
        "SELECT ... FROM (SELECT * FROM a JOIN b ON ... USING SAMPLE <spec>) WHERE ...")
    val fromPart = sql.substring(fromIdx + 4, whereIdx).trim
    // alias: explicit trailing identifier, else the relation's own last
    // name component; subquery relations use their explicit alias
    val alias = {
      val bare = raw"^([A-Za-z_][\w.]*)$$".r
      val aliased = raw"(?is)^([A-Za-z_][\w.]*)\s+(?:AS\s+)?([A-Za-z_]\w*)$$".r
      val subq = raw"(?is)\)\s*(?:AS\s+)?([A-Za-z_]\w*)$$".r
      fromPart match {
        case bare(n) => n.split('.').last
        case aliased(_, a) => a
        case _ => subq.findFirstMatchIn(fromPart).map(_.group(1)).getOrElse("")
      }
    }
    Some((fromIdx + 4, whereIdx, fromPart, alias))
  }

  private val RsvPctRe =
    raw"(?i)\bUSING\s+SAMPLE\s+reservoir\s*\(\s*(\d+(?:\.\d+)?)\s*(?:%|PERCENT\b)\s*\)(?:\s*REPEATABLE\s*\(\s*(\d+)\s*\))?".r
  private val RsvPctSizeRe =
    raw"(?i)\bUSING\s+SAMPLE\s+(\d+(?:\.\d+)?)\s*(?:%|PERCENT\b)\s*\(\s*reservoir\s*(?:,\s*(\d+))?\s*\)".r

  /** Percentage reservoir (r16, VERDICT r15 missing #3):
    * `USING SAMPLE reservoir(p%) [REPEATABLE (s)]` and the size-first
    * `USING SAMPLE p% (reservoir[, s])` — DuckDB 1.0.0 (probed) returns
    * EXACTLY round-half-up(p/100 × N) rows where N is the row count of
    * the base FROM relation BEFORE the block's WHERE (25 rows at 10% →
    * 3; 50% → 13; 10 rows at 15% → 2; a WHERE makes the post-filter
    * count variable — the draw happens first). The count needs the
    * input's cardinality, which a pure text rewrite doesn't have — so
    * this resolver runs at SqlStage level: ONE count over the base
    * relation (a metadata-cheap column-pruned count for file scans),
    * then the spec collapses to the exact-n `reservoir(n ROWS)` path
    * (deterministic hash top-n, TakeOrderedAndProject). A base relation
    * naming a CTE of the SAME statement (r18, VERDICT r17 #5) counts by
    * re-attaching the statement's own WITH definitions that close
    * BEFORE the sample site to the count query — those bodies are
    * already percent-resolved (matches resolve left-to-right), so the
    * count cannot recurse; a name no prefix can resolve keeps the
    * guided temp-table error.
    */
  private def cteDefsBefore(cur: String, masked: String,
                            limit: Int): (String, Seq[String]) = {
    val wm = raw"(?is)^\s*WITH\s+(RECURSIVE\s+)?".r.findFirstMatchIn(masked)
      .getOrElse(return ("", Nil))
    val rec = if (wm.group(1) != null) "RECURSIVE " else ""
    val defs = Seq.newBuilder[(String, Int)]
    var p = wm.end
    var more = true
    while (more) {
      more = false
      val defRe = raw"(?s)^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\([^()]*\)\s*)?(?i:AS)\s*(?:(?i:NOT\s+MATERIALIZED)\s*|(?i:MATERIALIZED)\s*)?\(".r
      defRe.findFirstMatchIn(masked.substring(p)).foreach { dm =>
        closeOf(masked, p + dm.end).foreach { close =>
          defs += ((cur.substring(p, close).trim, close))
          var q = close
          while (q < masked.length && masked.charAt(q).isWhitespace) q += 1
          if (q < masked.length && masked.charAt(q) == ',') { p = q + 1; more = true }
        }
      }
    }
    (rec, defs.result().filter(_._2 <= limit).map(_._1))
  }

  def resolvePercentReservoir(spark: org.apache.spark.sql.SparkSession,
      sql: String,
      run: String => org.apache.spark.sql.DataFrame): String = {
    var cur = sql
    var guard = 0
    while (guard < 16) { // sibling samples resolve one per iteration
      guard += 1
      val masked = maskQuotes(cur)
      val hit = RsvPctRe.findFirstMatchIn(masked)
        .orElse(RsvPctSizeRe.findFirstMatchIn(masked))
      hit match {
        case None => return cur
        case Some(mm) =>
          val pct = mm.group(1).toDouble
          val seedOpt = Option(mm.group(2))
          val stack = scala.collection.mutable.Stack[Int]()
          var i = 0
          while (i < mm.start) {
            masked.charAt(i) match {
              case '(' => stack.push(i + 1)
              case ')' => if (stack.nonEmpty) stack.pop()
              case _ =>
            }
            i += 1
          }
          val blockStart = if (stack.isEmpty) 0 else stack.top
          val fromIdx = depth0Find(masked, raw"(?i)\bFROM\b".r, blockStart, mm.start)
            .getOrElse(throw new graft.functions.expressions.DuckDialectException(
              "reservoir(n%) without a FROM relation has no cardinality to count"))
          val baseEnd = depth0Find(masked, raw"(?i)\bWHERE\b".r, fromIdx + 4, mm.start)
            .getOrElse(mm.start)
          val basePart = cur.substring(fromIdx + 4, baseEnd).trim
          // a bare identifier that names a PRECEDING same-statement CTE
          // goes straight to the WITH-prefixed count: the old
          // try-bare-first shape deliberately ran a count that FAILS
          // analysis for CTE bases (then retried) — a wasted failed
          // execution per resolve whose cached AnalysisException any
          // execution listener re-surfaces as a loud stack trace when
          // it touches the dead QueryExecution (r18; same counts, same
          // guided error for genuinely unresolvable names)
          val (rec, defs) = cteDefsBefore(cur, masked, mm.start)
          val cteNames = defs.flatMap(d =>
            raw"(?s)^\s*([A-Za-z_]\w*)".r.findFirstMatchIn(d).map(_.group(1).toLowerCase)).toSet
          val baseIsCte = cteNames.contains(basePart.toLowerCase)
          def guided(cause: Throwable): Nothing =
            throw new graft.functions.expressions.DuckDialectException(
              s"reservoir($pct%): could not count the base relation " +
                s"'$basePart' out of statement context (names neither " +
                "the catalog nor a preceding same-statement CTE " +
                "resolves) — materialize it first with " +
                "CREATE TEMP TABLE ... AS, or use reservoir(n ROWS)", cause)
          def countWith(orElse: Throwable => Long): Long =
            try run(s"WITH $rec${defs.mkString(", ")} " +
              s"SELECT count(*) AS __graft_rsv_n FROM $basePart")
              .collect().head.getLong(0)
            catch { case scala.util.control.NonFatal(e2) => orElse(e2) }
          val cnt =
            if (baseIsCte) countWith(guided)
            else
              try run(s"SELECT count(*) AS __graft_rsv_n FROM $basePart")
                .collect().head.getLong(0)
              catch {
                case scala.util.control.NonFatal(e) =>
                  // non-identifier CTE-scoped base (e.g. a subquery over
                  // a CTE): retry with the statement's WITH prefix
                  // (r18, VERDICT r17 #5)
                  if (defs.isEmpty) guided(e) else countWith(guided)
              }
          val n = math.floor(cnt * pct / 100.0 + 0.5).toLong
          val rep = seedOpt.map(s => s" REPEATABLE ($s)").getOrElse("")
          cur = cur.substring(0, mm.start) +
            s"USING SAMPLE reservoir($n ROWS)$rep" + cur.substring(mm.end)
      }
    }
    cur
  }

  def rewriteSample(sql: String): String = {
    val masked = maskQuotes(sql)
    FnSampleRe.findFirstMatchIn(masked).foreach { fm =>
      val seed = Option(fm.group(4)).map(s => s", $s").getOrElse("")
      return rewriteSample(sql.substring(0, fm.start) +
        s"USING SAMPLE ${fm.group(2)}${fm.group(3)} (${fm.group(1)}$seed)" +
        sql.substring(fm.end))
    }
    // size-first reservoir spelling → function form, then one rewriter
    RsvSizeRe.findFirstMatchIn(masked).foreach { rm =>
      val rep = Option(rm.group(2)).map(s => s" REPEATABLE ($s)").getOrElse("")
      return rewriteSample(sql.substring(0, rm.start) +
        s"USING SAMPLE reservoir(${rm.group(1)} ROWS)$rep" +
        sql.substring(rm.end))
    }
    RsvFnRe.findFirstMatchIn(masked).foreach { rm =>
      val n = rm.group(1)
      // unseeded reservoir is random in DuckDB; graft is deterministic
      // either way (documented) — a fixed default seed keeps repeated
      // runs stable, the property DuckDB's REPEATABLE promises
      val seed = Option(rm.group(2)).getOrElse("8675309")
      // helper name keyed on the MATCH OFFSET, not a counter: the
      // rewrite must be a pure function of its input (the oracle-corpus
      // idempotency pin) and offsets are unique per sibling sample
      val h = s"__graft_rsv_${rm.start}"
      // block start (same scan as the percentage path below)
      val stack = scala.collection.mutable.Stack[Int]()
      var i = 0
      while (i < rm.start) {
        masked.charAt(i) match {
          case '(' => stack.push(i + 1)
          case ')' => if (stack.nonEmpty) stack.pop()
          case _ =>
        }
        i += 1
      }
      val blockStart = if (stack.isEmpty) 0 else stack.top
      // a depth-0 WHERE before the sample: DuckDB 1.0.0 draws the n
      // rows from the base FROM relation BEFORE the filter (probed —
      // `WHERE p USING SAMPLE reservoir(10 ROWS) REPEATABLE (42)`
      // returns a deterministic ≤ 10, not 10), so attach the hash-top-n
      // to the relation and leave the WHERE above it; aggregation /
      // DISTINCT in the select list is then DuckDB-correct too (it
      // evaluates over the filtered sample), so the wrap guard is
      // bypassed on this path
      sampleSplit(sql, masked, blockStart, rm.start).foreach {
        case (fromEnd, whereIdx, fromPart, alias) =>
          val rel = s"( SELECT * EXCEPT ($h) FROM (SELECT *, " +
            s"xxhash64(struct(*), $seed) AS $h FROM ( SELECT * FROM $fromPart ) " +
            s"ORDER BY $h LIMIT $n) ) $alias"
          return rewriteSample(sql.substring(0, fromEnd) + s" $rel " +
            sql.substring(whereIdx, rm.start) + sql.substring(rm.end))
      }
      val head = sql.substring(blockStart, rm.start).trim
      guardAggregatedSample(masked.substring(blockStart, rm.start).trim)
      return rewriteSample(sql.substring(0, blockStart) +
        s"SELECT * EXCEPT ($h) FROM (SELECT *, xxhash64(struct(*), $seed) " +
        s"AS $h FROM ( $head ) ORDER BY $h LIMIT $n)" +
        sql.substring(rm.end))
    }
    SampleRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) =>
        // percentage methods are claimable, seeded or not (r14: the
        // seed rides through as Spark's REPEATABLE clause); anything
        // else parenthesized ('reservoir(...)') → not rewritten
        val wsLen = masked.substring(m.end).takeWhile(_.isWhitespace).length
        val after = masked.substring(m.end + wsLen)
        val method = raw"(?i)^\(\s*(bernoulli|system)\s*(?:,\s*(\d+))?\s*\)".r
          .findFirstMatchIn(after)
        val consumedMethod = method.map(mm => wsLen + mm.end).getOrElse(0)
        // optional `REPEATABLE (seed)` suffix (DuckDB's function-style
        // seed spelling) after the method parens or the bare size spec
        val afterMethod = masked.substring(m.end + consumedMethod)
        val wsLen2 = afterMethod.takeWhile(_.isWhitespace).length
        val rep = raw"(?i)^REPEATABLE\s*\(\s*(\d+)\s*\)".r
          .findFirstMatchIn(afterMethod.substring(wsLen2))
        val consumed = consumedMethod + rep.map(r => wsLen2 + r.end).getOrElse(0)
        val seed: Option[String] =
          method.flatMap(mm => Option(mm.group(2))).orElse(rep.map(_.group(1)))
        val isPercent = m.group(2) != null &&
          (m.group(2) == "%" || m.group(2).equalsIgnoreCase("percent"))
        if (method.isDefined && !isPercent) return sql // reservoir-ROWS territory
        // a seeded ROWS sample is DuckDB's exact-n seeded reservoir;
        // Spark's `n ROWS` takes the first n — silently different, so
        // the guided error stands
        if (seed.isDefined && !isPercent) return sql
        if (method.isEmpty &&
          (after.startsWith("(") || raw"(?i)^[a-z_]+\s*\(".r.findFirstIn(after).isDefined))
          return sql
        val spec = m.group(2) match {
          case s if s != null && (s == "%" || s.equalsIgnoreCase("percent")) =>
            s"${m.group(1)} PERCENT"
          case _ => s"${m.group(1)} ROWS"
        }
        val repeatable = seed.map(sd => s"REPEATABLE ($sd) ").getOrElse("")
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
        // exact-n (ROWS) with a depth-0 WHERE: DuckDB 1.0.0 samples the
        // base relation BEFORE the filter (probed; see sampleSplit) —
        // attach the TABLESAMPLE to the relation instead of wrapping
        // the filtered block, which would always return exactly n.
        // Percentage forms COMMUTE with row-independent filters (the
        // per-row inclusion decision doesn't depend on other rows), so
        // the wrap stays for them — cross-engine row sets differ by RNG
        // either way, and the count distribution is identical.
        if (!isPercent)
          sampleSplit(sql, masked, blockStart, m.start).foreach {
            case (fromEnd, whereIdx, fromPart, alias) =>
              val rel = s"( SELECT * FROM $fromPart ) TABLESAMPLE ($spec) $repeatable $alias"
              return rewriteSample(sql.substring(0, fromEnd) + s" $rel " +
                sql.substring(whereIdx, m.start) + sql.substring(m.end + consumed))
          }
        val head = sql.substring(blockStart, m.start).trim
        guardAggregatedSample(masked.substring(blockStart, m.start).trim)
        rewriteSample(sql.substring(0, blockStart) +
          s"SELECT * FROM ( $head ) TABLESAMPLE ($spec) $repeatable" +
          sql.substring(m.end + consumed))
    }
  }

  private val AsofRe = raw"(?i)\bASOF\s+(LEFT\s+)?JOIN\b".r

  /** Rewrite DuckDB `ASOF [LEFT] JOIN` (the last silently-trapped join
    * form, VERDICT r5 "What's missing #2") into the validity-interval
    * join Spark understands. DuckDB's ASOF semantics: for each left row,
    * join the single right row with the extremal timestamp satisfying
    * the one inequality, among rows matching the equality conditions.
    * The mechanical equivalent: give each right row a validity interval
    * ending at the NEXT timestamp for the same keys —
    *
    * {{{
    * FROM e ASOF JOIN p ON e.k = p.k AND e.ts >= p.ts
    * -- becomes
    * FROM e JOIN ( SELECT *, lead(ts) OVER (PARTITION BY k ORDER BY ts)
    *               AS __graft_asof_end_0 FROM p ) p
    *   ON e.k = p.k AND e.ts >= p.ts
    *   AND (p.__graft_asof_end_0 IS NULL OR e.ts < p.__graft_asof_end_0)
    * }}}
    *
    * so each left row matches exactly one right row (ties on the right
    * timestamp collapse to one survivor — the interval of every earlier
    * duplicate is empty), `ASOF LEFT JOIN` keeps unmatched left rows,
    * and the plan is a plain equi-join + one extra range predicate — no
    * O(n·m) blow-up, the window is one shuffle on the join keys. The
    * four inequality directions map to lead (`>=`, `>`: match latest
    * earlier) or lag (`<=`, `<`: match earliest later) with the matching
    * interval bound. A right timestamp of NULL never matches (comparison
    * yields NULL), and a NULL lead/lag means the interval is open-ended
    * — both exactly DuckDB's behavior.
    *
    * If the select list projects a star, the block is wrapped in
    * `SELECT * EXCEPT (helper) FROM (...)` (trailing ORDER BY / LIMIT /
    * set-ops stay outside the wrap) so the helper column never leaks.
    * Shapes outside the rewrite — USING, a non-equality side condition
    * referencing the right table, zero or several inequalities, OR /
    * BETWEEN at the top level — raise a guided [[graft.functions.expressions.DuckDialectException]]
    * naming the fix rather than silently misparsing (bare Spark would
    * read `t ASOF JOIN u` as table t aliased "ASOF" + inner join).
    */
  def rewriteAsof(sql: String): String = {
    val masked = maskQuotes(sql)
    AsofRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) => rewriteAsof(rewriteOneAsof(sql, masked, m))
    }
  }

  private def rewriteOneAsof(sql: String, masked: String,
                             m: scala.util.matching.Regex.Match): String = {
    def fail(why: String): Nothing =
      throw new graft.functions.expressions.DuckDialectException(
        s"ASOF JOIN couldn't be auto-rewritten ($why) — use " +
          "graft.queries.CoreQueries.asOfJoin, or rewrite by hand as a " +
          "windowed validity-interval join (lead/lag of the timestamp " +
          "over the equality keys, then an equi-join bounded by it)")
    val isLeft = m.group(1) != null
    // ---- right-side relation: subquery or (dotted) table name
    var i = m.end
    def skipWs(): Unit =
      while (i < masked.length && masked.charAt(i).isWhitespace) i += 1
    skipWs()
    if (i >= masked.length) fail("no right-side relation")
    val relStart = i
    val isSubquery = masked.charAt(i) == '('
    if (isSubquery) {
      var d = 1; i += 1
      while (i < masked.length && d > 0) {
        masked.charAt(i) match {
          case '(' => d += 1
          case ')' => d -= 1
          case _ =>
        }
        i += 1
      }
      if (d != 0) fail("unbalanced parens in the right-side subquery")
    } else {
      while (i < masked.length && (masked.charAt(i).isLetterOrDigit ||
        masked.charAt(i) == '_' || masked.charAt(i) == '.')) i += 1
      if (i == relStart) fail("unrecognized right-side relation")
    }
    val relText = sql.substring(relStart, i)
    // ---- optional [AS] alias, then ON
    skipWs()
    var alias: String = null
    if (i < masked.length && (masked.charAt(i).isLetter || masked.charAt(i) == '_')) {
      val w = wordStartingAt(masked, i)
      if (w == "AS") {
        i += 2; skipWs()
        val a = wordStartingAt(masked, i)
        if (a.isEmpty || a == "ON") fail("missing alias after AS")
        alias = sql.substring(i, i + a.length); i += a.length; skipWs()
      } else if (w != "ON") {
        alias = sql.substring(i, i + w.length); i += w.length; skipWs()
      }
    }
    if (alias == null) {
      if (isSubquery) fail("a right-side subquery needs an alias")
      alias = relText.substring(relText.lastIndexOf('.') + 1)
    }
    if (i >= masked.length || wordStartingAt(masked, i) != "ON")
      fail("ASOF JOIN requires an ON clause (USING has no column names to window over)")
    i += 2
    val condStart = i
    // ---- ON condition runs to the next same-depth clause keyword / ')'
    val condTerminators = Set("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
      "OFFSET", "WINDOW", "QUALIFY", "UNION", "INTERSECT", "EXCEPT", "MINUS",
      "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "ASOF", "SEMI",
      "ANTI", "NATURAL", "LATERAL")
    var condEnd = masked.length
    var dd = 0
    var scanning = true
    while (i < masked.length && scanning) {
      val c = masked.charAt(i)
      if (c == '(') { dd += 1; i += 1 }
      else if (c == ')') {
        if (dd == 0) { condEnd = i; scanning = false } else { dd -= 1; i += 1 }
      } else if (dd == 0 && c.isLetter &&
        (i == 0 || (!masked.charAt(i - 1).isLetterOrDigit && masked.charAt(i - 1) != '_'))) {
        val w = wordStartingAt(masked, i)
        if (condTerminators.contains(w)) { condEnd = i; scanning = false }
        else i += math.max(w.length, 1)
      } else i += 1
    }
    val condText = sql.substring(condStart, condEnd).trim
    val condMasked = masked.substring(condStart, condEnd)
    // ---- split the condition at top-level AND; reject OR/NOT/BETWEEN/IN
    val splits = scala.collection.mutable.ArrayBuffer[Int]()
    var j = 0
    var d2 = 0
    while (j < condMasked.length) {
      val c = condMasked.charAt(j)
      if (c == '(') { d2 += 1; j += 1 }
      else if (c == ')') { d2 -= 1; j += 1 }
      else if (d2 == 0 && c.isLetter &&
        (j == 0 || (!condMasked.charAt(j - 1).isLetterOrDigit && condMasked.charAt(j - 1) != '_'))) {
        val w = wordStartingAt(condMasked, j)
        if (w == "AND") { splits += j; j += 3 }
        else if (Set("OR", "NOT", "BETWEEN", "IN", "CASE").contains(w))
          fail(s"$w at the top level of the ON condition")
        else j += math.max(w.length, 1)
      } else j += 1
    }
    val ranges = {
      val starts = 0 +: splits.map(_ + 3)
      val ends = splits.toSeq :+ condMasked.length
      starts.zip(ends)
    }
    // ---- classify each conjunct by its single top-level comparison
    def topCmp(s: String): Option[(String, Int)] = {
      var k = 0; var d3 = 0; var found: Option[(String, Int)] = None; var n = 0
      while (k < s.length) {
        val c = s.charAt(k)
        if (c == '(') d3 += 1
        else if (c == ')') d3 -= 1
        else if (d3 == 0 && (c == '<' || c == '>' || c == '=' || c == '!')) {
          val two = s.substring(k, math.min(k + 2, s.length))
          val op = two match {
            case "<=" | ">=" | "<>" | "!=" | "==" => two
            case _ if c == '!' => "" // lone '!': not a comparison
            case _ => c.toString
          }
          if (op.nonEmpty) {
            n += 1
            if (found.isEmpty) found = Some((op, k))
            k += op.length - 1
          }
        }
        k += 1
      }
      if (n == 1) found else None
    }
    val rightColRe =
      ("(?i)^" + java.util.regex.Pattern.quote(alias) + raw"\.([A-Za-z_][A-Za-z_0-9]*)$$").r
    val rightRefRe = ("(?i)\\b" + java.util.regex.Pattern.quote(alias) + "\\.").r
    var ineq: Option[(String, String, String)] = None // (normalized op, leftExpr, right ts col)
    var nIneq = 0
    val partCols = scala.collection.mutable.ArrayBuffer[String]()
    for ((cs, ce) <- ranges) {
      val cm = condMasked.substring(cs, ce)
      val rawConj = sql.substring(condStart + cs, condStart + ce)
      topCmp(cm) match {
        case None => fail(s"no single comparison in ON conjunct '${rawConj.trim}'")
        case Some((op, pos)) =>
          val lhs = rawConj.substring(0, pos).trim
          val rhs = rawConj.substring(pos + op.length).trim
          val lhsM = cm.substring(0, pos)
          val rhsM = cm.substring(pos + op.length)
          val lhsIsRCol = rightColRe.findFirstIn(lhs.trim).isDefined
          val rhsIsRCol = rightColRe.findFirstIn(rhs.trim).isDefined
          op match {
            case "=" | "==" =>
              if (rhsIsRCol && rightRefRe.findFirstIn(lhsM).isEmpty)
                partCols += rhs.substring(rhs.lastIndexOf('.') + 1)
              else if (lhsIsRCol && rightRefRe.findFirstIn(rhsM).isEmpty)
                partCols += lhs.substring(lhs.lastIndexOf('.') + 1)
              else if (rightRefRe.findFirstIn(cm).isEmpty) ()
              // ^ a left-only (or literal) filter: legal, just no partition key
              else fail(s"equality '${rawConj.trim}' mixes the right table into an expression")
            case "<>" | "!=" => fail(s"non-equality '${rawConj.trim}' in the ON condition")
            case cmp =>
              nIneq += 1
              if (nIneq > 1) fail("more than one inequality in the ON condition (ASOF takes exactly one)")
              if (rhsIsRCol && rightRefRe.findFirstIn(lhsM).isEmpty)
                ineq = Some((cmp, lhs, rhs.substring(rhs.lastIndexOf('.') + 1)))
              else if (lhsIsRCol && rightRefRe.findFirstIn(rhsM).isEmpty) {
                val flipped = cmp match {
                  case ">=" => "<="
                  case "<=" => ">="
                  case ">" => "<"
                  case "<" => ">"
                }
                ineq = Some((flipped, rhs, lhs.substring(lhs.lastIndexOf('.') + 1)))
              } else fail(s"the inequality '${rawConj.trim}' must compare a plain right-side " +
                "column against a left-side expression")
          }
      }
    }
    val (op, leftExpr, rtsCol) = ineq.getOrElse(
      fail("no inequality in the ON condition (ASOF takes exactly one)"))
    val (wfn, boundOp) = op match {
      case ">=" => ("lead", "<")
      case ">" => ("lead", "<=")
      case "<=" => ("lag", ">")
      case "<" => ("lag", ">=")
    }
    // unique helper name (several ASOF joins + star select wraps nest)
    val helper = "__graft_asof_end_" +
      raw"__graft_asof_end_".r.findAllIn(masked).size
    val partition =
      if (partCols.isEmpty) "" else s"PARTITION BY ${partCols.mkString(", ")} "
    val innerFrom = if (isSubquery) s"$relText __graft_asof_src" else relText
    val newRel = s"( SELECT *, $wfn($rtsCol) OVER (${partition}ORDER BY $rtsCol) " +
      s"AS $helper FROM $innerFrom ) $alias"
    val joinKw = if (isLeft) "LEFT JOIN" else "JOIN"
    val newCond = s"$condText AND ( $alias.$helper IS NULL OR " +
      s"( $leftExpr ) $boundOp $alias.$helper )"
    val replacement = s"$joinKw $newRel ON $newCond "
    // ---- block bounds, for the star-leak wrap
    val stack = scala.collection.mutable.Stack[Int]()
    var p = 0
    while (p < m.start) {
      masked.charAt(p) match {
        case '(' => stack.push(p + 1)
        case ')' => if (stack.nonEmpty) stack.pop()
        case _ =>
      }
      p += 1
    }
    val blockStart = if (stack.isEmpty) 0 else stack.top
    val needsWrap = {
      // FROM position at block depth 0 bounds the select list
      var k = blockStart; var d4 = 0; var fromPos = m.start
      var looking = true
      while (k < m.start && looking) {
        val c = masked.charAt(k)
        if (c == '(') d4 += 1
        else if (c == ')') d4 -= 1
        else if (d4 == 0 && c.isLetter &&
          (k == 0 || (!masked.charAt(k - 1).isLetterOrDigit && masked.charAt(k - 1) != '_'))) {
          val w = wordStartingAt(masked, k)
          if (w == "FROM") { fromPos = k; looking = false }
          else k += math.max(w.length, 1) - 1
        }
        k += 1
      }
      selectListHasStar(masked, blockStart, fromPos)
    }
    if (!needsWrap)
      sql.substring(0, m.start) + replacement + sql.substring(condEnd)
    else {
      // block end: the wrap swallows trailing ORDER BY / LIMIT too (they
      // may reference table aliases invisible outside the subquery; an
      // inner Sort under a bare Project survives and Project preserves
      // order) — only a set-op branch boundary or ')' ends the block
      val tailTerminators = Set("UNION", "INTERSECT", "EXCEPT", "MINUS")
      var q = condEnd
      var d5 = 0
      var blockEnd = masked.length
      var scan2 = true
      while (q < masked.length && scan2) {
        val c = masked.charAt(q)
        if (c == '(') { d5 += 1; q += 1 }
        else if (c == ')') {
          if (d5 == 0) { blockEnd = q; scan2 = false } else { d5 -= 1; q += 1 }
        } else if (d5 == 0 && c.isLetter &&
          (q == 0 || (!masked.charAt(q - 1).isLetterOrDigit && masked.charAt(q - 1) != '_'))) {
          val w = wordStartingAt(masked, q)
          if (tailTerminators.contains(w)) { blockEnd = q; scan2 = false }
          else q += math.max(w.length, 1)
        } else q += 1
      }
      val block = sql.substring(blockStart, m.start) + replacement +
        sql.substring(condEnd, blockEnd)
      sql.substring(0, blockStart) +
        s"SELECT * EXCEPT ($helper) FROM ( $block ) " + sql.substring(blockEnd)
    }
  }

  private val PivotStmtRe = raw"(?is)^\s*PIVOT\s".r
  private val UnpivotStmtRe = raw"(?is)^\s*UNPIVOT\s".r

  /** Split `s` on depth-0 commas (parens tracked; `s` must already be
    * quote-masked-aligned with the raw text it indexes into).
    */
  private def splitTopLevel(raw: String, masked: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var d = 0
    var last = 0
    var k = 0
    while (k < masked.length) {
      masked.charAt(k) match {
        case '(' => d += 1
        case ')' => d -= 1
        case ',' if d == 0 => out += raw.substring(last, k); last = k + 1
        case _ =>
      }
      k += 1
    }
    out += raw.substring(last)
    out.result()
  }

  /** DuckDB's top-level `PIVOT` STATEMENT (`PIVOT rel ON col [IN (...)]
    * [USING agg(expr)] [GROUP BY ...] [ORDER BY ...] [LIMIT ...]`),
    * rewritten to Spark's pivot CLAUSE. The statement's defining
    * convenience — pivot values discovered from the data when `IN` is
    * omitted — needs a live session: one `SELECT DISTINCT col` (sorted,
    * capped at 1000 — a pivot wider than that is a mistake, not a
    * query) supplies the IN list Spark requires. Semantics parity with
    * DuckDB: single-agg columns are named by the value's text; an
    * omitted USING means count(*); an omitted GROUP BY groups on every
    * remaining column (Spark's pivot clause does exactly that, so no
    * projection is needed); an explicit GROUP BY narrows the implicit
    * grouping via an inner projection. Multiple USING aggregates and
    * USING aliases execute with DuckDB's value-major `{value}_{name}`
    * cell naming (r16; name = alias, else normalized aggregate text,
    * `count(*)` → `count_star()` — all probed). Multi-column ON keeps
    * a guided error. q105 runs the SAME statement text on both engines.
    */
  def rewritePivotStatement(spark: org.apache.spark.sql.SparkSession,
                            sql: String,
                            prepare: String => String = identity): String = {
    val masked = maskQuotes(sql)
    val m = PivotStmtRe.findFirstMatchIn(masked).getOrElse(return sql)
    def fail(why: String): Nothing =
      throw new graft.functions.expressions.DuckDialectException(
        s"PIVOT statement couldn't be auto-rewritten ($why) — use Spark's " +
          "pivot clause with explicit values: SELECT * FROM t PIVOT " +
          "(agg(expr) FOR col IN ('v1', 'v2'))")
    var i = m.end - 1
    def skipWs(): Unit = while (i < masked.length && masked.charAt(i).isWhitespace) i += 1
    def balanced(open: Int): Int = { // index after the matching ')'
      var d = 1
      var k = open + 1
      while (k < masked.length && d > 0) {
        masked.charAt(k) match {
          case '(' => d += 1
          case ')' => d -= 1
          case _ =>
        }
        k += 1
      }
      if (d != 0) fail("unbalanced parens")
      k
    }
    skipWs()
    val relStart = i
    if (i < masked.length && masked.charAt(i) == '(') i = balanced(i)
    else {
      while (i < masked.length && (masked.charAt(i).isLetterOrDigit ||
        masked.charAt(i) == '.' || masked.charAt(i) == '_')) i += 1
      if (i == relStart) fail("missing relation")
    }
    val relIsSub = masked.charAt(relStart) == '('
    val relForSql =
      if (relIsSub) s"${sql.substring(relStart, i)} __graft_pvsrc"
      else sql.substring(relStart, i)
    skipWs()
    if (!wordStartingAt(masked, i).equalsIgnoreCase("ON")) fail("missing ON <column>")
    i += 2; skipWs()
    val colStart = i
    while (i < masked.length && (masked.charAt(i).isLetterOrDigit || masked.charAt(i) == '_')) i += 1
    if (i == colStart) fail("ON must name a single plain column")
    val pcol = sql.substring(colStart, i)
    skipWs()
    if (i < masked.length && masked.charAt(i) == ',') fail("multiple ON columns")
    var inBody: Option[(String, String)] = None // (raw, masked)
    if (wordStartingAt(masked, i).equalsIgnoreCase("IN")) {
      i += 2; skipWs()
      if (i >= masked.length || masked.charAt(i) != '(') fail("IN without a value list")
      val e = balanced(i)
      inBody = Some((sql.substring(i + 1, e - 1), masked.substring(i + 1, e - 1)))
      i = e; skipWs()
    }
    // USING list: `agg(expr) [AS alias], ...` (r16: aliases and multiple
    // aggregates execute — previously a guided error). DuckDB's cell
    // naming (probed 1.0.0): a SINGLE unaliased aggregate names cells by
    // the value text alone; otherwise every cell is `{value}_{name}`
    // where name = the alias, or the aggregate's normalized text
    // (`min(x)`; `count(*)` renders `count_star()`).
    case class PivotAgg(fn: String, arg: String, name: String)
    var aggs = Seq(PivotAgg("count", "1", "count_star()"))
    var namedCells = false // any alias or >1 aggregate → value_name cells
    if (wordStartingAt(masked, i).equalsIgnoreCase("USING")) {
      i += 5
      val parsed = scala.collection.mutable.ArrayBuffer[PivotAgg]()
      var more = true
      while (more) {
        skipWs()
        val f0 = i
        while (i < masked.length && (masked.charAt(i).isLetterOrDigit || masked.charAt(i) == '_')) i += 1
        if (i == f0) fail("USING needs an aggregate call")
        val fn = sql.substring(f0, i)
        skipWs()
        if (i >= masked.length || masked.charAt(i) != '(') fail("USING needs an aggregate call")
        val e = balanced(i)
        var arg = sql.substring(i + 1, e - 1).trim
        val isStar = arg == "*"
        if (isStar) arg = "1"
        i = e; skipWs()
        var alias: Option[String] = None
        if (wordStartingAt(masked, i).equalsIgnoreCase("AS")) {
          i += 2; skipWs()
          val a0 = i
          while (i < masked.length && (masked.charAt(i).isLetterOrDigit || masked.charAt(i) == '_')) i += 1
          if (i == a0) fail("USING ... AS needs a plain name")
          alias = Some(sql.substring(a0, i))
          skipWs()
          namedCells = true
        }
        val defName =
          if (fn.equalsIgnoreCase("count") && isStar) "count_star()" else s"$fn($arg)"
        parsed += PivotAgg(fn, arg, alias.getOrElse(defName))
        if (i < masked.length && masked.charAt(i) == ',') { i += 1; namedCells = true }
        else more = false
      }
      aggs = parsed.toSeq
    }
    var groupCols: Option[String] = None
    if (wordStartingAt(masked, i).equalsIgnoreCase("GROUP")) {
      i += 5; skipWs()
      if (!wordStartingAt(masked, i).equalsIgnoreCase("BY")) fail("GROUP without BY")
      i += 2
      val g0 = i
      var d = 0
      var scanning = true
      while (i < masked.length && scanning) {
        val c = masked.charAt(i)
        if (c == '(') { d += 1; i += 1 }
        else if (c == ')') { d -= 1; i += 1 }
        else if (d == 0 && c.isLetter &&
          (!masked.charAt(i - 1).isLetterOrDigit && masked.charAt(i - 1) != '_')) {
          val w = wordStartingAt(masked, i)
          if (Set("ORDER", "LIMIT", "OFFSET").contains(w.toUpperCase)) scanning = false
          else i += math.max(w.length, 1)
        } else i += 1
      }
      groupCols = Some(sql.substring(g0, i).trim)
    }
    val tail = sql.substring(i)
    // value list: IN-pinned, else discovered (sorted, capped)
    val vals: Seq[(String, String)] = inBody match { // (literal, columnName)
      case Some((raw, rawMasked)) =>
        splitTopLevel(raw, rawMasked).map(_.trim).filter(_.nonEmpty).map { t =>
          val nm =
            if (t.length >= 2 && t.head == '\'' && t.last == '\'')
              t.substring(1, t.length - 1).replace("''", "'")
            else t
          (t, nm)
        }
      case None =>
        // the pivot source may itself carry DuckDB dialect (EXCLUDE,
        // QUALIFY, …): `prepare` (SqlStage passes the full rewrite
        // chain) runs over the discovery SQL before Spark parses it
        val rows = spark.sql(prepare(
          s"SELECT DISTINCT $pcol AS v FROM $relForSql WHERE $pcol IS NOT NULL " +
            "ORDER BY v LIMIT 1001")).collect()
        if (rows.length > 1000) fail("over 1000 distinct pivot values — pin them with IN (...)")
        if (rows.isEmpty) {
          // DuckDB over an empty (or all-NULL-pivot-column) input
          // (probed 1.0.0): ZERO rows whose schema is the grouping
          // columns alone — no cell columns to discover, no error.
          def btq(c: String) = s"`${c.replace("`", "``")}`"
          val grpList = groupCols.getOrElse {
            val schemaCols = spark.sql(prepare(s"SELECT * FROM $relForSql WHERE 1=0")).columns
            schemaCols.filterNot(_ == pcol)
              .filterNot(c => aggs.exists(a => ("(?i)(?<![\\w`])" +
                java.util.regex.Pattern.quote(c) + "(?![\\w`])").r
                .findFirstIn(a.arg).isDefined))
              .map(btq).mkString(", ")
          }
          // with implicit grouping where EVERY column is the pivot
          // column or an aggregate arg, the empty-input result has no
          // columns at all — DuckDB 1.0.0 raises "SELECT list is empty
          // after resolving * expressions!" (probed); a guided error
          // keeps the parity loud instead of an invalid `SELECT  FROM`
          // Spark parse (ADVICE r16)
          if (grpList.trim.isEmpty)
            fail("pivot over an empty input leaves no grouping columns " +
              "(every column is the pivot column or an aggregate " +
              "argument) — DuckDB raises a Binder error on this shape " +
              "too; add a grouping column or pin the pivot values " +
              "with IN (...)")
          return s"SELECT $grpList FROM $relForSql WHERE 1=0 $tail"
        }
        import org.apache.spark.sql.types._
        rows.head.schema("v").dataType match {
          case StringType => rows.toSeq.map { r =>
            val s0 = r.get(0).toString
            ("'" + s0.replace("'", "''") + "'", s0)
          }
          case _: NumericType | BooleanType => rows.toSeq.map { r =>
            val s0 = r.get(0).toString
            (s0, s0)
          }
          case DateType => rows.toSeq.map { r =>
            val s0 = r.get(0).toString
            (s"DATE '$s0'", s0)
          }
          case _: TimestampType => rows.toSeq.map { r =>
            val s0 = r.get(0).toString
            (s"TIMESTAMP '$s0'", s0)
          }
          case t => fail(s"pivot values of type ${t.simpleString} — pin them with IN (...)")
        }
    }
    // DuckDB's count over an empty pivot cell is 0; Spark's pivot cell
    // is NULL — count aggregates need a coalescing outer projection over
    // the known grouping columns (GROUP BY list, or every non-pivot
    // column from the relation's schema when grouping is implicit).
    // Named-cell mode projects value-major (DuckDB's column order).
    def bt(s0: String): String = s"`${s0.replace("`", "``")}`"
    // Spark's pivot clause names a cell `{value}_{aggAlias}` when there
    // are SEVERAL aggregates — aliasing each with its DuckDB name makes
    // Spark produce DuckDB's columns directly. With ONE aggregate Spark
    // names cells by the value text alone and IGNORES the alias
    // (probed), so a single-aliased USING needs the outer projection to
    // rename `{value}` → `{value}_{alias}`.
    val sparkAggList =
      if (aggs.size == 1) s"${aggs.head.fn}(${aggs.head.arg})"
      else aggs.map(a => s"${a.fn}(${a.arg}) AS ${bt(a.name)}").mkString(", ")
    val anyCount = aggs.exists(_.fn.equalsIgnoreCase("count"))
    // outer projection needed to coalesce count cells and/or rename
    // single-aliased cells to DuckDB's names
    val needOuter = anyCount || (namedCells && aggs.size == 1)
    // When an outer projection re-references pivot cells, the IN values
    // get collision-free internal aliases: Spark resolves references
    // case-INsensitively, so a cell named by value text 'F' captures an
    // outer reference to grouping column `f` (probed:
    // AMBIGUOUS_REFERENCE) — `__graft_c{i}` can collide with nothing,
    // and the outer projection renames cells to DuckDB's names.
    val inList = vals.zipWithIndex.map { case ((lit, nm), ix) =>
      if (needOuter) s"$lit AS `__graft_c$ix`"
      else s"$lit AS ${bt(nm)}"
    }.mkString(", ")
    def sparkCellName(ix: Int, a: PivotAgg): String =
      if (aggs.size == 1) s"__graft_c$ix" else s"__graft_c${ix}_${a.name}"
    def duckCellName(valueName: String, a: PivotAgg): String =
      if (!namedCells) valueName else s"${valueName}_${a.name}"
    def coalesced(grpList: String): String = {
      val grp = grpList.trim
      val cells = vals.zipWithIndex.flatMap { case ((_, nm), ix) =>
        aggs.map { a =>
          val src = bt(sparkCellName(ix, a))
          val dst = bt(duckCellName(nm, a))
          if (a.fn.equalsIgnoreCase("count")) s"coalesce($src, 0) AS $dst"
          else s"$src AS $dst"
        }
      }.mkString(", ")
      (if (grp.isEmpty) cells else s"$grp, $cells")
    }
    groupCols match {
      case Some(g) =>
        val pvProj = aggs.zipWithIndex
          .map { case (a, ix) => s"${a.arg} AS __graft_pv$ix" }.mkString(", ")
        val pvAggs =
          if (aggs.size == 1) s"${aggs.head.fn}(__graft_pv0)"
          else aggs.zipWithIndex
            .map { case (a, ix) => s"${a.fn}(__graft_pv$ix) AS ${bt(a.name)}" }
            .mkString(", ")
        val inner = s"(SELECT $g, $pcol, $pvProj FROM $relForSql) " +
          s"PIVOT ($pvAggs FOR $pcol IN ($inList))"
        // the outer projection's FROM wraps the pivot in a subquery —
        // a bare `(sub) PIVOT (single-agg ...)` leaves the pivot CHILD's
        // columns visible to outer references alongside the pivot
        // output, and a grouping column resolves ambiguously (probed:
        // AMBIGUOUS_REFERENCE on the single-aggregate shape)
        if (needOuter) s"SELECT ${coalesced(g)} FROM (SELECT * FROM $inner) __graft_pvt $tail"
        else s"SELECT * FROM $inner$tail"
      case None =>
        val inner = s"$relForSql PIVOT ($sparkAggList FOR $pcol IN ($inList))"
        if (needOuter) {
          // implicit grouping = every column the pivot doesn't consume:
          // exclude the pivot column AND any column an aggregate
          // argument references (Spark's clause drops those too)
          val schemaCols = spark.sql(prepare(s"SELECT * FROM $relForSql WHERE 1=0")).columns
          val others = schemaCols
            .filterNot(_ == pcol)
            .filterNot(c => aggs.exists(a => ("(?i)(?<![\\w`])" +
              java.util.regex.Pattern.quote(c) + "(?![\\w`])").r
              .findFirstIn(a.arg).isDefined))
            .map(c => bt(c)).mkString(", ")
          s"SELECT ${coalesced(others)} FROM (SELECT * FROM $inner) __graft_pvt $tail"
        } else s"SELECT * FROM $inner$tail"
    }
  }

  /** DuckDB's top-level `UNPIVOT` STATEMENT (`UNPIVOT rel ON c1, c2
    * [INTO NAME n VALUE v] [tail]`) → Spark's unpivot clause
    * (`SELECT * FROM rel UNPIVOT (v FOR n IN (c1, c2))`). Pure text —
    * the column list is explicit, so no session is needed. NULL cells
    * are dropped by both engines' defaults. Multiple VALUE columns
    * (DuckDB's paired unpivot) keep a guided error. q106 runs the SAME
    * statement text on both engines.
    */
  def rewriteUnpivotStatement(sql: String): String = {
    val masked = maskQuotes(sql)
    val m = UnpivotStmtRe.findFirstMatchIn(masked).getOrElse(return sql)
    def fail(why: String): Nothing =
      throw new graft.functions.expressions.DuckDialectException(
        s"UNPIVOT statement couldn't be auto-rewritten ($why) — use Spark's " +
          "unpivot clause: SELECT * FROM t UNPIVOT (v FOR n IN (c1, c2)), " +
          "or stack(): SELECT stack(2, 'c1', c1, 'c2', c2) AS (n, v) FROM t")
    var i = m.end - 1
    def skipWs(): Unit = while (i < masked.length && masked.charAt(i).isWhitespace) i += 1
    skipWs()
    val relStart = i
    if (i < masked.length && masked.charAt(i) == '(') {
      var d = 1; i += 1
      while (i < masked.length && d > 0) {
        masked.charAt(i) match {
          case '(' => d += 1
          case ')' => d -= 1
          case _ =>
        }
        i += 1
      }
      if (d != 0) fail("unbalanced parens in the relation")
    } else {
      while (i < masked.length && (masked.charAt(i).isLetterOrDigit ||
        masked.charAt(i) == '.' || masked.charAt(i) == '_')) i += 1
      if (i == relStart) fail("missing relation")
    }
    val relIsSub = masked.charAt(relStart) == '('
    val relForSql =
      if (relIsSub) s"${sql.substring(relStart, i)} __graft_upsrc"
      else sql.substring(relStart, i)
    skipWs()
    if (!wordStartingAt(masked, i).equalsIgnoreCase("ON")) fail("missing ON <columns>")
    i += 2
    // column list runs to INTO / ORDER / LIMIT / end at depth 0
    val c0 = i
    var d = 0
    var scanning = true
    while (i < masked.length && scanning) {
      val c = masked.charAt(i)
      if (c == '(') { d += 1; i += 1 }
      else if (c == ')') { d -= 1; i += 1 }
      else if (d == 0 && c.isLetter &&
        (!masked.charAt(i - 1).isLetterOrDigit && masked.charAt(i - 1) != '_')) {
        val w = wordStartingAt(masked, i)
        if (Set("INTO", "ORDER", "LIMIT", "OFFSET").contains(w.toUpperCase)) scanning = false
        else i += math.max(w.length, 1)
      } else i += 1
    }
    val colList = sql.substring(c0, i).trim
    if (colList.isEmpty) fail("ON lists no columns")
    var nameCol = "name"
    var valCol = "value"
    if (wordStartingAt(masked, i).equalsIgnoreCase("INTO")) {
      i += 4; skipWs()
      if (!wordStartingAt(masked, i).equalsIgnoreCase("NAME")) fail("INTO without NAME")
      i += 4; skipWs()
      val n0 = i
      while (i < masked.length && (masked.charAt(i).isLetterOrDigit || masked.charAt(i) == '_')) i += 1
      if (i == n0) fail("NAME without an identifier")
      nameCol = sql.substring(n0, i)
      skipWs()
      if (!wordStartingAt(masked, i).equalsIgnoreCase("VALUE")) fail("NAME without VALUE")
      i += 5; skipWs()
      val v0 = i
      while (i < masked.length && (masked.charAt(i).isLetterOrDigit || masked.charAt(i) == '_')) i += 1
      if (i == v0) fail("VALUE without an identifier")
      valCol = sql.substring(v0, i)
      skipWs()
      val nextW = wordStartingAt(masked, math.min(i, masked.length - 1)).toUpperCase
      if (i < masked.length && !Set("ORDER", "LIMIT", "OFFSET", "").contains(nextW))
        fail("multiple VALUE columns (paired unpivot)")
    }
    val tail = sql.substring(i)
    s"SELECT * FROM $relForSql UNPIVOT (`$valCol` FOR `$nameCol` IN ($colList))$tail"
  }

  private val PositionalRe = raw"(?i)\bPOSITIONAL\s+JOIN\b".r

  /** DuckDB `POSITIONAL JOIN`: pair rows of two relations BY POSITION,
    * NULL-padding the shorter side — i.e. a FULL OUTER equi-join on row
    * index. A distributed scan has no deterministic row order (file
    * order is a single-node notion), so the rewrite fires ONLY when
    * both sides are parenthesized subqueries with a top-level trailing
    * ORDER BY — the user-supplied total order that makes "position"
    * well-defined and run-stable. Each side gains
    * `row_number() OVER (ORDER BY <its own keys>)` and the join becomes
    * FULL OUTER on the two indexes; with a star select list the block
    * is wrapped in `SELECT * EXCEPT (helpers)` like the ASOF rewrite.
    * Bare table names (and ordinal ORDER BYs, which would be constants
    * inside a window frame) keep the guided error (VERDICT r6 #5).
    *
    * Scale note: a global row_number is a single-partition window —
    * this is a dialect-compat/verification path; at scale express the
    * pairing through real join keys.
    */
  def rewritePositional(sql: String): String = {
    val masked = maskQuotes(sql)
    PositionalRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) => rewritePositional(rewriteOnePositional(sql, masked, m))
    }
  }

  private def rewriteOnePositional(sql: String, masked: String,
                                   m: scala.util.matching.Regex.Match): String = {
    def fail(why: String): Nothing =
      throw new graft.functions.expressions.DuckDialectException(
        s"POSITIONAL JOIN couldn't be auto-rewritten ($why) — a distributed " +
          "scan has no deterministic row order, so each side must be a " +
          "subquery with an explicit ORDER BY: FROM (SELECT ... ORDER BY k1) a " +
          "POSITIONAL JOIN (SELECT ... ORDER BY k2) b; or add row_number() " +
          "indexes over a deterministic key on both sides and equi-join them")
    // ---- left side (backward): ( subquery ) [AS] [alias]
    var i = m.start - 1
    def skipWsBack(): Unit = while (i >= 0 && masked.charAt(i).isWhitespace) i -= 1
    skipWsBack()
    if (i < 0) fail("no left-side relation")
    var leftAlias: String = null
    if (masked.charAt(i) != ')' &&
      (masked.charAt(i).isLetterOrDigit || masked.charAt(i) == '_')) {
      // backward identifier scan (wordEndingAt rejects trailing digits —
      // it targets keywords — but `t1` is a fine alias)
      var b = i
      while (b >= 0 && (masked.charAt(b).isLetterOrDigit || masked.charAt(b) == '_')) b -= 1
      val w = sql.substring(b + 1, i + 1)
      if (w.isEmpty || !((w.head.isLetter || w.head == '_')) ||
        w.equalsIgnoreCase("AS")) fail("unrecognized left side")
      leftAlias = w
      i = b
      skipWsBack()
      // optional AS before the alias
      if (i >= 0 && (masked.charAt(i).isLetterOrDigit || masked.charAt(i) == '_') &&
        wordEndingAt(masked, i).equalsIgnoreCase("AS")) {
        i -= 2; skipWsBack()
      }
    }
    if (i < 0 || masked.charAt(i) != ')')
      fail("the left side is not a parenthesized subquery")
    val lEnd = i
    var d = 1
    i -= 1
    while (i >= 0 && d > 0) {
      masked.charAt(i) match {
        case ')' => d += 1
        case '(' => d -= 1
        case _ =>
      }
      if (d > 0) i -= 1
    }
    if (d != 0) fail("unbalanced parens on the left side")
    val lStart = i
    // ---- right side (forward): ( subquery ) [AS] [alias]
    var j = m.end
    def skipWs(): Unit = while (j < masked.length && masked.charAt(j).isWhitespace) j += 1
    skipWs()
    if (j >= masked.length || masked.charAt(j) != '(')
      fail("the right side is not a parenthesized subquery")
    val rStart = j
    var d2 = 1
    j += 1
    while (j < masked.length && d2 > 0) {
      masked.charAt(j) match {
        case '(' => d2 += 1
        case ')' => d2 -= 1
        case _ =>
      }
      j += 1
    }
    if (d2 != 0) fail("unbalanced parens on the right side")
    val rEnd = j - 1
    skipWs()
    var rightAlias: String = null
    var tailEnd = j
    if (j < masked.length && (masked.charAt(j).isLetter || masked.charAt(j) == '_')) {
      var w = wordStartingAt(masked, j)
      if (w.equalsIgnoreCase("AS")) {
        j += 2; skipWs(); w = wordStartingAt(masked, j)
        if (w.isEmpty) fail("missing alias after AS")
      }
      // a clause keyword is NOT an alias
      if (!Set("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET", "WINDOW",
        "UNION", "INTERSECT", "EXCEPT", "MINUS", "JOIN", "INNER", "LEFT",
        "RIGHT", "FULL", "CROSS", "ON", "USING", "POSITIONAL").contains(w.toUpperCase)) {
        rightAlias = sql.substring(j, j + w.length)
        tailEnd = j + w.length
      }
    }
    // ---- each side's top-level trailing ORDER BY supplies the keys
    def orderKeys(start: Int, end: Int, side: String): String = {
      val inner = masked.substring(start + 1, end)
      var k = 0
      var dd = 0
      var obPos = -1
      while (k < inner.length) {
        val c = inner.charAt(k)
        if (c == '(') { dd += 1; k += 1 }
        else if (c == ')') { dd -= 1; k += 1 }
        else if (dd == 0 && c.isLetter &&
          (k == 0 || (!inner.charAt(k - 1).isLetterOrDigit && inner.charAt(k - 1) != '_'))) {
          val w = wordStartingAt(inner, k)
          if (w.equalsIgnoreCase("ORDER")) obPos = k
          k += math.max(w.length, 1)
        } else k += 1
      }
      if (obPos < 0) fail(s"the $side side has no top-level ORDER BY")
      var p = obPos + 5
      while (p < inner.length && inner.charAt(p).isWhitespace) p += 1
      if (!wordStartingAt(inner, p).equalsIgnoreCase("BY")) fail(s"the $side side has no top-level ORDER BY")
      p += 2
      // keys run to a depth-0 LIMIT/OFFSET or the subquery end
      var q = p
      var d3 = 0
      var keysEnd = inner.length
      var scan = true
      while (q < inner.length && scan) {
        val c = inner.charAt(q)
        if (c == '(') { d3 += 1; q += 1 }
        else if (c == ')') { d3 -= 1; q += 1 }
        else if (d3 == 0 && c.isLetter &&
          (!inner.charAt(q - 1).isLetterOrDigit && inner.charAt(q - 1) != '_')) {
          val w = wordStartingAt(inner, q)
          if (w.equalsIgnoreCase("LIMIT") || w.equalsIgnoreCase("OFFSET")) {
            keysEnd = q; scan = false
          } else q += math.max(w.length, 1)
        } else q += 1
      }
      val keys = sql.substring(start + 1 + p, start + 1 + keysEnd).trim
      if (keys.isEmpty) fail(s"the $side side's ORDER BY lists no keys")
      // ordinals (ORDER BY 1) would be CONSTANTS inside a window frame
      if (keys.split(",").exists(_.trim.matches(raw"\d+(\s+(?i:ASC|DESC))?")))
        fail(s"the $side side orders by column ordinal — name the column")
      keys
    }
    val lKeys = orderKeys(lStart, lEnd, "left")
    val rKeys = orderKeys(rStart, rEnd, "right")
    val n = raw"__graft_pos_l".r.findAllIn(masked).size
    val lh = s"__graft_pos_l$n"
    val rh = s"__graft_pos_r$n"
    val la = if (leftAlias != null) leftAlias else s"__graft_posa$n"
    val ra = if (rightAlias != null) rightAlias else s"__graft_posb$n"
    val newLeft = s"( SELECT *, row_number() OVER (ORDER BY $lKeys) AS $lh " +
      s"FROM ${sql.substring(lStart, lEnd + 1)} __graft_pls$n ) $la"
    val newRight = s"( SELECT *, row_number() OVER (ORDER BY $rKeys) AS $rh " +
      s"FROM ${sql.substring(rStart, rEnd + 1)} __graft_prs$n ) $ra"
    val replacement = s"$newLeft FULL OUTER JOIN $newRight ON $la.$lh = $ra.$rh "
    // ---- star-leak wrap, as in the ASOF rewrite
    val stack = scala.collection.mutable.Stack[Int]()
    var p = 0
    while (p < lStart) {
      masked.charAt(p) match {
        case '(' => stack.push(p + 1)
        case ')' => if (stack.nonEmpty) stack.pop()
        case _ =>
      }
      p += 1
    }
    val blockStart = if (stack.isEmpty) 0 else stack.top
    // which helper indexes leak into the output? a bare `*` leaks both;
    // a one-sided `alias.*` leaks only that side's (wrapping EXCEPT with
    // a helper the projection doesn't carry would be an analysis error)
    val leakedHelpers: Seq[String] = {
      var k = blockStart; var d4 = 0; var fromPos = lStart; var looking = true
      while (k < lStart && looking) {
        val c = masked.charAt(k)
        if (c == '(') d4 += 1
        else if (c == ')') d4 -= 1
        else if (d4 == 0 && c.isLetter &&
          (k == 0 || (!masked.charAt(k - 1).isLetterOrDigit && masked.charAt(k - 1) != '_'))) {
          val w = wordStartingAt(masked, k)
          if (w == "FROM") { fromPos = k; looking = false }
          else k += math.max(w.length, 1) - 1
        }
        k += 1
      }
      starQualifiers(masked, sql, blockStart, fromPos).flatMap {
        case None => Seq(lh, rh)
        case Some(q) if q.equalsIgnoreCase(la) => Seq(lh)
        case Some(q) if q.equalsIgnoreCase(ra) => Seq(rh)
        case _ => Nil
      }.distinct
    }
    if (leakedHelpers.isEmpty)
      sql.substring(0, lStart) + replacement + sql.substring(tailEnd)
    else {
      val tailTerminators = Set("UNION", "INTERSECT", "EXCEPT", "MINUS")
      var q = tailEnd
      var d5 = 0
      var blockEnd = masked.length
      var scan2 = true
      while (q < masked.length && scan2) {
        val c = masked.charAt(q)
        if (c == '(') { d5 += 1; q += 1 }
        else if (c == ')') {
          if (d5 == 0) { blockEnd = q; scan2 = false } else { d5 -= 1; q += 1 }
        } else if (d5 == 0 && c.isLetter &&
          (q == 0 || (!masked.charAt(q - 1).isLetterOrDigit && masked.charAt(q - 1) != '_'))) {
          val w = wordStartingAt(masked, q)
          if (tailTerminators.contains(w)) { blockEnd = q; scan2 = false }
          else q += math.max(w.length, 1)
        } else q += 1
      }
      val block = sql.substring(blockStart, lStart) + replacement +
        sql.substring(tailEnd, blockEnd)
      sql.substring(0, blockStart) +
        s"SELECT * EXCEPT (${leakedHelpers.mkString(", ")}) FROM ( $block ) " +
        sql.substring(blockEnd)
    }
  }

  /** Star qualifiers at depth 0 of the select list: `None` for a bare
    * `*`, `Some(t)` for `t.*`. (The boolean [[selectListHasStar]] stays
    * for rewrites whose wrap is side-agnostic.)
    */
  private def starQualifiers(masked: String, sql: String, blockStart: Int,
                             fromPos: Int): Seq[Option[String]] = {
    val out = Seq.newBuilder[Option[String]]
    var k = blockStart
    var d = 0
    while (k < fromPos) {
      val c = masked.charAt(k)
      if (c == '(') d += 1
      else if (c == ')') d -= 1
      else if (d == 0 && c == '*') {
        val prevIdx = (k - 1 to blockStart by -1).find(x => !masked.charAt(x).isWhitespace)
        prevIdx match {
          case None => out += None
          case Some(x) =>
            val pc = masked.charAt(x)
            if (pc == ',') out += None
            else if (pc == '.') {
              var b = x - 1
              while (b >= blockStart && (masked.charAt(b).isLetterOrDigit ||
                masked.charAt(b) == '_')) b -= 1
              val q = sql.substring(b + 1, x)
              if (q.nonEmpty) out += Some(q)
            } else if ((pc.isLetterOrDigit || pc == '_') &&
              Set("SELECT", "DISTINCT", "ALL").contains(wordEndingAt(masked, x)))
              out += None
        }
      }
      k += 1
    }
    out.result()
  }

  /** Is there a projection star (`*`, `t.*`) at depth 0 of the select
    * list? Distinguished from multiplication by the preceding token:
    * a comma, a dot, or the SELECT/DISTINCT/ALL keyword means star.
    */
  private def selectListHasStar(masked: String, blockStart: Int, fromPos: Int): Boolean = {
    var k = blockStart
    var d = 0
    while (k < fromPos) {
      val c = masked.charAt(k)
      if (c == '(') d += 1
      else if (c == ')') d -= 1
      else if (d == 0 && c == '*') {
        val prevIdx = (k - 1 to blockStart by -1).find(x => !masked.charAt(x).isWhitespace)
        val isProj = prevIdx match {
          case None => true
          case Some(x) =>
            val pc = masked.charAt(x)
            if (pc == ',' || pc == '.') true
            else if (pc.isLetterOrDigit || pc == '_')
              Set("SELECT", "DISTINCT", "ALL").contains(wordEndingAt(masked, x))
            else false
        }
        if (isProj) return true
      }
      k += 1
    }
    false
  }

  private val ColumnsRe = raw"(?i)\bCOLUMNS\s*\(".r

  /** Expand DuckDB's `COLUMNS(...)` star pattern against a KNOWN schema
    * — callable only where the input columns are at hand (SqlStage; the
    * parser extension has no schema and leaves the construct to the
    * guided error). DuckDB (1.x, verified against 1.0.0) semantics: the
    * whole SELECT-LIST ITEM containing COLUMNS(...) is replicated per
    * matched column — any surrounding expression applies per column
    * (`COLUMNS('^n_') * 2`, `max(COLUMNS(*)) + 1`, and
    * `COLUMNS(p) <op> COLUMNS(p)` zips the equal expansions) — and each
    * output keeps the MATCHED COLUMN's name (an explicit `AS alias`
    * names every expansion `alias`, exactly as DuckDB does, duplicates
    * and all).
    *
    * Matchers: bare `*`; `'regex'` (RE2-style SEARCH over the name);
    * `['a','b']` explicit lists (a missing name raises); name-lambdas
    * over any boolean combination (AND/OR/NOT, parens) of
    * `[NOT] [I]LIKE 'pat'` (full match), `[NOT] SIMILAR TO 'regex'`
    * (full regex, DuckDB's SIMILAR TO), `[NOT] IN ('a', ...)`, and
    * `= / <> / != 'lit'` predicates on the variable
    * ([[lambdaPredicate]], r9). Lambdas computing FUNCTIONS of the
    * variable (len(c), substrings) and COLUMNS outside a select list
    * or WHERE clause keep the guided error. A pattern matching zero columns raises,
    * naming the available columns; so do two COLUMNS with DIFFERENT
    * patterns in one item (no sound splice — DuckDB zips identical
    * expansions only).
    */
  def rewriteColumns(sql: String, cols: Seq[String],
      resolve: String => Option[Seq[String]] = _ => None): String = {
    val masked = maskQuotes(sql)
    ColumnsRe.findFirstMatchIn(masked) match {
      case None => sql
      case Some(m) =>
        val i = closeOf(masked, m.end) match {
          case Some(e) => e
          case None => return sql // unbalanced — let the parser report it
        }
        val argRaw = sql.substring(m.end, i - 1).trim
        // expand against the ACTUAL source relation's schema when the
        // block reads one resolvable table (r16, the rewriteReplace
        // treatment) — the stage `df` contract stays the fallback
        val srcCols = {
          val stk = scala.collection.mutable.Stack[Int]()
          var bj = 0
          while (bj < m.start) {
            masked.charAt(bj) match {
              case '(' => stk.push(bj + 1)
              case ')' => if (stk.nonEmpty) stk.pop()
              case _ =>
            }
            bj += 1
          }
          val blockStart = if (stk.isEmpty) 0 else stk.top
          blockFromRelation(sql, masked, blockStart).flatMap(resolve).getOrElse(cols)
        }
        val matched = matchedColumns(argRaw, srcCols) match {
          case Some(ms) => ms
          case None => return sql // unsupported arg form → guided error
        }
        if (matched.isEmpty)
          throw new graft.functions.expressions.DuckDialectException(
            s"COLUMNS($argRaw) matches no column of [${srcCols.mkString(", ")}]")
        val (itemStart, itemEnd) = itemSpanContaining(masked, m.start) match {
          case Some(s) if raw"(?i)\bSELECT\b".r
              .findFirstMatchIn(masked.substring(s._1, m.start)).isDefined =>
            // an intervening SELECT between the item start and the
            // COLUMNS occurrence means COLUMNS sits in a NESTED
            // subquery clause (e.g. a scalar subquery's WHERE) that no
            // select list of its own claims — DuckDB binds COLUMNS
            // against the INNER query's schema, so replicating the
            // OUTER item against the stage schema would silently
            // diverge (ADVICE r8 #3): keep the guided error instead
            return sql
          case Some(s) => s
          case None =>
            // WHERE-clause COLUMNS: DuckDB replicates the ENTIRE
            // predicate per matched column and ANDs the replicas
            // (`WHERE COLUMNS('a.*') > 0 OR b = 'y'` keeps rows where
            // every column satisfies the full disjunction — verified
            // against duckdb 1.0.0)
            whereSpanContaining(masked, m.start) match {
              case None => return sql // other clause → guided error
              case Some((ws, we)) =>
                val occs = ColumnsRe.findAllMatchIn(masked)
                  .filter(o => o.start >= ws && o.start < we).toList
                  .flatMap(o => closeOf(masked, o.end)
                    .map(e => (o.start, e, sql.substring(o.end, e - 1).trim)))
                if (occs.exists(_._3 != argRaw))
                  throw new graft.functions.expressions.DuckDialectException(
                    "two COLUMNS(...) with different patterns in one predicate " +
                      "have no sound expansion — DuckDB zips IDENTICAL expansions only")
                val clause = sql.substring(ws, we)
                val rel = occs.map { case (s, e, _) => (s - ws, e - ws) }
                  .sortBy(-_._1)
                val expansion = matched.map { c =>
                  "(" + rel.foldLeft(clause) { case (acc, (s, e)) =>
                    acc.substring(0, s) + s"`$c`" + acc.substring(e)
                  }.trim + ")"
                }.mkString(" AND ")
                return rewriteColumns(sql.substring(0, ws) + " " + expansion +
                  " " + sql.substring(we), cols, resolve)
            }
        }
        // every COLUMNS inside the item must carry the SAME pattern
        val occs = ColumnsRe.findAllMatchIn(masked)
          .filter(o => o.start >= itemStart && o.start < itemEnd).toList
          .flatMap(o => closeOf(masked, o.end)
            .map(e => (o.start, e, sql.substring(o.end, e - 1).trim)))
        if (occs.exists(_._3 != argRaw))
          throw new graft.functions.expressions.DuckDialectException(
            "two COLUMNS(...) with different patterns in one select-list item " +
              "have no sound expansion — DuckDB zips IDENTICAL expansions only")
        // optional top-level trailing alias — DuckDB applies it to
        // EVERY expansion. Forms: `AS ident`, `AS "quoted"`/`` `q` ``,
        // and the IMPLICIT `expr ident` (no AS) — the last is detected
        // only for a bare trailing identifier that can't be part of an
        // expression (not a literal/keyword/interval unit; CAST(x AS t)
        // never matches: its AS sits inside parens).
        val itemMasked = masked.substring(itemStart, itemEnd)
        def topLevel(end: Int): Boolean = {
          val prefix = itemMasked.substring(0, end)
          prefix.count(_ == '(') == prefix.count(_ == ')')
        }
        val asM = raw"""(?is)\s+AS\s+(?:([A-Za-z_]\w*)|"([^"]+)"|`([^`]+)`)\s*$$""".r
          .findFirstMatchIn(itemMasked).filter(a => topLevel(a.start))
        val implicitM =
          if (asM.isDefined) None
          else raw"""(?is)(\S)\s+(?:([A-Za-z_]\w*)|"([^"]+)"|`([^`]+)`)\s*$$""".r
            .findFirstMatchIn(itemMasked)
            .filter { a =>
              val bare = a.group(2) != null
              val w = if (bare) a.group(2).toUpperCase else ""
              // words that legally END a select item without being an
              // alias (literals, CASE END, interval units, null-order
              // modifiers)
              val nonAlias = Set("NULL", "NULLS", "TRUE", "FALSE", "END",
                "UNKNOWN",
                "YEAR", "YEARS", "MONTH", "MONTHS", "WEEK", "WEEKS",
                "DAY", "DAYS", "HOUR", "HOURS", "MINUTE", "MINUTES",
                "SECOND", "SECONDS", "MILLISECOND", "MILLISECONDS",
                "MICROSECOND", "MICROSECONDS")
              // the token BEFORE the candidate alias must END an
              // expression: ')', quote/backtick, or a word that is not
              // a word-operator / clause keyword (AND flag, THEN x,
              // OVER w, AT TIME ZONE tz, x COLLATE c are expressions)
              val prevEnd = a.end(1) - 1
              val prevOk = {
                val c = itemMasked.charAt(prevEnd)
                if (c.isLetterOrDigit || c == '_') {
                  val pw = wordEndingAt(itemMasked, prevEnd)
                  !Set("AND", "OR", "NOT", "IN", "IS", "LIKE", "ILIKE",
                    "RLIKE", "DIV", "MOD", "BETWEEN", "THEN", "WHEN",
                    "ELSE", "ESCAPE", "DISTINCT", "ALL", "OVER",
                    "COLLATE", "ZONE", "TIME", "AT", "INTERVAL",
                    "IGNORE", "RESPECT").contains(pw)
                } else ")'`\"".contains(c)
              }
              val gi = if (bare) 2 else if (a.group(3) != null) 3 else 4
              topLevel(a.start(gi)) && (!bare || !nonAlias.contains(w)) && prevOk
            }
        def implicitGroup(a: scala.util.matching.Regex.Match): Int =
          if (a.group(2) != null) 2 else if (a.group(3) != null) 3 else 4
        // implicit-alias expr ends right after the last expression char
        // (group 1) — works for bare and quoted alias tails alike
        val exprLen = asM.map(_.start)
          .orElse(implicitM.map(_.end(1)))
          .getOrElse(itemMasked.length)
        val alias = asM.map { a =>
          val g = (1 to 3).find(i => a.group(i) != null).get
          sql.substring(itemStart + a.start(g), itemStart + a.end(g))
        }.orElse(implicitM.map { a =>
          val g = implicitGroup(a)
          sql.substring(itemStart + a.start(g), itemStart + a.end(g))
        })
        val exprSql = sql.substring(itemStart, itemStart + exprLen)
        val relOccs = occs.map { case (s, e, _) => (s - itemStart, e - itemStart) }
          .sortBy(-_._1)
        val expansion = matched.map { c =>
          val rep = relOccs.foldLeft(exprSql) { case (acc, (s, e)) =>
            acc.substring(0, s) + s"`$c`" + acc.substring(e)
          }.trim
          alias match {
            case Some(a) => s"$rep AS `$a`"
            case None if rep == s"`$c`" => rep // bare form keeps the name
            case None => s"$rep AS `$c`"
          }
        }.mkString(", ")
        // the item span swallows its surrounding whitespace (itemStart
        // abuts SELECT/',', itemEnd abuts FROM/','): re-pad
        rewriteColumns(
          sql.substring(0, itemStart) + " " + expansion + " " +
            sql.substring(itemEnd), cols, resolve)
    }
  }

  /** Index just past the ')' matching the '(' that `afterOpen` follows;
    * None when unbalanced.
    */
  private def closeOf(masked: String, afterOpen: Int): Option[Int] = {
    var i = afterOpen
    var d = 1
    while (i < masked.length && d > 0) {
      masked.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
      i += 1
    }
    if (d == 0) Some(i) else None
  }

  /** Column set matched by a COLUMNS(...) argument; None when the form
    * isn't supported (→ guided error).
    */
  private def matchedColumns(argRaw: String, cols: Seq[String]): Option[Seq[String]] = {
    if (argRaw == "*") return Some(cols)
    if (argRaw.length >= 2 && (argRaw.head == '\'' || argRaw.head == '"')
        && argRaw.last == argRaw.head)
      return {
        val re = argRaw.substring(1, argRaw.length - 1).r
        Some(cols.filter(c => re.findFirstIn(c).isDefined))
      }
    if (argRaw.startsWith("[") && argRaw.endsWith("]")) {
      val elems = argRaw.substring(1, argRaw.length - 1).split(",")
        .map(_.trim).filter(_.nonEmpty).toSeq
      if (!elems.forall(e => e.length >= 2 &&
          (e.head == '\'' || e.head == '"') && e.last == e.head)) return None
      val names = elems.map(e => e.substring(1, e.length - 1))
      names.find(n => !cols.contains(n)).foreach { missing =>
        throw new graft.functions.expressions.DuckDialectException(
          s"COLUMNS list names '$missing', not a column of [${cols.mkString(", ")}]")
      }
      return Some(names)
    }
    val lam = raw"(?is)^([A-Za-z_]\w*)\s*->\s*(.*)$$".r
    argRaw match {
      case lam(v, body) =>
        // name-lambda: any boolean combination (AND/OR/NOT, parens) of
        // [NOT] [I]LIKE / [NOT] SIMILAR TO / [NOT] IN (...) / = / <> /
        // != predicates over the variable — evaluated per column name
        // (r9, DuckDB 1.x-probed). Lambdas computing FUNCTIONS of the
        // name (len(c) > 3, substrings) stay guided errors.
        lambdaPredicate(v, body.trim).map(f => cols.filter(f))
      case _ => None // computed arg → guided error
    }
  }

  /** Parse a COLUMNS name-lambda body into a per-column-name boolean
    * evaluator; None when the body falls outside the supported grammar
    * (→ guided error). Grammar (precedence NOT > AND > OR):
    * {{{
    *   expr := term (OR term)* ; term := factor (AND factor)*
    *   factor := NOT factor | ( expr ) | pred
    *   pred := s [NOT] [I]LIKE 'pat' | s [NOT] SIMILAR TO 'rx'
    *         | s [NOT] IN ('a', ...) | s = 'lit' | s <> 'lit' | s != 'lit'
    *         | n cmp n
    *   s    := v | lower(s) | upper(s)          -- name transforms (r9)
    *   n    := n (+|-) n | n (*|/|//|%) n | - n | ( n ) | NUM
    *         | len(s) | length(s) | strlen(s)   -- arithmetic (r10)
    *   cmp  := = | <> | != | < | <= | > | >=
    * }}}
    * Numeric arithmetic follows DuckDB's rules (`/` double division,
    * `//` floor division, `%` modulo; usual precedence, unary minus),
    * so `c -> len(c) % 2 = 0` or `c -> len(c) * 2 >= 10 + 4` match the
    * columns DuckDB matches.
    * LIKE is a full match with %/_ wildcards; SIMILAR TO a full regex
    * (both as elsewhere in the dialect layer). The lambda variable is a
    * column NAME (VARCHAR) in DuckDB, so `len(c)` is the name's length
    * and `lower(c) LIKE ...` a case-normalized name match — the
    * name-function forms VERDICT r8 missing #3 left on the table.
    */
  private def lambdaPredicate(v: String, body: String): Option[String => Boolean] = {
    sealed trait Tok
    final case class Word(w: String) extends Tok
    final case class Str(s: String) extends Tok
    final case class Sym(s: String) extends Tok
    final case class Num(n: Long) extends Tok
    val toks = scala.collection.mutable.ArrayBuffer[Tok]()
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder; i += 1
        var open = true
        while (open) {
          if (i >= body.length) return None // unterminated literal
          val ch = body.charAt(i)
          if (ch == '\'')
            if (i + 1 < body.length && body.charAt(i + 1) == '\'') {
              sb.append('\''); i += 2
            } else { open = false; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        toks += Str(sb.toString)
      } else if (c.isLetter || c == '_') {
        val j0 = i
        while (i < body.length &&
          (body.charAt(i).isLetterOrDigit || body.charAt(i) == '_')) i += 1
        toks += Word(body.substring(j0, i))
      } else if (c.isDigit) {
        val j0 = i
        while (i < body.length && body.charAt(i).isDigit) i += 1
        toks += Num(body.substring(j0, i).toLong)
      } else if (c == '(' || c == ')' || c == ',') { toks += Sym(c.toString); i += 1 }
      else if (c == '/' && i + 1 < body.length && body.charAt(i + 1) == '/') {
        toks += Sym("//"); i += 2
      } else if (c == '+' || c == '-' || c == '*' || c == '/' || c == '%') {
        toks += Sym(c.toString); i += 1
      } else if ((c == '!' || c == '<') && i + 1 < body.length &&
        (body.substring(i, i + 2) == "!=" || body.substring(i, i + 2) == "<>")) {
        toks += Sym("<>"); i += 2
      } else if ((c == '<' || c == '>') && i + 1 < body.length &&
        body.charAt(i + 1) == '=') {
        toks += Sym(c.toString + "="); i += 2
      } else if (c == '<' || c == '>' || c == '=') { toks += Sym(c.toString); i += 1 }
      else return None
    }
    var p = 0
    def peek: Option[Tok] = if (p < toks.length) Some(toks(p)) else None
    def isKw(t: Tok, k: String): Boolean = t match {
      case Word(w) => w.equalsIgnoreCase(k); case _ => false
    }
    def takeStr(): Option[String] = peek match {
      case Some(Str(s)) => p += 1; Some(s); case _ => None
    }
    def likeRegex(pat: String, ci: Boolean): scala.util.matching.Regex = {
      val rx = "^" + pat.flatMap {
        case '%' => ".*"
        case '_' => "."
        case ch if "\\.[]{}()*+-?^$|".contains(ch) => "\\" + ch
        case ch => ch.toString
      } + "$"
      (if (ci) "(?i)" + rx else rx).r
    }
    def attempt[A](f: () => Option[A]): Option[A] = {
      val p0 = p
      val r = f()
      if (r.isEmpty) p = p0
      r
    }
    // integer literal with optional unary minus (substring arguments)
    def parseIntLit(): Option[Long] = peek match {
      case Some(Num(n)) => p += 1; Some(n)
      case Some(Sym("-")) =>
        p += 1
        peek match { case Some(Num(n)) => p += 1; Some(-n); case _ => None }
      case _ => None
    }
    // s := v | lower(s) | upper(s) | substring/substr(s, start [, len])
    // | replace(s, 'from', 'to') — name transforms (the variable is a
    // column NAME; the lambda-variable match stays case-SENSITIVE as in
    // the boolean grammar, function names are case-insensitive).
    // substring follows DuckDB 1.0.0 (probed): a negative start counts
    // from the END (start' = len + start + 1), start 0 eats into the
    // length, the window [max(start',1), start'+len-1] clamps to the
    // string, empty when inverted; a NEGATIVE length selects |len|
    // chars ENDING just before start — substring('hello', 3, -2) =
    // 'he', i.e. the window [start+len, start-1] (probed r12, ADVICE
    // r11 expected an error but duckdb 1.0.0 returns the backward
    // window); replace('', ...) is identity.
    def parseStrExpr(): Option[String => String] = peek match {
      case Some(Word(w)) if w == v => p += 1; Some(identity[String])
      case Some(Word(w)) if w.equalsIgnoreCase("lower") || w.equalsIgnoreCase("upper") =>
        p += 1
        if (!peek.contains(Sym("("))) return None
        p += 1
        val inner = parseStrExpr().getOrElse(return None)
        if (!peek.contains(Sym(")"))) return None
        p += 1
        if (w.equalsIgnoreCase("lower")) Some(c => inner(c).toLowerCase)
        else Some(c => inner(c).toUpperCase)
      case Some(Word(w)) if w.equalsIgnoreCase("substring") || w.equalsIgnoreCase("substr") =>
        p += 1
        if (!peek.contains(Sym("("))) return None
        p += 1
        val inner = parseStrExpr().getOrElse(return None)
        if (!peek.contains(Sym(","))) return None
        p += 1
        val start = parseIntLit().getOrElse(return None)
        val lenOpt =
          if (peek.contains(Sym(","))) {
            p += 1
            Some(parseIntLit().getOrElse(return None))
          } else None
        if (!peek.contains(Sym(")"))) return None
        p += 1
        Some { c =>
          val s = inner(c)
          val n = s.length.toLong
          val st = if (start < 0) n + start + 1 else start
          val (lo0, hi0) = lenOpt match {
            case None => (st, n)
            case Some(l) if l >= 0 => (st, st + l - 1)
            case Some(l) => (st + l, st - 1) // negative len: backward window
          }
          val lo = math.max(lo0, 1L)
          val hi = math.min(hi0, n)
          if (hi < lo) "" else s.substring(lo.toInt - 1, hi.toInt)
        }
      case Some(Word(w)) if w.equalsIgnoreCase("replace") =>
        p += 1
        if (!peek.contains(Sym("("))) return None
        p += 1
        val inner = parseStrExpr().getOrElse(return None)
        if (!peek.contains(Sym(","))) return None
        p += 1
        val from = takeStr().getOrElse(return None)
        if (!peek.contains(Sym(","))) return None
        p += 1
        val to = takeStr().getOrElse(return None)
        if (!peek.contains(Sym(")"))) return None
        p += 1
        Some(c => if (from.isEmpty) inner(c) else inner(c).replace(from, to))
      case _ => None
    }
    // numeric expressions over the NAME (r10 — VERDICT r9 #5's
    // arithmetic-on-the-variable forms): full + - * / // % arithmetic
    // with DuckDB's numeric rules, atoms are integer literals, unary
    // minus, parenthesized sub-expressions, and len/length/strlen of a
    // string expression. Values are doubles internally (NaN encodes
    // SQL NULL — the only NULL producer is /0); each subexpression
    // also carries its STATIC integral-typedness because DuckDB
    // dispatches `//` on the declared type, not the runtime value
    // (ADVICE r11, probed on duckdb 1.0.0): INTEGER // INTEGER
    // truncates toward zero (-7 // 2 = -3), but any DOUBLE operand
    // makes `//` PLAIN division — (7/1) // 2 = 3.5, 7.5 // 2 = 3.75.
    case class NumE(eval: String => Double, integral: Boolean)
    def parseNumAtom(): Option[NumE] = peek match {
      case Some(Num(k)) => p += 1; Some(NumE(_ => k.toDouble, integral = true))
      case Some(Sym("-")) =>
        p += 1
        parseNumAtom().map(e => NumE(c => -e.eval(c), e.integral))
      case Some(Sym("(")) =>
        p += 1
        val e = parseNumAdd().getOrElse(return None)
        if (!peek.contains(Sym(")"))) return None
        p += 1
        Some(e)
      case Some(Word(w)) if Seq("len", "length", "strlen").exists(w.equalsIgnoreCase) =>
        p += 1
        if (!peek.contains(Sym("("))) return None
        p += 1
        val inner = parseStrExpr().getOrElse(return None)
        if (!peek.contains(Sym(")"))) return None
        p += 1
        Some(NumE(c => inner(c).length.toDouble, integral = true))
      case _ => None
    }
    def parseNumMul(): Option[NumE] = {
      var left = parseNumAtom().getOrElse(return None)
      var scanning = true
      while (scanning) peek match {
        case Some(Sym(op @ ("*" | "/" | "//" | "%"))) =>
          p += 1
          val r = parseNumAtom().getOrElse(return None)
          val l = left
          left = op match {
            case "*" => NumE(c => l.eval(c) * r.eval(c), l.integral && r.integral)
            case "/" =>
              // `/` is always DOUBLE division; x / 0 is NULL (probed —
              // Infinity would wrongly satisfy <>/>/>= predicates)
              NumE(c => {
                val rv = r.eval(c)
                if (rv == 0.0d) Double.NaN else l.eval(c) / rv
              }, integral = false)
            case "//" =>
              val integralDiv = l.integral && r.integral
              NumE(c => {
                val (lv, rv) = (l.eval(c), r.eval(c))
                if (rv == 0.0d || lv.isNaN || rv.isNaN) Double.NaN
                else if (integralDiv) (lv.toLong / rv.toLong).toDouble
                else lv / rv
              }, integralDiv)
            case _ =>
              // %: JVM fmod matches DuckDB's sign rules; % 0 is NaN natively
              NumE(c => l.eval(c) % r.eval(c), l.integral && r.integral)
          }
        case _ => scanning = false
      }
      Some(left)
    }
    def parseNumAdd(): Option[NumE] = {
      var left = parseNumMul().getOrElse(return None)
      var scanning = true
      while (scanning) peek match {
        case Some(Sym(op @ ("+" | "-"))) =>
          p += 1
          val r = parseNumMul().getOrElse(return None)
          val l = left
          left = if (op == "+") NumE(c => l.eval(c) + r.eval(c), l.integral && r.integral)
                 else NumE(c => l.eval(c) - r.eval(c), l.integral && r.integral)
        case _ => scanning = false
      }
      Some(left)
    }
    val cmpOps = Set("=", "<>", "<", "<=", ">", ">=")
    // NULL-aware comparison (ADVICE r11): a NaN operand means SQL NULL,
    // and NULL cmp x is NULL for EVERY operator — `a != b` on NaN is
    // true in the JVM, which inverted <> and NOT (len(c) // 0 <> 0
    // matched ALL columns where DuckDB matches none).
    def cmpN(op: String, a: Double, b: Double): Option[Boolean] =
      if (a.isNaN || b.isNaN) None
      else Some(op match {
        case "=" => a == b
        case "<>" => a != b
        case "<" => a < b
        case "<=" => a <= b
        case ">" => a > b
        case ">=" => a >= b
      })
    // nexpr cmp nexpr — arithmetic allowed on BOTH sides
    def parseNumPred(): Option[String => Option[Boolean]] = {
      val l = parseNumAdd().getOrElse(return None)
      val op = peek match {
        case Some(Sym(s)) if cmpOps(s) => p += 1; s
        case _ => return None
      }
      parseNumAdd().map(r => (c: String) => cmpN(op, l.eval(c), r.eval(c)))
    }
    def parsePred(): Option[String => Option[Boolean]] = {
      attempt(() => parseNumPred()).foreach(f => return Some(f))
      val s = attempt(() => parseStrExpr()).getOrElse(return None)
      val neg = peek.exists(isKw(_, "NOT"))
      if (neg) p += 1
      // string predicates never see NULL (the operand is a column NAME)
      def negate(f: String => Boolean): String => Option[Boolean] =
        if (neg) c => Some(!f(c)) else c => Some(f(c))
      peek match {
        case Some(Word(op)) if op.equalsIgnoreCase("LIKE") || op.equalsIgnoreCase("ILIKE") =>
          p += 1
          val rx = likeRegex(takeStr().getOrElse(return None),
            op.equalsIgnoreCase("ILIKE"))
          Some(negate(c => rx.findFirstIn(s(c)).isDefined))
        case Some(t) if isKw(t, "SIMILAR") =>
          p += 1
          if (!peek.exists(isKw(_, "TO"))) return None
          p += 1
          // DuckDB's SIMILAR TO is a FULL regex match
          val rx = ("^(?:" + takeStr().getOrElse(return None) + ")$").r
          Some(negate(c => rx.findFirstIn(s(c)).isDefined))
        case Some(t) if isKw(t, "IN") =>
          p += 1
          if (!peek.contains(Sym("("))) return None
          p += 1
          val elems = scala.collection.mutable.Set[String]()
          elems += takeStr().getOrElse(return None)
          while (peek.contains(Sym(","))) {
            p += 1
            elems += takeStr().getOrElse(return None)
          }
          if (!peek.contains(Sym(")"))) return None
          p += 1
          Some(negate(c => elems.contains(s(c))))
        case Some(Sym("=")) if !neg =>
          p += 1
          val lit = takeStr().getOrElse(return None)
          Some(c => Some(s(c) == lit))
        case Some(Sym("<>")) if !neg =>
          p += 1
          val lit = takeStr().getOrElse(return None)
          Some(c => Some(s(c) != lit))
        case _ => None
      }
    }
    // Kleene three-valued AND/OR (ADVICE r11): NULL (None) propagates
    // unless the other side decides — false AND NULL = false,
    // true OR NULL = true; NOT NULL = NULL.
    def kAnd(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
      (a, b) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
    def kOr(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
      (a, b) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    def parseFactor(): Option[String => Option[Boolean]] = peek match {
      case Some(t) if isKw(t, "NOT") =>
        p += 1
        parseFactor().map(f => (c: String) => f(c).map(!_))
      case Some(Sym("(")) =>
        // A leading paren is ambiguous: a boolean group `(a AND b)` or
        // a parenthesized NUMERIC subexpression starting a predicate,
        // `(len(c) - 10) // 3 = -2` (VERDICT r11 #1 — the grammar used
        // to hard-commit to the boolean group and fail-closed on the
        // latter). Attempt the group, backtrack to the predicate
        // grammar, whose numeric atoms consume the paren themselves.
        val grouped = attempt { () =>
          p += 1
          parseExpr() match {
            case Some(e) if peek.contains(Sym(")")) => p += 1; Some(e)
            case _ => None
          }
        }
        grouped.orElse(attempt(() => parsePred()))
      case _ => parsePred()
    }
    def parseTerm(): Option[String => Option[Boolean]] = {
      var left = parseFactor().getOrElse(return None)
      while (peek.exists(isKw(_, "AND"))) {
        p += 1
        val r = parseFactor().getOrElse(return None)
        val l = left
        left = c => kAnd(l(c), r(c))
      }
      Some(left)
    }
    def parseExpr(): Option[String => Option[Boolean]] = {
      var left = parseTerm().getOrElse(return None)
      while (peek.exists(isKw(_, "OR"))) {
        p += 1
        val r = parseTerm().getOrElse(return None)
        val l = left
        left = c => kOr(l(c), r(c))
      }
      Some(left)
    }
    // a NULL predicate matches no column — NULL is falsy in a filter
    parseExpr().filter(_ => p == toks.length)
      .map(f => (c: String) => f(c).getOrElse(false))
  }

  /** The [start, end) span of the WHERE clause body containing position
    * `p` (innermost WHERE wins); None when `p` is in no WHERE clause.
    */
  private def whereSpanContaining(masked: String, p: Int): Option[(Int, Int)] = {
    val WhereRe = raw"(?i)\bWHERE\b".r
    val enders = Set("GROUP", "ORDER", "HAVING", "LIMIT", "QUALIFY",
      "WINDOW", "UNION", "INTERSECT", "EXCEPT")
    var best: Option[(Int, Int)] = None
    for (wm <- WhereRe.findAllMatchIn(masked) if wm.end <= p) {
      var j = wm.end
      var depth = 0
      var scanning = true
      while (scanning && j < masked.length) {
        val c = masked.charAt(j)
        if (c == '(') { depth += 1; j += 1 }
        else if (c == ')') {
          if (depth == 0) scanning = false else { depth -= 1; j += 1 }
        } else if (depth == 0 && (c.isLetter || c == '_')) {
          val w = wordStartingAt(masked, j)
          if (enders.contains(w)) scanning = false
          else j += math.max(1, w.length)
        } else j += 1
      }
      if (wm.end <= p && p < j) best = Some((wm.end, j))
    }
    best
  }

  /** The [start, end) span of the select-list item containing position
    * `p`, resolved against the INNERMOST enclosing SELECT; None when
    * `p` sits in no select list (WHERE handled separately; ON/... →
    * guided error).
    */
  private def itemSpanContaining(masked: String, p: Int): Option[(Int, Int)] = {
    val SelectRe = raw"(?i)\bSELECT\b".r
    var best: Option[(Int, Int)] = None
    for (sm <- SelectRe.findAllMatchIn(masked) if sm.end <= p) {
      var j = sm.end
      var depth = 0
      var itemStart = j
      var scanning = true
      while (scanning && j < masked.length) {
        val c = masked.charAt(j)
        if (c == '(') { depth += 1; j += 1 }
        else if (c == ')') {
          if (depth == 0) { // the paren enclosing this SELECT closes
            if (itemStart <= p && p < j) best = Some((itemStart, j))
            scanning = false
          } else { depth -= 1; j += 1 }
        } else if (c == ',' && depth == 0) {
          if (itemStart <= p && p < j) { best = Some((itemStart, j)); scanning = false }
          else { j += 1; itemStart = j }
        } else if (depth == 0 && (c.isLetter || c == '_')) {
          val w = wordStartingAt(masked, j)
          if (w == "FROM") {
            if (itemStart <= p && p < j) best = Some((itemStart, j))
            scanning = false
          } else if ((w == "DISTINCT" || w == "ALL") &&
              masked.substring(itemStart, j).trim.isEmpty) {
            j += w.length; itemStart = j
          } else j += math.max(1, w.length)
        } else j += 1
      }
      if (scanning && itemStart <= p && p <= j) // list ran to string end
        best = Some((itemStart, j))
    }
    best
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

  /** Replace the contents of single-quoted literals with '_' and SQL
    * comments (`--` to end-of-line, `/* */`) with spaces, in place
    * (positions preserved; '' escapes and newlines kept). Comment
    * MARKERS are blanked too, so a ';' — or any dialect marker — inside
    * a comment is invisible to every masked-text rewrite, and
    * [[splitStatements]] can't split a batch mid-comment (r9 review).
    * One state machine so quotes and comments shadow each other the way
    * the parser sees them: `--` inside a literal is text, `'` inside a
    * comment is not a quote.
    */
  private[graft] def maskQuotes(s: String): String = {
    val a = s.toCharArray
    var i = 0
    var inQ = false
    var inLine = false
    var inBlock = false
    while (i < a.length) {
      val c = a(i)
      if (inQ) {
        if (c == '\'') {
          if (i + 1 < a.length && a(i + 1) == '\'') { a(i) = '_'; a(i + 1) = '_'; i += 1 }
          else inQ = false
        } else a(i) = '_'
      } else if (inLine) {
        if (c == '\n' || c == '\r') inLine = false else a(i) = ' '
      } else if (inBlock) {
        if (c == '*' && i + 1 < a.length && a(i + 1) == '/') {
          a(i) = ' '; a(i + 1) = ' '; i += 1; inBlock = false
        } else if (c != '\n' && c != '\r') a(i) = ' '
      } else if (c == '\'') inQ = true
      else if (c == '-' && i + 1 < a.length && a(i + 1) == '-') {
        a(i) = ' '; a(i + 1) = ' '; i += 1; inLine = true
      } else if (c == '/' && i + 1 < a.length && a(i + 1) == '*') {
        a(i) = ' '; a(i + 1) = ' '; i += 1; inBlock = true
      }
      i += 1
    }
    new String(a)
  }

  private val StarReplaceRe =
    raw"(?is)\*\s*(?:(?:EXCLUDE|EXCEPT)\s*\(([^)]*)\)\s*)?REPLACE\s*\(".r

  /** Expand DuckDB `* [EXCLUDE (a, …)] REPLACE (expr AS col, …)` against
    * the stage schema (same contract as [[rewriteColumns]]: `cols` is the
    * `df` view's column list, so a star sourced from some other relation
    * in the query is expanded against the wrong schema — documented
    * dialect edge, consistent with COLUMNS()). Each star column comes out
    * verbatim except the replaced ones, which become `expr AS col` in the
    * star's position — DuckDB's exact semantics (select clause docs;
    * reference users get the construct via the verbatim passthrough,
    * filefilter.py:340-342). An EXCLUDE/EXCEPT list between the star and
    * REPLACE is folded into the same expansion. Guided errors: a
    * qualified star (`t.* REPLACE`), a REPLACE item without `AS`, and a
    * REPLACE target that is not a schema column (DuckDB errors there
    * too).
    */
  /** The single bare relation name of the block's FROM following `pos`
    * (depth-0 relative to the block containing `pos`), or None when the
    * FROM is absent, multi-relation (comma/JOIN), or a subquery — used
    * by [[rewriteReplace]] to expand a star against the ACTUAL source
    * table's schema instead of the stage `df` contract (r16, FuzzDiff:
    * `SELECT * REPLACE (…) FROM lineitem` previously refused because
    * the replaced name wasn't a stage-input column).
    */
  private def blockFromRelation(sql: String, masked: String, pos: Int): Option[String] = {
    var i = pos
    var d = 0
    var fromAt = -1
    var blockEnd = masked.length
    while (i < masked.length && blockEnd == masked.length) {
      val c = masked.charAt(i)
      if (c == '(') d += 1
      else if (c == ')') { d -= 1; if (d < 0) blockEnd = i }
      else if (d == 0 && fromAt < 0 && c.isLetter &&
        (i == 0 || (!masked.charAt(i - 1).isLetterOrDigit && masked.charAt(i - 1) != '_'))) {
        val w = wordStartingAt(masked, i)
        if (w == "FROM") fromAt = i
        else i += math.max(w.length, 1) - 1
      }
      i += 1
    }
    if (fromAt < 0) return None
    val fromEnd = depth0Find(masked,
      raw"(?i)\b(WHERE|GROUP|ORDER|LIMIT|HAVING|QUALIFY|WINDOW|UNION|INTERSECT|EXCEPT|USING|JOIN|LEFT|RIGHT|FULL|INNER|CROSS|SEMI|ANTI)\b|,".r,
      fromAt + 4, blockEnd) match {
      // a JOIN-family keyword or comma INSIDE the from-part → multi-relation
      case Some(p) =>
        val w = if (masked.charAt(p) == ',') "," else wordStartingAt(masked, p)
        if (w == "," || !Set("WHERE", "GROUP", "ORDER", "LIMIT", "HAVING",
          "QUALIFY", "WINDOW", "UNION", "INTERSECT", "EXCEPT").contains(w))
          return None
        p
      case None => blockEnd
    }
    val fromPart = sql.substring(fromAt + 4, fromEnd).trim
    raw"(?is)^([A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?[A-Za-z_]\w*)?$$".r
      .findFirstMatchIn(fromPart).map(_.group(1))
  }

  /** [[blockFromRelation]]'s (name, explicit alias) twin — the
    * qualified-star paths need the alias to match the qualifier.
    */
  private def blockFromRelationParts(sql: String, masked: String,
      pos: Int): Option[(String, Option[String])] =
    blockFromRelation(sql, masked, pos).map { name =>
      // re-extract the alias from the same single-relation from-part
      // shape blockFromRelation just validated
      val aliasRe =
        (raw"(?is)\bFROM\s+" + java.util.regex.Pattern.quote(name) +
          raw"\s+(?:AS\s+)?([A-Za-z_]\w*)").r
      (name, aliasRe.findFirstMatchIn(sql).map(_.group(1))
        .filterNot(a => Set("WHERE", "GROUP", "ORDER", "LIMIT", "HAVING",
          "QUALIFY", "WINDOW", "UNION", "INTERSECT", "EXCEPT", "USING",
          "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "SEMI",
          "ANTI").contains(a.toUpperCase)))
    }

  def rewriteReplace(sql: String, cols: Seq[String],
      resolve: String => Option[Seq[String]] = _ => None): String = {
    val masked = maskQuotes(sql)
    // `replace(...)` is also the string function and `*` is also
    // multiplication (`a * replace(b, 'x', 'y')`), so a match only counts
    // when the star sits in select-item position: start of text, after
    // `,`/`(`, after SELECT/DISTINCT/ALL, or after `.` (qualified star —
    // star context, but guided-error below).
    val m0 = StarReplaceRe.findAllMatchIn(masked).find { m =>
      (m.start - 1 to 0 by -1).find(j => !masked.charAt(j).isWhitespace) match {
        case None => true
        case Some(j) =>
          val c = masked.charAt(j)
          c == ',' || c == '(' || c == '.' ||
            Set("SELECT", "DISTINCT", "ALL").contains(wordEndingAt(masked, j))
      }
    }
    m0 match {
      case None => sql
      case Some(m) =>
        // qualified star (t.* REPLACE): claimable when the block reads a
        // single resolvable relation whose name/alias matches the
        // qualifier (r16 — DuckDB supports the form; single-relation
        // blocks make the qualifier redundant, so the bare expansion is
        // exact); anything else keeps the guided error
        val qual: Option[(String, Int)] =
          (m.start - 1 to 0 by -1).find(j => !masked.charAt(j).isWhitespace)
            .filter(j => masked.charAt(j) == '.')
            .map { j =>
              val w = wordEndingAt(masked, j - 1)
              if (w.isEmpty)
                throw new graft.functions.expressions.DuckDialectException(
                  "qualified-star REPLACE: could not read the qualifier — " +
                    "list the columns explicitly")
              (w, j - w.length)
            }
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
        val close = i - 1
        // prefer the ACTUAL source relation's schema (r16): a star over
        // `FROM <table>` expands against that table; the stage `df`
        // contract stays the fallback for df-sourced and complex FROMs
        val relParts = blockFromRelationParts(sql, masked, close + 1)
        val resolved = relParts.map(_._1).flatMap(resolve)
        val srcCols = resolved.getOrElse(cols)
        qual.foreach { case (q, _) =>
          val matches = relParts.exists { case (nm, al) =>
            q.equalsIgnoreCase(nm) || q.equalsIgnoreCase(nm.split('.').last) ||
              al.exists(_.equalsIgnoreCase(q))
          }
          if (!matches || (resolved.isEmpty && !q.equalsIgnoreCase("df")))
            throw new graft.functions.expressions.DuckDialectException(
              s"qualified-star REPLACE ($q.* REPLACE (...)) expands only when " +
                "the block reads a single resolvable relation named/aliased " +
                s"like the qualifier — list the columns explicitly")
        }
        val byLower = srcCols.map(c => c.toLowerCase -> c).toMap
        val itemRe = raw"(?is)^(.*\S)\s+AS\s+(`[^`]+`|\x22[^\x22]+\x22|[A-Za-z_]\w*)\s*$$".r
        val repl: Map[String, String] =
          splitTopLevel(sql.substring(m.end, close), masked.substring(m.end, close))
            .map { item =>
              item.trim match {
                case itemRe(expr, name0) =>
                  val name = name0.stripPrefix("`").stripSuffix("`")
                    .stripPrefix("\"").stripSuffix("\"").toLowerCase
                  if (!byLower.contains(name))
                    throw new graft.functions.expressions.DuckDialectException(
                      s"* REPLACE targets `$name`, not a column of " +
                        s"[${srcCols.mkString(", ")}]")
                  name -> expr.trim
                case other =>
                  throw new graft.functions.expressions.DuckDialectException(
                    s"* REPLACE item `$other` — each item must be `expr AS column`")
              }
            }.toMap
        val excluded: Set[String] = Option(m.group(1)) match {
          case None => Set.empty
          case Some(list) => list.split(',').iterator.map(_.trim)
            .filter(_.nonEmpty)
            .map(_.stripPrefix("`").stripSuffix("`")
              .stripPrefix("\"").stripSuffix("\"").toLowerCase).toSet
        }
        val expansion = srcCols
          .filterNot(c => excluded.contains(c.toLowerCase))
          .map { c =>
            repl.get(c.toLowerCase) match {
              case Some(expr) => s"$expr AS `$c`"
              case None => s"`$c`"
            }
          }.mkString(", ")
        if (expansion.isEmpty)
          throw new graft.functions.expressions.DuckDialectException(
            "* EXCLUDE ... REPLACE excluded every column of the stage schema")
        // a matched qualifier is consumed with the star (the expansion's
        // bare names resolve in the single-relation block)
        val expStart = qual.map(_._2).getOrElse(m.start)
        rewriteReplace(sql.substring(0, expStart) + expansion + sql.substring(i), cols, resolve)
    }
  }

  /** `SUMMARIZE <target>` statement detection: Some(target text) when
    * the statement is DuckDB's SUMMARIZE (target = a table name, `df`,
    * or a full SELECT), None otherwise.
    */
  def summarizeTarget(sql: String): Option[String] =
    raw"(?is)^\s*SUMMARIZE\b(.*)$$".r.findFirstMatchIn(sql)
      .map(_.group(1).trim.stripSuffix(";").trim)

  /** DuckDB `DESCRIBE <target>` / `SHOW <relation>` statement detection
    * (target = a table name, `df`, or a full SELECT — DuckDB's three
    * spellings share it). Spark's OWN statement forms pass through
    * untouched: `DESCRIBE TABLE/QUERY ...`, `SHOW TABLES/VIEWS/
    * FUNCTIONS/...` keep their native Spark output shape — only the
    * bare-relation DuckDB spellings are claimed, so a migrating user's
    * `DESCRIBE orders` gets DuckDB's six-column relation while Spark
    * DDL introspection stays Spark. `DESC` is left to Spark entirely
    * (its abbreviation, same shape risk, rare in DuckDB configs).
    */
  def describeTarget(sql: String): Option[String] = {
    val m = raw"(?is)^\s*(DESCRIBE|SHOW)\s+(.+?)\s*;?\s*$$".r.findFirstMatchIn(sql)
    m.flatMap { mm =>
      val target = mm.group(2).trim
      val sparkForm =
        raw"(?is)^(TABLES?|QUERY|ALL|DATABASES?|SCHEMAS?|NAMESPACES?|FUNCTIONS?|VIEWS?|CATALOGS?|CREATE|COLUMNS?|TBLPROPERTIES|PARTITIONS|EXTENDED|FORMATTED|HISTORY|CURRENT)\b.*".r
      if (sparkForm.findFirstIn(target).isDefined) None
      else if (mm.group(1).equalsIgnoreCase("SHOW") &&
        raw"(?is)^(SELECT|WITH|FROM)\b".r.findFirstIn(target).isDefined) None
      else Some(target)
    }
  }

  /** DuckDB's `DESCRIBE` relation: one row per column with
    * (column_name, column_type, null, key, default, extra) — DuckDB's
    * exact six columns and type names; `null` is YES/NO from the Spark
    * schema's nullability, key/default/extra are NULL exactly as DuckDB
    * prints them for parquet-backed relations. Pure metadata — costs
    * zero jobs at any scale (the schema is already on the driver).
    */
  def describe(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(df.schema.fields.map { f =>
        org.apache.spark.sql.Row(f.name, duckType(f.dataType),
          if (f.nullable) "YES" else "NO", null, null, null)
      }: _*)
    val schema = StructType(Seq("column_name", "column_type", "null",
      "key", "default", "extra").map(StructField(_, StringType, nullable = true)))
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** DuckDB's `SUMMARIZE` relation: one row per input column with
    * (column_name, column_type, min, max, approx_unique, avg, std,
    * q25, q50, q75, count, null_percentage) — same columns, same
    * DuckDB type names (STRING→VARCHAR etc.), numeric-only stats NULL
    * elsewhere, exactly DuckDB's shape. Values: min/max/count/
    * null_percentage are exact; approx_unique is Spark's HLL and
    * q25/q50/q75 Spark's GK quantiles, which can differ from DuckDB's
    * own approximations in the last places — faithful to SUMMARIZE's
    * contract (DuckDB documents approx_unique/q* as approximate), so
    * this relation has no byte-exact oracle and is spec-asserted
    * instead.
    *
    * Plan shape: ONE aggregate pass over the input (every stat for
    * every column in a single scan — ~7·ncols partial-aggregated
    * expressions), then a stack() of the 1-row result into ncols rows.
    * No collect, no per-column scans: at 100 TB SUMMARIZE costs one
    * read of the table.
    */
  /** Spark type → DuckDB type NAME, as DuckDB's DESCRIBE/SUMMARIZE
    * print them (probed against duckdb 1.0.0 over the shared parquet).
    */
  private def duckType(t: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    t match {
      case StringType => "VARCHAR"
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case BooleanType => "BOOLEAN"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case TimestampType => "TIMESTAMP WITH TIME ZONE"
      case TimestampNTZType => "TIMESTAMP"
      case DateType => "DATE"
      case BinaryType => "BLOB"
      case ArrayType(e, _) => s"${duckType(e)}[]"
      case other => other.sql
    }
  }

  def summarize(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val fields = df.schema.fields.toSeq
    def qn(n: String) = s"`${n.replace("`", "``")}`"
    val aggs: Seq[org.apache.spark.sql.Column] = fields.zipWithIndex.flatMap { case (f, ix) =>
      val c = col(qn(f.name))
      val numeric = f.dataType.isInstanceOf[NumericType]
      val ordered = numeric || (f.dataType match {
        case StringType | DateType | TimestampType | TimestampNTZType |
             BooleanType => true
        case _ => false
      })
      def nul = lit(null).cast("string")
      Seq(
        (if (ordered) min(c).cast("string") else nul).as(s"__g${ix}_min"),
        (if (ordered) max(c).cast("string") else nul).as(s"__g${ix}_max"),
        approx_count_distinct(c).as(s"__g${ix}_au"),
        (if (numeric) avg(c.cast("double")).cast("string") else nul).as(s"__g${ix}_avg"),
        (if (numeric) stddev(c.cast("double")).cast("string") else nul).as(s"__g${ix}_std"),
        (if (numeric)
          percentile_approx(c.cast("double"), array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
        else lit(null).cast("array<double>")).as(s"__g${ix}_q"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__g${ix}_nn"))
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.zipWithIndex.map { case (f, ix) =>
      struct(
        lit(f.name).as("column_name"),
        lit(duckType(f.dataType)).as("column_type"),
        col(s"__g${ix}_min").as("min"),
        col(s"__g${ix}_max").as("max"),
        col(s"__g${ix}_au").as("approx_unique"),
        col(s"__g${ix}_avg").as("avg"),
        col(s"__g${ix}_std").as("std"),
        element_at(col(s"__g${ix}_q"), 1).cast("string").as("q25"),
        element_at(col(s"__g${ix}_q"), 2).cast("string").as("q50"),
        element_at(col(s"__g${ix}_q"), 3).cast("string").as("q75"),
        col("__total").as("count"),
        (col(s"__g${ix}_nn") * 100.0 / greatest(col("__total"), lit(1L)))
          .cast("decimal(5,2)").as("null_percentage"))
    }
    one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
  }

  // ── DuckDB CREATE MACRO (reference passthrough, VERDICT r8 missing #4) ──

  /** One registered DuckDB macro. `params` in declared order; a param
    * present in `defaults` is a DuckDB default parameter (`n := 10`) —
    * bindable by NAME only, exactly DuckDB's rule. `isTable` marks
    * `AS TABLE query` macros, whose expansion is a parenthesized
    * subquery (usable anywhere a FROM-relation is).
    */
  final case class DuckMacro(name: String, params: Seq[String],
                             defaults: Map[String, String], body: String,
                             isTable: Boolean)

  /** Session-scoped macro registry — DuckDB macros live in the catalog
    * of one connection (`/root/reference` pipelines share one DuckDB
    * `.db` per run, Database.py:19-29); the Spark re-expression is one
    * SparkSession. Weak-KEYED by the session OBJECT (SparkSession keeps
    * Object identity equals/hashCode), so entries are unique per live
    * session — no identityHashCode collisions — and the whole namespace
    * is GC'd with its session instead of accumulating in long-lived
    * JVMs (r9 review). Values are tiny parsed text — no plan state.
    * All access goes through the synchronized helpers below (WeakHashMap
    * itself is not thread-safe); the inner TrieMap makes per-session
    * reads/writes lock-free once fetched.
    */
  private val macroReg =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, DuckMacro]]()

  /** The session's macro namespace, created on first registration. */
  private def macrosOf(spark: org.apache.spark.sql.SparkSession)
      : scala.collection.concurrent.TrieMap[String, DuckMacro] =
    macroReg.synchronized {
      var m = macroReg.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DuckMacro]
        macroReg.put(spark, m)
      }
      m
    }

  /** Read-only peek: None when the session never registered a macro —
    * keeps [[expandMacros]] zero-cost for macro-free sessions without
    * allocating an empty namespace per lookup.
    */
  private def macrosIfAny(spark: org.apache.spark.sql.SparkSession)
      : Option[scala.collection.concurrent.TrieMap[String, DuckMacro]] =
    macroReg.synchronized(Option(macroReg.get(spark))).filter(_.nonEmpty)

  private val CreateMacroHeadRe =
    raw"(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?MACRO\s+([A-Za-z_]\w*)\s*\(".r

  /** Is this statement a DuckDB `CREATE [OR REPLACE] [TEMP] MACRO`? */
  def isCreateMacroStatement(sql: String): Boolean =
    CreateMacroHeadRe.findFirstMatchIn(sql).isDefined

  private def macroFail(why: String): Nothing =
    throw new graft.functions.expressions.DuckDialectException(
      s"CREATE MACRO couldn't be parsed ($why) — supported: CREATE [OR REPLACE] " +
        "[TEMP] MACRO name(p1, p2, n := default) AS <expr> | AS TABLE <query> " +
        "inside graft sql stages (registered per session, expanded textually " +
        "at every later call site)")

  /** Parse a `CREATE MACRO` statement and register it for the session.
    * Scalar (`AS expr`) and table (`AS TABLE query`) forms, positional
    * params plus DuckDB default params (`n := 10`). A duplicate name
    * without OR REPLACE raises, matching DuckDB's catalog error.
    */
  def registerMacro(spark: org.apache.spark.sql.SparkSession, sql: String): String = {
    val masked = maskQuotes(sql)
    val m = CreateMacroHeadRe.findFirstMatchIn(masked).getOrElse(
      macroFail("not a CREATE MACRO statement"))
    val orReplace = m.group(1) != null
    val name = m.group(2)
    val close = closeOf(masked, m.end).getOrElse(macroFail("unbalanced parameter list"))
    val paramsRaw = sql.substring(m.end, close - 1)
    val paramsMasked = masked.substring(m.end, close - 1)
    val items =
      if (paramsRaw.trim.isEmpty) Nil
      else splitTopLevel(paramsRaw, paramsMasked).map(_.trim)
    val parsed = items.map { it =>
      raw"(?s)^([A-Za-z_]\w*)\s*(?::=\s*(.+))?$$".r.findFirstMatchIn(it) match {
        case Some(pm) => (pm.group(1), Option(pm.group(2)).map(_.trim))
        case None => macroFail(s"bad parameter '$it' — expected name or name := default")
      }
    }
    if (parsed.map(_._1.toLowerCase).distinct.size != parsed.size)
      macroFail("duplicate parameter name")
    val AsRe = raw"(?is)^\s*AS\s+(TABLE\s+)?".r
    val tail = masked.substring(close)
    val asM = AsRe.findFirstMatchIn(tail).getOrElse(macroFail("missing AS <body>"))
    val isTable = asM.group(1) != null
    val body = sql.substring(close + asM.end).trim.stripSuffix(";").trim
    if (body.isEmpty) macroFail("empty body")
    val reg = macrosOf(spark)
    val key = name.toLowerCase
    if (!orReplace && reg.contains(key))
      throw new graft.functions.expressions.DuckDialectException(
        s"macro '$name' already exists in this session — use CREATE OR REPLACE MACRO")
    reg.put(key, DuckMacro(name, parsed.map(_._1),
      parsed.collect { case (p, Some(d)) => p.toLowerCase -> d }.toMap, body, isTable))
    name
  }

  /** Expand every registered-macro invocation in `sql` by textual
    * substitution — each call becomes the macro body with parameters
    * replaced by the (parenthesized) argument texts, the whole wrapped
    * in parens; table macros expand to a parenthesized subquery. DuckDB
    * binds macros logically, but over expression text the parenthesized
    * substitution is semantics-preserving, and it happens BEFORE the
    * rest of the rewrite chain — so a macro body carrying its own
    * DuckDB-isms (bracket slices, struct_pack, …) still gets the full
    * dialect treatment at the call site. Fixpoint loop: macros calling
    * macros expand on the next round, runaway recursion stops at depth
    * 10 with a guided error. Zero-cost when the session has no macros.
    */
  def expandMacros(spark: org.apache.spark.sql.SparkSession, sql: String): String = {
    val reg = macrosIfAny(spark).getOrElse(return sql)
    val CallRe = raw"(?i)(?<![\w.`])([A-Za-z_]\w*)\s*\(".r
    var cur = sql
    var depth = 0
    var changed = true
    while (changed) {
      if (depth > 10)
        throw new graft.functions.expressions.DuckDialectException(
          "macro expansion exceeded depth 10 — recursive macro? DuckDB macros " +
            "cannot recurse; unroll the recursion or use an iterative operator")
      changed = false
      val masked = maskQuotes(cur)
      val sb = new StringBuilder
      var pos = 0
      CallRe.findAllMatchIn(masked).foreach { mm =>
        if (mm.start >= pos) reg.get(mm.group(1).toLowerCase).foreach { mac =>
          closeOf(masked, mm.end).foreach { close =>
            val argsRaw = cur.substring(mm.end, close - 1)
            val argsMasked = masked.substring(mm.end, close - 1)
            sb.append(cur.substring(pos, mm.start))
              .append(expandOneMacro(mac, argsRaw, argsMasked))
            pos = close
            changed = true
          }
        }
      }
      sb.append(cur.substring(pos))
      cur = sb.toString
      depth += 1
    }
    cur
  }

  /** One call site: bind arguments to parameters (positional args fill
    * the non-default params in declared order; `name := expr` args bind
    * by name — DuckDB's exact rule: default params are name-bound only),
    * then substitute each bound param identifier in the body with the
    * parenthesized argument text.
    */
  private def expandOneMacro(mac: DuckMacro, argsRaw: String, argsMasked: String): String = {
    def fail(why: String): Nothing =
      throw new graft.functions.expressions.DuckDialectException(
        s"macro ${mac.name}(${mac.params.mkString(", ")}): $why")
    val args =
      if (argsRaw.trim.isEmpty) Nil
      else {
        val raws = splitTopLevel(argsRaw, argsMasked)
        val maskeds = splitTopLevel(argsMasked, argsMasked)
        raws.zip(maskeds)
      }
    val NamedRe = raw"(?s)^\s*([A-Za-z_]\w*)\s*:=(.*)$$".r
    val (named, positional) = args.partition { case (_, mk) => NamedRe.findFirstIn(mk).isDefined }
    val positionalParams = mac.params.filterNot(p => mac.defaults.contains(p.toLowerCase))
    if (positional.size > positionalParams.size)
      fail(s"${positional.size} positional arguments for ${positionalParams.size} " +
        "positional parameters (default parameters bind by name: p := value)")
    if (positional.size < positionalParams.size)
      fail(s"missing argument for parameter '${positionalParams(positional.size)}'")
    val bound = scala.collection.mutable.Map[String, String]()
    positionalParams.zip(positional).foreach { case (p, (raw, _)) =>
      bound(p.toLowerCase) = raw.trim
    }
    named.foreach { case (raw, _) =>
      val nm = NamedRe.findFirstMatchIn(raw).get
      val pname = nm.group(1).toLowerCase
      if (!mac.params.exists(_.toLowerCase == pname))
        fail(s"no parameter named '${nm.group(1)}'")
      if (bound.contains(pname)) fail(s"parameter '${nm.group(1)}' bound twice")
      bound(pname) = nm.group(2).trim
    }
    mac.defaults.foreach { case (p, d) => if (!bound.contains(p)) bound(p) = d }
    val body = mac.body
    val bodyMasked = maskQuotes(body)
    val IdentRe = raw"(?i)(?<![\w.`])([A-Za-z_]\w*)\b".r
    val sb = new StringBuilder
    var pos = 0
    IdentRe.findAllMatchIn(bodyMasked).foreach { im =>
      bound.get(im.group(1).toLowerCase).foreach { arg =>
        // an identifier followed by '(' is a function CALL named like the
        // param — DuckDB params don't shadow function names; leave it
        var j = im.end
        while (j < bodyMasked.length && bodyMasked.charAt(j).isWhitespace) j += 1
        if (j >= bodyMasked.length || bodyMasked.charAt(j) != '(') {
          sb.append(body.substring(pos, im.start)).append("(").append(arg).append(")")
          pos = im.end
        }
      }
    }
    sb.append(body.substring(pos))
    "(" + sb.toString + ")"
  }

  // ── DuckDB file I/O through sql stages (r9): read_* + COPY TO ──────

  private val ReadFnRe =
    raw"(?i)(?<![\w.])(read_csv_auto|read_csv|read_parquet|read_json_auto|read_json)\s*\(".r

  /** Map a DuckDB column type name (read_csv `columns={'a':'INTEGER'}`,
    * ALTER TABLE ADD COLUMN / SET DATA TYPE) to the Spark DDL type.
    * Unknown names raise a guided error rather than silently mapping.
    */
  def duckTypeToSpark(t: String): String = t.trim.toUpperCase match {
    case v if v.startsWith("VARCHAR(") || v.startsWith("CHAR(") => "STRING"
    case "VARCHAR" | "TEXT" | "STRING" | "CHAR" | "BPCHAR" => "STRING"
    case "INTEGER" | "INT" | "INT4" | "SIGNED" => "INT"
    case "BIGINT" | "INT8" | "LONG" => "BIGINT"
    case "SMALLINT" | "INT2" | "SHORT" => "SMALLINT"
    case "TINYINT" | "INT1" => "TINYINT"
    case "UBIGINT" | "HUGEINT" => "DECIMAL(38,0)"
    case "UTINYINT" => "SMALLINT"
    case "USMALLINT" => "INT"
    case "UINTEGER" => "BIGINT"
    case "VARBINARY" => "BINARY"
    case "DOUBLE" | "FLOAT8" => "DOUBLE"
    case "FLOAT" | "REAL" | "FLOAT4" => "FLOAT"
    case "BOOLEAN" | "BOOL" | "LOGICAL" => "BOOLEAN"
    case "DATE" => "DATE"
    case "TIMESTAMP" | "DATETIME" => "TIMESTAMP"
    case "BLOB" | "BYTEA" | "BINARY" => "BINARY"
    case d if d.startsWith("DECIMAL") || d.startsWith("NUMERIC") =>
      d.replace("NUMERIC", "DECIMAL")
    case other => throw new graft.functions.expressions.DuckDialectException(
      s"DuckDB type '$other' has no Spark mapping " +
        "- use VARCHAR/INTEGER/BIGINT/DOUBLE/FLOAT/BOOLEAN/DATE/TIMESTAMP/DECIMAL(p,s)")
  }

  /** Split read-fn arguments on top-level commas, tracking () AND {}/[]
    * (the `columns={'a':'T','b':'U'}` struct literal carries commas
    * that [[splitTopLevel]]'s paren-only depth would split on).
    */
  private def splitReadArgs(raw: String, masked: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var d = 0
    var last = 0
    var k = 0
    while (k < masked.length) {
      masked.charAt(k) match {
        case '(' | '{' | '[' => d += 1
        case ')' | '}' | ']' => d -= 1
        case ',' if d == 0 => out += raw.substring(last, k); last = k + 1
        case _ =>
      }
      k += 1
    }
    out += raw.substring(last)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Rewrite DuckDB's `read_csv_auto('p') / read_csv / read_parquet /
    * read_json_auto / read_json` TABLE functions (FROM-position file
    * readers, previously guided errors) into session temp views backed
    * by the matching Spark reader - csv with header+schema inference
    * (read_csv_auto's contract), parquet, json lines.
    *
    * read_csv/read_csv_auto OPTION arguments (r10; previously a guided
    * error) map onto the Spark csv reader: `delim`/`sep` -> delimiter,
    * `header` -> header, `columns = {'name': 'TYPE', ...}` -> an
    * explicit DDL schema (inference off - DuckDB's contract: columns IS
    * the schema), `names = ['a', ...]` -> renamed inferred columns,
    * plus pass-throughs `quote`, `escape`, `nullstr` -> nullValue,
    * `dateformat` / `timestampformat`. `skip = N` is implemented
    * genuinely (r11): text read, drop the first N lines by file order,
    * parse the rest - single file only (DuckDB's skip is per file, so a
    * glob would misread -> guided error). `compression` on the READ
    * path only accepts values that agree with Spark's extension-based
    * decode. read_json takes `columns` (DDL schema), `format`
    * ('array' -> multiLine), `records` (false refused); read_parquet
    * takes `hive_partitioning` (false -> recursiveFileLookup, which
    * disables partition discovery), `union_by_name` (-> mergeSchema,
    * DuckDB's name-matched NULL-filling glob union, probed 1.0.0) and
    * `filename`. r17 csv additions: `sample_size` accepted (Spark's
    * inference always reads the whole file — the sample_size=-1
    * behavior users set to FIX misdetection; a smaller DuckDB sample
    * only coarsens DuckDB's side), `all_varchar` (inference off —
    * Spark's uninferred column type IS string), `ignore_errors`
    * (-> DROPMALFORMED), `filename` (per-row source path, scheme
    * stripped to DuckDB's plain-path rendering), `union_by_name` over
    * a csv GLOB keeps a guided error (csv schemas unify positionally
    * in Spark - no name-matched reader equivalent). Unsupported option
    * keys keep a guided error naming the pipeline `input` route -
    * never a silent misread. Spark
    * handles glob paths (`*.parquet` under a dir) natively. View names
    * are content-addressed by reader+path+options so two
    * differently-optioned reads of one path in a statement get distinct
    * views; always re-registered (see below).
    */
  def rewriteReadFns(spark: org.apache.spark.sql.SparkSession, sql: String): String = {
    val masked = maskQuotes(sql)
    val sb = new StringBuilder
    var pos = 0
    ReadFnRe.findAllMatchIn(masked).foreach { mm =>
      if (mm.start >= pos) closeOf(masked, mm.end).foreach { close =>
        val fn = mm.group(1).toLowerCase
        def fail(why: String): Nothing =
          throw new graft.functions.expressions.DuckDialectException(
            s"$fn $why - supported: $fn('path' [, delim/sep, header, columns, " +
              "names, quote, escape, nullstr, skip, compression, dateformat, " +
              "timestampformat, sample_size, all_varchar, ignore_errors, " +
              "filename, union_by_name]); declare the file as a pipeline " +
              "`input` (reference O1) for anything else, or read it with " +
              "the Dataset API")
        val argsRaw = sql.substring(mm.end, close - 1)
        val args = splitReadArgs(argsRaw, masked.substring(mm.end, close - 1))
        if (args.isEmpty) fail("needs a path argument")
        def strLit(s: String): Option[String] = {
          val t = s.trim
          if (t.length >= 2 && t.head == '\'' && t.last == '\'' &&
            !maskQuotes(t).drop(1).dropRight(1).contains('\''))
            Some(t.substring(1, t.length - 1).replace("''", "'"))
          else None
        }
        val path = strLit(args.head).getOrElse(fail("path must be a string literal"))
        val OptRe = raw"(?s)^([A-Za-z_]\w*)\s*(?::?=)\s*(.+)$$".r
        // arguments may carry leading comments (`read_csv(p, /* n; */
        // header = false)`) — strip like statement heads (r13 fuzz)
        val opts = args.tail.map(stripLeadingComments).map { a =>
          OptRe.findFirstMatchIn(a) match {
            case Some(om) => om.group(1).toLowerCase -> om.group(2).trim
            case None => fail(s"option '$a' isn't name=value")
          }
        }
        def boolOf(v: String): String = v.trim.toLowerCase match {
          case "true" | "1" => "true"
          case "false" | "0" => "false"
          case other => fail(s"expected true/false, got '$other'")
        }
        var schemaDdl: Option[String] = None
        var names: Seq[String] = Nil
        var skipLines = 0
        var jsonMultiline = false
        var noHivePartitioning = false
        var addFilename = false
        var mergeSchema = false
        var readerOpts = Map("header" -> "true", "inferSchema" -> "true")
        // columns = {'name': 'TYPE', ...} -> an explicit Spark DDL schema
        // (shared by read_csv and read_json - DuckDB's contract on both:
        // an explicit columns IS the schema, inference off)
        def parseColumns(v: String): Unit = {
          val body = v.trim
          if (!(body.startsWith("{") && body.endsWith("}")))
            fail("columns needs a {'name': 'TYPE', ...} struct")
          val inner = body.substring(1, body.length - 1)
          val pairs = splitReadArgs(inner, maskQuotes(inner)).map { p =>
            val kv = p.split(":", 2)
            if (kv.length != 2) fail(s"columns entry '$p' isn't 'name': 'TYPE'")
            val cn = strLit(kv(0)).getOrElse(fail(s"columns name '${kv(0)}' must be a string"))
            val ct = strLit(kv(1)).getOrElse(fail(s"columns type '${kv(1)}' must be a string"))
            s"`$cn` ${duckTypeToSpark(ct)}"
          }
          if (pairs.isEmpty) fail("columns struct is empty")
          schemaDdl = Some(pairs.mkString(", "))
        }
        val isCsv = fn == "read_csv" || fn == "read_csv_auto"
        val isJson = fn == "read_json" || fn == "read_json_auto"
        opts.foreach { case (k, v) =>
          // non-csv readers take their own (small) option vocabularies
          // (r11; previously "options are only supported on read_csv")
          if (fn == "read_parquet") k match {
            case "hive_partitioning" =>
              // true is Spark's native directory behavior; false maps to
              // recursiveFileLookup (which disables partition discovery)
              noHivePartitioning = boolOf(v) == "false"
            case "union_by_name" =>
              // DuckDB unions glob schemas BY NAME with NULL fill
              // (probed 1.0.0); Spark's mergeSchema is the same
              // name-matched merge for parquet
              if (boolOf(v) == "true") mergeSchema = true
            case "filename" =>
              // adds a per-row source-path column (probed: plain path,
              // no scheme) — appended after the read below
              if (boolOf(v) == "true") addFilename = true
            case other => fail(s"option '$other' isn't supported on read_parquet " +
              "(supported: hive_partitioning, union_by_name, filename)")
          }
          else if (isJson) k match {
            case "columns" => parseColumns(v)
            case "format" => strLit(v).map(_.toLowerCase) match {
              case Some("newline_delimited") | Some("nd") | Some("auto") => () // lines mode = Spark default
              case Some("array") => jsonMultiline = true
              case other => fail(s"format must be 'newline_delimited'/'nd'/'auto'/'array', got '${other.getOrElse(v)}'")
            }
            case "records" =>
              // records=false reads whole top-level values into one
              // column - a different shape; refuse rather than misread
              if (v.trim.toLowerCase != "auto" && boolOf(v) == "false")
                fail("records=false (value-per-row mode) isn't supported - read as text and parse")
            case other => fail(s"option '$other' isn't supported on $fn " +
              "(supported: columns, format, records)")
          }
          else k match {
            case "delim" | "sep" | "delimiter" =>
              readerOpts += "delimiter" -> strLit(v).getOrElse(fail(s"$k needs a string"))
            case "header" => readerOpts += "header" -> boolOf(v)
            case "quote" =>
              readerOpts += "quote" -> strLit(v).getOrElse(fail("quote needs a string"))
            case "escape" =>
              readerOpts += "escape" -> strLit(v).getOrElse(fail("escape needs a string"))
            case "nullstr" =>
              readerOpts += "nullValue" -> strLit(v).getOrElse(fail("nullstr needs a string"))
            case "skip" =>
              // Spark's CSV reader has no skip-lines option (r10 mapped
              // this to a nonexistent `skipLines` key — silently ignored,
              // ADVICE r10). Genuinely implemented below: read as text,
              // drop the first N lines by file order, parse the rest.
              skipLines = try { v.trim.toInt } catch {
                case _: NumberFormatException => fail(s"skip needs an integer, got '$v'")
              }
              if (skipLines < 0) fail("skip must be >= 0")
            case "compression" =>
              // On the READ path Spark decodes by file extension only
              // (`compression` is a write option). Accept values that
              // agree with extension-based decode; anything else would
              // silently misread, so it stays a guided error (ADVICE r10).
              val cv = strLit(v).getOrElse(fail("compression needs a string")).toLowerCase
              val extOk = cv match {
                case "none" | "auto" | "uncompressed" => true
                case "gzip" => path.endsWith(".gz") || path.endsWith(".gzip")
                case "zstd" => path.endsWith(".zst") || path.endsWith(".zstd")
                case _ => false
              }
              if (!extOk) fail(s"compression='$cv' can't be forced on the read path " +
                s"(Spark decodes by file extension; '$path' doesn't carry the " +
                "matching extension) - rename the file or decompress it first")
            case "dateformat" | "date_format" =>
              readerOpts += "dateFormat" -> strLit(v).getOrElse(fail(s"$k needs a string"))
            case "timestampformat" | "timestamp_format" =>
              readerOpts += "timestampFormat" -> strLit(v).getOrElse(fail(s"$k needs a string"))
            case "columns" => parseColumns(v)
            case "names" | "column_names" =>
              val body = v.trim
              if (!(body.startsWith("[") && body.endsWith("]")))
                fail(s"$k needs a ['a', 'b', ...] list")
              val innerN = body.substring(1, body.length - 1)
              names = splitReadArgs(innerN, maskQuotes(innerN))
                .map(s => strLit(s).getOrElse(fail(s"$k entry '$s' must be a string")))
            case "auto_detect" => boolOf(v) // inference is Spark's default; accept
            case "sample_size" =>
              // DuckDB's sample_size bounds how many rows type
              // inference READS (-1 = all). Spark's csv inference
              // always reads the whole file, i.e. the sample_size=-1
              // behavior — the value users set to FIX misdetection.
              // Accept any integer: a smaller DuckDB sample can only
              // make DuckDB's inference coarser, never this reader's.
              try v.trim.toLong catch {
                case _: NumberFormatException =>
                  fail(s"sample_size needs an integer, got '$v'")
              }
            case "all_varchar" =>
              // every column VARCHAR = inference off (Spark's default
              // column type without inferSchema is string)
              if (boolOf(v) == "true") readerOpts -= "inferSchema"
            case "ignore_errors" =>
              // DuckDB skips unparseable rows; DROPMALFORMED is Spark's
              // same-shape mode
              if (boolOf(v) == "true") readerOpts += "mode" -> "DROPMALFORMED"
            case "union_by_name" =>
              // csv glob schemas differ by HEADER content, which
              // Spark's csv reader unifies only positionally — so the
              // glob is EXPANDED below and the per-file frames align by
              // name with NULL fill (`unionByName(allowMissing)`, the
              // same name-matched merge DuckDB performs; probed 1.0.0:
              // first file's columns lead, later-file extras append in
              // file order). The listing is driver-side METADATA work —
              // the same file enumeration every Spark scan performs.
              if (boolOf(v) == "true") mergeSchema = true
            case "filename" =>
              if (boolOf(v) == "true") addFilename = true
            case other => fail(s"option '$other' isn't supported")
          }
        }
        // DuckDB: an explicit columns= IS the schema - no inference, and
        // the header flag only decides whether line 1 is skipped
        if (schemaDdl.isDefined) readerOpts -= "inferSchema"
        val optKey = readerOpts.toSeq.sorted.mkString(",") +
          schemaDdl.getOrElse("") + names.mkString(",") +
          (if (skipLines > 0) s",skip=$skipLines" else "") +
          (if (jsonMultiline) ",ml" else "") +
          (if (noHivePartitioning) ",nohive" else "") +
          (if (addFilename) ",fn" else "") +
          (if (mergeSchema) ",ms" else "")
        val view = "graft_rf_" + java.security.MessageDigest.getInstance("MD5")
          .digest((fn + " " + path + " " + optKey).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
        // ALWAYS re-register: a cached view would pin the schema/file
        // listing from the FIRST read of this path - a COPY-overwrite
        // then re-read (the round-trip workflow this feature exists
        // for) must see the file's CURRENT contents (review r9). The
        // re-registration costs a footer read (parquet) or one
        // inference pass (csv) per stage, not per row.
        val rdf = fn match {
          case "read_parquet" =>
            var r = spark.read
            if (noHivePartitioning) r = r.option("recursiveFileLookup", "true")
            if (mergeSchema) r = r.option("mergeSchema", "true")
            r.parquet(path)
          case "read_json_auto" | "read_json" =>
            val r = if (jsonMultiline) spark.read.option("multiLine", "true") else spark.read
            schemaDdl.fold(r)(d => r.schema(d)).json(path)
          case _ =>
            val base = spark.read.options(readerOpts)
            val read =
              if (skipLines > 0) {
                // genuine skip: no Spark CSV option exists, so read the
                // file as text, drop the first N lines BY FILE ORDER
                // (zipWithIndex indexes partitions by byte offset, so
                // indices are exact line numbers for a single file), and
                // parse the remainder. DuckDB's skip is per FILE, so a
                // glob/multi-file path would misread - refuse it.
                if (path.exists(c => c == '*' || c == '?' || c == '['))
                  fail("skip with a glob path isn't supported (DuckDB's skip " +
                    "applies per file) - read the files separately")
                // a DIRECTORY also reads as multiple files in Spark, and
                // drop-N-by-partition-order would cut lines from whichever
                // file sorts first (ADVICE r11) - skip needs ONE regular file
                if (new java.io.File(path).isDirectory)
                  fail("skip with a directory path isn't supported (DuckDB's " +
                    "skip applies per file) - point at a single file")
                val n = skipLines
                val body = spark.createDataset(
                  spark.read.textFile(path).rdd.zipWithIndex()
                    .collect { case (ln, i) if i >= n => ln }
                )(org.apache.spark.sql.Encoders.STRING)
                schemaDdl.fold(base)(d => base.schema(d)).csv(body)
              } else if (mergeSchema &&
                path.exists(c => c == '*' || c == '?' || c == '[')) {
                // union_by_name over a csv glob (r18, VERDICT r17 #3):
                // expand the glob, read each file with the SAME options
                // (per-file header/inference), align by name with NULL
                // fill. reduceLeft keeps the first file's column order
                // with later extras appended — DuckDB's order (probed).
                val hpath = new org.apache.hadoop.fs.Path(path)
                val hfs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
                val files = Option(hfs.globStatus(hpath)).map(_.toSeq).getOrElse(Nil)
                  .filter(_.isFile).map(_.getPath.toString).sorted
                if (files.isEmpty) fail(s"no files match '$path'")
                files.map(f => schemaDdl.fold(base)(d => base.schema(d)).csv(f))
                  .reduceLeft(_.unionByName(_, allowMissingColumns = true))
              } else schemaDdl.fold(base)(d => base.schema(d)).csv(path)
            if (names.nonEmpty) {
              if (names.length != read.columns.length)
                fail(s"names has ${names.length} entries but the file has " +
                  s"${read.columns.length} columns")
              read.toDF(names: _*)
            } else if (readerOpts("header") == "false" && schemaDdl.isEmpty)
              // DuckDB names headerless columns column0.. (Spark: _c0..)
              read.toDF(read.columns.indices.map(i => s"column$i"): _*)
            else read
        }
        // filename=true appends DuckDB's per-row source-path column
        // (probed: plain path, no scheme — input_file_name returns a
        // file: URI, stripped here)
        val rdf2 =
          if (addFilename)
            rdf.withColumn("filename", org.apache.spark.sql.functions
              .regexp_replace(org.apache.spark.sql.functions.input_file_name(),
                "^file:(//)?", ""))
          else rdf
        rdf2.createOrReplaceTempView(view)
        sb.append(sql.substring(pos, mm.start)).append(view)
        pos = close
      }
    }
    if (pos == 0) sql else { sb.append(sql.substring(pos)); sb.toString }
  }

  /** Parsed `COPY <source> TO '<path>' [(options)]` or `COPY <table>
    * FROM '<path>' [(options)]` statement (`from = true` for the
    * latter — r12, VERDICT r10 #4). `partitionBy` nonEmpty switches
    * the write from DuckDB's single-file shape to a Spark partitioned
    * DIRECTORY (hive-style `col=value` subdirs — DuckDB's PARTITION_BY
    * writes the identical layout), the scale-parallel form.
    */
  final case class CopySpec(sourceSql: Option[String], sourceTable: Option[String],
                            path: String, format: String, header: Boolean,
                            delimiter: String, partitionBy: Seq[String] = Nil,
                            from: Boolean = false)

  private val CopyHeadRe = raw"(?is)^\s*COPY\s+".r

  /** Detect DuckDB's `COPY (query) TO 'path' (opts)` / `COPY tbl TO
    * 'path' (opts)` / `COPY tbl FROM 'path' (opts)` statement — the
    * reference's own export shape (filefilter.py:374-379 hands
    * `COPY ... TO ... (FORMAT CSV)` to DuckDB). Returns None for
    * non-COPY statements; raises a guided error for COPY shapes
    * outside the supported grammar. Supported options: FORMAT
    * CSV|PARQUET|JSON, HEADER [true|false], DELIMITER|SEP 'c',
    * PARTITION_BY (TO only). Format defaults from the path extension
    * (.parquet/.json/else csv), DuckDB's rule.
    */
  def copyTarget(sql: String): Option[CopySpec] = {
    val masked = maskQuotes(sql)
    val m = CopyHeadRe.findFirstMatchIn(masked).getOrElse(return None)
    def fail(why: String): Nothing =
      throw new graft.functions.expressions.DuckDialectException(
        s"COPY statement couldn't be executed ($why) — supported: COPY (query) TO " +
          "'path' (FORMAT CSV|PARQUET|JSON, HEADER, DELIMITER 'c'), COPY table " +
          "TO 'path' (...), and COPY table FROM 'path' (...)")
    var i = m.end
    var srcSql: Option[String] = None
    var srcTable: Option[String] = None
    if (masked.charAt(i) == '(') {
      val close = closeOf(masked, i + 1).getOrElse(fail("unbalanced source subquery"))
      srcSql = Some(sql.substring(i + 1, close - 1))
      i = close
    } else {
      val t = raw"(?s)^([A-Za-z_][\w.]*)".r.findFirstMatchIn(masked.substring(i))
        .getOrElse(fail("missing source"))
      if (t.group(1).equalsIgnoreCase("FROM")) fail("COPY FROM needs a table name first")
      srcTable = Some(t.group(1))
      i += t.end
    }
    val toM = raw"(?is)^\s*(TO|FROM)\s*".r.findFirstMatchIn(masked.substring(i))
      .getOrElse(fail("missing TO/FROM"))
    val isFrom = toM.group(1).equalsIgnoreCase("FROM")
    if (isFrom && srcSql.isDefined) fail("COPY (query) FROM isn't meaningful")
    i += toM.end
    if (i >= masked.length || masked.charAt(i) != '\'') fail("TO needs a quoted path")
    var j = i + 1
    while (j < masked.length && masked.charAt(j) != '\'') j += 1
    if (j >= masked.length) fail("unterminated path literal")
    val path = sql.substring(i + 1, j).replace("''", "'")
    i = j + 1
    var format = path.toLowerCase match {
      case p if p.endsWith(".parquet") => "parquet"
      case p if p.endsWith(".json") || p.endsWith(".jsonl") || p.endsWith(".ndjson") => "json"
      case _ => "csv"
    }
    var header = true // duckdb 1.0 writes the header by default
    var delim = ","
    var partitionBy: Seq[String] = Nil
    val rest0 = sql.substring(i).trim
    if (rest0.nonEmpty) {
      val restMasked = masked.substring(i).trim
      if (!(restMasked.startsWith("(") && restMasked.stripSuffix(";").trim.endsWith(")")))
        fail(s"unexpected trailing text '${rest0.take(30)}'")
      val inner = rest0.stripSuffix(";").trim.stripPrefix("(").stripSuffix(")").trim
      val innerMasked = maskQuotes(inner)
      // options may carry leading comments (`(FORMAT CSV, /* note; */
      // HEADER, ...)`) — strip them per option like statement heads
      // (r13 option-fuzz finding)
      splitTopLevel(inner, innerMasked).map(o => stripLeadingComments(o).trim)
        .filter(_.nonEmpty).foreach { opt =>
        val parts = opt.split(raw"\s+", 2)
        parts(0).toUpperCase match {
          case "FORMAT" =>
            // DuckDB's own EXPORT DATABASE load.sql quotes the value
            // (FORMAT 'csv') — accept both spellings (r14 import)
            val f = parts.lift(1).getOrElse(fail("FORMAT needs a value"))
              .trim.stripPrefix("'").stripSuffix("'").toLowerCase
            if (!Set("csv", "parquet", "json").contains(f)) fail(s"unsupported FORMAT $f")
            format = f
          case "HEADER" =>
            header = parts.lift(1).map(_.trim.toLowerCase).forall(
              v => v == "true" || v == "1" || v == "on")
          case "DELIMITER" | "SEP" | "SEPARATOR" =>
            val d = parts.lift(1).getOrElse(fail("DELIMITER needs a value")).trim
            if (d.length < 2 || d.head != '\'' || d.last != '\'')
              fail("DELIMITER needs a quoted value")
            delim = d.substring(1, d.length - 1).replace("''", "'")
          case "QUOTE" =>
            // only the default double-quote is claimed — it appears in
            // DuckDB's own load.sql (r14 import); other quote chars
            // would silently change csv parsing
            val v = parts.lift(1).getOrElse(fail("QUOTE needs a value")).trim
            if (v != "'\"'") fail(s"unsupported QUOTE $v — only the default '\"'")
          case "PARTITION_BY" =>
            if (isFrom) fail("PARTITION_BY applies to COPY TO (reads discover " +
              "hive partitions natively)")
            val v = parts.lift(1).getOrElse(fail("PARTITION_BY needs columns")).trim
            val inner2 = if (v.startsWith("(") && v.endsWith(")"))
              v.substring(1, v.length - 1) else v
            partitionBy = inner2.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            if (partitionBy.isEmpty) fail("PARTITION_BY needs columns")
          case other => fail(s"unsupported COPY option $other")
        }
      }
    }
    Some(CopySpec(srcSql, srcTable, path, format, header, delim, partitionBy, isFrom))
  }

  /** Execute a parsed `COPY table FROM 'path' (opts)` (r12, VERDICT
    * r10 #4): read the file with the target's SCHEMA applied
    * positionally (DuckDB's contract — file columns map to table
    * columns in order, values cast to the table's types; csv/json get
    * the schema on the reader, parquet keeps its own types and casts
    * per position), append to the session temp view (the INSERT INTO
    * union flow) or a real catalog table (native insertInto), and
    * return DuckDB's one-row `Count` relation. The localCheckpoint
    * pins one file read so Count always equals the rows appended.
    */
  def executeCopyFrom(spark: org.apache.spark.sql.SparkSession,
                      spec: CopySpec): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val t = spec.sourceTable.get
    if (!spark.catalog.tableExists(t))
      throw new graft.functions.expressions.DuckDialectException(
        s"COPY $t FROM: unknown table '$t' — create it first with " +
          "CREATE TEMP TABLE ... AS in an earlier statement/stage")
    val cur = spark.table(t)
    val loaded = spec.format match {
      case "parquet" =>
        val raws = spark.read.parquet(spec.path)
        if (raws.columns.length != cur.columns.length)
          throw new graft.functions.expressions.DuckDialectException(
            s"COPY $t FROM: the file has ${raws.columns.length} columns but " +
              s"'$t' has ${cur.columns.length}")
        raws.select(raws.columns.zip(cur.schema.fields).map { case (c, f) =>
          col(c).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
      // FAILFAST (ADVICE r12 #2): DuckDB's COPY FROM errors on a
      // malformed / wrong-width row; Spark's default PERMISSIVE mode
      // would silently null-pad it and Count would report rows that
      // are actually garbage
      case "json" => spark.read.option("mode", "FAILFAST")
        .schema(cur.schema).json(spec.path)
      case _ => spark.read
        .option("header", spec.header.toString)
        .option("delimiter", spec.delimiter)
        .option("mode", "FAILFAST")
        .schema(cur.schema).csv(spec.path)
    }
    val pinned = loaded.localCheckpoint()
    val n = pinned.count()
    val isTemp = scala.util.Try(spark.catalog.getTable(t)).toOption
      .exists(_.tableType == "TEMPORARY")
    // The re-registered view is the CHECKPOINT of the union, not the
    // union plan itself (ADVICE r12 #3): repeated COPY FROM into one
    // view would otherwise layer one union + one pinned RDD per load
    // for the session's lifetime. Checkpointing keeps the view's plan
    // at constant depth and orphans the previous load's blocks for the
    // ContextCleaner; the price is rewriting the table's blocks per
    // load — fine for the view flow (loads are hand-written statements;
    // a bulk load LOOP belongs on a real table, which appends files via
    // insertInto below).
    if (isTemp) cur.union(pinned).localCheckpoint().createOrReplaceTempView(t)
    else pinned.write.insertInto(t)
    countRelation(spark, n)
  }

  /** Execute a parsed COPY: write the source relation to ONE file at
    * exactly `path` (DuckDB writes a single file; the Spark writer's
    * part-file directory is renamed over it — use the engine's
    * [[graft.sources.Sources]] sinks for scale-parallel multi-file
    * output), overwriting like DuckDB, and return DuckDB's one-row
    * `Count` relation (rows written).
    */
  def executeCopy(spark: org.apache.spark.sql.SparkSession,
                  src: org.apache.spark.sql.DataFrame, spec: CopySpec):
      org.apache.spark.sql.DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // pin ONE materialization: count and write both read the
    // checkpointed blocks, so the returned Count always equals the
    // rows written — a nondeterministic source (USING SAMPLE) would
    // otherwise produce a different row set per execution, and a
    // deterministic one would pay the query twice (review r9)
    val pinned0 = src.localCheckpoint()
    // the row count rides the WRITE action as an observed metric — the
    // checkpoint already pins one materialization, so a separate
    // count() job over the checkpointed blocks bought nothing but a
    // ~30 ms scheduling floor per COPY statement (r18; the observed
    // count equals the written rows by construction). The fallback
    // count() fires only if the write path ever stops reporting
    // observed metrics.
    val nObs = org.apache.spark.sql.Observation()
    val pinned = pinned0.observe(nObs, org.apache.spark.sql.functions
      .count(org.apache.spark.sql.functions.lit(1)).as("n"))
    def writtenCount(): Long =
      org.apache.spark.sql.GraftColumnBridge.observedOrEmpty(nObs).get("n") match {
        case Some(v: Number) => v.longValue()
        case _ => pinned0.count()
      }
    if (spec.partitionBy.nonEmpty) {
      // PARTITION_BY: hive-style col=value directory tree (DuckDB's
      // exact layout) — the parallel write path, no coalesce, no move
      val w = pinned.write.mode("overwrite").partitionBy(spec.partitionBy: _*)
      spec.format match {
        case "parquet" => w.parquet(spec.path)
        case "json" => w.json(spec.path)
        case _ => w.option("header", spec.header.toString)
          .option("delimiter", spec.delimiter).csv(spec.path)
      }
    } else {
      val tmpRoot = Files.createTempDirectory("graft_copy")
      try {
        val tmp = tmpRoot.toString + "/out"
        val w = pinned.coalesce(1).write.mode("overwrite")
        spec.format match {
          case "parquet" => w.parquet(tmp)
          case "json" => w.json(tmp)
          case _ => w.option("header", spec.header.toString)
            .option("delimiter", spec.delimiter).csv(tmp)
        }
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
          .getOrElse(throw new IllegalStateException(s"no part file written under $tmp"))
        val target = Paths.get(spec.path)
        Option(target.getParent).foreach(Files.createDirectories(_))
        Files.move(part.toPath, target, StandardCopyOption.REPLACE_EXISTING)
      } finally {
        // the moved part file is all that survives — _SUCCESS/.crc and
        // the temp dir itself would otherwise accumulate per COPY (r9
        // review)
        import scala.jdk.CollectionConverters._
        Files.walk(tmpRoot).iterator().asScala.toSeq.reverseIterator
          .foreach(p => Files.deleteIfExists(p))
      }
    }
    countRelation(spark, writtenCount())
  }

  private val UpdateStmtRe =
    raw"(?is)^\s*UPDATE\s+([A-Za-z_]\w*)\s+SET\s+(.*)$$".r
  private val DeleteStmtRe =
    raw"(?is)^\s*DELETE\s+FROM\s+([A-Za-z_]\w*)\s*(?:\s+WHERE\s+(.*?))?\s*;?\s*$$".r

  /** Split a trailing DuckDB `RETURNING <projection>` off a DML
    * statement (INSERT/UPDATE/DELETE only — probed duckdb 1.0.0:
    * returns the AFFECTED rows, post-assignment values for UPDATE,
    * old values for DELETE, `*` and aliased expressions allowed).
    * Depth-0 keyword scan outside quotes; non-DML statements pass
    * through untouched.
    */
  def stripReturning(sql: String): (String, Option[String]) = {
    val masked = maskQuotes(sql)
    if (raw"(?is)^\s*(INSERT|UPDATE|DELETE)\b".r.findFirstIn(masked).isEmpty)
      return (sql, None)
    var d = 0
    var i = 0
    while (i < masked.length) {
      val c = masked.charAt(i)
      if (c == '(') { d += 1; i += 1 }
      else if (c == ')') { d -= 1; i += 1 }
      else if (d == 0 && c.isLetter &&
        (i == 0 || (!masked.charAt(i - 1).isLetterOrDigit && masked.charAt(i - 1) != '_'))) {
        val w = wordStartingAt(masked, i)
        if (w.equalsIgnoreCase("RETURNING")) {
          val proj = sql.substring(i + w.length).replaceAll(";\\s*$", "").trim
          if (proj.isEmpty)
            throw new graft.functions.expressions.DuckDialectException(
              "RETURNING needs a projection list (columns, expressions, or *)")
          return (sql.substring(0, i), Some(proj))
        }
        i += math.max(w.length, 1)
      } else i += 1
    }
    (sql, None)
  }

  /** A parsed `UPDATE table SET col = expr[, ...] [FROM tables]
    * [WHERE pred]` statement: simultaneous assignments (every RHS reads
    * the OLD row — `SET a = b, b = a` swaps, probed against duckdb
    * 1.0.0) over a session temp table. With FROM, each target row
    * matching any from-row under the predicate takes the assignment
    * (an ARBITRARY match when several — DuckDB picks one too, probed).
    */
  final case class UpdateSpec(table: String,
                              assigns: Seq[(String, String)],
                              where: Option[String],
                              from: Option[String] = None)

  /** Detect a DuckDB `UPDATE` statement → [[UpdateSpec]]. Only the
    * single-table simple-identifier form is claimed; the joined
    * `UPDATE ... FROM` form throws a guided error naming the
    * temp-table rebuild route rather than silently mis-parsing.
    */
  def updateTarget(sql: String): Option[UpdateSpec] = {
    val m = UpdateStmtRe.findFirstMatchIn(maskQuotes(sql)).getOrElse(return None)
    val table = sql.substring(m.start(1), m.end(1))
    val rest = sql.substring(m.start(2)).replaceAll(";\\s*$", "")
    val restMasked = maskQuotes(rest)
    // depth-0 keyword scan: FROM (joined update) and WHERE end the SET
    // list, WHERE ends the FROM list
    var d = 0
    var whereAt = -1
    var fromAt = -1
    var k = 0
    while (k < restMasked.length && whereAt < 0) {
      val c = restMasked.charAt(k)
      if (c == '(') { d += 1; k += 1 }
      else if (c == ')') { d -= 1; k += 1 }
      else if (d == 0 && c.isLetter &&
        (k == 0 || (!restMasked.charAt(k - 1).isLetterOrDigit && restMasked.charAt(k - 1) != '_'))) {
        val w = wordStartingAt(restMasked, k)
        if (w == "WHERE") whereAt = k
        else if (w == "FROM" && fromAt < 0) fromAt = k
        k += math.max(w.length, 1)
      } else k += 1
    }
    val setEnd = if (fromAt >= 0) fromAt else if (whereAt >= 0) whereAt else rest.length
    val setPart = rest.substring(0, setEnd)
    val fromPart =
      if (fromAt < 0) None
      else Some(rest.substring(fromAt + "FROM".length,
        if (whereAt >= 0) whereAt else rest.length).trim).filter(_.nonEmpty)
    if (fromAt >= 0 && fromPart.isEmpty)
      throw new graft.functions.expressions.DuckDialectException(
        "UPDATE ... FROM: empty FROM list")
    val wherePart =
      if (whereAt < 0) None
      else Some(rest.substring(whereAt + "WHERE".length).trim)
    val assigns = splitTopLevel(setPart, maskQuotes(setPart)).map { a =>
      val am = maskQuotes(a)
      val eq = am.indexOf('=')
      if (eq < 0)
        throw new graft.functions.expressions.DuckDialectException(
          s"UPDATE $table: malformed assignment '${a.trim}' — need col = expr")
      val col = a.substring(0, eq).trim
      if (!col.matches("[A-Za-z_]\\w*"))
        throw new graft.functions.expressions.DuckDialectException(
          s"UPDATE $table: assignment target '$col' must be a simple column name")
      (col, a.substring(eq + 1).trim)
    }
    if (assigns.map(_._1.toLowerCase).distinct.length != assigns.length)
      throw new graft.functions.expressions.DuckDialectException(
        s"UPDATE $table: a column is assigned twice (DuckDB errors here too)")
    Some(UpdateSpec(table, assigns, wherePart.filter(_.nonEmpty), fromPart))
  }

  /** Detect a DuckDB `DELETE FROM table [WHERE pred]` statement →
    * Some((table, predOpt)). Only the simple-identifier single-table
    * form is claimed (DuckDB itself only deletes from base tables).
    */
  def deleteTarget(sql: String): Option[(String, Option[String])] = {
    val masked = maskQuotes(sql)
    val m = DeleteStmtRe.findFirstMatchIn(masked).getOrElse(return None)
    val table = sql.substring(m.start(1), m.end(1))
    val pred = if (m.group(2) == null) None
      else Some(sql.substring(m.start(2), m.end(2)).trim).filter(_.nonEmpty)
    Some((table, pred))
  }

  /** A parsed `ALTER TABLE` statement over a session temp table (r13).
    * One of: RenameColumn, AddColumn (DuckDB type name + optional
    * DEFAULT literal — omitted default fills NULL, probed), DropColumn,
    * RenameTable, SetType (`ALTER COLUMN c SET DATA TYPE t [USING e]`).
    */
  sealed trait AlterSpec { def table: String }
  final case class AlterRenameColumn(table: String, from: String, to: String) extends AlterSpec
  final case class AlterAddColumn(table: String, col: String, typeName: String,
                                  default: Option[String]) extends AlterSpec
  final case class AlterDropColumn(table: String, col: String) extends AlterSpec
  final case class AlterRenameTable(table: String, to: String) extends AlterSpec
  final case class AlterSetType(table: String, col: String, typeName: String,
                                using: Option[String]) extends AlterSpec

  private val AlterHeadRe = raw"(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_]\w*)\s+(.*?)\s*;?\s*$$".r
  private val RenameColRe = raw"(?is)^RENAME\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)$$".r
  private val RenameTblRe = raw"(?is)^RENAME\s+TO\s+([A-Za-z_]\w*)$$".r
  private val AddColRe = raw"(?is)^ADD\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+([A-Za-z_]\w*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)(?:\s+DEFAULT\s+(.+))?$$".r
  private val DropColRe = raw"(?is)^DROP\s+(?:COLUMN\s+)?([A-Za-z_]\w*)$$".r
  private val SetTypeRe = raw"(?is)^ALTER\s+(?:COLUMN\s+)?([A-Za-z_]\w*)\s+(?:SET\s+DATA\s+)?TYPE\s+([A-Za-z_]\w*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)(?:\s+USING\s+(.+))?$$".r

  /** Detect a DuckDB `ALTER TABLE` statement → Some((table, action)).
    * `action` is None for an ALTER shape outside the claimed set
    * (SET/DROP DEFAULT, constraints, partitions, properties) — the
    * caller decides: a session temp view gets a guided error, a real
    * catalog table falls through to Spark's own ALTER TABLE untouched.
    */
  def alterTarget(sql: String): Option[(String, Option[AlterSpec])] = {
    val m = AlterHeadRe.findFirstMatchIn(maskQuotes(sql)).getOrElse(return None)
    val table = sql.substring(m.start(1), m.end(1))
    val action = sql.substring(m.start(2), m.end(2)).trim
    val spec = action match {
      case RenameTblRe(to) => Some(AlterRenameTable(table, to))
      case RenameColRe(from, to) => Some(AlterRenameColumn(table, from, to))
      case AddColRe(c, t, d) => Some(AlterAddColumn(table, c, t, Option(d).map(_.trim)))
      case DropColRe(c) => Some(AlterDropColumn(table, c))
      case SetTypeRe(c, t, u) => Some(AlterSetType(table, c, t, Option(u).map(_.trim)))
      case _ => None
    }
    Some((table, spec))
  }

  private val TruncateRe = raw"(?is)^\s*TRUNCATE\s+(?:TABLE\s+)?([A-Za-z_]\w*)\s*;?\s*$$".r

  /** Detect `TRUNCATE [TABLE] t` → the table name (DuckDB: removes all
    * rows, returns the Count relation — probed).
    */
  def truncateTarget(sql: String): Option[String] =
    TruncateRe.findFirstMatchIn(sql).map(_.group(1))

  private val DropTableRe = raw"(?is)^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$$".r

  /** Detect `DROP TABLE [IF EXISTS] t` → Some((ifExists, name)). Only
    * claimed when the name is a SESSION TEMP VIEW (DuckDB's DROP TABLE
    * drops temp tables; Spark's insists on DROP VIEW for them) — real
    * catalog tables keep Spark's native DROP TABLE.
    */
  def dropTableTarget(sql: String): Option[(Boolean, String)] =
    DropTableRe.findFirstMatchIn(sql).map(m => (m.group(1) != null, m.group(2)))

  /** DuckDB's one-row `Count` relation — what COPY, UPDATE and DELETE
    * statements return (affected-row count, probed: column literally
    * named `Count`, BIGINT).
    */
  def countRelation(spark: org.apache.spark.sql.SparkSession, n: Long):
      org.apache.spark.sql.DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("Count",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(n)), schema)
  }

  private val DuckSetRe =
    raw"(?is)^\s*SET\s+(GLOBAL\s+|SESSION\s+)?([A-Za-z_]\w*)\s*=\s*(.+?)\s*;?\s*$$".r

  /** DuckDB `SET setting = value` statements in sql stages. Spark's own
    * SET syntax happens to parse these, which makes them a SILENT trap:
    * `SET TimeZone='America/New_York'` would set a meaningless conf key
    * named "TimeZone" and leave the session timezone — and every
    * timestamp result — unchanged. Settings with a Spark equivalent map
    * to it (TimeZone → spark.sql.session.timeZone); known operational
    * DuckDB settings (memory_limit, threads, …) are acknowledged with a
    * warning and skipped — they tune the engine, not the results; the
    * cluster deployment owns those knobs here. Unknown names fall
    * through to Spark's native SET untouched. Returns true when the
    * statement was consumed.
    */
  def applyDuckSet(spark: org.apache.spark.sql.SparkSession, sql: String): Boolean = {
    val m = DuckSetRe.findFirstMatchIn(sql).getOrElse(return false)
    val key = m.group(2)
    val value = m.group(3).trim.stripPrefix("'").stripSuffix("'")
    key.toLowerCase match {
      case "timezone" =>
        spark.conf.set("spark.sql.session.timeZone", value)
        true
      case "memory_limit" | "max_memory" | "threads" | "worker_threads" |
           "temp_directory" | "preserve_insertion_order" | "enable_progress_bar" |
           "enable_object_cache" | "checkpoint_threshold" =>
        System.err.println(s"[graft] DuckDB setting '$key' acknowledged and " +
          "skipped — engine tuning belongs to the Spark deployment " +
          "(spark.executor.memory, spark.sql.shuffle.partitions, ...)")
        true
      case _ => false // Spark's own SET handles sparky keys natively
    }
  }

  private val CtasRe =
    raw"(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?TEMP(?:ORARY)?\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s+AS\s+(.*)$$".r

  /** DuckDB `CREATE [OR REPLACE] TEMP TABLE name AS query` (CTAS)
    * inside sql stages: Some((orReplace, ifNotExists, name, query)).
    * The Spark re-expression registers the query as a session temp
    * view — lazy where DuckDB materializes, which is result-identical
    * for the deterministic queries a pipeline carries (and free when
    * the name is never read). ONLY the TEMP forms are claimed: a plain
    * `CREATE TABLE ... AS` is Spark's own CTAS and passes through to
    * the catalog untouched (intercepting it would silently downgrade a
    * durable table to a session view — review r9). Column-list and
    * non-AS forms are likewise left to Spark.
    */
  def ctasTarget(sql: String): Option[(Boolean, Boolean, String, String)] =
    CtasRe.findFirstMatchIn(sql).map { m =>
      (m.group(1) != null, m.group(2) != null, m.group(3),
        m.group(4).trim.stripSuffix(";"))
    }

  private val InsertRe =
    raw"(?is)^\s*INSERT\s+INTO\s+([A-Za-z_]\w*)\s+(BY\s+NAME\s+)?(.*)$$".r

  /** DuckDB `INSERT INTO name [BY NAME] query` against a SESSION table
    * (one created by a CTAS stage or a temp view): Some((name, byName,
    * query)). The Spark re-expression re-registers the view as the
    * union of its current relation and the query — positional with
    * DuckDB's column-count check, or BY NAME. Appends compose lazily
    * (each INSERT stacks one union node; a pipeline's handful of
    * appends is plan-trivial). VALUES lists are queries in both
    * engines, so `INSERT INTO t VALUES (...)` works unchanged.
    */
  def insertTarget(sql: String): Option[(String, Boolean, String)] =
    InsertRe.findFirstMatchIn(sql).map { m =>
      (m.group(1), m.group(2) != null, m.group(3).trim.stripSuffix(";"))
    }

  // ---- typed temp tables + upsert (r13) -------------------------------

  /** One column of a typed `CREATE TEMP TABLE (…)` definition. */
  final case class ColumnDef(name: String, typeName: String,
                             default: Option[String], notNull: Boolean)

  /** A parsed column-definition `CREATE TEMP TABLE` (the non-CTAS form
    * DuckDB upserts need — `ON CONFLICT` resolves against a declared
    * PRIMARY KEY). `pk` holds the key columns (inline `PRIMARY KEY` on
    * a column or a table-level `PRIMARY KEY (a, b)`).
    */
  final case class CreateTableDef(orReplace: Boolean, ifNotExists: Boolean,
                                  name: String, cols: Seq[ColumnDef],
                                  pk: Seq[String])

  /** Constraint metadata a typed CREATE TEMP TABLE declares, kept per
    * session so later INSERTs enforce it (DuckDB stores this in its
    * catalog; the temp view itself only carries the schema). `defaults`
    * and `notNull` are keyed by lowercase column name; `pk` keeps the
    * declared spelling. Maintained by the Stages DDL handlers (ALTER
    * RENAME/ADD/DROP, DROP TABLE, CTAS-replace).
    */
  final case class TableMeta(pk: Seq[String], defaults: Map[String, String],
                             notNull: Set[String])

  /** Session-scoped table-constraint registry — the [[macroReg]]
    * pattern: weak-keyed by the session object, values are tiny parsed
    * text, the namespace dies with its session.
    */
  private val tableMetaReg =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, TableMeta]]()

  def putTableMeta(spark: org.apache.spark.sql.SparkSession, table: String,
                   meta: TableMeta): Unit = tableMetaReg.synchronized {
    var m = tableMetaReg.get(spark)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty[String, TableMeta]
      tableMetaReg.put(spark, m)
    }
    m.put(table.toLowerCase, meta)
  }

  def tableMeta(spark: org.apache.spark.sql.SparkSession, table: String)
      : Option[TableMeta] =
    tableMetaReg.synchronized(Option(tableMetaReg.get(spark)))
      .flatMap(_.get(table.toLowerCase))

  def dropTableMeta(spark: org.apache.spark.sql.SparkSession, table: String): Unit =
    tableMetaReg.synchronized(Option(tableMetaReg.get(spark)))
      .foreach(_.remove(table.toLowerCase))

  def renameTableMeta(spark: org.apache.spark.sql.SparkSession,
                      from: String, to: String): Unit =
    tableMetaReg.synchronized(Option(tableMetaReg.get(spark))).foreach { m =>
      m.remove(from.toLowerCase).foreach(meta => m.put(to.toLowerCase, meta))
    }

  // ---- session TABLE registry (r14: EXPORT/IMPORT DATABASE) ----
  // DuckDB's EXPORT DATABASE walks its catalog; the graft equivalent is
  // the set of temp views created AS TABLES (CTAS / typed CREATE / an
  // IMPORT) — plain registered views (`df`, the parquet base tables,
  // scratch names) are NOT tables and don't export.
  private val sessionTablesReg =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.LinkedHashSet[String]]()

  def registerSessionTable(spark: org.apache.spark.sql.SparkSession,
                           t: String): Unit = sessionTablesReg.synchronized {
    var s = sessionTablesReg.get(spark)
    if (s == null) { s = new java.util.LinkedHashSet[String](); sessionTablesReg.put(spark, s) }
    s.add(t.toLowerCase)
  }

  def dropSessionTable(spark: org.apache.spark.sql.SparkSession, t: String): Unit =
    sessionTablesReg.synchronized(
      Option(sessionTablesReg.get(spark)).foreach(_.remove(t.toLowerCase)))

  def renameSessionTable(spark: org.apache.spark.sql.SparkSession,
                         from: String, to: String): Unit =
    sessionTablesReg.synchronized(
      Option(sessionTablesReg.get(spark)).foreach { s =>
        if (s.remove(from.toLowerCase)) s.add(to.toLowerCase)
      })

  def sessionTables(spark: org.apache.spark.sql.SparkSession): Seq[String] =
    sessionTablesReg.synchronized(
      Option(sessionTablesReg.get(spark))
        .map(s => scala.jdk.CollectionConverters.SetHasAsScala(s).asScala.toSeq)
        .getOrElse(Nil))

  /** Spark type → DuckDB DDL type (the EXPORT DATABASE schema.sql). */
  def sparkTypeToDuck(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case StringType => "VARCHAR"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case BinaryType => "BLOB"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case ArrayType(e, _) => sparkTypeToDuck(e) + "[]"
      case other => other.sql
    }
  }

  private val ExportDbRe =
    raw"(?is)^\s*EXPORT\s+DATABASE\s+'([^']+)'\s*(?:\(\s*(.*?)\s*\))?\s*;?\s*$$".r
  private val ImportDbRe =
    raw"(?is)^\s*IMPORT\s+DATABASE\s+'([^']+)'\s*;?\s*$$".r
  private val CheckpointRe = raw"(?is)^\s*(?:FORCE\s+)?CHECKPOINT\s*;?\s*$$".r

  /** `EXPORT DATABASE 'dir' [(FORMAT CSV|PARQUET)]` → Some((dir, fmt)). */
  def exportDatabaseTarget(sql: String): Option[(String, String)] =
    ExportDbRe.findFirstMatchIn(sql).map { m =>
      val fmt = Option(m.group(2)).map(_.trim).filter(_.nonEmpty) match {
        case None => "csv"
        case Some(o) =>
          val fm = raw"(?i)^FORMAT\s+'?(\w+)'?$$".r.findFirstMatchIn(o).getOrElse(
            throw new graft.functions.expressions.DuckDialectException(
              s"EXPORT DATABASE options '$o' — supported: (FORMAT CSV|PARQUET)"))
          fm.group(1).toLowerCase
      }
      if (fmt != "csv" && fmt != "parquet")
        throw new graft.functions.expressions.DuckDialectException(
          s"EXPORT DATABASE FORMAT $fmt — supported: CSV, PARQUET")
      (m.group(1), fmt)
    }

  def importDatabaseTarget(sql: String): Option[String] =
    ImportDbRe.findFirstMatchIn(sql).map(_.group(1))

  def isCheckpointStatement(sql: String): Boolean =
    CheckpointRe.findFirstIn(sql).isDefined

  /** DuckDB's empty `Success` relation (probed: EXPORT DATABASE and
    * CHECKPOINT both return zero rows of one BOOLEAN `Success` column).
    */
  def successRelation(spark: org.apache.spark.sql.SparkSession):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("Success", BooleanType))))
  }

  /** Execute `EXPORT DATABASE 'dir' [(FORMAT ...)]`: every session
    * TABLE ([[sessionTables]]) writes one data file under `dir` plus a
    * DuckDB-compatible `schema.sql` (typed CREATE TABLE statements) and
    * `load.sql` (COPY ... FROM statements) — the same layout DuckDB
    * produces (readable names instead of its mangled `t_.csv`), so
    * either engine can IMPORT the directory. Scale note: each table
    * routes through [[executeCopy]]'s single-file writer (DuckDB's
    * contract); bulk multi-file export is the Sources sinks' job.
    */
  def executeExportDatabase(spark: org.apache.spark.sql.SparkSession,
                            dir: String, fmt: String):
      org.apache.spark.sql.DataFrame = {
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(dir))
    val tables = sessionTables(spark).filter(spark.catalog.tableExists)
    val schemaSb = new StringBuilder
    val loadSb = new StringBuilder
    tables.foreach { t =>
      val dfT = spark.table(t)
      val ext = if (fmt == "parquet") "parquet" else "csv"
      val path = s"$dir/$t.$ext"
      executeCopy(spark, dfT, CopySpec(None, Some(t), path, fmt,
        header = true, delimiter = ","))
      schemaSb ++= s"CREATE TABLE $t(" + dfT.schema.fields
        .map(f => s"${f.name} ${sparkTypeToDuck(f.dataType)}")
        .mkString(", ") + ");\n"
      loadSb ++= (if (fmt == "parquet") s"COPY $t FROM '$path' (FORMAT PARQUET);\n"
        else s"COPY $t FROM '$path' (FORMAT CSV, HEADER, DELIMITER ',');\n")
    }
    Files.write(Paths.get(dir, "schema.sql"), schemaSb.toString.getBytes("UTF-8"))
    Files.write(Paths.get(dir, "load.sql"), loadSb.toString.getBytes("UTF-8"))
    successRelation(spark)
  }

  // ---- ATTACH / DETACH over EXPORT-DATABASE directories (r15, VERDICT
  // r14 missing #2) ----
  // DuckDB's ATTACH mounts a storage file as an alias-qualified schema;
  // graft's storage model is the EXPORT DATABASE directory (either
  // engine's layout), so ATTACH 'dir' AS a runs the IMPORT route into
  // alias-prefixed temp views and later statements' `a.tbl` references
  // rewrite onto them. DETACH drops the views. A .db file keeps a
  // guided error — there is no DuckDB storage engine here.

  private val AttachRe =
    raw"(?is)^\s*ATTACH\s+(?:DATABASE\s+)?(IF\s+NOT\s+EXISTS\s+)?'([^']+)'(?:\s+AS\s+([A-Za-z_]\w*))?\s*(?:\(\s*READ_?\s*ONLY\s*\))?\s*;?\s*$$".r
  private val DetachRe =
    raw"(?is)^\s*DETACH\s+(?:DATABASE\s+)?(IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$$".r

  /** `ATTACH [DATABASE] [IF NOT EXISTS] 'dir' [AS alias] [(READ_ONLY)]`
    * → Some((dir, alias, ifNotExists)); the default alias is the
    * path's basename sans extension, DuckDB's rule. A duplicate-alias
    * ATTACH IF NOT EXISTS is a no-op (probed 1.0.0), not an error.
    */
  def attachTarget(sql: String): Option[(String, String, Boolean)] =
    AttachRe.findFirstMatchIn(sql).map { m =>
      val dir = m.group(2)
      val alias = Option(m.group(3)).getOrElse {
        // DuckDB's rule: basename sans extension; non-identifier chars
        // sanitize to '_' (DuckDB would need a quoted alias there —
        // graft's alias references are plain identifiers)
        val base = new java.io.File(dir).getName
        val dot = base.lastIndexOf('.')
        (if (dot > 0) base.substring(0, dot) else base).replaceAll("\\W", "_")
      }
      (dir, alias.toLowerCase, m.group(1) != null)
    }

  /** `DETACH [DATABASE] [IF EXISTS] alias` → Some((alias, ifExists)). */
  def detachTarget(sql: String): Option[(String, Boolean)] =
    DetachRe.findFirstMatchIn(sql).map(m =>
      (m.group(2).toLowerCase, m.group(1) != null))

  /** alias-qualified table → its backing temp-view name. */
  private def attachViewName(alias: String, table: String): String =
    s"__graft_att_${alias}__${table.toLowerCase}"

  /** Remap a `COPY ... FROM '<path>'` source onto `dir` by basename:
    * DuckDB's load.sql records ABSOLUTE paths (r15 interop fixture), so
    * a moved or copied export directory would point at the original
    * location (DuckDB's own IMPORT shares the quirk); the data files
    * always sit next to load.sql, so the basename under the mounted
    * directory is the correct source.
    */
  def remapCopySourceToDir(st: String, dir: String): String =
    raw"(?is)\bFROM\s+'([^']+)'".r.replaceAllIn(st, m => {
      val base = new java.io.File(m.group(1)).getName
      java.util.regex.Matcher.quoteReplacement(s"FROM '$dir/$base'")
    })

  private val attachReg =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, Seq[String]]]()

  // --- setseed session registry (r16). DuckDB's setseed(x) reseeds a
  // serial process-global RNG; a distributed plan cannot replay that
  // stream, but it CAN honor the property users reach for — reproducible
  // random() draws. The DuckDialect setseed builder registers the seed
  // here (at analysis time, idempotent); rewriteSeededRandom then turns
  // later zero-arg random()/rand() calls into rand(<seed-derived long>),
  // deterministic per row for a fixed partitioning. Weak keys: the
  // registry dies with the session.
  private val seedReg =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Double]()

  def registerSeed(spark: org.apache.spark.sql.SparkSession, seed: Double): Unit =
    seedReg.synchronized { seedReg.put(spark, java.lang.Double.valueOf(seed)); () }

  def sessionSeed(spark: org.apache.spark.sql.SparkSession): Option[Double] =
    seedReg.synchronized(Option(seedReg.get(spark)).map(_.doubleValue))

  /** After `SELECT setseed(x)`, zero-arg `random()`/`rand()` calls
    * rewrite to `rand(<doubleToLongBits(x)>)` — same seed, same draws
    * (DuckDB's reseed-then-replay property; the VALUES differ from
    * DuckDB's serial stream, documented in the setseed builder). Scans
    * the quote-masked text so literals can't match; no seed registered →
    * the text passes through untouched (Spark's native nondeterministic
    * rand).
    */
  def rewriteSeededRandom(spark: org.apache.spark.sql.SparkSession,
                          sql: String): String =
    sessionSeed(spark) match {
      case None => sql
      case Some(seed) =>
        val re = raw"(?i)\b(random|rand)\s*\(\s*\)".r
        val masked = maskQuotes(sql)
        val out = new StringBuilder
        var last = 0
        re.findAllMatchIn(masked).foreach { m =>
          out ++= sql.substring(last, m.start)
          out ++= s"rand(${java.lang.Double.doubleToLongBits(seed)}L)"
          last = m.end
        }
        if (last == 0) sql else { out ++= sql.substring(last); out.toString }
    }

  private def attachMap(spark: org.apache.spark.sql.SparkSession)
      : scala.collection.concurrent.TrieMap[String, Seq[String]] =
    attachReg.synchronized {
      var m = attachReg.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Seq[String]]
        attachReg.put(spark, m)
      }
      m
    }

  def executeAttach(spark: org.apache.spark.sql.SparkSession, dir: String,
                    alias: String, run: String => org.apache.spark.sql.DataFrame,
                    ifNotExists: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    import java.nio.file.{Files, Paths}
    val reg = attachMap(spark)
    if (reg.contains(alias)) {
      // DuckDB 1.0.0 (probed): duplicate alias errors, but the
      // IF NOT EXISTS spelling is a no-op so re-runnable scripts pass
      if (ifNotExists) return successRelation(spark)
      throw new graft.functions.expressions.DuckDialectException(
        s"ATTACH: database alias '$alias' is already attached — DETACH $alias " +
          "first (DuckDB errors on duplicate aliases too)")
    }
    val p = Paths.get(dir)
    if (!Files.isDirectory(p) || !Files.isRegularFile(p.resolve("schema.sql")))
      throw new graft.functions.expressions.DuckDialectException(
        s"ATTACH '$dir' — graft attaches EXPORT DATABASE directories " +
          "(schema.sql + load.sql, either engine's EXPORT layout), not .db " +
          "storage files; EXPORT DATABASE the source first, or read the data " +
          "files directly (read_parquet/read_csv_auto, Sources loaders)")
    def readSql(f: String): String = {
      val fp = p.resolve(f)
      if (!Files.isRegularFile(fp)) ""
      else new String(Files.readAllBytes(fp), "UTF-8")
    }
    val CreateHeadRe =
      raw"(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)".r
    val CopyHeadRe = raw"(?is)^\s*COPY\s+([A-Za-z_]\w*)\s+FROM\b".r
    val tables = Seq.newBuilder[String]
    (splitStatements(readSql("schema.sql")) ++
      splitStatements(readSql("load.sql"))).foreach { st =>
      val renamed = CreateHeadRe.findFirstMatchIn(st) match {
        case Some(m) =>
          val t = m.group(1)
          tables += t.toLowerCase
          "CREATE OR REPLACE TEMP TABLE " + attachViewName(alias, t) +
            st.substring(m.end)
        case None => CopyHeadRe.findFirstMatchIn(st) match {
          case Some(m) =>
            s"COPY ${attachViewName(alias, m.group(1))} FROM" + st.substring(m.end)
          case None => st // indexes/sequences in a DuckDB export: skip below
        }
      }
      // a DuckDB-produced export may carry CREATE INDEX/SEQUENCE
      // statements — no Spark equivalent and nothing reads them here
      if (renamed.trim.nonEmpty &&
          !renamed.matches("(?is)^\\s*CREATE\\s+(UNIQUE\\s+)?(INDEX|SEQUENCE)\\b.*"))
        run(remapCopySourceToDir(renamed, dir))
    }
    val ts = tables.result().distinct
    // attached relations are NOT session tables: DuckDB's EXPORT
    // DATABASE walks only the current database, so a later EXPORT here
    // must not re-export the attachment (and DETACH, not DROP, owns
    // their lifecycle)
    ts.foreach { t =>
      dropSessionTable(spark, attachViewName(alias, t))
      dropTableMeta(spark, attachViewName(alias, t))
    }
    reg.put(alias, ts)
    successRelation(spark)
  }

  def executeDetach(spark: org.apache.spark.sql.SparkSession, alias: String,
                    ifExists: Boolean): org.apache.spark.sql.DataFrame = {
    attachMap(spark).remove(alias) match {
      case Some(ts) =>
        ts.foreach(t => spark.catalog.dropTempView(attachViewName(alias, t)))
      case None if !ifExists =>
        throw new graft.functions.expressions.DuckDialectException(
          s"DETACH: no database named '$alias' is attached (DuckDB errors " +
            "here too); DETACH IF EXISTS ignores the miss")
      case None => ()
    }
    successRelation(spark)
  }

  /** Rewrite `alias.tbl` references onto the attached temp views —
    * string literals are skipped via [[maskQuotes]]; only (alias, tbl)
    * pairs actually attached in THIS session rewrite, so ordinary
    * schema-qualified names (global_temp.x, catalog tables) never
    * match.
    */
  def rewriteAttachedRefs(spark: org.apache.spark.sql.SparkSession,
                          sql: String): String = {
    val reg = attachReg.synchronized(Option(attachReg.get(spark)))
      .map(_.readOnlySnapshot()).getOrElse(return sql)
    if (reg.isEmpty) return sql
    var out = sql
    reg.foreach { case (alias, ts) => ts.foreach { t =>
      val re = ("(?i)(?<![\\w.`])" + java.util.regex.Pattern.quote(alias) +
        "\\s*\\.\\s*" + java.util.regex.Pattern.quote(t) + "(?![\\w.`])").r
      var changed = true
      while (changed) {
        changed = false
        val masked = maskQuotes(out)
        re.findFirstMatchIn(masked).foreach { m =>
          out = out.substring(0, m.start) + attachViewName(alias, t) +
            out.substring(m.end)
          changed = true
        }
      }
    }}
    out
  }

  private val CreateDefHeadRe =
    raw"(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?TEMP(?:ORARY)?\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s*\(".r

  private def createDefFail(why: String): Nothing =
    throw new graft.functions.expressions.DuckDialectException(
      s"CREATE TEMP TABLE (column definitions) couldn't be parsed ($why) — " +
        "supported: CREATE [OR REPLACE] TEMP TABLE [IF NOT EXISTS] name " +
        "(col TYPE [PRIMARY KEY] [NOT NULL] [DEFAULT expr], ..., " +
        "[PRIMARY KEY (a, b)]); UNIQUE/CHECK/FOREIGN KEY constraints are " +
        "not claimed — enforce them with a later sql-stage assertion")

  /** Detect a typed (column-definition) `CREATE TEMP TABLE` — the
    * non-CTAS form. Only TEMP is claimed, mirroring [[ctasTarget]]: a
    * plain `CREATE TABLE name (...)` stays Spark's own catalog DDL.
    * Inside the claimed form, malformed column definitions fail loudly.
    */
  def createTableDefTarget(sql: String): Option[CreateTableDef] = {
    val masked = maskQuotes(sql)
    val m = CreateDefHeadRe.findFirstMatchIn(masked).getOrElse(return None)
    val close = closeOf(masked, m.end).getOrElse(
      createDefFail("unbalanced column-definition parens"))
    val tail = masked.substring(close).trim
    if (tail.nonEmpty && tail != ";")
      createDefFail(s"unexpected trailing text '${sql.substring(close).trim.take(40)}'")
    val body = sql.substring(m.end, close - 1)
    val bodyMasked = masked.substring(m.end, close - 1)
    if (body.trim.isEmpty) createDefFail("empty column list")
    // DuckDB's own EXPORT DATABASE schema.sql double-quotes column
    // names that shadow keywords ("name" VARCHAR — r15 interop
    // fixture); plain-identifier quotes strip, anything needing real
    // quoting keeps the loud failure below
    val items = splitTopLevel(body, bodyMasked).map(
      _.trim.replaceAll("^\"([A-Za-z_]\\w*)\"", "$1"))
    val TablePkRe = raw"(?is)^PRIMARY\s+KEY\s*\(([^)]*)\)$$".r
    val ColRe = raw"(?is)^([A-Za-z_]\w*)\s+([A-Za-z_]\w*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*(.*)$$".r
    var pk = Seq.empty[String]
    val cols = Seq.newBuilder[ColumnDef]
    items.foreach {
      case TablePkRe(ks) =>
        if (pk.nonEmpty) createDefFail("more than one PRIMARY KEY")
        pk = ks.split(',').map(_.trim).toSeq
        if (pk.exists(!_.matches("[A-Za-z_]\\w*")))
          createDefFail(s"bad PRIMARY KEY column list '$ks'")
      case it if it.matches("(?is)^(UNIQUE|CHECK|FOREIGN|CONSTRAINT)\\b.*") =>
        createDefFail(s"unclaimed table constraint '${it.take(30)}'")
      case ColRe(cname, ctype, mods0) =>
        var mods = mods0.trim
        var default: Option[String] = None
        var notNull = false
        var inlinePk = false
        // modifiers may appear in any order; DEFAULT's expression runs
        // to the end or to the next recognized modifier keyword
        var progress = true
        while (mods.nonEmpty && progress) {
          progress = false
          val pkM = raw"(?is)^PRIMARY\s+KEY\b\s*".r.findFirstMatchIn(mods)
          val nnM = raw"(?is)^NOT\s+NULL\b\s*".r.findFirstMatchIn(mods)
          val dfM = raw"(?is)^DEFAULT\s+".r.findFirstMatchIn(mods)
          if (pkM.isDefined) { inlinePk = true; mods = mods.substring(pkM.get.end); progress = true }
          else if (nnM.isDefined) { notNull = true; mods = mods.substring(nnM.get.end); progress = true }
          else if (dfM.isDefined) {
            val rest = mods.substring(dfM.get.end)
            val stop = raw"(?is)\s+(PRIMARY\s+KEY|NOT\s+NULL)\b".r.findFirstMatchIn(
              maskQuotes(rest))
            val (d, after) = stop match {
              case Some(s) => (rest.substring(0, s.start), rest.substring(s.start))
              case None => (rest, "")
            }
            if (d.trim.isEmpty) createDefFail(s"column '$cname': empty DEFAULT")
            default = Some(d.trim)
            mods = after.trim
            progress = true
          }
        }
        if (mods.nonEmpty)
          createDefFail(s"column '$cname': unclaimed modifier '${mods.take(30)}'")
        if (inlinePk) {
          if (pk.nonEmpty) createDefFail("more than one PRIMARY KEY")
          pk = Seq(cname)
        }
        cols += ColumnDef(cname, ctype, default, notNull)
      case it => createDefFail(s"bad column definition '${it.take(40)}'")
    }
    val defs = cols.result()
    if (defs.map(_.name.toLowerCase).distinct.size != defs.size)
      createDefFail("duplicate column name")
    val known = defs.map(_.name.toLowerCase).toSet
    pk.find(k => !known.contains(k.toLowerCase)).foreach(k =>
      createDefFail(s"PRIMARY KEY names unknown column '$k'"))
    Some(CreateTableDef(m.group(1) != null, m.group(2) != null, m.group(3),
      defs, pk))
  }

  /** The conflict-resolution half of a DuckDB upsert. */
  sealed trait ConflictAction
  case object DoNothing extends ConflictAction
  final case class DoUpdate(assigns: Seq[(String, String)],
                            where: Option[String]) extends ConflictAction

  /** A fully parsed `INSERT` statement (r13 upsert surface): optional
    * `OR REPLACE`/`OR IGNORE` shorthand, optional explicit column list,
    * the source query, and an optional `ON CONFLICT [(cols)] DO
    * NOTHING | DO UPDATE SET ... [WHERE ...]` clause.
    */
  final case class InsertSpec(table: String, byName: Boolean,
                              cols: Option[Seq[String]], query: String,
                              conflictTarget: Option[Seq[String]],
                              action: Option[ConflictAction])

  private val InsertHeadRe =
    raw"(?is)^\s*INSERT\s+(OR\s+REPLACE\s+|OR\s+IGNORE\s+)?INTO\s+([A-Za-z_]\w*)\s+(BY\s+NAME\s+)?(.*)$$".r

  private def insertFail(table: String, why: String): Nothing =
    throw new graft.functions.expressions.DuckDialectException(
      s"INSERT INTO $table: $why — supported: INSERT [OR REPLACE | OR IGNORE] " +
        "INTO t [BY NAME] [(c1, c2)] <query> [ON CONFLICT [(keys)] DO NOTHING " +
        "| DO UPDATE SET c = expr, ... [WHERE pred]] (excluded.c reads the " +
        "incoming row)")

  /** Parse a DuckDB `INSERT` statement → [[InsertSpec]]. `OR REPLACE` /
    * `OR IGNORE` normalize to their `ON CONFLICT` equivalents at the
    * execution site (probed: OR REPLACE = DO UPDATE SET <listed cols> =
    * excluded — UNLISTED columns keep the OLD row's values; OR IGNORE =
    * DO NOTHING).
    */
  def insertSpec(sql: String): Option[InsertSpec] = {
    val masked = maskQuotes(sql)
    val m = InsertHeadRe.findFirstMatchIn(masked).getOrElse(return None)
    val table = sql.substring(m.start(2), m.end(2))
    val orClause = Option(m.group(1)).map(_.trim.toUpperCase match {
      case s if s.startsWith("OR REPLACE") || s.matches("(?is)OR\\s+REPLACE") => "REPLACE"
      case _ => "IGNORE"
    })
    var rest = sql.substring(m.start(4)).replaceAll(";\\s*$", "")
    var restMasked = masked.substring(m.start(4)).replaceAll(";\\s*$", "")
    // optional explicit column list: a leading parenthesized pure
    // identifier list (a leading parenthesized QUERY keeps rest as-is)
    var cols: Option[Seq[String]] = None
    if (rest.trim.startsWith("(")) {
      val open = rest.indexOf('(')
      closeOf(restMasked, open + 1).foreach { cl =>
        val inner = rest.substring(open + 1, cl - 1)
        val items = inner.split(',').map(_.trim)
        if (items.nonEmpty && items.forall(_.matches("[A-Za-z_]\\w*")) &&
          !items.head.matches("(?i)SELECT|FROM|WITH|VALUES|TABLE")) {
          cols = Some(items.toSeq)
          rest = rest.substring(cl).trim
          restMasked = restMasked.substring(cl).trim
        }
      }
    }
    // depth-0 scan for the ON CONFLICT clause
    var d = 0
    var confAt = -1
    var k = 0
    while (k < restMasked.length && confAt < 0) {
      val c = restMasked.charAt(k)
      if (c == '(') { d += 1; k += 1 }
      else if (c == ')') { d -= 1; k += 1 }
      else if (d == 0 && (c == 'O' || c == 'o') &&
        (k == 0 || (!restMasked.charAt(k - 1).isLetterOrDigit && restMasked.charAt(k - 1) != '_')) &&
        raw"(?is)^ON\s+CONFLICT\b".r.findFirstIn(restMasked.substring(k)).isDefined) {
        confAt = k
      } else k += 1
    }
    if (confAt < 0) {
      if (rest.trim.isEmpty) insertFail(table, "missing source query")
      return Some(InsertSpec(table, m.group(3) != null, cols, rest.trim,
        None, orClause.map(o => if (o == "IGNORE") DoNothing
          else DoUpdate(Nil, None))))
    }
    if (orClause.isDefined)
      insertFail(table, "OR REPLACE/OR IGNORE cannot combine with ON CONFLICT")
    val query = rest.substring(0, confAt).trim
    if (query.isEmpty) insertFail(table, "missing source query")
    var clause = rest.substring(confAt).replaceFirst(raw"(?is)^ON\s+CONFLICT\s*", "")
    var clauseMasked = maskQuotes(clause)
    var target: Option[Seq[String]] = None
    if (clause.startsWith("(")) {
      val cl = closeOf(clauseMasked, 1).getOrElse(
        insertFail(table, "unbalanced conflict-target parens"))
      val items = clause.substring(1, cl - 1).split(',').map(_.trim).toSeq
      if (items.exists(!_.matches("[A-Za-z_]\\w*")))
        insertFail(table, s"bad conflict target '${clause.substring(0, cl)}'")
      target = Some(items)
      clause = clause.substring(cl).trim
      clauseMasked = maskQuotes(clause)
    }
    val action =
      if (clause.matches(raw"(?is)^DO\s+NOTHING\s*$$")) DoNothing
      else {
        val upM = raw"(?is)^DO\s+UPDATE\s+SET\s+".r.findFirstMatchIn(clause)
          .getOrElse(insertFail(table,
            s"unclaimed conflict action '${clause.take(30)}'"))
        val setPart0 = clause.substring(upM.end)
        val setMasked0 = clauseMasked.substring(upM.end)
        // depth-0 WHERE ends the SET list (the updateTarget scan)
        var d2 = 0; var whereAt = -1; var j = 0
        while (j < setMasked0.length && whereAt < 0) {
          val c = setMasked0.charAt(j)
          if (c == '(') { d2 += 1; j += 1 }
          else if (c == ')') { d2 -= 1; j += 1 }
          else if (d2 == 0 && c.isLetter &&
            (j == 0 || (!setMasked0.charAt(j - 1).isLetterOrDigit && setMasked0.charAt(j - 1) != '_')) &&
            wordStartingAt(setMasked0, j) == "WHERE") whereAt = j
          else j += 1
        }
        val (setPart, wherePart) =
          if (whereAt < 0) (setPart0, None)
          else (setPart0.substring(0, whereAt),
            Some(setPart0.substring(whereAt + "WHERE".length).trim))
        val assigns = splitTopLevel(setPart, maskQuotes(setPart)).map { a =>
          val am = maskQuotes(a)
          val eq = am.indexOf('=')
          if (eq < 0) insertFail(table, s"malformed assignment '${a.trim}'")
          val cn = a.substring(0, eq).trim
          if (!cn.matches("[A-Za-z_]\\w*"))
            insertFail(table, s"assignment target '$cn' must be a simple column")
          (cn, a.substring(eq + 1).trim)
        }
        if (assigns.isEmpty) insertFail(table, "empty SET list")
        DoUpdate(assigns, wherePart.filter(_.nonEmpty))
      }
    Some(InsertSpec(table, m.group(3) != null, cols, query, target, Some(action)))
  }

  /** Rewrite an upsert SET/WHERE expression's row qualifiers for the
    * executed join shape: `excluded.c` → `__exc_c` (the incoming row's
    * renamed columns) and `<table>.c` → bare `c` (the old row — the
    * join's unprefixed side). Masked-position replacement, so quoted
    * strings containing the words stay untouched.
    */
  def rewriteUpsertRefs(expr: String, table: String): String = {
    val masked = maskQuotes(expr)
    val re = raw"(?i)(?<![\w.])(excluded|${java.util.regex.Pattern.quote(table)})\s*\.\s*([A-Za-z_]\w*)".r
    val sb = new StringBuilder
    var last = 0
    re.findAllMatchIn(masked).foreach { m =>
      sb.append(expr.substring(last, m.start))
      val qual = expr.substring(m.start(1), m.end(1))
      val c = expr.substring(m.start(2), m.end(2))
      sb.append(if (qual.equalsIgnoreCase("excluded")) s"__exc_$c" else c)
      last = m.end
    }
    sb.append(expr.substring(last))
    sb.toString
  }

  /** Split multi-statement sql-stage code on top-level (quote-masked)
    * semicolons, dropping empty statements — DuckDB sql stages carry
    * `CREATE MACRO ...; SELECT ...` batches through the reference's
    * verbatim passthrough (filefilter.py:340-342).
    */
  /** Parsed top-level `UNION [ALL] BY NAME` statement: query sides (a
    * leading CTE prefix is replicated onto every side so its scope
    * matches DuckDB's whole-statement binding), per-boundary ALL flags,
    * and the trailing ORDER BY/LIMIT/OFFSET clauses (which DuckDB
    * applies to the WHOLE union).
    */
  final case class UnionByNameSpec(sides: Seq[String], alls: Seq[Boolean],
                                   tail: String)

  /** Detect `q1 UNION [ALL] BY NAME q2 [...] [ORDER BY ...] [LIMIT n]`
    * (r10 — previously a raw parse error: Spark has no BY NAME union).
    * Executed in [[graft.operators.SqlStage]] via
    * `Dataset.unionByName(allowMissingColumns = true)` — probed DuckDB
    * semantics: columns match by NAME in any order, a column missing on
    * one side becomes NULL there, plain UNION dedups the accumulated
    * result, ALL keeps everything.
    */
  def unionByNameTarget(sql: String): Option[UnionByNameSpec] = {
    val masked = maskQuotes(sql)
    def depth0(p: Int): Boolean = {
      val pre = masked.substring(0, p)
      pre.count(_ == '(') == pre.count(_ == ')')
    }
    val bounds = raw"(?i)\bUNION\s+(ALL\s+)?BY\s+NAME\b".r
      .findAllMatchIn(masked).filter(m => depth0(m.start)).toList
    if (bounds.isEmpty) return None
    // leading CTE prefix: everything before the first depth-0 SELECT
    // (or FROM-first FROM) — replicated onto every side
    // CTE bodies live inside parens, so the first depth-0 SELECT (or
    // FROM-first FROM) marks where the union's first side begins
    val bodyStart =
      if (raw"(?is)^\s*WITH\b".r.findFirstIn(masked).isDefined)
        raw"(?i)\bSELECT\b|\bFROM\b".r.findAllMatchIn(masked)
          .find(m => depth0(m.start)).map(_.start).getOrElse(0)
      else 0
    val prefix = sql.substring(0, bodyStart)
    val cuts = bounds.map(m => (m.start, m.end, m.group(1) != null))
    val sides = Seq.newBuilder[String]
    var last = bodyStart
    cuts.foreach { case (s0, e0, _) =>
      sides += (prefix + sql.substring(last, s0)).trim
      last = e0
    }
    // the LAST side may carry whole-union ORDER BY / LIMIT / OFFSET
    val lastMasked = masked.substring(last)
    val tailPos = raw"(?i)\bORDER\s+BY\b|\bLIMIT\b|\bOFFSET\b".r
      .findAllMatchIn(lastMasked)
      .find(m => {
        val pre = lastMasked.substring(0, m.start)
        pre.count(_ == '(') == pre.count(_ == ')')
      }).map(_.start)
    val (lastSide, tail) = tailPos match {
      case Some(tp) => (sql.substring(last, last + tp), sql.substring(last + tp))
      case None => (sql.substring(last), "")
    }
    sides += (prefix + lastSide).trim
    Some(UnionByNameSpec(sides.result(), cuts.map(_._3), tail.trim.stripSuffix(";")))
  }

  private val slf = org.slf4j.LoggerFactory.getLogger("graft.sql")

  /** Pre-exec cost heuristic for `WITH RECURSIVE` (VERDICT r9 #3):
    * Spark executes linear recursion natively but pays ONE JOB PER
    * LEVEL (UnionLoop's iterative model — depth × driver floor, ~0.1 s
    * per level at local[32]), so deep or unbounded recursion that
    * DuckDB would grind through in-process becomes a driver-bound loop.
    * Returns a guided warning when the statement carries recursion with
    * NO visible level bound (no `n < K`-style comparison literal and no
    * LIMIT — the transitive-closure / reachability shape) or with every
    * visible bound above 100 levels. A heuristic by design: the bound
    * literal is identified textually, so a bounded recursion whose
    * bound lives in a variable still warns — the warning names the
    * scale operators, it never blocks execution.
    */
  def deepRecursionWarning(sql: String): Option[String] = {
    val masked = maskQuotes(sql)
    if (raw"(?i)\bWITH\s+RECURSIVE\b".r.findFirstIn(masked).isEmpty) return None
    val cmp = raw"[<>]=?\s*(\d+)".r.findAllMatchIn(masked).map(_.group(1).toLong) ++
      raw"(\d+)\s*[<>]=?".r.findAllMatchIn(masked).map(_.group(1).toLong) ++
      raw"(?i)\bLIMIT\s+(\d+)".r.findAllMatchIn(masked).map(_.group(1).toLong)
    val bounds = cmp.toSeq
    val diag =
      if (bounds.isEmpty)
        Some("no visible level bound (reachability/transitive-closure shape)")
      else if (bounds.min > 100)
        Some(s"its smallest visible bound is ${bounds.min} levels")
      else None
    diag.map { why =>
      s"WITH RECURSIVE runs one Spark job per recursion level — $why, so this " +
        "statement may be driver-bound at depth (cost ≈ depth × job floor). For " +
        "transitive closure / reachability use graft.functions.Dedup" +
        ".connectedComponents (path doubling, O(log diameter) rounds); for a " +
        "known shallow depth, bound the recursion (WHERE lvl < K / LIMIT) or " +
        "unroll with UNION ALL."
    }
  }

  /** Log [[deepRecursionWarning]] if it applies; returns it for tests. */
  def warnDeepRecursion(sql: String): Option[String] = {
    val w = deepRecursionWarning(sql)
    w.foreach(slf.warn)
    w
  }

  def splitStatements(sql: String): Seq[String] = {
    val masked = maskQuotes(sql)
    val out = Seq.newBuilder[String]
    var last = 0
    var i = 0
    while (i < masked.length) {
      if (masked.charAt(i) == ';') { out += sql.substring(last, i); last = i + 1 }
      i += 1
    }
    out += sql.substring(last)
    // leading comments carry no semantics but defeat every
    // head-anchored statement detector (CREATE MACRO / COPY / CTAS /
    // INSERT / SET / DESCRIBE anchor at ^\s* — the r12 composed-macro
    // fuzz caught `-- note\nCREATE MACRO ...` falling through to
    // Spark's parser); strip them per statement
    out.result().map(stripLeadingComments).filter(_.trim.nonEmpty)
  }

  /** Strip leading whitespace, `--` line comments and closed `/* */`
    * block comments from a statement head (see [[splitStatements]]).
    */
  def stripLeadingComments(sql: String): String = {
    var i = 0
    var moved = true
    while (moved) {
      moved = false
      while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      if (sql.startsWith("--", i)) {
        val nl = sql.indexOf('\n', i)
        i = if (nl < 0) sql.length else nl + 1
        moved = true
      } else if (sql.startsWith("/*", i)) {
        val end = sql.indexOf("*/", i + 2)
        if (end >= 0) { i = end + 2; moved = true }
      }
    }
    if (i == 0) sql else sql.substring(i)
  }
}
