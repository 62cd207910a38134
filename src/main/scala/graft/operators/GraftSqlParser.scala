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
  private def rewrite(sql: String): String = GraftSqlParser.rewriteExclude(sql)

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
