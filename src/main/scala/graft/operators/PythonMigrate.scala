package graft.operators

import scala.collection.mutable

/** Migration aid for the reference's per-row `python` stages (O13,
  * /root/reference/filefilter.py:38-50): translates the restricted
  * python subset that the reference's own examples use
  * (/root/reference/FileFilterGPT/phones.yml:6-15,
  * /root/reference/examples/fullExample/fullExample.yml:22-40) into
  * Spark SQL derive columns — so those YAMLs run VERBATIM through
  * [[graft.Main]], compiled to codegen'd Catalyst expressions instead of
  * per-row exec().
  *
  * Supported subset (anything else fails with an actionable message
  * naming the construct and line):
  *  - `import re/json/random/pandas/math` (with aliases); other imports
  *    error
  *  - module-level constant bindings `name = <expr>`
  *  - `def f(a, b):` whose body is bindings + an if/elif/else chain of
  *    single `return <expr>` branches (compiled to CASE WHEN), or a
  *    plain `return <expr>` — including `return {dict literal}`
  *  - `row['x'] = <expr>` assignments (the output derive columns)
  *  - module-level `if/elif/else` whose branches assign row columns —
  *    each column becomes one CASE over the branch conditions; a branch
  *    that skips the column keeps its prior value (NULL when new)
  *  - expressions: literals, f-strings (`f"a {row['x']}"` → concat;
  *    format specs error), `row['y']`, str/int/float/len/abs/round and
  *    min/max (→ least/greatest), `re.match/search/fullmatch(pat, e)`
  *    (→ RLIKE, anchored per python semantics), `re.sub(pat, repl, e)`
  *    (→ regexp_replace with the 'g' flag — python replaces ALL matches;
  *    `\g<1>` backrefs become `\1`),
  *    `rand.uniform(a,b)` (→ `a + rand()*(b-a)`),
  *    `math.sqrt/floor/ceil/exp/log/log2/log10/pow/fabs` + `math.pi/e`,
  *    `json.dumps({...})` (→ to_json(named_struct(...))),
  *    `json.loads(e)` + `.get('k', d)` / `['k']` (→ get_json_object),
  *    string methods lower/upper/strip/lstrip/rstrip/title/capitalize/
  *    startswith/endswith/replace/find/count/zfill/ljust/rjust and
  *    `.split(sep)` / `.split()` with python list indexing
  *    (`s.split(',')[0]`, negatives from the end) and `len()`,
  *    arithmetic incl. `**` (→ power) and
  *    `//` (→ floor division), comparisons, and/or/not/in,
  *    `a if cond else b`, dict-returning function results
  *
  * Documented divergences (same spirit as the `derive` stage, SURVEY
  * §2c): a dict-returning function call is inlined at each USE site, so
  * a non-deterministic dict member read twice yields independent draws
  * (the reference evaluated the function once per row); and `.get(k,
  * default)` maps to get_json_object + coalesce, so an explicit `{}`
  * default becomes NULL.
  */
object PythonMigrate {

  final class MigrationError(line: Int, construct: String, hint: String)
    extends IllegalArgumentException(
      s"python stage migration: unsupported construct at line $line: $construct. " +
        s"$hint Re-express this stage as a 'derive' stage (Spark SQL expressions), " +
        "a 'sql' stage, or a registered 'transform'.")

  // ---------------------------------------------------------------- lexer

  private sealed trait Tok
  private case class TName(s: String) extends Tok
  private case class TNum(s: String) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TOp(s: String) extends Tok
  /** f-string: alternating literal (Left) / embedded-expression source
    * (Right) parts.
    */
  private case class TFStr(parts: Vector[Either[String, String]]) extends Tok

  private def lex(src: String, lineNo: Int): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val ops2 = Set("==", "!=", "<=", ">=", "//", "**")
    while (i < src.length) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') i = src.length
      else if (c.isLetter || c == '_') {
        val j0 = i
        while (i < src.length && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        val w = src.substring(j0, i)
        // r'...' raw / f'...' formatted string prefixes
        if ((w == "r" || w == "R") && i < src.length && (src.charAt(i) == '\'' || src.charAt(i) == '"')) {
          val (s, ni) = lexString(src, i, lineNo, raw = true); out += TStr(s); i = ni
        } else if ((w == "f" || w == "F") && i < src.length && (src.charAt(i) == '\'' || src.charAt(i) == '"')) {
          val (parts, ni) = lexFString(src, i, lineNo); out += TFStr(parts); i = ni
        } else out += TName(w)
      } else if (c.isDigit || (c == '.' && i + 1 < src.length && src.charAt(i + 1).isDigit)) {
        val j0 = i
        while (i < src.length && (src.charAt(i).isDigit || src.charAt(i) == '.')) i += 1
        out += TNum(src.substring(j0, i))
      } else if (c == '\'' || c == '"') {
        val (s, ni) = lexString(src, i, lineNo, raw = false); out += TStr(s); i = ni
      } else if (i + 1 < src.length && ops2.contains(src.substring(i, i + 2))) {
        out += TOp(src.substring(i, i + 2)); i += 2
      } else {
        out += TOp(c.toString); i += 1
      }
    }
    out.result()
  }

  private def lexString(src: String, start: Int, lineNo: Int, raw: Boolean): (String, Int) = {
    val quote = src.charAt(start)
    val sb = new StringBuilder
    var i = start + 1
    while (i < src.length && src.charAt(i) != quote) {
      val c = src.charAt(i)
      if (c == '\\' && !raw && i + 1 < src.length) {
        def hex(ch: Char) = ch.isDigit || ('a' to 'f').contains(ch.toLower)
        val n = src.charAt(i + 1)
        n match {
          case 'n' => sb += '\n'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 'a' => sb += 7.toChar; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case 'v' => sb += 11.toChar; i += 2
          case '\\' => sb += '\\'; i += 2
          case '\'' => sb += '\''; i += 2
          case '"' => sb += '"'; i += 2
          case 'x' if i + 3 < src.length && hex(src.charAt(i + 2)) && hex(src.charAt(i + 3)) =>
            sb += Integer.parseInt(src.substring(i + 2, i + 4), 16).toChar; i += 4
          case 'u' if i + 5 < src.length && (2 to 5).forall(k => hex(src.charAt(i + k))) =>
            sb += Integer.parseInt(src.substring(i + 2, i + 6), 16).toChar; i += 6
          case 'U' if i + 9 < src.length && (2 to 9).forall(k => hex(src.charAt(i + k))) =>
            sb.appendAll(Character.toChars(
              Integer.parseInt(src.substring(i + 2, i + 10), 16))); i += 10
          case 'N' =>
            // \N{UNICODE NAME}: python resolves via the unicode database;
            // preserving the backslash would silently diverge — error
            throw new MigrationError(lineNo, "\\N{...} named unicode escape",
              "Write the character directly or as \\uXXXX.")
          case o if o >= '0' && o <= '7' =>
            var j = i + 1
            var v = 0
            while (j < src.length && j < i + 4 &&
              src.charAt(j) >= '0' && src.charAt(j) <= '7') {
              v = v * 8 + (src.charAt(j) - '0'); j += 1
            }
            sb += v.toChar; i = j
          case other =>
            // Python PRESERVES unrecognized escapes ('\d' stays "\d") —
            // dropping the backslash turned un-raw regex literals like
            // re.match('\d+', s) into literal-text matches (ADVICE r6)
            sb += '\\'; sb += other; i += 2
        }
      } else if (c == '\\' && raw && i + 1 < src.length) {
        sb += '\\'; sb += src.charAt(i + 1); i += 2
      } else { sb += c; i += 1 }
    }
    if (i >= src.length)
      throw new MigrationError(lineNo, "unterminated string literal", "")
    (sb.toString, i + 1)
  }

  /** f-string body: literal text with `{expr}` holes ({{ }} escapes).
    * Format specs (`{x:.2f}`, `{x!r}`) have no SQL equivalent → error.
    */
  private def lexFString(src: String, start: Int, lineNo: Int): (Vector[Either[String, String]], Int) = {
    val quote = src.charAt(start)
    val parts = Vector.newBuilder[Either[String, String]]
    val lit = new StringBuilder
    var i = start + 1
    while (i < src.length && src.charAt(i) != quote) {
      val c = src.charAt(i)
      if (c == '{') {
        if (i + 1 < src.length && src.charAt(i + 1) == '{') { lit += '{'; i += 2 }
        else {
          if (lit.nonEmpty) { parts += Left(lit.toString); lit.clear() }
          val e = new StringBuilder
          var depth = 1
          i += 1
          while (i < src.length && depth > 0) {
            val ec = src.charAt(i)
            if (ec == '{') { depth += 1; e += ec }
            else if (ec == '}') { depth -= 1; if (depth > 0) e += ec }
            else e += ec
            i += 1
          }
          if (depth > 0) throw new MigrationError(lineNo, "unterminated f-string expression", "")
          val es = e.toString
          if (raw"[!:](?![=])".r.findFirstIn(
              es.replaceAll("'[^']*'", "").replaceAll("\"[^\"]*\"", "")).isDefined)
            throw new MigrationError(lineNo, s"f-string format spec in '{$es}'",
              "Format specs have no SQL equivalent — use round/format_number in a 'derive' stage.")
          parts += Right(es)
        }
      } else if (c == '}') {
        if (i + 1 < src.length && src.charAt(i + 1) == '}') { lit += '}'; i += 2 }
        else throw new MigrationError(lineNo, "single '}' in f-string", "Escape it as '}}'.")
      } else if (c == '\\' && i + 1 < src.length) {
        val n = src.charAt(i + 1)
        lit += (n match {
          case 'n' => '\n'; case 't' => '\t'; case '\\' => '\\'
          case '\'' => '\''; case '"' => '"'; case other => other
        })
        i += 2
      } else { lit += c; i += 1 }
    }
    if (i >= src.length) throw new MigrationError(lineNo, "unterminated f-string", "")
    if (lit.nonEmpty) parts += Left(lit.toString)
    (parts.result(), i + 1)
  }

  // ------------------------------------------------------------ value IR

  /** Translated value: either a SQL fragment, a python dict, or a parsed
    * JSON document handle (json.loads result).
    */
  private sealed trait V
  private case class Sql(sql: String, isString: Boolean = false) extends V
  private case class Tup(items: Seq[V]) extends V
  private case class Dict(fields: Seq[(String, V)]) extends V
  private case class Json(src: V) extends V
  /** A string-array value (`.split(...)` result): subscriptable with an
    * integer (python indexing, negatives from the end) and measurable
    * with len(); anything else errors.
    */
  private case class Arr(sql: String) extends V
  private case class Func(params: Seq[String], body: Seq[Stmt], defLine: Int) extends V
  /** Bound python module alias, e.g. `rand` -> random. */
  private case class Module(name: String) extends V

  private def sqlOf(v: V, line: Int): Sql = v match {
    case s: Sql => s
    case Json(src) => sqlOf(src, line)
    case Tup(_) => throw new MigrationError(line, "a tuple used as a scalar value",
      "Tuples are only valid on the right of 'in'.")
    case Dict(_) => throw new MigrationError(line, "a dict used as a scalar value",
      "Subscript it with a constant key.")
    case Arr(_) => throw new MigrationError(line, "a list used as a scalar value",
      "Subscript the .split(...) result with a constant index, or take len() of it.")
    case Func(_, _, l) => throw new MigrationError(line, s"function value (defined at line $l) used as a scalar", "")
    case Module(m) => throw new MigrationError(line, s"module '$m' used as a value", "")
  }

  private def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Undo [[sqlStr]]: recover the raw string from its SQL-literal form —
    * needed when a python method wants the literal's VALUE at translate
    * time (regex-quoting a split separator, converting re.sub backrefs).
    */
  private def rawStr(sqlLit: String): String = {
    val inner = sqlLit.stripPrefix("'").stripSuffix("'")
    val sb = new StringBuilder
    var i = 0
    while (i < inner.length) {
      if (inner.charAt(i) == '\\' && i + 1 < inner.length) {
        sb.append(inner.charAt(i + 1)); i += 2
      } else { sb.append(inner.charAt(i)); i += 1 }
    }
    sb.toString
  }

  // ----------------------------------------------------------- statements

  private sealed trait Stmt { def line: Int }
  private case class SBind(name: String, expr: Vector[Tok], line: Int) extends Stmt
  private case class SRow(col: String, expr: Vector[Tok], line: Int) extends Stmt
  private case class SReturn(expr: Vector[Tok], line: Int) extends Stmt
  private case class SIf(branches: Seq[(Option[Vector[Tok]], Seq[Stmt])], line: Int) extends Stmt
  private case class SDef(name: String, params: Seq[String], body: Seq[Stmt], line: Int) extends Stmt
  private case class SImport(binds: Seq[(String, String)], line: Int) extends Stmt

  private case class Line(no: Int, indent: Int, text: String)

  private def logicalLines(code: String): Vector[Line] =
    code.linesIterator.zipWithIndex.flatMap { case (raw, idx) =>
      val noComment = stripComment(raw)
      val t = noComment.trim
      if (t.isEmpty) None
      else Some(Line(idx + 1, noComment.takeWhile(_ == ' ').length +
        noComment.takeWhile(_ == '\t').length * 8, t))
    }.toVector

  private def stripComment(s: String): String = {
    var i = 0; var q: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == '\\') i += 1 else if (c == q) q = 0 }
      else if (c == '\'' || c == '"') q = c
      else if (c == '#') return s.substring(0, i)
      i += 1
    }
    s
  }

  /** Parse a block of lines (all at indent >= the first line's). */
  private def parseBlock(lines: Vector[Line]): Seq[Stmt] = {
    val out = Seq.newBuilder[Stmt]
    var i = 0
    val base = if (lines.nonEmpty) lines.head.indent else 0
    def childBlock(from: Int): (Vector[Line], Int) = {
      var j = from
      while (j < lines.length && lines(j).indent > base) j += 1
      (lines.slice(from, j), j)
    }
    while (i < lines.length) {
      val ln = lines(i)
      val t = ln.text
      if (ln.indent != base)
        throw new MigrationError(ln.no, s"unexpected indentation: '$t'", "")
      if (t.startsWith("import ") || t.startsWith("from ")) {
        out += parseImport(t, ln.no); i += 1
      } else if (t.startsWith("def ")) {
        val m = """def\s+(\w+)\s*\(([^)]*)\)\s*:\s*""".r
        t match {
          case m(name, params) =>
            val (body, ni) = childBlock(i + 1)
            if (body.isEmpty) throw new MigrationError(ln.no, s"empty function '$name'", "")
            out += SDef(name, params.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
              parseBlock(body), ln.no)
            i = ni
          case _ => throw new MigrationError(ln.no, s"'$t'", "Only simple 'def name(args):' is supported.")
        }
      } else if (t.startsWith("if ") || t.startsWith("elif ") || t.startsWith("else")) {
        // collect a full if/elif/else chain
        val branches = Seq.newBuilder[(Option[Vector[Tok]], Seq[Stmt])]
        var done = false
        while (i < lines.length && !done) {
          val bl = lines(i); val bt = bl.text
          val cond: Option[String] =
            if (bt.startsWith("if ") && branches.knownSize == 0) Some(bt.stripPrefix("if "))
            else if (bt.startsWith("elif ")) Some(bt.stripPrefix("elif "))
            else if (bt == "else:" || bt.startsWith("else")) None
            else { done = true; None }
          if (!done) {
            val condTrim = cond.map(_.trim.stripSuffix(":").trim)
            if (cond.isDefined && (condTrim.isEmpty || !bt.trim.endsWith(":")))
              throw new MigrationError(bl.no, s"'$bt'", "Conditions must end with ':'.")
            val (body, ni) = childBlock(i + 1)
            if (body.isEmpty) throw new MigrationError(bl.no, "empty branch body", "")
            branches += ((condTrim.map(c => lex(c, bl.no)), parseBlock(body)))
            i = ni
            if (cond.isEmpty) done = true // else terminates the chain
            else if (i >= lines.length || lines(i).indent != base ||
              !(lines(i).text.startsWith("elif") || lines(i).text.startsWith("else"))) done = true
          }
        }
        out += SIf(branches.result(), ln.no)
      } else if (t.startsWith("return")) {
        out += SReturn(lex(t.stripPrefix("return").trim, ln.no), ln.no); i += 1
      } else {
        // assignment: row['x'] = expr | name = expr  (reject == etc.)
        val eq = findTopLevelAssign(t)
        if (eq < 0)
          throw new MigrationError(ln.no, s"'$t'",
            "Only assignments, imports, defs and if/elif/else are supported.")
        val lhs = t.substring(0, eq).trim
        val rhs = t.substring(eq + 1).trim
        val rowLhs = """row\s*\[\s*['"](.+?)['"]\s*\]""".r
        lhs match {
          case rowLhs(colName) => out += SRow(colName, lex(rhs, ln.no), ln.no)
          case name if name.matches("""\w+""") => out += SBind(name, lex(rhs, ln.no), ln.no)
          case other => throw new MigrationError(ln.no, s"assignment to '$other'",
            "Only row['col'] = ... and name = ... are supported.")
        }
        i += 1
      }
    }
    out.result()
  }

  private def findTopLevelAssign(s: String): Int = {
    var i = 0; var q: Char = 0; var depth = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == '\\') i += 1 else if (c == q) q = 0 }
      else if (c == '\'' || c == '"') q = c
      else if (c == '(' || c == '[' || c == '{') depth += 1
      else if (c == ')' || c == ']' || c == '}') depth -= 1
      else if (depth == 0 && c == '=' &&
        (i == 0 || !"=<>!+-*/%".contains(s.charAt(i - 1))) &&
        (i + 1 >= s.length || s.charAt(i + 1) != '=')) return i
      i += 1
    }
    -1
  }

  private def parseImport(t: String, no: Int): SImport = {
    val allowed = Set("re", "json", "random", "pandas", "math")
    val imp = """import\s+(\w+)(?:\s+as\s+(\w+))?""".r
    val from = """from\s+(\w+)\s+import\s+.*""".r
    t match {
      case imp(mod, alias) =>
        if (!allowed.contains(mod))
          throw new MigrationError(no, s"import of module '$mod'",
            s"Only ${allowed.mkString("/")} are understood by the migrator.")
        SImport(Seq((Option(alias).getOrElse(mod), mod)), no)
      case from(mod) =>
        if (!allowed.contains(mod))
          throw new MigrationError(no, s"import from module '$mod'",
            s"Only ${allowed.mkString("/")} are understood by the migrator.")
        SImport(Nil, no)
      case _ => throw new MigrationError(no, s"'$t'", "")
    }
  }

  // --------------------------------------------------- expression parser

  /** Pratt parser over a token vector; evaluates straight to [[V]]
    * against the environment (bindings, functions, module aliases).
    */
  private final class ExprParser(toks: Vector[Tok], env: mutable.Map[String, V], line: Int) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expect(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case other => throw new MigrationError(line, s"expected '$op', found '$other'", "")
    }
    private def err(what: String, hint: String = ""): Nothing =
      throw new MigrationError(line, what, hint)

    def parseFull(): V = {
      val v = ternary()
      if (pos < toks.length) err(s"trailing tokens after expression: '${toks.drop(pos).mkString(" ")}'")
      v
    }

    // python conditional expression: a if cond else b
    private def ternary(): V = {
      val v = orExpr()
      peek match {
        case Some(TName("if")) =>
          next()
          val cond = boolOf(orExpr())
          peek match {
            case Some(TName("else")) => next()
            case _ => err("conditional expression missing 'else'")
          }
          val other = ternary()
          val (a, b) = (sqlOf(v, line), sqlOf(other, line))
          Sql(s"CASE WHEN $cond THEN ${a.sql} ELSE ${b.sql} END", a.isString || b.isString)
        case _ => v
      }
    }

    private def orExpr(): V = {
      var v = andExpr()
      while (peek.contains(TName("or"))) { next(); v = Sql(s"(${boolOf(v)} OR ${boolOf(andExpr())})") }
      v
    }
    private def andExpr(): V = {
      var v = notExpr()
      while (peek.contains(TName("and"))) { next(); v = Sql(s"(${boolOf(v)} AND ${boolOf(notExpr())})") }
      v
    }
    private def notExpr(): V = peek match {
      case Some(TName("not")) => next(); Sql(s"(NOT ${boolOf(notExpr())})")
      case _ => comparison()
    }

    private def comparison(): V = {
      val l = additive()
      def inList(negate: Boolean): V = {
        val r = additive()
        val items = r match {
          case Tup(is) => is.map(sqlOf(_, line).sql)
          case single => Seq(sqlOf(single, line).sql)
        }
        val not = if (negate) "NOT " else ""
        Sql(s"(${sqlOf(l, line).sql} ${not}IN (${items.mkString(", ")}))")
      }
      peek match {
        case Some(TOp(op)) if Set("==", "!=", "<", ">", "<=", ">=").contains(op) =>
          next()
          val r = additive()
          val sqlOp = op match { case "==" => "="; case "!=" => "<>"; case o => o }
          Sql(s"(${sqlOf(l, line).sql} $sqlOp ${sqlOf(r, line).sql})")
        case Some(TName("in")) => next(); inList(negate = false)
        case Some(TName("not")) if pos + 1 < toks.length && toks(pos + 1) == TName("in") =>
          next(); next(); inList(negate = true)
        case _ => l
      }
    }

    private def additive(): V = {
      var v = multiplicative()
      var cont = true
      while (cont) peek match {
        case Some(TOp("+")) =>
          next()
          val r = multiplicative()
          val (a, b) = (sqlOf(v, line), sqlOf(r, line))
          // python `+` is concat for strings, addition for numbers; we
          // know the static type only for literals/str() results
          v = if (a.isString || b.isString) Sql(s"concat(${a.sql}, ${b.sql})", isString = true)
              else Sql(s"(${a.sql} + ${b.sql})")
        case Some(TOp("-")) => next(); v = Sql(s"(${sqlOf(v, line).sql} - ${sqlOf(multiplicative(), line).sql})")
        case _ => cont = false
      }
      v
    }

    private def multiplicative(): V = {
      var v = unary()
      var cont = true
      while (cont) peek match {
        case Some(TOp(op)) if Set("*", "/", "%").contains(op) =>
          next(); v = Sql(s"(${sqlOf(v, line).sql} $op ${sqlOf(unary(), line).sql})")
        case Some(TOp("//")) =>
          // python floor division (rounds toward -inf, unlike SQL int div)
          next(); v = Sql(s"floor(${sqlOf(v, line).sql} / ${sqlOf(unary(), line).sql})")
        case _ => cont = false
      }
      v
    }

    private def unary(): V = peek match {
      case Some(TOp("-")) => next(); Sql(s"(- ${sqlOf(unary(), line).sql})")
      case _ => power()
    }

    // python ** binds tighter than unary minus and is right-associative:
    // -2**2 = -(2**2), 2**3**2 = 2**(3**2) — both fall out of unary()
    // on the right side
    private def power(): V = {
      val base = postfix()
      peek match {
        case Some(TOp("**")) =>
          next(); Sql(s"power(${sqlOf(base, line).sql}, ${sqlOf(unary(), line).sql})")
        case _ => base
      }
    }

    private def postfix(): V = {
      var v = atom()
      var cont = true
      while (cont) peek match {
        case Some(TOp("(")) => v = call(v, None)
        case Some(TOp("[")) =>
          next()
          val key = ternary()
          expect("]")
          v = subscript(v, key)
        case Some(TOp(".")) =>
          next()
          val name = next() match {
            case TName(n) => n
            case o => err(s"expected attribute name after '.', found '$o'")
          }
          v = peek match {
            case Some(TOp("(")) => call(v, Some(name))
            case _ => (v, name) match {
              case (Module("math"), "pi") => Sql("pi()")
              case (Module("math"), "e") => Sql("e()")
              case _ => err(s"attribute access '.$name' without a call",
                "Only method calls like .get(...)/.lower()/.strip() are supported.")
            }
          }
        case _ => cont = false
      }
      v
    }

    private def atom(): V = next() match {
      case TStr(s) => Sql(sqlStr(s), isString = true)
      case TFStr(parts) =>
        if (parts.isEmpty) Sql(sqlStr(""), isString = true)
        else {
          val pieces = parts.map {
            case Left(lit) => sqlStr(lit)
            case Right(src) =>
              val inner = new ExprParser(lex(src, line), env, line).parseFull()
              val s = sqlOf(inner, line)
              if (s.isString) s.sql else s"CAST(${s.sql} AS STRING)"
          }
          if (pieces.length == 1) Sql(pieces.head, isString = true)
          else Sql(s"concat(${pieces.mkString(", ")})", isString = true)
        }
      case TNum(n) => Sql(n)
      case TName("True") => Sql("true")
      case TName("False") => Sql("false")
      case TName("None") => Sql("NULL")
      case TName("row") =>
        expect("[")
        val col = next() match {
          case TStr(s) => s
          case o => err(s"row subscript must be a string literal, found '$o'")
        }
        expect("]")
        // a module-level if branch shadows row['c'] with the branch's
        // own assigned value (keys of this shape can't collide with
        // bare-name bindings — '[' never lexes into a TName)
        env.getOrElse(s"row['$col']", Sql(s"`$col`"))
      case TName(n) if peek.contains(TOp("(")) && builtins.contains(n) => call(Module("__builtin__"), Some(n))
      case TName(n) =>
        env.getOrElse(n, err(s"undefined name '$n'",
          "Bind it earlier in the block or pass it as a function argument."))
      case TOp("(") =>
        val v = ternary()
        peek match {
          case Some(TOp(",")) => // tuple literal (for the right of 'in')
            val items = Seq.newBuilder[V]
            items += v
            while (peek.contains(TOp(","))) {
              next()
              if (!peek.contains(TOp(")"))) items += ternary()
            }
            expect(")")
            Tup(items.result())
          case _ => expect(")"); v
        }
      case TOp("{") =>
        val fields = Seq.newBuilder[(String, V)]
        if (!peek.contains(TOp("}"))) {
          var more = true
          while (more) {
            val k = next() match {
              case TStr(s) => s
              case o => err(s"dict key must be a string literal, found '$o'")
            }
            expect(":")
            fields += ((k, ternary()))
            peek match { case Some(TOp(",")) => next() ; case _ => more = false }
          }
        }
        expect("}")
        Dict(fields.result())
      case other => err(s"unexpected token '$other'")
    }

    private val builtins = Set("str", "int", "float", "len", "abs", "round", "min", "max")

    private def call(target: V, method: Option[String]): V = {
      expect("(")
      val args = Seq.newBuilder[V]
      if (!peek.contains(TOp(")"))) {
        var more = true
        while (more) {
          args += ternary()
          peek match { case Some(TOp(",")) => next(); case _ => more = false }
        }
      }
      expect(")")
      val a = args.result()
      // a JSON-subscript result used with string methods behaves as its
      // extracted string (get_json_object returns STRING); .get() keeps
      // the Json view for nested access
      val tgt = target match {
        case j: Json if !method.contains("get") => sqlOf(j, line)
        case t => t
      }
      (tgt, method) match {
        case (Module("__builtin__"), Some(fn)) => builtinCall(fn, a)
        case (Module("re"), Some("match")) =>
          if (a.length != 2) err("re.match expects (pattern, string)")
          val pat = a.head match {
            case Sql(lit, true) => lit
            case _ => err("re.match pattern must be a string literal")
          }
          // RLIKE is an unanchored search; re.match anchors at the start
          val anchored = "'^(?:" + pat.stripPrefix("'").stripSuffix("'") + ")'"
          Sql(s"(${sqlOf(a(1), line).sql} RLIKE $anchored)")
        case (Module("re"), Some("search")) =>
          if (a.length != 2) err("re.search expects (pattern, string)")
          a.head match {
            case Sql(pat, true) => Sql(s"(${sqlOf(a(1), line).sql} RLIKE $pat)")
            case _ => err("re.search pattern must be a string literal")
          }
        case (Module("re"), Some("fullmatch")) =>
          if (a.length != 2) err("re.fullmatch expects (pattern, string)")
          a.head match {
            case Sql(pat, true) =>
              val anchored = "'^(?:" + pat.stripPrefix("'").stripSuffix("'") + ")$'"
              Sql(s"(${sqlOf(a(1), line).sql} RLIKE $anchored)")
            case _ => err("re.fullmatch pattern must be a string literal")
          }
        case (Module("re"), Some("sub")) =>
          if (a.length != 3) err("re.sub expects (pattern, repl, string)")
          val pat = a.head match {
            case Sql(lit, true) => lit
            case _ => err("re.sub pattern must be a string literal")
          }
          val repl = a(1) match {
            case Sql(lit, true) =>
              // python backrefs: \g<1> → \1 (\1 and literals already
              // match the DuckDB-dialect regexp_replace rewrite rules —
              // \N backref, \\ literal backslash, $ literal)
              sqlStr(rawStr(lit).replaceAll("""\\g<(\d+)>""", """\\$1"""))
            case _ => err("re.sub replacement must be a string literal")
          }
          // python re.sub replaces ALL matches; the DuckDB-semantics
          // native replaces the FIRST unless 'g' is passed (emitted by
          // its registered name — derive expressions don't pass through
          // the dialect rename)
          Sql(s"duck_regexp_replace(${sqlOf(a(2), line).sql}, $pat, $repl, 'g')", isString = true)
        case (Module("re"), Some(other)) =>
          err(s"re.$other", "re.match/search/fullmatch/sub are translated; use regexp_extract in a 'derive' stage for group capture.")
        case (Module("random"), Some("uniform")) =>
          if (a.length != 2) err("uniform expects (a, b)")
          val (lo, hi) = (sqlOf(a.head, line).sql, sqlOf(a(1), line).sql)
          Sql(s"($lo + rand() * ($hi - $lo))")
        case (Module("random"), Some("random")) => Sql("rand()")
        case (Module("random"), Some(other)) =>
          err(s"random.$other", "Only uniform/random are translated.")
        case (Module("math"), Some(fn)) =>
          def one = sqlOf(a.head, line).sql
          fn match {
            case "sqrt" => Sql(s"sqrt($one)")
            case "floor" => Sql(s"floor($one)")
            case "ceil" => Sql(s"ceil($one)")
            case "exp" => Sql(s"exp($one)")
            case "log" =>
              // python math.log(x[, base]); SQL log(base, x) flips args
              if (a.length == 2) Sql(s"log(${sqlOf(a(1), line).sql}, $one)")
              else Sql(s"ln($one)")
            case "log2" => Sql(s"log2($one)")
            case "log10" => Sql(s"log10($one)")
            case "pow" =>
              if (a.length != 2) err("math.pow expects (x, y)")
              Sql(s"power($one, ${sqlOf(a(1), line).sql})")
            case "fabs" => Sql(s"abs(CAST($one AS DOUBLE))")
            case other => err(s"math.$other",
              "Translated: sqrt/floor/ceil/exp/log/log2/log10/pow/fabs and the pi/e constants.")
          }
        case (Module("json"), Some("dumps")) => a.head match {
          case Dict(fields) =>
            val parts = fields.map { case (k, v) => s"${sqlStr(k)}, ${sqlOf(v, line).sql}" }
            Sql(s"to_json(named_struct(${parts.mkString(", ")}))", isString = true)
          case other => err("json.dumps of a non-dict-literal",
            "Only dict literals are translated (to to_json(named_struct(...))).")
        }
        case (Module("json"), Some("loads")) =>
          if (a.length != 1) err("json.loads expects one argument")
          Json(a.head)
        case (Module(m), Some(other)) => err(s"$m.$other", "")
        // python string methods on any scalar expression
        case (v, Some("lower")) if a.isEmpty && v.isInstanceOf[Sql] =>
          Sql(s"lower(${sqlOf(v, line).sql})", isString = true)
        case (v, Some("upper")) if a.isEmpty && v.isInstanceOf[Sql] =>
          Sql(s"upper(${sqlOf(v, line).sql})", isString = true)
        case (v, Some("strip")) if a.isEmpty && v.isInstanceOf[Sql] =>
          Sql(s"trim(${sqlOf(v, line).sql})", isString = true)
        case (v, Some("lstrip")) if a.isEmpty && v.isInstanceOf[Sql] =>
          Sql(s"ltrim(${sqlOf(v, line).sql})", isString = true)
        case (v, Some("rstrip")) if a.isEmpty && v.isInstanceOf[Sql] =>
          Sql(s"rtrim(${sqlOf(v, line).sql})", isString = true)
        case (v, Some("title")) if a.isEmpty && v.isInstanceOf[Sql] =>
          Sql(s"initcap(${sqlOf(v, line).sql})", isString = true)
        case (v, Some("capitalize")) if a.isEmpty && v.isInstanceOf[Sql] =>
          // python: first char upper, REST lower (initcap would touch every word)
          val s = sqlOf(v, line).sql
          Sql(s"concat(upper(substring($s, 1, 1)), lower(substring($s, 2)))", isString = true)
        case (v, Some("startswith")) if a.length == 1 && v.isInstanceOf[Sql] =>
          Sql(s"startswith(${sqlOf(v, line).sql}, ${sqlOf(a.head, line).sql})")
        case (v, Some("endswith")) if a.length == 1 && v.isInstanceOf[Sql] =>
          Sql(s"endswith(${sqlOf(v, line).sql}, ${sqlOf(a.head, line).sql})")
        case (v, Some("replace")) if a.length == 2 && v.isInstanceOf[Sql] =>
          Sql(s"replace(${sqlOf(v, line).sql}, ${sqlOf(a.head, line).sql}, ${sqlOf(a(1), line).sql})",
            isString = true)
        case (v, Some("split")) if v.isInstanceOf[Sql] =>
          a match {
            // no-arg split: whitespace runs, outer whitespace dropped
            case Seq() => Arr(s"split(trim(${sqlOf(v, line).sql}), ${sqlStr("\\s+")})")
            case Seq(Sql(sep, true)) =>
              // python separators are LITERAL — regex-quote at translate time
              val quoted = sqlStr(java.util.regex.Pattern.quote(rawStr(sep)))
              Arr(s"split(${sqlOf(v, line).sql}, $quoted, -1)")
            case _ => err(".split separator must be a string literal (or absent)")
          }
        case (v, Some("find")) if a.length == 1 && v.isInstanceOf[Sql] =>
          // python find: -1 when absent; instr: 0 when absent — the -1 aligns both
          Sql(s"(instr(${sqlOf(v, line).sql}, ${sqlOf(a.head, line).sql}) - 1)")
        case (v, Some("count")) if a.length == 1 && v.isInstanceOf[Sql] =>
          a.head match {
            case Sql(sub, true) =>
              val quoted = sqlStr(java.util.regex.Pattern.quote(rawStr(sub)))
              Sql(s"(size(split(${sqlOf(v, line).sql}, $quoted, -1)) - 1)")
            case _ => err(".count argument must be a string literal")
          }
        case (v, Some("zfill")) if a.length == 1 && v.isInstanceOf[Sql] =>
          // lpad TRUNCATES a longer string; python zfill never does
          val (s, n) = (sqlOf(v, line).sql, sqlOf(a.head, line).sql)
          Sql(s"if(length($s) >= $n, $s, lpad($s, $n, '0'))", isString = true)
        case (v, Some("rjust" | "ljust")) if a.nonEmpty && a.length <= 2 && v.isInstanceOf[Sql] =>
          val (s, n) = (sqlOf(v, line).sql, sqlOf(a.head, line).sql)
          val pad = a.lift(1).map(p => sqlOf(p, line).sql).getOrElse("' '")
          val f = if (method.contains("rjust")) "lpad" else "rpad"
          Sql(s"if(length($s) >= $n, $s, $f($s, $n, $pad))", isString = true)
        case (Json(src), Some("get")) =>
          if (a.isEmpty) err(".get() needs a key")
          val key = a.head match {
            case Sql(lit, true) => lit.stripPrefix("'").stripSuffix("'")
            case _ => err(".get key must be a string literal")
          }
          val base = s"get_json_object(${sqlOf(src, line).sql}, '$$.$key')"
          a.lift(1) match {
            case Some(Sql(d, isStr)) if d != "NULL" => Sql(s"coalesce($base, $d)", isStr)
            case _ => Sql(base, isString = true) // {} default → NULL (documented divergence)
          }
        case (f: Func, None) => applyFunc(f, a)
        case (other, m) => err(s"call on $other${m.fold("")("." + _)}")
      }
    }

    private def builtinCall(fn: String, a: Seq[V]): V = fn match {
      case "str" => Sql(s"CAST(${sqlOf(a.head, line).sql} AS STRING)", isString = true)
      case "int" => Sql(s"CAST(${sqlOf(a.head, line).sql} AS BIGINT)")
      case "float" => Sql(s"CAST(${sqlOf(a.head, line).sql} AS DOUBLE)")
      case "len" => a.head match {
        case Arr(arr) => Sql(s"size($arr)")
        case v => Sql(s"length(${sqlOf(v, line).sql})")
      }
      case "abs" => Sql(s"abs(${sqlOf(a.head, line).sql})")
      case "round" =>
        if (a.length == 2) Sql(s"round(${sqlOf(a.head, line).sql}, ${sqlOf(a(1), line).sql})")
        else Sql(s"round(${sqlOf(a.head, line).sql})")
      case "min" | "max" =>
        if (a.length < 2) err(s"$fn() needs 2+ scalar arguments",
          "min/max over a list has no row-local SQL form — use a groupBy aggregate.")
        val f = if (fn == "min") "least" else "greatest"
        Sql(s"$f(${a.map(sqlOf(_, line).sql).mkString(", ")})")
    }

    /** A bare row-column reference (atom emits them as `` `col` ``). */
    private def isColumnRef(s: String): Boolean =
      s.length > 2 && s.head == '`' && s.last == '`' && !s.substring(1, s.length - 1).contains('`')

    private def subscript(v: V, key: V): V = (v, key) match {
      case (Dict(fields), Sql(lit, true)) =>
        val k = lit.stripPrefix("'").stripSuffix("'")
        fields.collectFirst { case (`k`, fv) => fv }
          .getOrElse(err(s"dict has no key '$k'"))
      case (Json(src), Sql(lit, true)) =>
        val k = lit.stripPrefix("'").stripSuffix("'")
        Json(Sql(s"get_json_object(${sqlOf(src, line).sql}, '$$.$k')", isString = true))
      case (Json(src), Sql(lit, false)) if lit.forall(_.isDigit) =>
        Json(Sql(s"get_json_object(${sqlOf(src, line).sql}, '$$[$lit]')", isString = true))
      // row['col']['key'] — a row field subscripted by a string/index key
      // is a JSON-string column (what a rest stage writes, countries.yml:
      // row['response']['region']). The reference raises a per-row
      // TypeError here and keeps the row unchanged (filefilter.py:38-50);
      // graft compiles to get_json_object, which extracts the value when
      // the column IS JSON and yields NULL when it isn't — documented
      // divergence (the column appears, NULL-filled, instead of a
      // silently-counted error).
      case (Sql(col, _), k @ Sql(_, true)) if isColumnRef(col) =>
        subscript(Json(Sql(col, isString = true)), k)
      case (Sql(col, _), k @ Sql(lit, false)) if isColumnRef(col) && lit.forall(_.isDigit) =>
        subscript(Json(Sql(col, isString = true)), k)
      // python list indexing on a .split(...) result: 0-based from the
      // front, negatives from the end — element_at is 1-based front,
      // negative-from-end, so only non-negative indexes shift
      case (Arr(arr), Sql(lit, false))
          if lit.replaceAll("[()\\s]", "").matches("-?\\d+") =>
        val i = lit.replaceAll("[()\\s]", "").toLong
        Sql(s"element_at($arr, ${if (i >= 0) i + 1 else i})", isString = true)
      case (Arr(_), _) => err("list index must be an integer literal",
        "Python-side dynamic indexes have no bounds semantics in SQL (element_at throws past the end).")
      case _ => err("subscript on a non-dict value",
        "Only dict-literal, json.loads(...), row['col'] JSON-string and .split(...) list values can be subscripted.")
    }

    def boolOf(v: V): String = v match {
      case Sql(s, false) => s
      case Sql(s, true) => err(s"string value $s used as a condition",
        "Write an explicit comparison.")
      case other => err(s"$other used as a condition")
    }

    /** Inline a user function call: bind params, run the body. */
    private def applyFunc(f: Func, args: Seq[V]): V = {
      if (args.length != f.params.length)
        err(s"function defined at line ${f.defLine} called with ${args.length} args, expects ${f.params.length}")
      val child = mutable.Map[String, V]() ++= env
      f.params.zip(args).foreach { case (p, a) => child.put(p, a) }
      evalBody(f.body, child)
        .getOrElse(err(s"function defined at line ${f.defLine} has no return on some path",
          "Every branch must return a value."))
    }
  }

  /** Evaluate a def body (bindings, if/elif/else of returns, return). */
  private def evalBody(body: Seq[Stmt], env: mutable.Map[String, V]): Option[V] = {
    body.foreach {
      case SBind(n, toks, line) => env.put(n, new ExprParser(toks, env, line).parseFull())
      case SReturn(toks, line) => return Some(new ExprParser(toks, env, line).parseFull())
      case SIf(branches, line) =>
        // every branch must be a single return → CASE WHEN chain
        val parts = branches.map { case (condToks, stmts) =>
          val ret = stmts match {
            case Seq(SReturn(toks, l)) => new ExprParser(toks, env, l).parseFull()
            case other => throw new MigrationError(line,
              s"if/elif branch with ${other.length} statement(s)",
              "Each branch must be a single 'return <expr>'.")
          }
          (condToks.map(ct => { val p = new ExprParser(ct, env, line); p.boolOf(p.parseFull()) }), ret)
        }
        val hasElse = parts.exists(_._1.isEmpty)
        val whens = parts.collect { case (Some(c), v) => s"WHEN $c THEN ${sqlOf(v, line).sql}" }
        val elseSql = parts.collectFirst { case (None, v) => sqlOf(v, line).sql }
        val isStr = parts.exists(_._2 match { case Sql(_, s) => s; case _ => false })
        if (!hasElse)
          return Some(Sql(s"CASE ${whens.mkString(" ")} ELSE NULL END", isStr))
        return Some(Sql(s"CASE ${whens.mkString(" ")} ELSE ${elseSql.get} END", isStr))
      case SRow(_, _, line) => throw new MigrationError(line, "row assignment inside a function", "")
      case SDef(n, _, _, line) => throw new MigrationError(line, s"nested def '$n'", "")
      case SImport(_, line) => throw new MigrationError(line, "import inside a function", "")
    }
    None
  }

  /** Translate a reference `python` stage's code block into ordered
    * (columnName, sparkSqlExpr) derive columns.
    */
  def toDeriveColumns(code: String): Seq[(String, String)] = {
    val stmts = parseBlock(logicalLines(code))
    val env = mutable.Map[String, V]()
    val out = Seq.newBuilder[(String, String)]
    stmts.foreach {
      case SImport(binds, _) => binds.foreach { case (alias, mod) => env.put(alias, Module(mod)) }
      case SDef(name, params, body, line) => env.put(name, Func(params, body, line))
      case SBind(name, toks, line) => env.put(name, new ExprParser(toks, env, line).parseFull())
      case SRow(colName, toks, line) =>
        val v = new ExprParser(toks, env, line).parseFull()
        val sql = sqlOf(v, line).sql
        out += ((colName, sql))
        // later statements can read the new column
        env.put(colName, Sql(s"`$colName`"))
      case SIf(branches, line) =>
        // module-level if/elif/else whose branches assign row columns:
        // each column assigned in ANY branch becomes one CASE over the
        // branch conditions; a branch that does not assign the column
        // keeps its prior value (the existing column if bound earlier in
        // this block, else NULL — python's missing-key-on-that-path).
        val evaluated = branches.map { case (condToks, stmts) =>
          val cond = condToks.map { ct =>
            val p = new ExprParser(ct, env, line); p.boolOf(p.parseFull())
          }
          // per-branch env: an assignment binds its INLINED value, so a
          // later read in the same branch sees this branch's value no
          // matter which order the per-column CASEs are emitted in —
          // python's sequential dataflow even when two branches assign
          // the same columns in opposite def-use order (ADVICE r6)
          val branchEnv = env.clone()
          val assigns = stmts.map {
            case SRow(c, toks, l) =>
              val v = new ExprParser(toks, branchEnv, l).parseFull()
              branchEnv.put(s"row['$c']", v)
              (c, v)
            case other => throw new MigrationError(other.line,
              "statement other than row['...'] = ... inside a module-level if branch",
              "Branches of a module-level if may only assign row columns.")
          }
          (cond, assigns)
        }
        val assignedCols = evaluated.flatMap(_._2.map(_._1)).distinct
        // Python evaluates the branch conditions ONCE, before any branch
        // body runs; our per-column CASEs re-evaluate them inside every
        // withColumn, so a column the conditions READ must be
        // overwritten LAST — after every other CASE has read its pre-if
        // value. Two such columns cannot both be ordered last →
        // actionable error instead of a silent one-branch divergence.
        val condSqls = evaluated.flatMap(_._1)
        val condRead = assignedCols.filter(c => condSqls.exists(_.contains(s"`$c`")))
        if (condRead.size > 1)
          throw new MigrationError(line,
            s"if branches assign columns their conditions read (${condRead.mkString(", ")})",
            "At most one condition-read column may be assigned in a module-level " +
              "if; bind the condition inputs to fresh names first.")
        val ordered = assignedCols.filterNot(condRead.contains) ++ condRead
        ordered.foreach { colName =>
          val fallback = if (env.contains(colName)) s"`$colName`" else "NULL"
          def valueIn(assigns: Seq[(String, V)]): String =
            assigns.reverse.collectFirst { case (`colName`, vv) => sqlOf(vv, line).sql }
              .getOrElse(fallback)
          val whens = evaluated.collect { case (Some(c), assigns) =>
            s"WHEN $c THEN ${valueIn(assigns)}"
          }
          val elseVal = evaluated.collectFirst { case (None, assigns) => valueIn(assigns) }
            .getOrElse(fallback)
          out += ((colName, s"CASE ${whens.mkString(" ")} ELSE $elseVal END"))
          env.put(colName, Sql(s"`$colName`"))
        }
      case SReturn(_, line) => throw new MigrationError(line, "module-level return", "")
    }
    val cols = out.result()
    if (cols.isEmpty)
      throw new IllegalArgumentException(
        "python stage migration: the code block assigns no row['...'] columns; " +
          "nothing to translate. Re-express the stage as 'derive', 'sql' or 'transform'.")
    cols
  }
}
