package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the r14 sixth probe sweep's function closures —
  * invoked via `StaticInvoke` (codegen'd, null-propagating). Every
  * behavior probed against duckdb 1.0.0; see the DuckDialect builders
  * for the per-function notes.
  */
object DuckSweep {

  /** DuckDB `format_bytes`/`formatReadableSize`: binary (KiB) units,
    * value TRUNCATED to one decimal (probed: 1556480 → '1.4 MiB'),
    * '1 byte' singular, sign carried through.
    */
  def formatBytes(n: Long): UTF8String = {
    // math.abs(Long.MinValue) overflows (stays negative) and would fall
    // into the `< 1024` raw-bytes branch; its magnitude is exactly 2^63
    // = 8192 PiB (DuckDB 1.0.0's units stop at PiB — probed:
    // format_bytes(2^60) = '1024.0 PiB', max Long = '8191.9 PiB').
    if (n == Long.MinValue) return UTF8String.fromString("-8192.0 PiB")
    val neg = n < 0
    var a = math.abs(n)
    if (a < 1024)
      return UTF8String.fromString(
        if (a == 1L) s"$n byte" else s"$n bytes")
    val units = Array("KiB", "MiB", "GiB", "TiB", "PiB")
    // DuckDB truncates with INTEGER division at each unit step (probed:
    // 1363729 → '1.2 MiB', though 1363729/2^20 = 1.3006 — the value
    // first floors to 1331 KiB, then 1331/1024 truncates to 1.2)
    var u = 0
    while (a >= 1024L * 1024L && u < units.length - 1) { a /= 1024L; u += 1 }
    val t = a * 10L / 1024L
    UTF8String.fromString((if (neg) "-" else "") + s"${t / 10}.${t % 10} ${units(u)}")
  }

  /** `formatReadableDecimalSize`: decimal (kB/MB/…) units, same
    * truncate-to-one-decimal rule (probed: 1460000 → '1.4 MB',
    * 1000 → '1.0 kB').
    */
  def formatBytesDecimal(n: Long): UTF8String = {
    // 2^63 → '-9223.3 PB' (abs would overflow; DuckDB 1.0.0 stops at
    // PB — probed: max Long = '9223.3 PB')
    if (n == Long.MinValue) return UTF8String.fromString("-9223.3 PB")
    val neg = n < 0
    var a = math.abs(n)
    if (a < 1000)
      return UTF8String.fromString(
        if (a == 1L) s"$n byte" else s"$n bytes")
    val units = Array("kB", "MB", "GB", "TB", "PB")
    var u = 0
    while (a >= 1000L * 1000L && u < units.length - 1) { a /= 1000L; u += 1 }
    val t = a * 10L / 1000L
    UTF8String.fromString((if (neg) "-" else "") + s"${t / 10}.${t % 10} ${units(u)}")
  }

  /** DuckDB `regexp_escape` = RE2 QuoteMeta: backslash-escape every
    * character outside [A-Za-z0-9_] (probed: 'a-b c+d(e)' →
    * 'a\-b\ c\+d\(e\)').
    */
  def regexpEscape(s: UTF8String): UTF8String = {
    val in = s.toString
    val sb = new java.lang.StringBuilder(in.length * 2)
    in.foreach { c =>
      if (c.isLetterOrDigit && c < 128 || c == '_') sb.append(c)
      else { sb.append('\\'); sb.append(c) }
    }
    UTF8String.fromString(sb.toString)
  }

  // path components on '/' AND '\' separators (DuckDB's 'both'
  // default): leading separator becomes a root '/' element, empty
  // components drop (probed: '/a/b/c.txt' → ['/','a','b','c.txt'],
  // 'C:\a\b.txt' → ['C:','a','b.txt'])
  private def components(s: String): Array[String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    if (s.nonEmpty && (s.charAt(0) == '/' || s.charAt(0) == '\\'))
      parts += "/"
    s.split("[/\\\\]").foreach(p => if (p.nonEmpty) parts += p)
    parts.toArray
  }

  def parsePath(s: UTF8String): ArrayData =
    new GenericArrayData(components(s.toString)
      .map(p => UTF8String.fromString(p).asInstanceOf[Any]))

  /** FIRST path component when the path has more than one, else ''
    * (probed: 'a/b' → 'a', 'c.txt' → '', '/a/b/c.txt' → '/').
    */
  def parseDirname(s: UTF8String): UTF8String = {
    val parts = components(s.toString)
    UTF8String.fromString(if (parts.length > 1) parts.head else "")
  }

  /** Path up to (excluding) the LAST separator (probed: '/c.txt' → '',
    * 'a/b/c/' → 'a/b/c').
    */
  def parseDirpath(s: UTF8String): UTF8String = {
    val in = s.toString
    val i = math.max(in.lastIndexOf('/'), in.lastIndexOf('\\'))
    UTF8String.fromString(if (i < 0) "" else in.substring(0, i))
  }

  /** LAST path component; trimExtension strips from the last '.'
    * (probed: '.bashrc' with trim → '').
    */
  def parseFilename(s: UTF8String, trimExtension: Boolean): UTF8String = {
    val in = s.toString
    val i = math.max(in.lastIndexOf('/'), in.lastIndexOf('\\'))
    var f = if (i < 0) in else in.substring(i + 1)
    if (trimExtension) {
      val d = f.lastIndexOf('.')
      if (d >= 0) f = f.substring(0, d)
    }
    UTF8String.fromString(f)
  }

  /** Julian Day as DOUBLE with midnight = .0 (probed: DuckDB's julian
    * of 1970-01-01 is 2440588.0, noon adds .5).
    */
  def julianUs(us: Long): Double = {
    val day = Math.floorDiv(us, TimeBucketKernel.DayUs)
    day + 2440588.0 + (us - day * TimeBucketKernel.DayUs).toDouble / 86400.0e6
  }

  // grapheme-cluster segmentation (java.text.BreakIterator — the same
  // UAX#29 defaults utf8proc implements; probed: a ZWJ emoji family is
  // ONE cluster, combining marks attach)
  private def clusters(s: String): Array[String] = {
    val bi = java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
    bi.setText(s)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      out += s.substring(start, end)
      start = end
      end = bi.next()
    }
    out.toArray
  }

  def lengthGrapheme(s: UTF8String): Int = clusters(s.toString).length

  /** DuckDB `chr` is CODE-POINT based (chr(769) = U+0301); Spark's is
    * mod-256 ASCII. Invalid code points error like DuckDB's.
    */
  def chrCodepoint(n: Int): UTF8String =
    UTF8String.fromString(new String(Character.toChars(n)))

  /** left/right with DuckDB's negative rule: drop |n| clusters from the
    * other end (the left/right treatment).
    */
  def leftGrapheme(s: UTF8String, n: Int): UTF8String = {
    val cs = clusters(s.toString)
    val k = if (n >= 0) math.min(n, cs.length) else math.max(cs.length + n, 0)
    UTF8String.fromString(cs.take(k).mkString)
  }

  def rightGrapheme(s: UTF8String, n: Int): UTF8String = {
    val cs = clusters(s.toString)
    val k = if (n >= 0) math.min(n, cs.length) else math.max(cs.length + n, 0)
    UTF8String.fromString(cs.takeRight(k).mkString)
  }

  /** substring over clusters with DuckDB's substring rules (probed):
    * start ≥ 0 clips on the [1, L] axis (start 0 consumes a slot of
    * len); start < 0 counts from the end and CLAMPS to 1 keeping len.
    * len < 0 encodes the 2-arg to-the-end form.
    */
  def substringGrapheme(s: UTF8String, start: Int, len: Int): UTF8String = {
    val cs = clusters(s.toString)
    val L = cs.length
    val (lo, hi) =
      if (start >= 0) {
        val h = if (len < 0) L else start + len - 1
        (math.max(start, 1), math.min(h, L))
      } else {
        val p = math.max(1, L + start + 1)
        val h = if (len < 0) L else p + len - 1
        (p, math.min(h, L))
      }
    if (hi < lo) UTF8String.fromString("")
    else UTF8String.fromString(cs.slice(lo - 1, hi).mkString)
  }

  /** IEEE sign bit (probed: signbit(-2.5) TRUE, signbit(0.0) FALSE). */
  def signbit(x: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(x) < 0

  /** DuckDB's round(DOUBLE, p): scaled half-away-from-zero on the
    * EXACT binary value — `round(x·10^p)/10^p` in double arithmetic
    * (probed 1.0.0: round(0.0640625, 6) → 0.064062 because
    * 0.0640625·1e6 = 64062.49999…; round(1.005, 2) → 1.0;
    * round(0.125, 2) → 0.13 — half away, not half even). Spark's own
    * Round goes through BigDecimal.valueOf's SHORTEST-DECIMAL repr and
    * reads 0.064063/1.01/0.13 — a silent divergence the differential
    * fuzzer surfaced through round(cume_dist(), 6) (r18, seed 112).
    * Negative p divides first (round(123.456, -1) → 120, probed);
    * an infinite scaled product passes the input through
    * (round(1e308, 2) → 1e308, probed); NaN/±Inf/±0.0 pass through
    * sign-preserved (round(-0.0, 2) → -0.0, probed); a power-of-ten
    * overflow on negative p yields 0.0 (round(5.0, -400) → 0.0,
    * probed).
    */
  def duckRound(x: Double, p: Int): Double = {
    if (x.isNaN || x.isInfinite || x == 0.0d) return x
    def halfAway(v: Double): Double =
      if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)
    if (p >= 0) {
      val power = math.pow(10.0, p.toDouble)
      val scaled = x * power
      if (scaled.isInfinite) x else halfAway(scaled) / power
    } else {
      val power = math.pow(10.0, (-p).toDouble)
      if (power.isInfinite) return 0.0d
      halfAway(x / power) * power
    }
  }

  private def md5Half(s: UTF8String, offset: Int): org.apache.spark.sql.types.Decimal = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
    var v = java.math.BigInteger.ZERO
    var i = 7
    while (i >= 0) { // little-endian u64
      v = v.shiftLeft(8).or(java.math.BigInteger.valueOf((d(offset + i) & 0xff).toLong))
      i -= 1
    }
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(v), 20, 0)
  }

  /** DuckDB `md5_number_lower/upper` (probed): the digest's LAST /
    * FIRST 8 bytes as a LITTLE-endian unsigned 64-bit number.
    */
  def md5NumberLower(s: UTF8String): org.apache.spark.sql.types.Decimal = md5Half(s, 8)
  def md5NumberUpper(s: UTF8String): org.apache.spark.sql.types.Decimal = md5Half(s, 0)

  /** DuckDB `md5_number` (r16, probed): the full 16-byte digest as a
    * LITTLE-endian SIGNED 128-bit number (md5_number('b') is negative).
    * DuckDB types it HUGEINT; Spark's widest exact numeric,
    * DECIMAL(38,0), cannot carry int128 (|HUGEINT| reaches ~1.7e38 >
    * 1e38-1), so graft renders the decimal DIGITS as VARCHAR —
    * `CAST(md5_number(x) AS VARCHAR)` is then byte-identical
    * cross-engine text, and the 64-bit halves (md5_number_lower/upper)
    * remain the numeric route for sharding arithmetic.
    */
  def md5Number(s: UTF8String): UTF8String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
    val be = new Array[Byte](16)
    var i = 0
    while (i < 16) { be(i) = d(15 - i); i += 1 } // LE digest → BigInteger's BE
    UTF8String.fromString(new java.math.BigInteger(be).toString)
  }

  /** DuckDB `age(a, b)` (r16, probed 1.0.0 — Postgres's symbolic
    * subtraction): field-wise calendar difference with single-step
    * borrowing; the day borrow adds the EARLIER operand's month length
    * (always sufficient: |day diff| < that month's length), and
    * `age(a, b) = -age(b, a)` (probed: DuckDB negates every field).
    * DuckDB returns INTERVAL; Spark's CalendarIntervalType is neither
    * orderable nor parquet-writable, so graft renders DuckDB's VARCHAR
    * form directly (probed: singular/plural unit names, zero components
    * omitted, time part omitted when zero unless EVERYTHING is zero →
    * '00:00:00', uniform sign with '-' on each component, fractional
    * seconds trimmed of trailing zeros) — `CAST(age(..) AS VARCHAR)` is
    * byte-identical cross-engine text; interval arithmetic on the
    * result is not claimed (use date_diff for a single unit).
    */
  def ageInterval(aUs: Long, bUs: Long): UTF8String = {
    val neg = aUs < bUs
    val (hiUs, loUs) = if (neg) (bUs, aUs) else (aUs, bUs)
    def ldt(us: Long): java.time.LocalDateTime =
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    val t1 = ldt(hiUs)
    val t2 = ldt(loUs)
    var years = t1.getYear - t2.getYear
    var months = t1.getMonthValue - t2.getMonthValue
    var days = t1.getDayOfMonth - t2.getDayOfMonth
    var hours = t1.getHour - t2.getHour
    var minutes = t1.getMinute - t2.getMinute
    var seconds = t1.getSecond - t2.getSecond
    var micros = (t1.getNano - t2.getNano) / 1000
    if (micros < 0) { micros += 1000000; seconds -= 1 }
    if (seconds < 0) { seconds += 60; minutes -= 1 }
    if (minutes < 0) { minutes += 60; hours -= 1 }
    if (hours < 0) { hours += 24; days -= 1 }
    if (days < 0) { days += t2.toLocalDate.lengthOfMonth; months -= 1 }
    if (months < 0) { months += 12; years -= 1 }
    val sb = new StringBuilder
    val sign = if (neg) -1 else 1
    def unit(v: Int, name: String): Unit = if (v != 0) {
      if (sb.nonEmpty) sb += ' '
      sb ++= (v * sign).toString
      sb += ' '
      sb ++= name
      if (v != 1) sb += 's'
    }
    unit(years, "year")
    unit(months, "month")
    unit(days, "day")
    val timeUs = ((hours * 60L + minutes) * 60L + seconds) * 1000000L + micros
    if (timeUs != 0 || sb.isEmpty) {
      if (sb.nonEmpty) sb += ' '
      if (neg && timeUs != 0) sb += '-'
      sb ++= f"$hours%02d:$minutes%02d:$seconds%02d"
      if (micros != 0) {
        var frac = micros.toString
        frac = "0" * (6 - frac.length) + frac
        while (frac.endsWith("0")) frac = frac.dropRight(1)
        sb += '.'
        sb ++= frac
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** DuckDB `json_type` (1-arg; probed): OBJECT / ARRAY / VARCHAR /
    * BOOLEAN / NULL; numbers classify LEXICALLY like yyjson — a plain
    * integer literal is UBIGINT (fits u64) / BIGINT (negative, fits
    * i64) / DOUBLE (overflow), and anything written with a '.' or
    * exponent is DOUBLE even when integral-valued ('12.0', '1e3');
    * malformed input errors like DuckDB's.
    */
  def duckJsonType(s: UTF8String): UTF8String = {
    val in = s.toString.trim
    def fail(): Nothing = throw new IllegalArgumentException(
      s"Malformed JSON in json_type: '${in.take(40)}'")
    if (in.isEmpty) fail()
    val t = in.charAt(0) match {
      case '{' => "OBJECT"
      case '[' => "ARRAY"
      case '"' => "VARCHAR"
      case 't' | 'f' =>
        if (in == "true" || in == "false") "BOOLEAN" else fail()
      case 'n' => if (in == "null") "NULL" else fail()
      case c if c == '-' || c.isDigit =>
        // yyjson lexes, it doesn't normalize: any number WRITTEN with a
        // decimal point or exponent is DOUBLE even when integral-valued
        // ('12.0', '1e3'); plain integer literals are UBIGINT (fits
        // u64), BIGINT (negative, fits i64), else DOUBLE on overflow.
        if (in.exists(ch => ch == '.' || ch == 'e' || ch == 'E')) {
          try { new java.math.BigDecimal(in); "DOUBLE" }
          catch { case _: NumberFormatException => fail() }
        } else try {
          val bi = new java.math.BigInteger(in)
          // the SIGN CHARACTER decides the signed/unsigned read (probed:
          // json_type('-0') = BIGINT), not the value's signum
          if (in.charAt(0) == '-') (if (bi.bitLength <= 63) "BIGINT" else "DOUBLE")
          else (if (bi.bitLength <= 64) "UBIGINT" else "DOUBLE")
        } catch { case _: NumberFormatException => fail() }
      case _ => fail()
    }
    UTF8String.fromString(t)
  }

  /** DuckDB `bar(v, min, max[, width=80])` (probed 1.0.0): unicode
    * block bar — `frac = clamp((v-min)/(max-min), 0, 1)` (a reversed or
    * empty range renders empty), `full = floor(frac·width)` FULL BLOCKS
    * plus one eighth-block for `floor(frac·width%1 · 8)` eighths, then
    * space padding computed against the bar's BYTE length (each block
    * char is 3 UTF-8 bytes — DuckDB pads `width - strlen(bar)`, probed:
    * bar(2.5,0,10,8) = 2 blocks + 2 spaces, bar(0,0,10,8) = 8 spaces).
    */
  def bar(v: Double, lo: Double, hi: Double, width: Double): UTF8String = {
    if (width < 1)
      throw new IllegalArgumentException("Max bar width must be >= 1")
    var frac = if (hi <= lo) 0.0 else (v - lo) / (hi - lo)
    if (frac.isNaN) frac = 0.0
    frac = math.max(0.0, math.min(1.0, frac))
    val blocks = frac * width
    val full = math.floor(blocks).toInt
    val eighths = math.floor((blocks - full) * 8.0).toInt
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < full) { sb.append('█'); i += 1 }
    if (eighths > 0) sb.append("▏▎▍▌▋▊▉".charAt(eighths - 1))
    val chars = full + (if (eighths > 0) 1 else 0)
    var pad = math.max(0, math.round(width).toInt - 3 * chars)
    while (pad > 0) { sb.append(' '); pad -= 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Backs the `icu_collate_<locale>` family and `icu_sort_key` (see
    * the DuckDialect registration notes): locale collation key as
    * uppercase hex. Collator instances are NOT thread-safe —
    * thread-local cache keyed by the locale tag.
    */
  private val tlCollators =
    ThreadLocal.withInitial[java.util.HashMap[String, java.text.Collator]](
      () => new java.util.HashMap[String, java.text.Collator]())

  def icuCollateKey(s: UTF8String, tag: UTF8String): UTF8String = {
    val t = tag.toString
    val m = tlCollators.get()
    var col = m.get(t)
    if (col == null) {
      val parts = t.split("_")
      val loc =
        if (parts.length > 1) new java.util.Locale(parts(0), parts(1).toUpperCase)
        else new java.util.Locale(parts(0))
      col = java.text.Collator.getInstance(loc)
      m.put(t, col)
    }
    val bytes = col.getCollationKey(s.toString).toByteArray
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append("%02X".format(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** DuckDB `array_cross_product` (probed 1.0.0): 3-d cross product
    * over DOUBLE[3]; wrong lengths or NULL slots error like DuckDB's
    * typed ARRAY requirement.
    */
  def crossProduct(a: ArrayData, b: ArrayData): ArrayData = {
    if (a.numElements != 3 || b.numElements != 3)
      throw new IllegalArgumentException(
        "array_cross_product needs two 3-element lists, got " +
          s"${a.numElements} and ${b.numElements}")
    var i = 0
    while (i < 3) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          "array_cross_product: NULL element (DuckDB's DOUBLE[3] arrays are non-null)")
      i += 1
    }
    val (a1, a2, a3) = (a.getDouble(0), a.getDouble(1), a.getDouble(2))
    val (b1, b2, b3) = (b.getDouble(0), b.getDouble(1), b.getDouble(2))
    new GenericArrayData(Array(a2 * b3 - a3 * b2, a3 * b1 - a1 * b3, a1 * b2 - a2 * b1))
  }

  private lazy val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parseJson(s: UTF8String, fn: String): com.fasterxml.jackson.databind.JsonNode =
    try jsonMapper.readTree(s.toString)
    catch { case _: Exception => throw new IllegalArgumentException(
      s"Malformed JSON in $fn: '${s.toString.take(40)}'") }

  /** DuckDB `json_structure` (probed 1.0.0): objects map each key to
    * its value's structure; arrays MERGE their element structures with
    * DuckDB's refinement rules (probed: '[1,2.5]' → ["DOUBLE"],
    * '["a",null]' → ["VARCHAR"], '[-1,1]' → ["BIGINT"],
    * '[{"a":1},{"b":2.5}]' → key-union objects) — NULL coalesces into
    * any sibling, BIGINT absorbs UBIGINT, DOUBLE absorbs both integral
    * kinds, objects union keys recursively, arrays merge element-wise,
    * and genuinely incompatible kinds (number vs VARCHAR, object vs
    * array, …) collapse to "JSON". An object that ends up with zero
    * keys renders "JSON" ('{}' and '[{}]' probes); an empty array is
    * the NULL element structure (["NULL"]). One lexical divergence:
    * '-0' classifies UBIGINT here (Jackson normalizes the sign away)
    * where DuckDB says BIGINT.
    */
  def jsonStructure(s: UTF8String): UTF8String =
    UTF8String.fromString(renderStruct(structOf(parseJson(s, "json_structure"))))

  // Structure tree: objects keep first-seen key order (LinkedHashMap,
  // matching DuckDB's key-union output order), arrays carry one merged
  // element structure, scalars carry the DuckDB type-name kind.
  private sealed trait JStruct
  private final case class JObj(
      fields: scala.collection.mutable.LinkedHashMap[String, JStruct]) extends JStruct
  private final case class JArr(elem: JStruct) extends JStruct
  private final case class JScalar(kind: String) extends JStruct

  private val JNull = JScalar("NULL")

  private def structOf(n: com.fasterxml.jackson.databind.JsonNode): JStruct = {
    import scala.jdk.CollectionConverters._
    if (n.isObject) {
      val m = new scala.collection.mutable.LinkedHashMap[String, JStruct]
      n.properties().asScala.foreach(e => m.put(e.getKey, structOf(e.getValue)))
      JObj(m)
    } else if (n.isArray) {
      JArr(n.elements().asScala.map(structOf)
        .foldLeft(JNull: JStruct)(mergeStruct))
    } else JScalar(scalarJsonType(n))
  }

  private def mergeStruct(a: JStruct, b: JStruct): JStruct = (a, b) match {
    case (JScalar("NULL"), _) => b
    case (_, JScalar("NULL")) => a
    case (JObj(fa), JObj(fb)) =>
      fb.foreach { case (k, v) =>
        fa.put(k, fa.get(k).fold(v)(mergeStruct(_, v)))
      }
      JObj(fa)
    case (JArr(ea), JArr(eb)) => JArr(mergeStruct(ea, eb))
    case (JScalar(x), JScalar(y)) =>
      if (x == y) a
      else if ((x == "BIGINT" || x == "UBIGINT") && (y == "BIGINT" || y == "UBIGINT"))
        JScalar("BIGINT")
      else if ((x == "DOUBLE" || x == "BIGINT" || x == "UBIGINT") &&
               (y == "DOUBLE" || y == "BIGINT" || y == "UBIGINT"))
        JScalar("DOUBLE")
      else JScalar("JSON")
    case _ => JScalar("JSON")
  }

  private def renderStruct(s: JStruct): String = s match {
    case JObj(fields) =>
      if (fields.isEmpty) "\"JSON\""
      else fields.iterator
        .map { case (k, v) => jsonMapper.writeValueAsString(k) + ":" + renderStruct(v) }
        .mkString("{", ",", "}")
    case JArr(elem) => "[" + renderStruct(elem) + "]"
    case JScalar(kind) => "\"" + kind + "\""
  }

  private def scalarJsonType(n: com.fasterxml.jackson.databind.JsonNode): String =
    if (n.isTextual) "VARCHAR"
    else if (n.isBoolean) "BOOLEAN"
    else if (n.isNull) "NULL"
    else if (n.isFloatingPointNumber || n.isBigDecimal) "DOUBLE"
    else { // integral: sign decides the signed/unsigned read (yyjson)
      val bi = n.bigIntegerValue
      if (bi.signum < 0) (if (bi.bitLength <= 63) "BIGINT" else "DOUBLE")
      else (if (bi.bitLength <= 64) "UBIGINT" else "DOUBLE")
    }

  /** DuckDB `json_contains(haystack, needle)` (probed 1.0.0): true when
    * the needle value appears anywhere in the haystack — objects match
    * by key-subset (every needle field matched in the candidate),
    * arrays by element-subset ([1,2] contains [2,1]), scalars by value
    * equality (numbers numerically), and the search recurses into every
    * object field and array element.
    */
  def jsonContains(h: UTF8String, n: UTF8String): Boolean = {
    val hay = parseJson(h, "json_contains")
    val nee = parseJson(n, "json_contains")
    containsNode(hay, nee)
  }

  private def containsNode(h: com.fasterxml.jackson.databind.JsonNode,
                           n: com.fasterxml.jackson.databind.JsonNode): Boolean = {
    import scala.jdk.CollectionConverters._
    matchesNode(h, n) ||
      (if (h.isObject) h.properties().asScala.exists(e => containsNode(e.getValue, n))
       else if (h.isArray) h.elements().asScala.exists(containsNode(_, n))
       else false)
  }

  private def matchesNode(h: com.fasterxml.jackson.databind.JsonNode,
                          n: com.fasterxml.jackson.databind.JsonNode): Boolean = {
    import scala.jdk.CollectionConverters._
    if (n.isObject && h.isObject)
      n.properties().asScala.forall(e =>
        h.has(e.getKey) && matchesNode(h.get(e.getKey), e.getValue))
    else if (n.isArray && h.isArray)
      n.elements().asScala.forall(ne =>
        h.elements().asScala.exists(he => matchesNode(he, ne)))
    else if (n.isNumber && h.isNumber)
      h.decimalValue.compareTo(n.decimalValue) == 0
    else h == n
  }

  // ------------------------------------------------------------------
  // fmt-spec `format()` (r17): DuckDB's `format('{:spec}', x)` runs the
  // bundled fmt library; every rule below is probed against duckdb
  // 1.0.0. The big divergence from java.util.Formatter is ROUNDING:
  // fmt rounds the EXACT binary value of the double half-to-EVEN
  // ('{:.1f}' of 0.25 → '0.2' where Java's %.1f gives '0.3'), so the
  // kernels work on `new java.math.BigDecimal(v)` (the exact value)
  // with RoundingMode.HALF_EVEN throughout.

  /** Parsed `[[fill]align][sign|,][#][0][width][.prec][type]`.
    * DuckDB's fmt build parses the thousands-separator flag in the
    * SIGN slot — mutually exclusive with a sign, before '#'/'0'/width
    * (probed: `{:,10d}`, `{:,#x}`, `{:,08d}` → '0004,096' and
    * `{:*>,8d}` all execute; `{:+,d}`, `{:,+d}`, `{:10,d}`, `{:0,d}`
    * are all "missing '}'" errors). `align`/`sign`/`typ` 0 = unset;
    * `prec` -1 = unset; `width` 0 = unset (a genuine width never
    * starts with the '0' digit — that is the zero-pad flag).
    */
  private[expressions] final case class FmtSpec(fill: Char, align: Char,
      sign: Char, alt: Boolean, zero: Boolean, comma: Boolean,
      width: Int, prec: Int, typ: Char)

  private[expressions] def parseFmtSpec(spec: String): FmtSpec = {
    def bad(why: String): Nothing = throw new IllegalArgumentException(why)
    val n = spec.length
    var i = 0
    var fill = ' '
    var align = 0.toChar
    def isAlign(c: Char) = c == '<' || c == '>' || c == '^' || c == '='
    if (n >= 2 && isAlign(spec.charAt(1))) {
      fill = spec.charAt(0); align = spec.charAt(1); i = 2
    } else if (n >= 1 && isAlign(spec.charAt(0))) {
      align = spec.charAt(0); i = 1
    }
    var sign = 0.toChar
    var comma = false
    if (i < n && (spec.charAt(i) == '+' || spec.charAt(i) == '-' ||
        spec.charAt(i) == ' ')) { sign = spec.charAt(i); i += 1 }
    // printf allows BOTH a sign and the grouping flag ('%+,d' → '+42',
    // probed) while the brace grammar keeps them mutually exclusive —
    // the parse accepts both here and the format() BUILDER rejects the
    // combination (the printf builders allow it)
    if (i < n && spec.charAt(i) == ',') { comma = true; i += 1 }
    var alt = false
    if (i < n && spec.charAt(i) == '#') { alt = true; i += 1 }
    var zero = false
    if (i < n && spec.charAt(i) == '0') {
      // the zero flag overrides ANY explicit fill/align (probed:
      // '{:*>08.2f}' of -3.14159 → '-0003.14', sign-aware zero fill)
      zero = true; align = '='; fill = '0'
      i += 1
    }
    var width = 0
    while (i < n && spec.charAt(i).isDigit) {
      width = width * 10 + (spec.charAt(i) - '0'); i += 1
    }
    var prec = -1
    if (i < n && spec.charAt(i) == '.') {
      i += 1
      if (i >= n || !spec.charAt(i).isDigit)
        bad("missing precision digits after '.'")
      prec = 0
      while (i < n && spec.charAt(i).isDigit) {
        prec = prec * 10 + (spec.charAt(i) - '0'); i += 1
      }
    }
    var typ = 0.toChar
    if (i < n) {
      typ = spec.charAt(i); i += 1
      if (i < n) bad(s"unparsed trailing characters '${spec.substring(i)}'")
      if ("dboxXsfFeEgGuc".indexOf(typ) < 0)
        bad(s"""unsupported format type "$typ"""")
    }
    FmtSpec(fill, align, sign, alt, zero, comma, width, prec, typ)
  }

  /** Width/alignment pad around `prefix` (sign + radix prefix, kept
    * left of '='-aligned fill) and `body`. Width counts CODEPOINTS
    * (probed: `{:7}` of '日本語' pads 4).
    */
  private def fmtPad(prefix: String, body: String, f: FmtSpec,
                     defAlign: Char): String = {
    val len = prefix.codePointCount(0, prefix.length) +
      body.codePointCount(0, body.length)
    if (f.width <= len) return prefix + body
    val a = if (f.align != 0.toChar) f.align else defAlign
    val pad = f.fill.toString * (f.width - len)
    a match {
      case '=' => prefix + pad + body
      case '<' => prefix + body + pad
      case '^' =>
        val l = (f.width - len) / 2
        (f.fill.toString * l) + prefix + body +
          (f.fill.toString * (f.width - len - l))
      case _ => pad + prefix + body
    }
  }

  private def group3(digits: String): String = {
    val sb = new java.lang.StringBuilder
    val head = digits.length % 3
    if (head > 0) sb.append(digits, 0, head)
    var i = head
    while (i < digits.length) {
      if (sb.length > 0) sb.append(',')
      sb.append(digits, i, i + 3)
      i += 3
    }
    sb.toString
  }

  def fmtSpecLong(spec: UTF8String, v: Long): UTF8String =
    UTF8String.fromString(fmtLong(spec.toString, v))

  /** Integer presentation. Probed: negative x/o/b are SIGN-MAGNITUDE
    * ('{:x}' of -255 → '-ff', not two's complement); the thousands
    * separator forces grouped DECIMAL whatever the type char says
    * ('{:,x}' of 4096 → '4,096'); '#' prefixes 0x/0X/0b, and a C-style
    * leading '0' for octal only when nonzero; precision is rejected.
    */
  private[expressions] def fmtLong(spec: String, v: Long): String = {
    val f = parseFmtSpec(spec)
    if (f.prec >= 0)
      throw new IllegalArgumentException(
        "precision not allowed for this argument type")
    if (f.typ != 0.toChar && "dboxX".indexOf(f.typ) < 0)
      throw new IllegalArgumentException(
        s"""Invalid type specifier "${f.typ}" for formatting a value of type int""")
    val mag = java.math.BigInteger.valueOf(v).abs
    val body =
      if (f.comma) group3(mag.toString)
      else f.typ match {
        case 'x' => mag.toString(16)
        case 'X' => mag.toString(16).toUpperCase
        case 'o' => mag.toString(8)
        case 'b' => mag.toString(2)
        case _ => mag.toString
      }
    val radixPrefix =
      if (f.alt && !f.comma) f.typ match {
        case 'x' => "0x"
        case 'X' => "0X"
        case 'b' => "0b"
        case 'o' => if (v != 0L) "0" else ""
        case _ => ""
      } else ""
    val signStr =
      if (v < 0) "-"
      else if (f.sign == '+') "+"
      else if (f.sign == ' ') " "
      else ""
    fmtPad(signStr + radixPrefix, body, f, '>')
  }

  def fmtSpecDouble(spec: UTF8String, v: Double): UTF8String =
    UTF8String.fromString(fmtDouble(spec.toString, v))

  private def fmtStripZeros(s: String): String =
    if (s.indexOf('.') < 0) s
    else {
      var e = s.length
      while (s.charAt(e - 1) == '0') e -= 1
      if (s.charAt(e - 1) == '.') e -= 1
      s.substring(0, e)
    }

  /** `d.ddd e±XX` from a BigDecimal already rounded to ≤ p+1
    * significant digits of |v|; exponent is signed, minimum two digits
    * (probed: '1.000000e+300' keeps three).
    */
  private def fmtEForm(r: java.math.BigDecimal, p: Int, upper: Boolean,
                       strip: Boolean): String = {
    val x = if (r.signum == 0) 0 else r.precision - r.scale - 1
    val ds =
      (if (r.signum == 0) "0" else r.unscaledValue.toString).padTo(p + 1, '0')
    val mant =
      if (p > 0) ds.charAt(0) + "." + ds.substring(1, p + 1)
      else ds.substring(0, 1)
    val m = if (strip) fmtStripZeros(mant) else mant
    val ax = math.abs(x)
    m + (if (upper) "E" else "e") +
      (if (x < 0) "-" else "+") + (if (ax < 10) "0" + ax else ax.toString)
  }

  /** %g on the exact value: round to `p` significant digits
    * (half-even), fixed form when the decimal exponent X satisfies
    * -4 ≤ X < p, else scientific with p-1 mantissa digits; trailing
    * zeros stripped unless '#' (probed: '{:#g}' of 100.0 → '100.000').
    *
    * DuckDB's bundled fmt DIVERGES from C99 %g in the fixed branch for
    * values below 1: the first significant digit lands at decimal
    * position min(|X|, p+1) instead of |X|, silently shifting small
    * values up ('{:.1g}' of 0.0001 → '0.01', '{:.2g}' of 0.00012 →
    * '0.0012' — probed, and the min() formula differentially validated
    * against duckdb 1.0.0 on 4,000 random (value, precision) pairs
    * with zero mismatches). Reproduced bug-for-bug: hash parity with
    * the reference engine beats C99 correctness here.
    */
  private def fmtGForm(exact: java.math.BigDecimal, p: Int, upper: Boolean,
                       alt: Boolean): String = {
    val r = exact.round(new java.math.MathContext(p,
      java.math.RoundingMode.HALF_EVEN))
    val x = if (r.signum == 0) 0 else r.precision - r.scale - 1
    if (x >= -4 && x < p) {
      if (x < 0 && r.signum != 0) {
        val ds0 = r.stripTrailingZeros().unscaledValue.toString
        val pos = math.min(-x, p + 1)
        "0." + ("0" * (pos - 1)) + ds0
      } else {
        val s = r.setScale(math.max(p - 1 - x, 0),
          java.math.RoundingMode.UNNECESSARY).toPlainString
        if (alt) s else fmtStripZeros(s)
      }
    } else fmtEForm(r, p - 1, upper, strip = !alt)
  }

  /** DuckDB's default double repr (same as its VARCHAR cast, probed):
    * shortest round-tripping digits, fixed form with a forced '.0' for
    * decimal exponents in [-4, 15], scientific with a BARE single-digit
    * mantissa outside ('1e+16', '1.2345678901234568e+17', '1e-05').
    * The shortest digits come from a minimal-precision half-even
    * round-trip search on the exact value — Ryu's correctly-rounded
    * output, independent of the JDK's Double.toString vintage.
    */
  private[expressions] def fmtShortestDouble(v: Double): String = {
    if (v == 0.0) return "0.0"
    val av = math.abs(v)
    val exact = new java.math.BigDecimal(av)
    var p = 1
    var r = exact.round(new java.math.MathContext(1,
      java.math.RoundingMode.HALF_EVEN))
    while (r.doubleValue() != av && p < 17) {
      p += 1
      r = exact.round(new java.math.MathContext(p,
        java.math.RoundingMode.HALF_EVEN))
    }
    r = r.stripTrailingZeros()
    val x = r.precision - r.scale - 1
    if (x >= -4 && x <= 15) {
      val s = r.toPlainString
      if (s.indexOf('.') < 0) s + ".0" else s
    } else {
      val digits = r.unscaledValue.toString
      val mant =
        if (digits.length == 1) digits
        else digits.charAt(0) + "." + digits.substring(1)
      val ax = math.abs(x)
      mant + "e" + (if (x < 0) "-" else "+") +
        (if (ax < 10) "0" + ax else ax.toString)
    }
  }

  /** Float presentation. Probed: exact-binary-value HALF_EVEN rounding
    * ('{:.1f}' of 0.25 → '0.2'; '{:.0f}' of 1.5 → '2'; '{:.30f}' of
    * 0.1 prints the binary expansion); a literal `-0.0` parses as +0.0
    * and prints UNSIGNED ('0.00') but a true sign-bit IEEE -0.0 prints
    * SIGNED ('-0.00' — the sign comes from the raw bit, as for a
    * nonzero value that rounds to zero like -0.004); nan/inf lowercase;
    * thousands separators are rejected; `{:.N}` with no type char is
    * %g; no precision and no type is the shortest-repr VARCHAR form.
    */
  private[expressions] def fmtDouble(spec: String, v: Double): String = {
    val f = parseFmtSpec(spec)
    if (f.typ != 0.toChar && "fFeEgG".indexOf(f.typ) < 0)
      throw new IllegalArgumentException(
        s"""Invalid type specifier "${f.typ}" for formatting a value of type float""")
    if (f.comma)
      throw new IllegalArgumentException(
        "Thousand separators are not supported for floating point numbers")
    // sign comes from the IEEE sign BIT: a true -0.0 prints signed
    // ('-0.00' — probed via CAST('-0.0' AS DOUBLE); the bare -0.0
    // LITERAL parses as negated-decimal +0.0 in both engines)
    val signStr =
      if (!v.isNaN && java.lang.Double.doubleToRawLongBits(v) < 0) "-"
      else if (f.sign == '+') "+"
      else if (f.sign == ' ') " "
      else ""
    if (v.isNaN) return fmtPad(signStr, "nan", f, '>')
    if (v.isInfinity) return fmtPad(signStr, "inf", f, '>')
    val exact = new java.math.BigDecimal(math.abs(v))
    val body = f.typ match {
      case 'f' | 'F' =>
        val p = if (f.prec < 0) 6 else f.prec
        val s = exact.setScale(p, java.math.RoundingMode.HALF_EVEN)
          .toPlainString
        if (f.alt && p == 0) s + "." else s
      case 'e' | 'E' =>
        val p = if (f.prec < 0) 6 else f.prec
        fmtEForm(exact.round(new java.math.MathContext(p + 1,
          java.math.RoundingMode.HALF_EVEN)), p, f.typ == 'E', strip = false)
      case 'g' | 'G' =>
        if (f.prec == 0) throw new IllegalArgumentException(
          "precision 0 with a general float format: DuckDB's bundled fmt " +
            "emits unspecified digits here ('{:.0g}' of 9.5 → '9.5' but of " +
            "1234.0 → '1000', probed) — use precision ≥ 1")
        fmtGForm(exact, if (f.prec < 0) 6 else f.prec, f.typ == 'G', f.alt)
      case _ =>
        if (f.prec == 0) throw new IllegalArgumentException(
          "precision 0 with a general float format: DuckDB's bundled fmt " +
            "emits unspecified digits here ('{:.0g}' of 9.5 → '9.5' but of " +
            "1234.0 → '1000', probed) — use precision ≥ 1")
        if (f.prec > 0) fmtGForm(exact, f.prec, upper = false, f.alt)
        else fmtShortestDouble(v)
    }
    fmtPad(signStr, body, f, '>')
  }

  def fmtSpecFloat(spec: UTF8String, v: Float): UTF8String =
    UTF8String.fromString(fmtFloat(spec.toString, v))

  /** REAL presentation: every TYPED form ('{:.2f}', '{:e}', '{:g}' …)
    * widens exactly to double (the exact binary value is preserved, so
    * rounding matches — probed '{:.1f}' of 2.25::REAL → '2.2'), but the
    * default no-type no-precision repr uses FLOAT-width shortest digits
    * (probed: '{}' of 2.345::REAL → '2.345' — double-width shortest
    * would print the widening noise '2.3450000286102295').
    *
    * Known micro-divergence (documented, not claimed): DuckDB renders
    * floats with fmt's grisu2, which emits one-two EXTRA digits beyond
    * the shortest round-trip on ~0.7% of random bit patterns
    * ('1830800.25' where '1830800.2' already round-trips — measured on
    * 2,900 random floats). This path prints the true shortest; the
    * same divergence class already exists in every engine's
    * float→string cast (Spark's Java repr picks '1830800.2' too), no
    * gate or fuzz template stringifies raw floats.
    */
  private[expressions] def fmtFloat(spec: String, v: Float): String = {
    val f = parseFmtSpec(spec)
    if (f.typ == 0.toChar && f.prec < 0 && !f.comma &&
        !v.isNaN && !v.isInfinity) {
      val neg = java.lang.Float.floatToRawIntBits(v) < 0
      if (v == 0.0f) return fmtPad(signOf(neg, f), "0.0", f, '>')
      val av = math.abs(v)
      val exact = new java.math.BigDecimal(av.toDouble)
      var p = 1
      var r = exact.round(new java.math.MathContext(1,
        java.math.RoundingMode.HALF_EVEN))
      while (r.floatValue() != av && p < 9) {
        p += 1
        r = exact.round(new java.math.MathContext(p,
          java.math.RoundingMode.HALF_EVEN))
      }
      r = r.stripTrailingZeros()
      val x = r.precision - r.scale - 1
      val body =
        if (x >= -4 && x <= 15) {
          val s = r.toPlainString
          if (s.indexOf('.') < 0) s + ".0" else s
        } else {
          val digits = r.unscaledValue.toString
          val mant =
            if (digits.length == 1) digits
            else digits.charAt(0) + "." + digits.substring(1)
          val ax = math.abs(x)
          mant + "e" + (if (x < 0) "-" else "+") +
            (if (ax < 10) "0" + ax else ax.toString)
        }
      fmtPad(signOf(neg, f), body, f, '>')
    } else fmtDouble(spec, v.toDouble)
  }

  private def signOf(neg: Boolean, f: FmtSpec): String =
    if (neg) "-"
    else if (f.sign == '+') "+"
    else if (f.sign == ' ') " "
    else ""

  def fmtSpecString(spec: UTF8String, s: UTF8String): UTF8String =
    UTF8String.fromString(fmtStr(spec.toString, s.toString))

  /** String presentation: numeric-only pieces (sign, '#', zero-pad,
    * '=' alignment) are rejected with fmt's own message; the thousands
    * flag is silently ignored (probed: '{:,s}' of 'ab' → 'ab');
    * precision TRUNCATES to that many codepoints; default align left.
    */
  private[expressions] def fmtStr(spec: String, s0: String): String = {
    val f = parseFmtSpec(spec)
    if (f.typ != 0.toChar && f.typ != 's')
      throw new IllegalArgumentException(
        s"""Invalid type specifier "${f.typ}" for formatting a value of type string""")
    if (f.zero || f.align == '=' || f.sign != 0.toChar || f.alt)
      throw new IllegalArgumentException(
        "format specifier requires numeric argument")
    val s =
      if (f.prec < 0) s0
      else {
        val cp = s0.codePointCount(0, s0.length)
        if (cp <= f.prec) s0
        else s0.substring(0, s0.offsetByCodePoints(0, f.prec))
      }
    fmtPad("", s, f, '<')
  }

  // --- printf (r17): DuckDB's printf() runs fmt::sprintf, sharing the
  // float kernels above (probed: printf('%.1f', 0.25) → '0.2',
  // '%.1g' of 0.0001 → '0.01' — the same exact-binary rounding AND the
  // same small-value %g bug as format()). The C-only conversions get
  // their own kernels below.

  def printfRadix(spec: UTF8String, v: Long, bits: Int): UTF8String =
    UTF8String.fromString(printfRadixStr(spec.toString, v, bits))

  /** `%x/%X/%o/%b/%u`: TWO'S COMPLEMENT / unsigned reinterpretation at
    * the argument's storage width — C semantics, unlike the brace
    * form's sign-magnitude (probed: printf('%x', -255) → 'ffffff01',
    * on a BIGINT → 'ffffffffffffff01'; '%u' of -255 → '4294967041').
    * Sub-INT types promote to 32 bits like C default promotion. The
    * grouping flag forces grouped unsigned DECIMAL ('%,x' of 4096 →
    * '4,096', probed, same override as the brace form). Sign flags
    * APPLY to unsigned conversions, on the reinterpreted magnitude
    * (probed 1.0.0: '%+x' of 255 → '+ff', of -255 → '+ffffff01';
    * '% u' of 5 → ' 5'; '%#+x' → '+0xff' — sign left of the radix
    * prefix). Precision is C min-digits, zero-extending the BODY
    * string to `prec` CHARS after grouping ('%,.9x' of 4096 →
    * '00004,096', probed) and after octal's '#' merges its '0' into
    * the digits ('%#.5o' of 8 → '00010' but '%#.5x' of 255 →
    * '0x000ff' — hex/binary prefixes stay OUTSIDE the extension,
    * probed); fmt drops the precision entirely when the zero flag is
    * present ('%010.5x' of 255 → '00000000ff', '%0.5d' → '42',
    * probed — NOT C, which ignores the flag instead).
    */
  private[expressions] def printfRadixStr(spec: String, v: Long,
                                          bits: Int): String = {
    val f = parseFmtSpec(spec)
    val uv =
      if (bits == 64) {
        if (v >= 0) java.math.BigInteger.valueOf(v)
        else java.math.BigInteger.valueOf(v)
          .add(java.math.BigInteger.ONE.shiftLeft(64))
      } else java.math.BigInteger.valueOf(v & 0xFFFFFFFFL)
    var body =
      if (f.comma) group3(uv.toString)
      else f.typ match {
        case 'x' => uv.toString(16)
        case 'X' => uv.toString(16).toUpperCase
        case 'o' => uv.toString(8)
        case 'b' => uv.toString(2)
        case _ => uv.toString // 'u'
      }
    // '#' prefixes only NONZERO values — C semantics ('%#x' of 0 → '0',
    // probed), unlike the brace form where '{:#x}' of 0 keeps '0x0'
    var radixPrefix =
      if (f.alt && !f.comma && uv.signum != 0) f.typ match {
        case 'x' => "0x"
        case 'X' => "0X"
        case 'b' => "0b"
        case 'o' => "0"
        case _ => ""
      } else ""
    if (f.typ == 'o') { body = radixPrefix + body; radixPrefix = "" }
    if (f.prec >= 0 && !f.zero && body.length < f.prec)
      body = "0" * (f.prec - body.length) + body
    val signStr =
      if (f.sign == '+') "+" else if (f.sign == ' ') " " else ""
    fmtPad(signStr + radixPrefix, body, f, '>')
  }

  def printfInt(spec: UTF8String, v: Long): UTF8String =
    UTF8String.fromString(printfIntStr(spec.toString, v))

  /** printf's `%d`/`%i` WITH a precision — C min-digits on the signed
    * value, which the brace grammar (and so [[fmtLong]]) rejects.
    * Zero-extension follows the same fmt rules as [[printfRadixStr]]:
    * the body string pads to `prec` CHARS after grouping ('%,.8d' of
    * -123456 → '-0123,456', probed), the sign stays outside
    * ('%.5d' of -42 → '-00042'), and the zero flag DROPS the
    * precision ('%08.5d' of -42 → '-0000042' = plain '%08d', probed).
    */
  private[expressions] def printfIntStr(spec: String, v: Long): String = {
    val f = parseFmtSpec(spec)
    if (f.typ != 0.toChar && f.typ != 'd')
      throw new IllegalArgumentException(
        s"""Invalid type specifier "${f.typ}" for formatting a value of type int""")
    val mag = java.math.BigInteger.valueOf(v).abs
    var body = if (f.comma) group3(mag.toString) else mag.toString
    if (f.prec >= 0 && !f.zero && body.length < f.prec)
      body = "0" * (f.prec - body.length) + body
    val signStr =
      if (v < 0) "-"
      else if (f.sign == '+') "+"
      else if (f.sign == ' ') " "
      else ""
    fmtPad(signStr, body, f, '>')
  }

  def printfChar(spec: UTF8String, v: Long): UTF8String =
    UTF8String.fromString(printfCharStr(spec.toString, v))

  /** `%c`: the codepoint's character. Width pads on the LEFT whatever
    * the '-' flag says (probed: '%-5c|' of 65 → '    A|' — fmt's
    * sprintf quirk, reproduced).
    */
  private[expressions] def printfCharStr(spec: String, v: Long): String = {
    val f = parseFmtSpec(spec)
    val s = new String(Character.toChars(v.toInt))
    fmtPad("", s, f.copy(align = '>', fill = ' ', zero = false), '>')
  }

  // --- printf dynamic '*' width/precision (r18): the spec string is
  // COMPOSED at runtime from the literal flag prefix plus the argument
  // values, then runs the same kernels as the literal forms. Probed
  // 1.0.0 semantics: a NEGATIVE width left-aligns at |w| like C's '-'
  // flag — but the zero flag still beats it ('%0*d' of (-6, 42) →
  // '000042', the documented '%0-8d' precedence); a negative PRECISION
  // clamps to 0 for every conversion ('%.*f' of -2 ≡ '%.0f' → '2',
  // '%.*s' of -3 → '', '%.*d' of -5 → '42'), unlike C's drop-the-spec;
  // NULL width/precision/value → NULL row (fmt never runs).

  /** A trailing '.' on the flags template marks "a precision slot
    * exists" (dynamic negatives clamp to 0, so no numeric sentinel can
    * distinguish absent from clamped — '%.*f' of -2 ≡ '%.0f' → '2'
    * while a spec with NO precision defaults to 6).
    */
  private def pfComposeSpec(flags0: String, typ: Char, w: Long, p: Long): String = {
    val hasP = flags0.nonEmpty && flags0.charAt(flags0.length - 1) == '.'
    var flags = if (hasP) flags0.substring(0, flags0.length - 1) else flags0
    var ww = w
    if (ww < 0) {
      ww = -ww
      // C's negative-width '-' flag, which fmt's zero flag overrides
      if (flags.indexOf('0') < 0) flags = "<" + flags.substring(1)
    }
    if (ww > 1000000L)
      throw new IllegalArgumentException("format specifier width out of range")
    val sb = new java.lang.StringBuilder(flags)
    if (ww > 0) sb.append(ww)
    if (hasP) sb.append('.').append(math.max(p, 0L))
    sb.append(typ)
    sb.toString
  }

  def printfDynLong(flags: UTF8String, typS: UTF8String, w: Long, p: Long,
                    v: Long, bits: Int): UTF8String = {
    val typ = typS.toString.charAt(0)
    val spec = pfComposeSpec(flags.toString, if (typ == 'i') 'd' else typ, w, p)
    val out = typ match {
      case 'd' | 'i' => printfIntStr(spec, v)
      case 'c' => printfCharStr(spec, v)
      case 'u' | 'x' | 'X' | 'o' | 'b' => printfRadixStr(spec, v, bits)
      case _ => fmtLong(spec, v) // raises fmt's own type-mismatch message
    }
    UTF8String.fromString(out)
  }

  def printfDynDouble(flags: UTF8String, typS: UTF8String, w: Long, p: Long,
                      v: Double): UTF8String = {
    val typ = typS.toString.charAt(0)
    UTF8String.fromString(fmtDouble(pfComposeSpec(flags.toString, typ, w, p), v))
  }

  def printfDynStr(flags: UTF8String, typS: UTF8String, w: Long, p: Long,
                   s: UTF8String): UTF8String = {
    val typ = typS.toString.charAt(0)
    UTF8String.fromString(fmtStr(pfComposeSpec(flags.toString, typ, w, p), s.toString))
  }
}

/** DuckDB `millisecond`/`microsecond`: the sub-MINUTE count INCLUDING
  * the seconds (probed 1.0.0: millisecond('…13:30:05.123456') = 5123,
  * microsecond = 5123456); DATE input yields 0 (midnight). Type
  * dispatch at plan time (the [[DuckLen]] pattern): TIMESTAMP carries
  * epoch micros, TIME nanos-of-day, DATE days.
  */
case class SubMinutePart(child: Expression, unitMicros: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case TimestampType | TimestampNTZType | DateType | _: TimeType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"millisecond/microsecond need a timestamp, time or date, got $t")
    }

  // 0 = date (always 0), 1 = time (nanos of day), 2 = timestamp (micros)
  private lazy val mode: Int = child.dataType match {
    case DateType => 0
    case _: TimeType => 1
    case _ => 2
  }

  override def nullSafeEval(v: Any): Any = mode match {
    case 0 => 0L
    case 1 => Math.floorMod(v.asInstanceOf[Long], 60000000000L) / (unitMicros * 1000L)
    case 2 => Math.floorMod(v.asInstanceOf[Long], 60000000L) / unitMicros
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => mode match {
      case 0 => s"${ev.value} = 0L;"
      case 1 => s"${ev.value} = java.lang.Math.floorMod($c, 60000000000L) / ${unitMicros * 1000L}L;"
      case 2 => s"${ev.value} = java.lang.Math.floorMod($c, 60000000L) / ${unitMicros}L;"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DuckDB `timezone`/`timezone_hour`/`timezone_minute` semantics are
  * type-split (probed 1.0.0): on a TIMESTAMPTZ they return the SESSION
  * time zone's UTC offset at that instant (seconds / truncated hours /
  * leftover minutes, sign carried); on a naive TIMESTAMP they return 0
  * regardless of `SET TimeZone`. graft has ONE timestamp type — Spark's
  * session-tz `TimestampType`, the TIMESTAMPTZ-shaped one — so this
  * expression implements the TIMESTAMPTZ branch for every input. That
  * is a DELIBERATE divergence: a value DuckDB would type as plain
  * TIMESTAMP gets the session offset here (0 under graft's default UTC
  * session, nonzero after a user `SET TimeZone`, which rides through
  * the [[TimeZoneAwareExpression]] resolution). Fringe surface —
  * interpreted eval (CodegenFallback), not a hot-path expression.
  */
case class TzOffsetPart(child: Expression, part: String,
                        timeZoneId: Option[String] = None)
    extends UnaryExpression
    with TimeZoneAwareExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case TimestampType | TimestampNTZType | DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"timezone/timezone_hour/timezone_minute need a timestamp or date, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val micros = child.dataType match {
      case DateType => v.asInstanceOf[Int].toLong * 86400L * 1000000L
      case _ => v.asInstanceOf[Long]
    }
    val inst = java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    val off = zoneId.getRules.getOffset(inst).getTotalSeconds
    part match {
      case "hour" => (off / 3600).toLong
      case "minute" => ((off % 3600) / 60).toLong
      case _ => off.toLong
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
