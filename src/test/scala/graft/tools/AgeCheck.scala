package graft.tools

/** Scratch: differential check of DuckSweep.ageInterval against a
  * DuckDB-produced expectation table (a\tb\tCAST(age(a,b) AS VARCHAR)).
  * No Spark session needed — the kernel is a pure function of micros.
  */
object AgeCheck {
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("/tmp/age_pairs.tsv")
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    def micros(s: String): Long = {
      val dot = s.indexOf('.')
      val (base, frac) = if (dot < 0) (s, "0") else (s.substring(0, dot), s.substring(dot + 1))
      fmt.parse(base).getTime * 1000L + (frac.padTo(6, '0').take(6)).toLong
    }
    var n = 0
    var bad = 0
    scala.io.Source.fromFile(in).getLines().foreach { line =>
      val Array(a, b, want) = line.split("\t", 3)
      val got = graft.functions.expressions.DuckSweep
        .ageInterval(micros(a), micros(b)).toString
      n += 1
      if (got != want) {
        bad += 1
        if (bad <= 10) println(s"[agecheck] MISMATCH age('$a','$b'): got '$got' want '$want'")
      }
    }
    println(s"[agecheck] $n pairs, $bad mismatches")
  }
}
