package graft

import graft.operators.{RestConfig, RestStage, RowTransformStage}
import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.scalacheck.Gen

/** Property-based coverage (SURVEY §5 strategy item 2) using raw
  * ScalaCheck generators sampled in-loop (no scalatest-plus bridge in
  * the offline dep set): CSV sink→source round-trips under arbitrary
  * delimiters/content, template substitution totality, and the
  * reference's keep-on-error row semantics.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val cell = Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
  private val delims = Seq(";", ",", "|", "\t")

  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  test("CSV sink → source round-trips rows for any delimiter") {
    for (trial <- 1 to 8) {
      val d = delims(trial % delims.size)
      val rows = List.fill(6)((sample(cell), sample(cell)))
      val df = rows.toDF("a", "b")
      val out = Files.createTempDirectory("graft-prop").toString + "/csv"
      Sources.writeCsv(df, out, d)
      val back = spark.read.option("header", "true").option("delimiter", d).csv(out)
      assert(back.count() == rows.size)
      val got = back.collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(got.toList == rows.sorted, s"delimiter '$d'")
    }
  }

  test("DuckSlice: codegen and interpreted paths agree on random lists/strings/bounds") {
    import org.apache.spark.sql.functions._
    graft.functions.expressions.GraftFunctions.register(spark)
    // the r9 Janino boxing bug FAILED codegen (now a hard error in
    // DialectSpec's CODEGEN_ONLY runs); this property pins the other
    // failure mode — a codegen path that runs but DIVERGES from eval
    val lst = Gen.listOfN(8, Gen.chooseNum(-99, 99)).map(_.take(sample(Gen.chooseNum(0, 8))))
    val bound = Gen.oneOf(Gen.chooseNum(-10, 10).map(_.toString), Gen.const("NULL"))
    def run(mode: String, sql: String): Seq[Row] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try spark.sql(sql).collect().toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    for (_ <- 1 to 25) {
      val l = sample(lst)
      val (b, e) = (sample(bound), sample(bound))
      val arr = if (l.isEmpty) "CAST(array() AS ARRAY<INT>)" else s"array(${l.mkString(",")})"
      val s = "'" + sample(Gen.alphaNumStr.map(_.take(8))) + "'"
      for (expr <- Seq(
        s"list_slice($arr, $b, $e)", s"graft_bracket_slice($arr, $b, $e)",
        s"array_slice($s, $b, $e)", s"graft_bracket_slice($s, $b, $e)")) {
        val sql = s"SELECT $expr AS r"
        val cg = run("CODEGEN_ONLY", sql)
        val in = run("NO_CODEGEN", sql)
        assert(cg.map(_.toString) == in.map(_.toString), sql)
      }
    }
  }

  test("chunkWindows: full coverage, stride overlap, exact reconstruction for random docs") {
    import org.apache.spark.sql.functions._
    val word = Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty)
    for (_ <- 1 to 8) {
      val n = sample(Gen.choose(1, 120))
      val words = List.fill(n)(sample(word))
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = df.select(posexplode(
          graft.functions.TextFunctions.chunkWindows(col("text"), 40, 30))
          .as(Seq("i", "c")))
        .select(col("i"), col("c.chunk"), col("c.n_tokens"))
        .orderBy(col("i")).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      // chunk i starts at token i*30 (0-based) and holds min(40, n-i*30)
      val expectedCount = (n - 1) / 30 + 1
      assert(chunks.length == expectedCount)
      chunks.foreach { case (i, chunk, nt) =>
        val want = words.slice(i * 30, i * 30 + 40)
        assert(chunk == want.mkString(" ") && nt == want.length)
      }
      // coverage: stride < size means every token appears in some chunk
      assert(chunks.map(_._3).sum >= n)
    }
  }

  test("dedupSpans: all-unique corpora reconstruct byte-identically; span counts conserve") {
    import org.apache.spark.sql.functions._
    val word = Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty)
    for (trial <- 1 to 5) {
      val width = sample(Gen.choose(2, 7))
      // per-doc unique vocabulary (prefix with the doc id) → no span can
      // repeat anywhere → output must reconstruct every doc exactly
      val docs = (0 until 8).map { i =>
        val n = sample(Gen.choose(1, 40))
        (i.toLong, List.fill(n)(s"d$i${sample(word)}").mkString(" "))
      }
      val out = graft.functions.Dedup.dedupSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", width)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      docs.foreach { case (id, text) =>
        val (clean, nSpans, nKept) = out(id)
        assert(clean == text, s"trial $trial width $width doc $id")
        assert(nSpans == nKept)
        assert(nSpans == (text.split(" ").length - 1) / width + 1)
      }
    }
  }

  test("Upsert.byKey is idempotent and key-complete for random updates") {
    for (_ <- 1 to 6) {
      val baseKeys = sample(Gen.pick(8, 1L to 20L)).toList
      val updKeys = sample(Gen.someOf(1L to 25L)).toList
      val base = baseKeys.map(k => (k, s"b$k")).toDF("k", "v")
      val upd = updKeys.map(k => (k, s"u$k")).toDF("k", "v")
      val once = graft.operators.Upsert.byKey(base, upd, Seq("k"))
      val twice = graft.operators.Upsert.byKey(once, upd, Seq("k"))
      val o = once.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val t = twice.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(o == t) // idempotent
      assert(o.map(_._1) == (baseKeys ++ updKeys).toSet) // key-complete
      // updated keys carry the update value, untouched keys the base value
      o.foreach { case (k, v) =>
        assert(v == (if (updKeys.contains(k)) s"u$k" else s"b$k"))
      }
    }
  }

  test("redactPii: idempotent and PII-free for synthesized contacts") {
    import org.apache.spark.sql.functions._
    val word = Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty)
    for (_ <- 1 to 8) {
      val user = sample(word); val host = sample(word)
      val digits = sample(Gen.listOfN(9, Gen.numChar)).mkString
      val text = s"${sample(word)} $user@$host.com call +$digits now"
      val df = Seq(Tuple1(text)).toDF("text")
        .select(graft.functions.TextFunctions.redactPii(col("text")).as("r"))
      val r = df.collect().head.getString(0)
      assert(r.contains("<EMAIL>") && r.contains("<PHONE>"))
      assert(!r.contains(s"$user@") && !r.contains(digits))
      // idempotent: redacting the redacted text changes nothing
      val rr = Seq(Tuple1(r)).toDF("text")
        .select(graft.functions.TextFunctions.redactPii(col("text")).as("r"))
        .collect().head.getString(0)
      assert(rr == r)
    }
  }

  test("template substitution: filled iff every placeholder resolves") {
    for (_ <- 1 to 20) {
      val v = sample(Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty))
      val rowMap: Map[String, Any] = Map("x" -> v)
      val filled = RestStage.buildUri(
        RestConfig(host = "http://h", path = "/p/{x}"), rowMap)
      assert(filled.contains(s"http://h/p/$v"))
      val missing = RestStage.buildUri(
        RestConfig(host = "http://h", path = "/p/{y}"), rowMap)
      assert(missing.isEmpty)
    }
  }

  test("tokenBudget invariants hold for random budgets/fanouts: caps, prefix-freedom, totality") {
    import org.apache.spark.sql.functions._
    val langs = Seq("en", "fr", "de", "zh")
    val rnd = new scala.util.Random(17)
    val rows = (0L until 600L).map(i => (i, langs(rnd.nextInt(langs.size)), 5L + rnd.nextInt(60)))
    val df = rows.toDF("doc_id", "lang", "n_tokens")
    val tokensByLang = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    for (trial <- 1 to 5) {
      val budgets = langs.take(1 + rnd.nextInt(3))
        .map(l => l -> rnd.between(1L, tokensByLang(l) + 1)).toMap
      val fanout = Seq(16, 256, 4096)(rnd.nextInt(3))
      val kept = graft.functions.Mix.tokenBudget(
          df, col("lang"), col("doc_id"), col("n_tokens"), budgets, fanout)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens")))
      val byLang = kept.groupBy(_._2)
      // hard caps on budgeted strata; unbudgeted strata intact
      byLang.foreach { case (l, rs) =>
        budgets.get(l) match {
          case Some(b) => assert(rs.map(_._3).sum <= b, s"trial $trial $l over budget")
          case None => assert(rs.length == rows.count(_._2 == l), s"trial $trial $l dropped rows")
        }
      }
      // cum_tokens is a valid per-stratum cumulative: sorted cums are
      // the running sums of their own token counts
      byLang.foreach { case (l, rs) =>
        val sorted = rs.sortBy(_._4)
        sorted.foldLeft(0L) { case (acc, (_, _, n, cum)) =>
          assert(cum == acc + n, s"trial $trial $l cum gap at $cum"); cum
        }
      }
      // fanout never changes the result
      val other = graft.functions.Mix.tokenBudget(
          df, col("lang"), col("doc_id"), col("n_tokens"), budgets,
          if (fanout == 16) 256 else 16)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens"))).toMap
      assert(kept.forall { case (id, _, _, cum) => other(id) == cum }
        && other.size == kept.length, s"trial $trial fanout variance")
    }
  }

  test("RowTransformStage: failing rows pass through unchanged with error count (§2c)") {
    val acc = spark.sparkContext.longAccumulator("errs")
    val df = Seq((1L, "ok"), (2L, "boom"), (3L, "ok")).toDF("id", "v")
    val stage = RowTransformStage("t", row => {
      if (row.getString(1) == "boom") throw new RuntimeException("nope")
      Row(row.getLong(0) * 10, row.getString(1))
    }, acc)
    val out = stage(spark, df).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((10L, "ok"), (2L, "boom"), (30L, "ok"))) // original row kept
    assert(acc.value == 1L)
  }

  test("macro expansion == direct substitution for random arithmetic bodies/args") {
    // registerMacro + expandMacros must be semantics-preserving: for a
    // random arithmetic body over params (a, b) and random integer
    // argument EXPRESSIONS, evaluating the macro call equals evaluating
    // the body with the args textually substituted by hand (both via
    // spark.sql, so only the expansion machinery is under test —
    // precedence safety included, since args are sums and bodies
    // multiply)
    val df = spark.range(1).toDF("id")
    val atom = Gen.oneOf(Gen.const("a"), Gen.const("b"), Gen.chooseNum(1, 9).map(_.toString))
    val op = Gen.oneOf(" + ", " - ", " * ")
    def body(depth: Int): Gen[String] =
      if (depth == 0) atom
      else Gen.oneOf(
        atom,
        for { l <- body(depth - 1); o <- op; r <- body(depth - 1) } yield s"$l$o$r")
    val argExpr = for {
      x <- Gen.chooseNum(-9, 9); y <- Gen.chooseNum(1, 9)
    } yield s"$x + $y"
    (1 to 25).foreach { i =>
      val b = sample(body(3))
      val (aArg, bArg) = (sample(argExpr), sample(argExpr))
      graft.operators.SqlStage("p",
        s"CREATE OR REPLACE MACRO prop_m(a, b) AS $b").apply(spark, df)
      val viaMacro = graft.operators.SqlStage("p",
        s"SELECT prop_m($aArg, $bArg) AS v FROM df").apply(spark, df)
        .collect().head.getAs[Number](0).longValue
      val byHand = spark.sql(
        s"SELECT ${b.replace("a", s"($aArg)").replace("b", s"($bArg)")} AS v")
        .collect().head.getAs[Number](0).longValue
      assert(viaMacro == byHand, s"body=$b a=$aArg b=$bArg")
    }
  }
}
