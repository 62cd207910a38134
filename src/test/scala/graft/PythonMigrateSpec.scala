package graft

import graft.operators.PythonMigrate
import java.nio.file.Files

/** The python-stage migration aid (VERDICT r2 #3): the reference's own
  * example YAMLs with literal `code:` blocks run VERBATIM through
  * graft.Main / Pipeline, translated to codegen'd derive columns.
  */
class PythonMigrateSpec extends SparkSpec {

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-pm").toFile
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f)
    w.print(content)
    w.close()
    f.getAbsolutePath
  }

  test("reference phones.yml runs VERBATIM through graft.Main") {
    val yml = "/root/reference/FileFilterGPT/phones.yml"
    assert(new java.io.File(yml).isFile)
    val in = write("phones.csv",
      "telefono\n912345678\n612345678\n12345\n698765432\n")
    val out = Files.createTempDirectory("graft-pm-out").toString + "/result"
    Main.main(Array(in, yml, out))
    val back = spark.read.option("header", "true").csv(out)
    assert(back.columns.toSeq == Seq("telefono", "tipo_telefono"))
    val got = back.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("912345678") == "fijo")
    assert(got("612345678") == "movil")
    assert(got("12345") == "error")
    assert(got("698765432") == "movil")
  }

  test("reference fullExample.yml + fullExample.txt run VERBATIM through graft.Main") {
    val yml = "/root/reference/examples/fullExample/fullExample.yml"
    val txt = "/root/reference/examples/fullExample/fullExample.txt"
    assert(new java.io.File(yml).isFile && new java.io.File(txt).isFile)
    val out = Files.createTempDirectory("graft-fe-out").toString + "/result"
    Main.main(Array(txt, yml, out))
    val back = spark.read.option("header", "true").option("delimiter", ";").csv(out)
    // final sql stage EXCLUDEs lat, lon, geocode; python stages added
    // address + state from the simulated json
    assert(back.columns.toSeq == Seq("id", "address", "state"))
    assert(back.count() == 5)
    val r = back.collect().head
    assert(r.getString(1) == "Calle de la Princesa, 1, 28008 Madrid, Spain")
    assert(r.getString(2) == "Madrid")
  }

  test("regex-classify def with if/elif/else compiles to one CASE expression") {
    val cols = PythonMigrate.toDeriveColumns(
      """import re
        |
        |def validar_telefono(numero):
        |    if re.match(r'^9\d{8}$', numero):
        |        return 'fijo'
        |    elif re.match(r'^6\d{8}$', numero):
        |        return 'movil'
        |    else:
        |        return 'error'
        |
        |row['tipo_telefono'] = validar_telefono(str(row['telefono']))
        |""".stripMargin)
    assert(cols.map(_._1) == Seq("tipo_telefono"))
    assert(cols.head._2.contains("CASE WHEN"))
    assert(cols.head._2.contains("RLIKE"))
  }

  test("fullExample 'Add locations': rand.uniform via dict-returning function") {
    val cols = PythonMigrate.toDeriveColumns(
      """import pandas as pd
        |import random as rand
        |
        |lat_n = 40.643
        |lat_s = 40.340
        |lon_w = -3.888
        |lon_e = -3.517
        |
        |def genCoords(lat_norte, lat_sur, lon_oeste, lon_este):
        |  latitude = rand.uniform(lat_sur, lat_norte)
        |  longitude = rand.uniform(lon_oeste, lon_este)
        |  return {'latitude': latitude, 'longitude': longitude}
        |
        |coords = genCoords(lat_n, lat_s, lon_w, lon_e)
        |row['lat'] = coords['latitude']
        |row['lon'] = coords['longitude']
        |""".stripMargin)
    assert(cols.map(_._1) == Seq("lat", "lon"))
    assert(cols.forall(_._2.contains("rand()")))
    // runs and lands inside the coordinate box
    import org.apache.spark.sql.functions._
    val df = spark.range(100).toDF("id")
      .withColumn("lat", expr(cols(0)._2))
      .withColumn("lon", expr(cols(1)._2))
    val r = df.agg(min("lat"), max("lat"), min("lon"), max("lon")).head()
    assert(r.getDouble(0) >= 40.340 && r.getDouble(1) <= 40.643)
    assert(r.getDouble(2) >= -3.888 && r.getDouble(3) <= -3.517)
  }

  test("fullExample 'Simulate data' + 'Extract vars': json.dumps / json.loads / .get") {
    val simulate = PythonMigrate.toDeriveColumns(
      """import json
        |row['geocode'] = json.dumps({'address': 'Calle de la Princesa, 1, 28008 Madrid, Spain', 'state': 'Madrid', 'country': 'Spain'})
        |""".stripMargin)
    val extract = PythonMigrate.toDeriveColumns(
      """import json
        |json_string = row['geocode']
        |obj = json.loads(json_string)
        |row['address']=obj.get('address',{})
        |row['state']=obj.get('state',{})
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    var df = spark.range(3).toDF("id")
    (simulate ++ extract).foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val r = df.select("address", "state").head()
    assert(r.getString(0) == "Calle de la Princesa, 1, 28008 Madrid, Spain")
    assert(r.getString(1) == "Madrid")
  }

  test("scalar expressions: arithmetic, ternary, concat, int(), len()") {
    val cols = PythonMigrate.toDeriveColumns(
      """base = 10
        |row['score'] = int(row['a']) * 2 + base
        |row['label'] = 'hi ' + str(row['a'])
        |row['flag'] = 'big' if int(row['a']) > 5 else 'small'
        |row['n'] = len(str(row['a']))
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    var df = spark.range(10).toDF("a")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val r = df.filter(col("a") === 7).head()
    assert(r.getAs[Long]("score") == 24L)
    assert(r.getAs[String]("label") == "hi 7")
    assert(r.getAs[String]("flag") == "big")
    assert(r.getAs[Int]("n") == 1)
  }

  test("randomized arithmetic round-trip: translated SQL == direct evaluation") {
    // Random (+,-,*) expression trees with parens, ternaries and
    // comparisons over row['a'] and small int literals: the translation
    // must agree with a direct Scala evaluation on every sample.
    val rnd = new scala.util.Random(99)
    def gen(depth: Int): (String, Long => Long) =
      if (depth == 0) {
        if (rnd.nextBoolean()) { val k = rnd.nextInt(10); (k.toString, _ => k.toLong) }
        else ("row['a']", a => a)
      } else rnd.nextInt(4) match {
        case 0 => val (l, lf) = gen(depth - 1); val (r, rf) = gen(depth - 1)
          (s"($l + $r)", a => lf(a) + rf(a))
        case 1 => val (l, lf) = gen(depth - 1); val (r, rf) = gen(depth - 1)
          (s"($l - $r)", a => lf(a) - rf(a))
        case 2 => val (l, lf) = gen(depth - 1); val (r, rf) = gen(depth - 1)
          (s"($l * $r)", a => lf(a) * rf(a))
        case 3 => val (l, lf) = gen(depth - 1); val (r, rf) = gen(depth - 1)
          val (c1, c1f) = gen(0); val (c2, c2f) = gen(0)
          (s"($l if $c1 > $c2 else $r)", a => if (c1f(a) > c2f(a)) lf(a) else rf(a))
      }
    val samples = (1 to 60).map { i => (s"e$i", gen(3)) }
    val code = samples.map { case (n, (py, _)) => s"row['$n'] = $py" }.mkString("\n")
    val cols = PythonMigrate.toDeriveColumns(code)
    import org.apache.spark.sql.functions._
    val aVal = 7L
    var df = spark.sql(s"SELECT CAST($aVal AS BIGINT) AS a")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e).cast("long")) }
    val row = df.head()
    samples.foreach { case (n, (py, f)) =>
      assert(row.getAs[Long](n) == f(aVal), s"$n: $py")
    }
  }

  test("string methods and membership: lower/strip/startswith/replace, in/not in") {
    val cols = PythonMigrate.toDeriveColumns(
      """def classify(lang):
        |    if lang in ('en', 'es'):
        |        return 'latin'
        |    elif lang not in ('zh',):
        |        return 'other'
        |    else:
        |        return 'cjk'
        |
        |row['norm'] = str(row['name']).strip().lower()
        |row['shout'] = str(row['name']).upper()
        |row['is_a'] = 'yes' if str(row['name']).startswith('a') else 'no'
        |row['fixed'] = str(row['name']).replace('x', 'y')
        |row['family'] = classify(str(row['lang']))
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    var df = spark.sql(
      "SELECT * FROM VALUES ('  Axx  ', 'en'), ('beta', 'zh'), ('ax', 'fr') AS t(name, lang)")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val rows = df.collect().map(r =>
      r.getAs[String]("name") -> ((r.getAs[String]("norm"), r.getAs[String]("shout"),
        r.getAs[String]("is_a"), r.getAs[String]("fixed"), r.getAs[String]("family")))).toMap
    assert(rows("  Axx  ") == (("axx", "  AXX  ", "no", "  Ayy  ", "latin")))
    assert(rows("beta") == (("beta", "BETA", "no", "beta", "cjk")))
    assert(rows("ax") == (("ax", "AX", "yes", "ay", "other")))
  }

  test("re.sub/search/fullmatch and split/find/count/zfill/rjust translate (r6 widening)") {
    val cols = PythonMigrate.toDeriveColumns(
      """import re
        |row['digits'] = re.sub('[^0-9]', '', row['s'])
        |row['swapped'] = re.sub('(a+)(b+)', r'\2-\1', row['s'])
        |row['has_num'] = re.search('[0-9]', row['s'])
        |row['all_num'] = re.fullmatch('[0-9]+', row['s'])
        |row['first'] = row['csv'].split(',')[0]
        |row['last'] = row['csv'].split(',')[-1]
        |row['n_parts'] = len(row['csv'].split(','))
        |row['word2'] = row['s'].split()[1] if len(row['s'].split()) > 1 else ''
        |row['pos'] = row['s'].find('b')
        |row['commas'] = row['csv'].count(',')
        |row['padded'] = str(row['pos']).zfill(4)
        |row['right'] = row['s'].rjust(8, '.')
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    // re.sub emits the duck_regexp_replace native (python replaces ALL
    // matches → 'g'); DeriveStage registers it, raw expr() must too
    graft.functions.expressions.GraftFunctions.register(spark)
    var df = spark.sql(
      "SELECT * FROM VALUES ('aabbb x1', 'p,q,r'), ('42', 'single') AS t(s, csv)")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val rows = df.collect().map(r => r.getAs[String]("s") -> r).toMap
    val a = rows("aabbb x1")
    assert(a.getAs[String]("digits") == "1")
    assert(a.getAs[String]("swapped") == "bbb-aa x1")
    assert(a.getAs[Boolean]("has_num") && !a.getAs[Boolean]("all_num"))
    assert(a.getAs[String]("first") == "p" && a.getAs[String]("last") == "r")
    assert(a.getAs[Int]("n_parts") == 3)
    assert(a.getAs[String]("word2") == "x1")
    assert(a.getAs[Int]("pos") == 2) // python: 'aabbb'.find('b') == 2
    assert(a.getAs[Int]("commas") == 2)
    assert(a.getAs[String]("padded") == "0002")
    assert(a.getAs[String]("right") == "aabbb x1") // already 8 chars: untouched
    val b = rows("42")
    assert(b.getAs[Boolean]("all_num"))
    assert(b.getAs[String]("first") == "single" && b.getAs[String]("last") == "single")
    assert(b.getAs[String]("word2") == "")
    assert(b.getAs[Int]("pos") == -1) // absent → python -1
    assert(b.getAs[String]("right") == "......42")
  }

  test("split separators are literal; dynamic list indexes raise a guided error") {
    val cols = PythonMigrate.toDeriveColumns(
      "row['p'] = row['s'].split('.')[1]\n")
    import org.apache.spark.sql.functions._
    val df = spark.sql("SELECT 'a.b.c' AS s")
      .withColumn("p", expr(cols.head._2))
    assert(df.collect().head.getAs[String]("p") == "b") // '.' not a regex-any
    val e = intercept[IllegalArgumentException] {
      PythonMigrate.toDeriveColumns("row['p'] = row['s'].split(',')[row['i']]\n")
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("module-level if/elif/else assigning row columns compiles to CASE per column") {
    val cols = PythonMigrate.toDeriveColumns(
      """if int(row['a']) > 6:
        |    row['size'] = 'big'
        |    row['extra'] = 1
        |elif int(row['a']) > 3:
        |    row['size'] = 'mid'
        |else:
        |    row['size'] = 'small'
        |row['after'] = row['size']
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    var df = spark.range(10).toDF("a")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val rows = df.collect().map(r => r.getAs[Long]("a") ->
      ((r.getAs[String]("size"), Option(r.get(r.fieldIndex("extra"))), r.getAs[String]("after")))).toMap
    assert(rows(8L) == (("big", Some(1), "big")))
    assert(rows(5L) == (("mid", None, "mid")))   // 'extra' only set on one path → NULL
    assert(rows(1L) == (("small", None, "small")))
  }

  test("module-level if without else keeps the column's prior value") {
    val cols = PythonMigrate.toDeriveColumns(
      """row['flag'] = 'base'
        |if int(row['a']) > 5:
        |    row['flag'] = 'high'
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    var df = spark.range(10).toDF("a")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val m = df.collect().map(r => r.getAs[Long]("a") -> r.getAs[String]("flag")).toMap
    assert(m(7L) == "high" && m(3L) == "base")
  }

  test("un-raw regex escapes keep their backslash (python preserves unknown escapes)") {
    // '\d+' without an r-prefix: python keeps the backslash, so this is
    // a digit match — r6's lexer dropped it and matched literal "d+"
    val cols = PythonMigrate.toDeriveColumns(
      """import re
        |row['is_num'] = 1 if re.match('\d+', row['s']) else 0
        |row['mixed'] = '\ttab\d'
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    var df = Seq("123", "abc", "d+").toDF("s")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val m = df.collect().map(r => r.getString(0) ->
      ((r.getAs[Int]("is_num"), r.getAs[String]("mixed")))).toMap
    assert(m("123")._1 == 1)
    assert(m("abc")._1 == 0)
    assert(m("d+")._1 == 0)  // the r6 bug matched exactly this row
    // recognized escapes still translate, unknown ones survive verbatim
    assert(m("123")._2 == "\ttab\\d")
  }

  test("opposite def-use order across if branches follows python dataflow per branch") {
    // branch A assigns b then a (a reads b); branch B assigns a then b
    // (b reads a) — emission order can't satisfy both as column refs, so
    // same-branch reads must inline that branch's value (ADVICE r6)
    val cols = PythonMigrate.toDeriveColumns(
      """row['b'] = 100
        |row['a'] = 200
        |if int(row['x']) > 5:
        |    row['b'] = 1
        |    row['a'] = int(row['b']) * 2
        |else:
        |    row['a'] = 0
        |    row['b'] = int(row['a']) + 1
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    var df = spark.range(10).toDF("x")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val m = df.collect().map(r => r.getAs[Long]("x") ->
      ((r.getAs[Number]("a").intValue(), r.getAs[Number]("b").intValue()))).toMap
    assert(m(8L) == ((2, 1)))   // python: b=1, a=b*2=2
    assert(m(2L) == ((0, 1)))   // python: a=0, b=a+1=1 — NOT 101/201
  }

  test("if-condition reading an assigned column sees the PRE-if value (emit-last ordering)") {
    // python evaluates the condition once, before the branch body; the
    // per-column CASEs must not let x's overwrite leak into y's CASE
    val cols = PythonMigrate.toDeriveColumns(
      """row['x'] = int(row['raw'])
        |if int(row['x']) > 5:
        |    row['x'] = 0
        |    row['y'] = 1
        |else:
        |    row['y'] = 2
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    var df = spark.range(10).toDF("raw")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val m = df.collect().map(r => r.getAs[Long]("raw") ->
      ((r.getAs[Number]("x").intValue(), r.getAs[Number]("y").intValue()))).toMap
    assert(m(8L) == ((0, 1)))  // python: cond true -> x=0, y=1 (r7 review: y read NEW x=0 and got 2)
    assert(m(3L) == ((3, 2)))
    // TWO condition-read assigned columns cannot both be ordered last
    val e = intercept[PythonMigrate.MigrationError](PythonMigrate.toDeriveColumns(
      """row['a'] = 1
        |row['b'] = 2
        |if int(row['a']) + int(row['b']) > 2:
        |    row['a'] = 0
        |    row['b'] = 0
        |""".stripMargin))
    assert(e.getMessage.contains("conditions read"))
  }

  test("unicode escapes translate; named escapes error") {
    // backslash built by concatenation: scalac itself interprets \uXXXX
    // in source (even triple-quoted), so a literal one can't be typed
    val code = "row['s'] = '" + "\\" + "u00e9" + "\\" + "U0001F600x'\n"
    val cols = PythonMigrate.toDeriveColumns(code)
    import org.apache.spark.sql.functions._
    val v = spark.range(1).toDF("id")
      .withColumn("s", expr(cols.head._2)).collect().head.getString(1)
    assert(v == "\u00e9" + new String(Character.toChars(0x1F600)) + "x")
    val e = intercept[PythonMigrate.MigrationError](
      PythonMigrate.toDeriveColumns("row['s'] = '\\N{BULLET}'\n"))
    assert(e.getMessage.contains("unicode"))
  }

  test("f-strings, math module, min/max, ** and // translate") {
    val cols = PythonMigrate.toDeriveColumns(
      """import math
        |row['msg'] = f"id={row['a']} sq={row['a'] ** 2}"
        |row['rt'] = math.sqrt(float(row['a']))
        |row['half'] = row['a'] // 2
        |row['neg'] = -7 // 2
        |row['lo'] = min(row['a'], 5)
        |row['hi'] = max(row['a'], 5, 7)
        |row['circ'] = math.pi * 2
        |row['cap'] = str(row['name']).capitalize()
        |row['t'] = str(row['name']).title()
        |""".stripMargin)
    import org.apache.spark.sql.functions._
    var df = spark.sql("SELECT CAST(9 AS BIGINT) AS a, 'hello world' AS name")
    cols.foreach { case (c, e) => df = df.withColumn(c, expr(e)) }
    val r = df.head()
    assert(r.getAs[String]("msg") == "id=9 sq=81.0")
    assert(math.abs(r.getAs[Double]("rt") - 3.0) < 1e-12)
    assert(r.getAs[Long]("half") == 4L)
    assert(r.getAs[Long]("neg") == -4L)  // python floor division semantics
    assert(r.getAs[Long]("lo") == 5L && r.getAs[Long]("hi") == 9L)
    assert(math.abs(r.getAs[Double]("circ") - 2 * math.Pi) < 1e-12)
    assert(r.getAs[String]("cap") == "Hello world")
    assert(r.getAs[String]("t") == "Hello World")
  }

  test("f-string format specs and list-min raise guided errors") {
    val e1 = intercept[IllegalArgumentException](
      PythonMigrate.toDeriveColumns("row['x'] = f\"{row['a']:.2f}\""))
    assert(e1.getMessage.contains("format spec"))
    val e2 = intercept[IllegalArgumentException](
      PythonMigrate.toDeriveColumns("row['x'] = min(row['a'])"))
    assert(e2.getMessage.contains("2+ scalar"))
  }

  test("unsupported constructs fail with actionable line-numbered messages") {
    val cases = Seq(
      "import requests\nrow['x'] = 1" -> "module 'requests'",
      "for i in range(3):\n    row['x'] = i" -> "line 1",
      "row['x'] = undefined_thing" -> "undefined name",
      "x = 1" -> "assigns no row",
      "row['x'] = open('/etc/passwd')" -> "undefined name 'open'")
    cases.foreach { case (code, needle) =>
      val e = intercept[IllegalArgumentException](PythonMigrate.toDeriveColumns(code))
      assert(e.getMessage.contains(needle), s"message for <<$code>> was: ${e.getMessage}")
    }
  }

  test("python stage with actionConfig (no code) still uses the derive surface") {
    val yaml =
      """
        |inDelimiter: ";"
        |filters:
        |  - name: classify
        |    actionType: python
        |    actionConfig:
        |      columns:
        |        - {name: two, expr: "CAST(v AS INT) * 2"}
        |""".stripMargin
    val in = write("v.csv", "v\n1\n2\n")
    val res = graft.operators.Pipeline.runYaml(spark, yaml, in)
    assert(res.output.select("two").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4))
  }
}
