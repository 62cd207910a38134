package graft

import org.apache.spark.sql.DataFrame
import graft.operators.GraftSqlParser

/** Differential check of the native as-of execs
  * ([[graft.plans.AsofHashJoinExec]] generic + primitive paths,
  * [[graft.plans.AsofMergeJoinExec]]) against the lead-window
  * validity-interval rewrite they replace: same randomized data, every
  * inequality direction, inner + left outer, null keys / null
  * timestamps / duplicate timestamps, answers compared as multisets.
  * The interval rewrite is itself gate-checked against DuckDB's native
  * ASOF JOIN (q99), so agreement here chains the execs to the oracle.
  *
  * Duplicate right timestamps carry IDENTICAL projected payloads (the
  * tie winner is engine-arbitrary, exactly like DuckDB) so multiset
  * comparison is deterministic.
  */
class AsofSpec extends SparkSpec {

  private val rng = new scala.util.Random(41)

  /** (key, ts, payload) rows; key/ts nullable, ts ties duplicated. */
  private def genRows(n: Int, keyRange: Int): Seq[(Integer, Integer, Long)] =
    (1 to n).flatMap { _ =>
      val k: Integer = if (rng.nextInt(20) == 0) null else Int.box(rng.nextInt(keyRange))
      val t: Integer = if (rng.nextInt(25) == 0) null else Int.box(rng.nextInt(40))
      val payload = if (k == null || t == null) -1L else k.toLong * 1000 + t.toLong
      val base = Seq((k, t, payload))
      if (rng.nextInt(6) == 0) base ++ base else base // exact duplicate ties
    }

  private def setupViews(stringKey: Boolean): Unit = {
    import spark.implicits._
    val l = genRows(220, 8)
    val r = genRows(120, 8)
    if (stringKey) {
      l.map { case (k, t, p) => (if (k == null) null else "k" + k, t, p) }
        .toDF("lk", "lts", "lpay").createOrReplaceTempView("asof_l")
      r.map { case (k, t, p) => (if (k == null) null else "k" + k, t, p) }
        .toDF("rk", "rts", "rpay").createOrReplaceTempView("asof_r")
    } else {
      l.toDF("lk", "lts", "lpay").createOrReplaceTempView("asof_l")
      r.toDF("rk", "rts", "rpay").createOrReplaceTempView("asof_r")
    }
  }

  private def asofSql(op: String, left: Boolean): String = {
    val kw = if (left) "ASOF LEFT JOIN" else "ASOF JOIN"
    s"""SELECT l.lk, l.lts, l.lpay, r.rts, r.rpay
        FROM asof_l l $kw asof_r r ON l.lk = r.rk AND l.lts $op r.rts"""
  }

  private def run(sql: String): Seq[String] =
    spark.sql(GraftSqlParser.rewriteAll(sql)).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  /** Run `body` with the strategy removed (plans the interval rewrite). */
  private def withoutStrategy[A](body: => A): A = {
    val saved = spark.experimental.extraStrategies
    spark.experimental.extraStrategies =
      saved.filterNot(_ == graft.plans.AsofMergeStrategy)
    try body finally spark.experimental.extraStrategies = saved
  }

  /** Run `body` with the hash exec disabled (forces the merge exec). */
  private def forceMerge[A](body: => A): A = {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  private def checkAll(stringKey: Boolean): Unit = {
    setupViews(stringKey)
    for (op <- Seq(">=", ">", "<=", "<"); left <- Seq(false, true)) {
      val sql = asofSql(op, left)
      val oracle = withoutStrategy(run(sql))
      val hash = run(sql)
      val merge = forceMerge(run(sql))
      assert(hash == oracle, s"hash exec diverged (op=$op left=$left stringKey=$stringKey)")
      assert(merge == oracle, s"merge exec diverged (op=$op left=$left stringKey=$stringKey)")
      // the strategy actually engaged (no silent fallback to the rewrite)
      val p = spark.sql(GraftSqlParser.rewriteAll(sql)).queryExecution.executedPlan.toString
      assert(p.contains("AsofHashJoin") || p.contains("AsofMergeJoin"), p)
    }
  }

  test("native as-of execs match the interval rewrite: primitive int keys") {
    checkAll(stringKey = false)
  }

  test("native as-of execs match the interval rewrite: generic string keys") {
    checkAll(stringKey = true)
  }

  test("native as-of execs match the interval rewrite: MULTI-key (r13)") {
    import spark.implicits._
    // q141 gates one multi-key shape; this fuzzes the space — composite
    // (int, string) equality keys with nulls in either component, every
    // inequality direction, both join types, all three paths
    def gen(n: Int): Seq[(Integer, String, Integer, Long)] =
      (1 to n).flatMap { _ =>
        val a: Integer = if (rng.nextInt(15) == 0) null else Int.box(rng.nextInt(4))
        val b: String = if (rng.nextInt(15) == 0) null else "g" + rng.nextInt(3)
        val t: Integer = if (rng.nextInt(25) == 0) null else Int.box(rng.nextInt(30))
        val pay = if (a == null || b == null || t == null) -1L
          else a.toLong * 10000 + b.hashCode.toLong % 97 + t.toLong
        val base = Seq((a, b, t, pay))
        if (rng.nextInt(6) == 0) base ++ base else base
      }
    gen(200).toDF("la", "lb", "lts", "lpay").createOrReplaceTempView("asof_ml")
    gen(110).toDF("ra", "rb", "rts", "rpay").createOrReplaceTempView("asof_mr")
    for (op <- Seq(">=", ">", "<=", "<"); left <- Seq(false, true)) {
      val kw = if (left) "ASOF LEFT JOIN" else "ASOF JOIN"
      val sql = s"""SELECT l.la, l.lb, l.lts, l.lpay, r.rts, r.rpay
                    FROM asof_ml l $kw asof_mr r
                    ON l.la = r.ra AND l.lb = r.rb AND l.lts $op r.rts"""
      val oracle = withoutStrategy(run(sql))
      assert(run(sql) == oracle, s"multi-key hash diverged (op=$op left=$left)")
      assert(forceMerge(run(sql)) == oracle, s"multi-key merge diverged (op=$op left=$left)")
      val p = spark.sql(GraftSqlParser.rewriteAll(sql)).queryExecution.executedPlan.toString
      assert(p.contains("AsofHashJoin") || p.contains("AsofMergeJoin"), p)
    }
  }

  test("merge exec plans co-partitioned sorts, no window, no union") {
    setupViews(stringKey = false)
    forceMerge {
      val p = spark.sql(GraftSqlParser.rewriteAll(asofSql(">=", left = true)))
        .queryExecution.executedPlan.toString
      assert(p.contains("AsofMergeJoin"), p)
      assert(!p.contains("Window") && !p.contains("Union"), p)
    }
  }
}
