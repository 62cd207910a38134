package graft.queries

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2b): scans with
  * pushdown, aggregation, joins of every flavor, windows, set ops,
  * rollup/cube/grouping sets, scalar subquery, as-of join, string /
  * date / math / JSON scalar functions.
  *
  * Every query is paired with ANSI SQL in [[sql]] that DuckDB executes
  * over the same parquet tables; results must hash-match, so outputs
  * are fully deterministic: exact decimal aggregation (see
  * [[graft.Tables]]), total-order ORDER BY with unique tie-breakers,
  * and no raw timestamps in output columns (dates / formatted strings
  * instead — parquet TIMESTAMP annotations differ between writers).
  */
object CoreQueries {

  /** revenue in exact decimals: extprice * (1 - discount) */
  private def revenue: Column =
    dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))

  private val REV =
    "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))"

  // ---------------------------------------------------------------- scans

  /** Projection + predicate pushdown into the parquet scan (SURVEY O1/O2). */
  def q01ScanPrune(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1995-07-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // ----------------------------------------------------------- aggregation

  /** TPC-H Q1 shape: grouped aggregate with exact-decimal sums + means. */
  def q02AggPricing(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") < lit("2001-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue).cast("double").as("sum_disc_price"),
        sum(revenue * (lit(1) + dec2(col("l_tax")))).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** count distinct + plain count grouped (SURVEY §2b aggregation). */
  def q09DistinctAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))

  /** ROLLUP with grouping_id (subtotals + grand total). */
  def q10Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
           dsum(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
              col("gid"), col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("rflag"), col("lstatus"))

  /** CUBE over two dims. */
  def q11Cube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
           dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("gid"), col("n"), col("sum_price"))
      .orderBy(col("gid"), col("status"), col("priority"))

  /** GROUPING SETS via the SQL passthrough (SURVEY O12: `sql` stage). */
  def q19GroupingSets(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority
    """)
  }

  // ----------------------------------------------------------------- joins

  /** Multi-way equi-join + agg: revenue per nation (broadcast the dim). */
  def q03JoinRevenueByNation(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Left-semi join (EXISTS). */
  def q04SemiJoin(s: SparkSession, d: String): DataFrame = {
    val bigOrders = orders(s, d).filter(col("o_totalprice") > 400000.0)
    customer(s, d)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): parts never shipped. */
  def q05AntiJoin(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_partkey"))

  /** Left-outer join + agg keeping empty groups. */
  def q06OuterJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))

  /** Theta (non-equi) self-join: nation pairs within a region. */
  def q17ThetaJoin(s: SparkSession, d: String): DataFrame = {
    val n1 = nation(s, d).select(col("n_nationkey").as("k1"),
      col("n_name").as("nation_a"), col("n_regionkey").as("r1"))
    val n2 = nation(s, d).select(col("n_nationkey").as("k2"),
      col("n_name").as("nation_b"), col("n_regionkey").as("r2"))
    n1.join(n2, col("r1") === col("r2") && col("k1") < col("k2"))
      .select(col("nation_a"), col("nation_b"), col("r1").as("regionkey"))
      .orderBy(col("regionkey"), col("nation_a"), col("nation_b"))
  }

  /** Scalar subquery via SQL passthrough: orders above the mean price. */
  def q18ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_sub")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_sub
      WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM orders_sub)
      ORDER BY o_orderkey
    """)
  }

  /** As-of join (no native Spark operator): for each event, the most
    * recent order date of that user at event time. Implemented scalably
    * as union + sorted window (one shuffle on the key, no O(n·m)
    * non-equi join); the oracle uses DuckDB's native ASOF JOIN.
    */
  def q20AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id").as("k"), col("ts").as("t"),
      lit(null).cast("timestamp").as("od"), lit(1).as("is_evt"), col("event_id"))
    val od = orders(s, d).select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
      col("o_orderdate").as("od"), lit(0).as("is_evt"),
      lit(null).cast("long").as("event_id"))
    // orders sort before events at equal t => o_orderdate <= ts is inclusive
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("is_evt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    od.unionAll(ev)
      .withColumn("last_order_date", last(col("od"), ignoreNulls = true).over(w))
      .filter(col("is_evt") === 1)
      .select(col("event_id"), col("k").as("user_id"),
              col("last_order_date").cast("date").as("last_order_date"))
      .orderBy(col("event_id"))
  }

  /** The SAME DuckDB `ASOF LEFT JOIN` text as q20's oracle, executed by
    * SPARK through the dialect layer's validity-interval rewrite
    * ([[graft.operators.GraftSqlParser.rewriteAsof]]) — a reference
    * user's `sql` stage containing ASOF JOIN now runs verbatim instead
    * of raising the guided error. The oracle is the byte-identical SQL
    * run natively by DuckDB, so the rewrite's semantics (inclusive
    * bound, exactly-one-match cardinality, LEFT rows kept) are
    * hash-checked against the native operator, and q20 pins the same
    * answer via the hand-built union+window plan.
    */
  def q99AsofSql(s: SparkSession, d: String): DataFrame = {
    // registers the AsofMergeStrategy planner rule (and dialect fns)
    graft.functions.expressions.GraftFunctions.register(s)
    events(s, d).createOrReplaceTempView("events")
    // Normalize the order-side event-time to session-tz ONCE at the
    // scan (the Tables.events policy, applied to the other join side).
    // Without it the ASOF join compares TIMESTAMP_NTZ o_orderdate with
    // the normalized TIMESTAMP e.ts, and Catalyst re-casts the BUILD
    // side inside the join condition — per candidate PAIR, ~15 evals
    // per probe row here (r8 bench q99 0.36→0.52 s was exactly this,
    // introduced by the r8 events normalization; measured back to
    // 0.41 s with the one-per-row cast). UTC session ⇒ bit-identical
    // dates out.
    orders(s, d)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .createOrReplaceTempView("orders")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(asofSqlText))
  }

  private[graft] val asofSqlText = """
      SELECT e.event_id, e.user_id,
             CAST(o.o_orderdate AS DATE) AS last_order_date
      FROM events e
      ASOF LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
      ORDER BY e.event_id"""

  /** FORWARD, STRICT, MULTI-KEY ASOF through the dialect layer — the
    * other half of the native as-of exec's surface, gate-anchored
    * (r13): for each event, the day of the NEXT event of the same
    * (user, type) strictly after it (the next-occurrence /
    * time-to-next-event shape). q99 pins backward/inclusive/single-key
    * through the primitive fast path; this text pins forward/strict
    * with a two-column equality (string second key), which routes the
    * GENERIC [[graft.plans.AsofHashJoinExec]] build/probe. The oracle
    * is the byte-identical SQL run natively by DuckDB (probed: 1.0.0
    * supports all four inequality directions and multi-key equality).
    * Output is the next event's DAY, not its id — duplicate (user,
    * type, ts) rows make the surviving ROW engine-arbitrary on both
    * sides, but its `ts` is tie-invariant (the q20 CAST-to-DATE
    * treatment).
    */
  def q141AsofForward(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    events(s, d).createOrReplaceTempView("events")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(asofForwardSqlText))
  }

  private[graft] val asofForwardSqlText = """
      SELECT a.event_id, a.user_id,
             CAST(b.ts AS DATE) AS next_same_type_day,
             (b.ts IS NOT NULL) AS has_next
      FROM events a
      ASOF LEFT JOIN events b
        ON a.user_id = b.user_id AND a.event_type = b.event_type AND a.ts < b.ts
      ORDER BY a.event_id"""

  // --------------------------------------------------------------- windows

  /** Top-3 orders per customer: row_number window + filter. */
  def q07WindowTopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running sum per partition (rows frame) with deterministic order.
    * (l_orderkey, l_linenumber) is NOT unique in the generated data (118k
    * duplicate pairs at sf0.1, one full-tuple tie), so the ROWS-frame
    * order needs l_partkey + l_quantity tiebreaks: with l_quantity in
    * the order, rows that still tie contribute equal increments and the
    * output multiset is engine-independent.
    */
  def q08WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .withColumn("running_qty", sum(dec2(col("l_quantity"))).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
              col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** lag / lead / ntile / rank family over event streams. */
  def q22WindowLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("seq", row_number().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .select(col("event_id"), col("user_id"), col("seq"), col("quartile"),
              coalesce(col("prev_type"), lit("-")).as("prev_type"),
              coalesce(col("next_type"), lit("-")).as("next_type"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- topk / setops

  /** Global top-k: TakeOrderedAndProject, no full sort at scale. */
  def q12TopkGlobal(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(10)

  /** UNION / INTERSECT / EXCEPT distinct set algebra. */
  def q13SetOps(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    val rich = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
    val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
    auto.union(machinery).distinct()
      .intersect(rich)
      .except(c.filter(col("c_acctbal") > 9000.0).select(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }

  // ------------------------------------------------------- scalar functions

  /** String function battery. */
  def q14StringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        lower(col("p_type")).as("type_lc"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
        size(split(col("p_name"), " ")).as("n_words"))
      .orderBy(col("p_partkey"))

  /** Date/time functions: extract + trunc + diff. */
  def q15DateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(year(col("o_orderdate")).as("o_year"),
               month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_year"), col("o_month"))

  /** JSON extraction from a string column (events.props). */
  def q16Json(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Math + CASE bucketing. */
  def q21MathCase(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        floor(col("c_acctbal")).as("floor_bal"),
        ceil(col("c_acctbal")).as("ceil_bal"),
        sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_bucket"))
      .orderBy(col("c_custkey"))

  /** Conditional aggregation (pivot shape) per nation × return flag. */
  def q23PivotConditional(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(when(col("l_returnflag") === "A", dec2(col("l_quantity"))).otherwise(lit(0)))
          .cast("double").as("qty_a"),
        sum(when(col("l_returnflag") === "N", dec2(col("l_quantity"))).otherwise(lit(0)))
          .cast("double").as("qty_n"),
        sum(when(col("l_returnflag") === "R", dec2(col("l_quantity"))).otherwise(lit(0)))
          .cast("double").as("qty_r"))
      .orderBy(col("n_name"))

  // ------------------------------------------------------------------ maps

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_prune"        -> (q01ScanPrune _),
    "q02_agg_pricing"       -> (q02AggPricing _),
    "q03_join_revenue_nation" -> (q03JoinRevenueByNation _),
    "q04_semi_join"         -> (q04SemiJoin _),
    "q05_anti_join"         -> (q05AntiJoin _),
    "q06_outer_join"        -> (q06OuterJoin _),
    "q07_window_topk_group" -> (q07WindowTopkPerGroup _),
    "q08_window_running"    -> (q08WindowRunning _),
    "q09_distinct_agg"      -> (q09DistinctAgg _),
    "q10_rollup"            -> (q10Rollup _),
    "q11_cube"              -> (q11Cube _),
    "q12_topk_global"       -> (q12TopkGlobal _),
    "q13_set_ops"           -> (q13SetOps _),
    "q14_string_funcs"      -> (q14StringFuncs _),
    "q15_date_funcs"        -> (q15DateFuncs _),
    "q16_json"              -> (q16Json _),
    "q17_theta_join"        -> (q17ThetaJoin _),
    "q18_scalar_subquery"   -> (q18ScalarSubquery _),
    "q19_grouping_sets"     -> (q19GroupingSets _),
    "q20_asof_join"         -> (q20AsofJoin _),
    "q99_asof_sql"          -> (q99AsofSql _),
    "q141_asof_forward"     -> (q141AsofForward _),
    "q21_math_case"         -> (q21MathCase _),
    "q22_window_lag_lead"   -> (q22WindowLagLead _),
    "q23_pivot_conditional" -> (q23PivotConditional _),
  )

  val sql: Map[String, String] = Map(
    "q01_scan_prune" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-07-01'
      ORDER BY l_orderkey, l_linenumber""",

    "q02_agg_pricing" -> s"""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST($REV AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '2001-01-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q03_join_revenue_nation" -> s"""
      SELECT n_name, CAST($REV AS DOUBLE) AS revenue, COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    "q04_semi_join" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      ORDER BY c_custkey""",

    "q05_anti_join" -> """
      SELECT p_partkey, p_name, p_retailprice
      FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      ORDER BY p_partkey""",

    "q06_outer_join" -> """
      SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey""",

    "q07_window_topk_group" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",

    "q08_window_running" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_quantity
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem
      ORDER BY l_suppkey, l_orderkey, l_linenumber""",

    "q09_distinct_agg" -> """
      SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q10_rollup" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        COALESCE(l_linestatus, 'ALL') AS lstatus,
        GROUPING(l_returnflag, l_linestatus) AS gid,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, rflag, lstatus""",

    "q11_cube" -> """
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        GROUPING(o_orderstatus, o_orderpriority) AS gid,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority""",

    "q12_topk_global" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10""",

    "q13_set_ops" -> """
      SELECT c_custkey FROM (
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
         UNION
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0) t
      ORDER BY c_custkey""",

    "q14_string_funcs" -> """
      SELECT p_partkey,
        UPPER(p_brand) AS brand_uc,
        LOWER(p_type) AS type_lc,
        SUBSTR(p_name, 1, 8) AS name_prefix,
        LENGTH(p_name) AS name_len,
        CONCAT_WS('|', p_brand, p_type) AS brand_type,
        REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS no_vowels,
        LEN(STRING_SPLIT(p_name, ' ')) AS n_words
      FROM part
      ORDER BY p_partkey""",

    "q15_date_funcs" -> """
      SELECT YEAR(o_orderdate) AS o_year, MONTH(o_orderdate) AS o_month,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY YEAR(o_orderdate), MONTH(o_orderdate)
      ORDER BY o_year, o_month""",

    "q16_json" -> """
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        COUNT(*) AS n
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    "q17_theta_join" -> """
      SELECT n1.n_name AS nation_a, n2.n_name AS nation_b,
             n1.n_regionkey AS regionkey
      FROM nation n1 JOIN nation n2
        ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
      ORDER BY regionkey, nation_a, nation_b""",

    "q18_scalar_subquery" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM orders)
      ORDER BY o_orderkey""",

    "q19_grouping_sets" -> """
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""",

    "q20_asof_join" -> """
      SELECT e.event_id, e.user_id,
             CAST(o.o_orderdate AS DATE) AS last_order_date
      FROM events e
      ASOF LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
      ORDER BY e.event_id""",

    // byte-identical to the Spark side's input text: DuckDB runs the
    // native ASOF operator, Spark runs the rewriteAsof output
    "q99_asof_sql" -> asofSqlText,
    "q141_asof_forward" -> asofForwardSqlText,

    "q21_math_case" -> """
      SELECT c_custkey,
        ABS(c_acctbal) AS abs_bal,
        CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
        CAST(CEIL(c_acctbal) AS BIGINT) AS ceil_bal,
        SQRT(ABS(c_acctbal)) AS sqrt_bal,
        CASE WHEN c_acctbal < 0 THEN 'negative'
             WHEN c_acctbal < 5000 THEN 'low'
             ELSE 'high' END AS bal_bucket
      FROM customer
      ORDER BY c_custkey""",

    "q22_window_lag_lead" -> """
      SELECT event_id, user_id,
        ROW_NUMBER() OVER w AS seq,
        NTILE(4) OVER w AS quartile,
        COALESCE(LAG(event_type, 1) OVER w, '-') AS prev_type,
        COALESCE(LEAD(event_type, 1) OVER w, '-') AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id""",

    "q23_pivot_conditional" -> """
      SELECT n_name,
        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE) AS qty_a,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE) AS qty_n,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE) AS qty_r
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",
  )
}
