package graft.queries

import graft.Tables._
import graft.functions.{VectorFunctions => VF}
import graft.operators.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave coverage: embedding near-dup join, native pivot, RANGE
  * window frames, exact percentiles, array functions, and a query
  * executed by the YAML pipeline engine itself (source → derive → sql),
  * so the engine—not just the DataFrame API—sits in the correctness
  * gate.
  */
object ExtraQueries {

  /** Embedding-cosine near-dup pairs, exact (brute-force O(n²)/2). This
    * is the VERIFICATION ORACLE only — it plans as a
    * BroadcastNestedLoopJoin and must never run at scale. The production
    * pairwise path is the banded sign-LSH join in
    * [[graft.functions.VectorFunctions.lshNearDupPairs]]
    * (VectorQueries.q37EmbedNearDupLsh), whose precision is exact and
    * whose recall is asserted against this query's pass-set in DedupSpec.
    */
  def q46EmbedNearDup(s: SparkSession, d: String): DataFrame =
    // disk-memoized per corpus snapshot (content-fingerprint keyed,
    // shared with q37's audit — VERDICT r12 #2): the pair set is a
    // deterministic pure function of (corpus, threshold), so re-listing
    // it every run re-reads the parquet instead of re-running the O(n²)
    // scan; a regenerated corpus changes the key and rebuilds
    VF.exactNearDupPairsCached(embeddings(s, d), "vec_id", "embedding", 0.45, d)
      .orderBy(col("id_a"), col("id_b"))

  /** CDC-style upsert ([[graft.operators.Upsert]]): every 100th order
    * arrives as an update with doubled total price; same-key rows are
    * replaced, the rest pass through (left-anti + union — the MERGE
    * shape without a table format).
    */
  def q87Upsert(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val updates = base.filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") * 2).as("o_totalprice"))
    graft.operators.Upsert.byKey(base, updates, Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** Native pivot (count per status × priority), nulls filled to 0. */
  def q47Pivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map(
        "1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
        "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
      .orderBy(col("o_orderstatus"))

  /** RANGE frame: trailing-30-day order count + spend per customer. */
  def q48RangeFrame(s: SparkSession, d: String): DataFrame = {
    val dayNum = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(dayNum)
      .rangeBetween(-30, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"),
        count(lit(1)).over(w).as("orders_30d"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("spend_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exact interpolated percentiles per group. */
  def q49Median(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
           percentile(col("o_totalprice"), lit(0.9)).as("p90"),
           min(col("o_totalprice")).as("lo"),
           max(col("o_totalprice")).as("hi"))
      .orderBy(col("o_orderpriority"))

  /** Approximate quantiles with the accuracy bound IN the harness (the
    * q69 pattern for sketches): percentile_approx is Greenwald-Khanna
    * with guaranteed rank error ≤ 1/accuracy; we emit the EXACT
    * interpolated median (hash-matches DuckDB quantile_cont, proven by
    * q49) plus a boolean asserting the sketch value's realized rank sits
    * within 1.5× the theoretical bound. The oracle emits the exact
    * median with a literal TRUE — the gate fails iff the sketch drifts.
    */
  def q80ApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice").as("p"))
    val ap = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("p"), lit(0.5), lit(100)).as("ap"))
    // Exact interpolated median via the `percentile` AGGREGATE plus the
    // sketch's realized rank in the SAME single groupBy — no window.
    // The previous shape (window row_number + interpolation) was the
    // r4 single-core winner, but a window PARTITIONED BY a 3-value
    // flag is at most 3 tasks: one core sorts ~200k rows while 31
    // idle here, and at 100 TB those 3 partitions are the textbook
    // hot-partition sort. Percentile partial-aggregates on every scan
    // split (map-side value→count maps, mergeable), so the heavy pass
    // parallelizes with the input; its memory is bounded by DISTINCT
    // values per group — the honest scale limit of any EXACT
    // percentile, and this query's whole point is certifying the
    // UNBOUNDED-scale path (percentile_approx) against it. Both
    // formulations interpolate identically (q49 precedent:
    // percentile() hash-matches DuckDB quantile_cont bit-for-bit).
    li.join(broadcast(ap), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("p"), lit(0.5)).as("exact_median"),
           count(lit(1)).as("n"),
           sum(when(col("p") <= col("ap"), 1L).otherwise(0L)).as("le"))
      .select(col("l_returnflag"), col("exact_median"),
        (abs(col("le").cast("double") / col("n") - 0.5) <= 0.015)
          .as("rank_within_bound"))
      .orderBy(col("l_returnflag"))
  }

  /** Unkeyed interval join via bin quantization ([[graft.operators.RangeJoin]]):
    * 360 fixed 45-minute windows (every 2 h across the event month)
    * joined to events by containment — an equality join on the hour bin
    * instead of the nested-loop a bare range predicate plans. Oracle is
    * DuckDB's native inequality join over the same generated windows.
    */
  def q81RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val iv = s.range(0, 360).select(col("id").as("interval_id"),
      expr("timestamp_seconds(1704067200 + id * 7200)").as("w_start"),
      expr("timestamp_seconds(1704067200 + id * 7200 + 2700)").as("w_end"))
    graft.operators.RangeJoin.byTime(ev, "ts", iv, "w_start", "w_end", binSeconds = 3600)
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(dec6(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("interval_id"))
  }

  /** Array function battery over tokenized documents. */
  def q50ArrayOps(s: SparkSession, d: String): DataFrame = {
    val tok = split(col("text"), " ")
    documents(s, d)
      .select(col("doc_id"),
        size(array_distinct(tok)).as("n_uniq"),
        array_join(slice(sort_array(tok), 1, 3), ",").as("first3"),
        array_contains(tok, "spark").as("has_spark"),
        element_at(tok, 1).as("head_tok"))
      .orderBy(col("doc_id"))
  }

  /** The YAML pipeline engine end-to-end inside the correctness gate:
    * parquet source → derive stage → sql aggregation stage.
    */
  def q60PipelineSql(s: SparkSession, d: String): DataFrame = {
    val yaml =
      """
        |filters:
        |  - name: derive_tokens
        |    actionType: derive
        |    actionConfig:
        |      columns:
        |        - {name: n_tokens, expr: "size(split(text, ' '))"}
        |      filter: "n_chars >= 100"
        |  - name: agg
        |    actionType: sql
        |    code: "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM df GROUP BY lang ORDER BY lang"
        |""".stripMargin
    Pipeline.runYaml(s, yaml, s"$d/documents.parquet", None).output
  }

  /** DuckDB's PIVOT STATEMENT through the dialect layer (r6
    * what's-missing #1, the q99-for-ASOF pattern): the exact statement
    * text a reference user writes in a `sql` stage runs on BOTH
    * engines — graft auto-rewrites it to Spark's pivot clause,
    * DISCOVERING the pivot values from the data (the statement form's
    * defining convenience; Spark's clause requires them pinned), and
    * DuckDB executes it natively. count(*) keeps every cell integral →
    * hash-exact across engines.
    */
  private[graft] val pivotSqlText =
    "PIVOT (SELECT source, lang FROM documents) ON lang USING count(*) " +
      "GROUP BY source ORDER BY source"

  def q105PivotSql(s: SparkSession, d: String): DataFrame = {
    documents(s, d).createOrReplaceTempView("documents")
    s.sql(graft.operators.GraftSqlParser.rewritePivotStatement(s, pivotSqlText))
  }

  /** DuckDB's UNPIVOT STATEMENT, same both-engines treatment as q105:
    * columns to rows with INTO NAME/VALUE naming; NULL cells dropped by
    * both engines' defaults; BIGINT casts keep the shared value column
    * type exact.
    */
  private[graft] val unpivotSqlText =
    // FLOOR before the BIGINT cast: DuckDB's double→bigint cast rounds,
    // Spark's truncates — floor makes both exact on 2-decimal prices
    "UNPIVOT (SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice) AS BIGINT) AS tp, " +
      "CAST(o_custkey AS BIGINT) AS ck FROM orders) ON tp, ck " +
      "INTO NAME metric VALUE v ORDER BY k, metric"

  def q106UnpivotSql(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(graft.operators.GraftSqlParser.rewriteUnpivotStatement(unpivotSqlText))
  }

  /** DuckDB/Postgres `SELECT DISTINCT ON` through the dialect layer
    * (q105 pattern): the identical statement text runs on both engines —
    * graft lowers it to QUALIFY row_number() = 1 over the query's ORDER
    * BY ([[graft.operators.GraftSqlParser.rewriteDistinctOn]]), DuckDB
    * executes it natively. The ORDER BY pins a unique row per key
    * (c_custkey tie-break), so both engines keep the same one.
    */
  private[graft] val distinctOnSqlText =
    "SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal " +
      "FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey"

  def q107DistinctOnSql(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(distinctOnSqlText))
  }

  /** DuckDB `* EXCLUDE (...) REPLACE (expr AS col)` through the dialect
    * layer, same both-engines treatment: graft expands the star against
    * the relation schema ([[graft.operators.GraftSqlParser
    * .rewriteReplace]] — in a YAML `sql` stage the stage schema is used),
    * DuckDB executes the identical text natively.
    */
  private[graft] val starReplaceSqlText =
    "SELECT * EXCLUDE (n_regionkey) REPLACE (lower(n_name) AS n_name) " +
      "FROM nation ORDER BY n_nationkey"

  def q108StarReplaceSql(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d)
    n.createOrReplaceTempView("nation")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(
      graft.operators.GraftSqlParser.rewriteReplace(
        starReplaceSqlText, n.columns.toSeq)))
  }

  /** Flatten-all over a JSON-string column (pd.json_normalize analog,
    * fullExample.yml.old:75-91): schema inferred by sampling, then
    * from_json + star-expand.
    */
  def q61JsonFlatten(s: SparkSession, d: String): DataFrame =
    graft.functions.JsonOps.flattenJson(events(s, d), "props")
      .select(col("event_id"), col("event_type"), col("k"))
      .orderBy(col("event_id"))

  /** Bounded top-k per group via the custom TopKAggregator UDAF —
    * O(k) state per group instead of a full window sort.
    */
  def q62TopkAgg(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(3),
      org.apache.spark.sql.Encoders.product[graft.functions.Scored])
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("ids"))
      .select(col("o_custkey"),
        array_join(transform(col("ids"), _.cast("string")), ",").as("top3"))
      .orderBy(col("o_custkey"))
  }

  /** Explode as UDTF: token inverted-index counts (lateral view shape). */
  def q63Explode(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))

  /** Multiset algebra: INTERSECT ALL / EXCEPT ALL preserve duplicates. */
  def q64MultisetOps(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val a = li.filter(col("l_returnflag") === "A").select(col("l_suppkey"))
    val n = li.filter(col("l_returnflag") === "N").select(col("l_suppkey"))
    val r = li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
    a.intersectAll(n).exceptAll(r)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("l_suppkey"))
  }

  /** Date arithmetic: interval add/sub + day difference. */
  def q65DateArith(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"),
        date_add(col("o_orderdate").cast("date"), 30).as("due"),
        date_sub(col("o_orderdate").cast("date"), 7).as("week_before"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("age_days"),
        last_day(col("o_orderdate").cast("date")).as("month_end"))
      .orderBy(col("o_orderkey"))

  /** Remaining window family: rank/dense_rank/percent_rank/cume_dist +
    * first/last value frames.
    */
  def q66WindowMisc(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        first(col("c_custkey")).over(frame).as("poorest"),
        last(col("c_custkey")).over(frame).as("richest"))
      .orderBy(col("c_custkey"))
  }

  /** Ordered string aggregation (listagg/string_agg parity via sorted
    * collect_list — deterministic).
    */
  def q67ListAgg(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .groupBy(col("n_regionkey"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
           count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))

  /** Deterministic hash sampling — portable across engines (md5 prefix),
    * the reproducible alternative to TABLESAMPLE for pipeline sampling.
    */
  def q68HashSample(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** HLL sketch cardinalities with the accuracy bound IN the harness
    * (VERDICT r2 #8): sketch estimates are engine-specific, so instead
    * of emitting raw estimates (rows-only check), emit the EXACT
    * distinct counts plus booleans asserting the HLL estimate lands
    * within ±5% of them. The oracle computes the same exact counts with
    * literal TRUE flags — the driver's cell-exact compare then fails the
    * gate iff Spark's approx_count_distinct drifts out of the bound.
    */
  def q69ApproxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
           countDistinct(col("l_partkey")).as("exact_parts"),
           // rsd=0.01 so the ±5% assertion is a ~5σ bound, not ~1σ as
           // with the 0.05 default (which fails ~1/3 of the time)
           approx_count_distinct(col("l_orderkey"), 0.01).as("ao"),
           approx_count_distinct(col("l_partkey"), 0.01).as("ap"))
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("ao") - col("exact_orders")).cast("double") / col("exact_orders") <= 0.05)
          .as("orders_within_5pct"),
        (abs(col("ap") - col("exact_parts")).cast("double") / col("exact_parts") <= 0.05)
          .as("parts_within_5pct"))
      .orderBy(col("l_returnflag"))

  /** Correlated scalar subquery: orders above their own customer's mean
    * (decimal-exact mean so the threshold is engine-independent).
    */
  def q70CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_corr")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_corr o
      WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM orders_corr i WHERE i.o_custkey = o.o_custkey)
      ORDER BY o_orderkey
    """)
  }

  /** Regexp capture groups + position/occurrence functions. */
  def q71RegexpExtract(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("last_word"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        instr(col("p_name"), "a").as("first_a"))
      .orderBy(col("p_partkey"))

  /** IN-subquery predicate (plans as a semi join). */
  def q72InSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_in")
    customer(s, d).createOrReplaceTempView("customer_in")
    s.sql("""
      SELECT o_orderkey, o_custkey
      FROM orders_in
      WHERE o_custkey IN (SELECT c_custkey FROM customer_in WHERE c_acctbal > 8000.0)
      ORDER BY o_orderkey
    """)
  }

  /** Deterministic variance/stddev: built-in var_samp is a streaming
    * (order-dependent) fold in both engines, so compute from exact
    * decimal Σx and Σx² instead — identical on any partitioning. The
    * emitted statistics are rounded (var to 2, stddev to 4 decimals)
    * because DuckDB's wide-decimal→double cast can land one ulp away
    * from the correctly-rounded conversion once Σx² outgrows 2⁵³
    * significant bits (seen at sf0.1); rounding quantums sit orders of
    * magnitude above one ulp, so both engines agree.
    */
  def q73Variance(s: SparkSession, d: String): DataFrame = {
    val x = dec2(col("o_totalprice"))
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           sum(x).cast("double").as("sx"),
           sum(x * x).cast("double").as("sxx"))
      .select(col("o_orderstatus"), col("n"),
        round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 2)
          .as("var_samp"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 4)
          .as("stddev_samp"))
      .orderBy(col("o_orderstatus"))
  }

  /** Bitwise aggregates (commutative → order-independent). */
  def q74BitAggs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(bit_and(col("l_linenumber")).as("band"),
           bit_or(col("l_linenumber")).as("bor"),
           bit_xor(col("l_linenumber")).as("bxor"))
      .orderBy(col("l_returnflag"))

  /** String shaping family: pad / trim / repeat / reverse / translate. */
  def q75StringShape(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .select(col("n_nationkey"),
        lpad(col("n_name"), 12, "_").as("padded"),
        rtrim(lpad(col("n_name"), 12, " ")).as("trimmed"),
        reverse(col("n_name")).as("rev"),
        repeat(substring(col("n_name"), 1, 2), 3).as("rep"),
        translate(col("n_name"), "_", "-").as("dashed"))
      .orderBy(col("n_nationkey"))

  /** least / greatest / nullif / ifnull scalar conditionals. */
  def q76Conditionals(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        least(col("l_discount"), col("l_tax")).as("lo"),
        greatest(col("l_discount"), col("l_tax")).as("hi"),
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_neg"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** COLUMNS(...) star-pattern expansion through the dialect layer —
    * DuckDB executes the IDENTICAL statement text natively (the
    * q105-q108 pattern), covering the r8 item-replication semantics:
    * an aggregate + arithmetic applied per matched column, outputs
    * named after the matched columns (DuckDB 1.x naming, verified
    * against duckdb 1.0.0). max and doubling keep every value exact in
    * doubles, so the gate hash compares bit-for-bit. The matcher is a
    * BOOLEAN name-lambda (r9: LIKE/=/OR through
    * [[graft.operators.GraftSqlParser]]'s lambda grammar) so the
    * general predicate evaluator — not just the regex matcher — sits
    * in the gate; DialectSpec covers the rest of the grammar.
    */
  private[graft] val columnsSqlText =
    "SELECT l_returnflag, max(COLUMNS(c -> (c LIKE 'l_q%' OR c = 'l_extendedprice') " +
      "AND len(lower(c)) * 2 - 5 >= 5 + 10)) * 2, " +
      // r12 (VERDICT r11 #4): substring/replace NAME transforms and a
      // parenthesized numeric lambda body in-gate — matches l_discount
      // only (probed duckdb 1.0.0; output named after the matched column)
      "min(COLUMNS(c -> substring(replace(c, 'l_', ''), 1, 4) = 'disc' " +
      "AND (len(c) - 2) // 2 = 4)) " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"

  def q113ColumnsSql(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    l.createOrReplaceTempView("lineitem")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(
      graft.operators.GraftSqlParser.rewriteColumns(
        columnsSqlText, l.columns.toSeq)))
  }

  /** `WITH RECURSIVE` through the passthrough, IDENTICAL text on both
    * engines (VERDICT r8 missing #2 → the dialect layer's native-run
    * path): standard linear recursion builds the 0..6 level table,
    * joins it to customer, and aggregates — Spark 4.x executes
    * recursive CTEs natively (UnionLoop), DuckDB natively; the
    * DuckDialect hint stays as the fallback for unparseable shapes
    * (DialectSpec). Spark runs one JOB per recursion level (the
    * iterative-execution cost model: depth × driver floor, amortized
    * only by per-level data volume), so the gate recursion is kept
    * shallow — depth 7, ~0.1 s/level — while DialectSpec covers the
    * semantics at depth 25. DECIMAL sum → DOUBLE keeps the money
    * column exact (q81 precedent).
    */
  private[graft] val recursiveSqlText = """
      WITH RECURSIVE lvl AS (
        SELECT 0 AS n
        UNION ALL
        SELECT n + 1 FROM lvl WHERE n < 6)
      SELECT n, COUNT(*) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      FROM lvl JOIN customer ON c_nationkey % 7 = n
      GROUP BY n ORDER BY n"""

  def q117RecursiveSql(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(recursiveSqlText))
  }

  /** DuckDB bracket slicing `expr[begin:end]` through the dialect
    * layer, identical text on both engines (the q105-q108 pattern):
    * graft auto-rewrites every bracket-slice — inner bounds, open
    * ends, negatives — to the native [[graft.functions.expressions
    * .DuckSlice]] expression ([[graft.operators.GraftSqlParser
    * .rewriteSlice]]), DuckDB executes the text natively. String
    * slices keep the output hash scalar (no array columns to
    * canonicalize).
    */
  private[graft] val sliceSqlText = """
      SELECT n_nationkey, n_name[2:4] AS mid, n_name[-3:] AS tail,
             n_name[:4] AS head, n_name[3:-2] AS core
      FROM nation ORDER BY n_nationkey"""

  def q118SliceSql(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(sliceSqlText))
  }

  /** `arg_max`/`arg_min` + `GROUP BY ALL` + `ORDER BY ALL` through the
    * passthrough, identical text on both engines (the q105-q108
    * pattern): the argmax aliases route to Spark's max_by/min_by
    * Catalyst aggregates (same argument order as DuckDB, r9), and the
    * ALL forms run natively on Spark 4. The `arg_max` ORDER value is
    * the UNIQUE o_orderkey, so neither engine's tie behavior is
    * exercised and the result is deterministic.
    */
  private[graft] val argmaxSqlText = """
      SELECT o_custkey, arg_max(CAST(o_orderdate AS DATE), o_orderkey) AS last_key_date,
             arg_min(CAST(o_orderdate AS DATE), o_orderkey) AS first_key_date
      FROM orders GROUP BY ALL ORDER BY ALL"""

  def q119ArgmaxSql(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(argmaxSqlText))
  }

  /** DuckDB `CREATE MACRO` through the passthrough — identical
    * MULTI-STATEMENT text on both engines (the q105-q108 pattern, one
    * step further: the whole `CREATE MACRO ...; CREATE MACRO ...;
    * SELECT ...` batch a reference user hands a `sql` stage verbatim,
    * filefilter.py:340-342). Graft registers both macros in the session
    * registry ([[graft.operators.GraftSqlParser.registerMacro]]) and
    * expands the call sites textually ([[graft.operators.GraftSqlParser
    * .expandMacros]]) — a scalar macro inside an aggregate AND a table
    * macro as an IN-subquery source; DuckDB executes the same batch
    * natively. The DECIMAL(18,4) cast inside the macro body keeps the
    * summed revenue exact on both engines (q117's DECIMAL→DOUBLE
    * precedent), and both engines see the identical IEEE double product
    * before the cast.
    */
  private[graft] val macroSqlText = """
      CREATE OR REPLACE MACRO disc_price(p, d) AS CAST(p * (1 - d) AS DECIMAL(18,4));
      CREATE OR REPLACE MACRO pricey_orders(lim := 150000) AS TABLE
        SELECT o_orderkey FROM orders WHERE o_totalprice > lim;
      SELECT l_returnflag, COUNT(*) AS n_items,
             CAST(SUM(disc_price(l_extendedprice, l_discount)) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM pricey_orders())
      GROUP BY l_returnflag ORDER BY l_returnflag"""

  def q120MacroSql(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    orders(s, d).createOrReplaceTempView("orders")
    lineitem(s, d).createOrReplaceTempView("lineitem")
    graft.operators.SqlStage("q120", macroSqlText).apply(s, orders(s, d))
  }

  /** DuckDB's `DESCRIBE` statement through the passthrough — identical
    * text on both engines (the SUMMARIZE treatment, but byte-exact:
    * DESCRIBE is pure metadata, so DuckDB's six-column relation —
    * column_name/column_type/null/key/default/extra, DuckDB type
    * names, YES/NO nullability, NULL key/default/extra — hash-matches
    * exactly). Costs zero Spark jobs: the schema is already on the
    * driver. `DESCRIBE SELECT` keeps the inner query in the dialect
    * layer; Spark's own DESCRIBE TABLE / SHOW TABLES forms are never
    * claimed ([[graft.operators.GraftSqlParser.describeTarget]]).
    */
  private[graft] val describeSqlText =
    "DESCRIBE SELECT n_nationkey, n_name, n_regionkey FROM nation"

  def q121DescribeSql(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    graft.operators.SqlStage("q121", describeSqlText).apply(s, nation(s, d))
  }

  /** DuckDB file-I/O through the passthrough — identical multi-statement
    * text on both engines: `COPY (query) TO` writes csv (one with an
    * EXPLICIT non-default delimiter, one headerless ordered) and
    * JSONL files at exact paths (graft: coalesced part renamed over
    * them; DuckDB: natively), a `CREATE TEMP TABLE` seeds an empty
    * table whose schema comes from the OPTION-BEARING `read_csv(…,
    * delim = '|', header = true)`, `COPY … FROM` (r12, VERDICT r10 #4)
    * loads the csv back into it, and the final SELECT joins three
    * read-back legs: the loaded table, a `read_csv(…, header = false,
    * skip = 2, columns = {...})` leg (r12 gate anchor for the r11
    * genuine-skip implementation — the first two DATA rows of the
    * ordered headerless file drop, so skip_k is NULL for k 0-1), and a
    * `read_json(…, format = 'newline_delimited', columns = {...})` leg
    * (r12 anchor for the read_json option vocabulary). The whole
    * write→load→read round-trip is what hash-matches, so the writer's
    * quoting/delimiter/header, COPY FROM's positional typed append,
    * and every reader option are ALL under test. Each engine
    * overwrites the shared /tmp paths before reading, so each compares
    * its own round-trip. BIGINT casts pin the inferred int widths.
    *
    * SINGLE-RUNNER ASSUMPTION (ADVICE r12 #4): the fixture paths are
    * fixed literals because the gate's contract is byte-identical SQL
    * text on both engines — a per-session suffix would diverge from
    * the static oracle text. Two q124 executions racing in one process
    * would interleave on the shared paths and the COPY FROM append
    * count; every harness here serializes it (Bench's queue dequeues
    * each query once per pass, Verify/tests run it once), and a user
    * embedding this text runs it as a config statement batch, which is
    * sequential by construction.
    */
  private[graft] val copySqlText = """
      COPY (SELECT n_nationkey, n_name, n_regionkey FROM nation)
        TO '/tmp/graft_q124_roundtrip.csv' (FORMAT CSV, HEADER, DELIMITER '|');
      COPY (SELECT n_nationkey AS k, n_name AS name FROM nation ORDER BY n_nationkey)
        TO '/tmp/graft_q124_skip.csv' (FORMAT CSV, HEADER false);
      COPY (SELECT n_nationkey AS k, n_name AS name FROM nation)
        TO '/tmp/graft_q124_rt.json' (FORMAT JSON);
      CREATE OR REPLACE TEMP TABLE q124_loaded AS
        SELECT n_nationkey, n_name, n_regionkey
        FROM read_csv('/tmp/graft_q124_roundtrip.csv', delim = '|', header = true)
        WHERE n_nationkey < 0;
      COPY q124_loaded FROM '/tmp/graft_q124_roundtrip.csv' (FORMAT CSV, HEADER, DELIMITER '|');
      SELECT CAST(t.n_nationkey AS BIGINT) AS k, t.n_name,
             CAST(t.n_regionkey AS BIGINT) AS rk,
             CAST(s.k AS BIGINT) AS skip_k,
             CAST(j.k AS BIGINT) AS json_k, j.name AS json_name
      FROM q124_loaded t
      LEFT JOIN read_csv('/tmp/graft_q124_skip.csv', header = false, skip = 2,
                         columns = {'k': 'BIGINT', 'name': 'VARCHAR'}) s ON s.k = t.n_nationkey
      LEFT JOIN read_json('/tmp/graft_q124_rt.json', format = 'newline_delimited',
                          columns = {'k': 'BIGINT', 'name': 'VARCHAR'}) j ON j.k = t.n_nationkey
      ORDER BY k"""

  def q124CopyRoundtrip(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    // the read-back view re-registers on every rewrite (r9 review fix),
    // so each run reads its own freshly written file — no manual drop
    graft.operators.SqlStage("q124", copySqlText).apply(s, nation(s, d))
  }

  /** DuckDB's FROM-first statement syntax through the passthrough —
    * identical text on both engines ([[graft.operators.GraftSqlParser
    * .rewriteFromFirst]] restores standard clause order; DuckDB parses
    * it natively). DECIMAL→DOUBLE keeps the quantity sum exact.
    */
  private[graft] val fromFirstSqlText = """
      FROM lineitem SELECT l_returnflag, COUNT(*) AS n_rows,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      GROUP BY l_returnflag ORDER BY l_returnflag"""

  def q126FromFirst(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(fromFirstSqlText))
  }

  /** DuckDB list comprehensions through the passthrough — IDENTICAL
    * text on both engines (the q118 slicing pattern): `[expr FOR w IN
    * list IF cond]` auto-rewrites to `list_transform(list_filter(...))`
    * ([[graft.operators.GraftSqlParser.rewriteComprehension]], DuckDB's
    * own desugaring order — filter first) and the bare `['the','and']`
    * list literal to `array(...)` ([[graft.operators.GraftSqlParser
    * .rewriteListLiteral]], r10) and `GLOB` to an anchored RLIKE
    * ([[graft.operators.GraftSqlParser.rewriteGlob]], r10); DuckDB
    * executes all three natively. COALESCE pins the empty-list sum (DuckDB:
    * NULL) and BIGINT casts pin the widths.
    */
  private[graft] val comprehensionSqlText = """
      SELECT doc_id,
             CAST(COALESCE(list_sum([length(w) FOR w IN string_split(text, ' ')
                                     IF length(w) >= 4]), 0) AS BIGINT) AS long_chars,
             CAST(len([upper(w) FOR w IN string_split(text, ' ')
                       IF w LIKE 't%']) AS BIGINT) AS n_t_words,
             list_has_any(string_split(text, ' '), ['the', 'and']) AS has_stop,
             text GLOB '*data*' AS mentions_data
      FROM documents ORDER BY doc_id"""

  def q133Comprehension(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    documents(s, d).createOrReplaceTempView("documents")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(comprehensionSqlText))
  }

  /** DuckDB `//` and `**` operators through the passthrough — IDENTICAL
    * text on both engines (the q118/q133 pattern): `a // b` rewrites to
    * the native [[graft.functions.expressions.DuckDiv]] (integer
    * truncation / double division, probed semantics), `a ** b` to
    * `power`; DuckDB runs both natively. The BIGINT casts make the `//`
    * operands integral on both engines (the hash-exact path), while the
    * `// 2.5` term exercises the fractional double-division path under
    * a MAX (order-independent, so the double is bit-stable).
    */
  private[graft] val opsSqlText = """
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS BIGINT) // 7) AS BIGINT) AS q7,
             CAST(SUM(CAST(l_quantity AS BIGINT) % 7) AS BIGINT) AS m7,
             CAST(MAX(2 ** (CAST(l_quantity AS BIGINT) // 13)) AS DOUBLE) AS p13,
             CAST(MAX(CAST(l_quantity AS BIGINT) // 2.5) AS DOUBLE) AS f25
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  def q134DivPow(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(opsSqlText))
  }

  /** DuckDB `->`/`->>` JSON extraction through the passthrough —
    * IDENTICAL text on both engines: the JSON column is synthesized
    * in-query from documents (`||` concat + `//`, both portable), then
    * a nested `-> 'm' ->> 'half'` chain and a scalar `->> 'lang'`
    * extract from it, and a struct LITERAL field access (`({'q': …}).q` →
    * `named_struct`) rides along — graft rewrites the chain to `get_json_object`
    * ([[graft.operators.GraftSqlParser.rewriteJsonOps]]), DuckDB runs
    * the operators natively; ->> output forms agree (probed: VARCHAR,
    * unquoted strings, NULL on missing).
    */
  private[graft] val jsonOpsSqlText = """
      WITH p AS (
        SELECT doc_id, lang, n_chars,
               '{"lang": "' || lang || '", "m": {"half": ' || (n_chars // 2) || '}}' AS j
        FROM documents)
      SELECT doc_id, j ->> 'lang' AS jl,
             CAST(j -> 'm' ->> 'half' AS BIGINT) AS jh,
             ({'q': n_chars // 4, 'l': lang}).q AS sq
      FROM p ORDER BY doc_id"""

  def q135JsonOps(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    documents(s, d).createOrReplaceTempView("documents")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(jsonOpsSqlText))
  }

  /** Terminal-`->` JSON chains through the passthrough (r12, VERDICT
    * r11 #3) — IDENTICAL text on both engines: the synthesized JSON
    * exercises every rendering rule of DuckDB's JSON-typed `->` result
    * (all probed on duckdb 1.0.0): a string value keeps its QUOTES
    * (`->>`'s is unquoted — both in the same row for contrast), a
    * number canonicalizes, an OBJECT re-serializes compact with source
    * key order (the 'z' key before 'a' pins order preservation — the
    * rewrite's get_json_object branch, [[graft.operators.GraftSqlParser
    * .rewriteJsonOps]]), chained and array-indexed terminal `->`s
    * extract through, a JSON `null` value becomes SQL NULL, and a
    * missing key is NULL. A `transform` lambda with a constant string
    * body rides along to pin the lambda/JSON-arrow disambiguation.
    */
  private[graft] val jsonArrowSqlText = """
      WITH p AS (
        SELECT doc_id, lang, n_chars,
               '{"lang": "' || lang || '", "len": ' || n_chars ||
               ', "m": {"z": ' || (n_chars // 2) || ', "a": "' || lang || '"}' ||
               ', "tags": ["t0", "t1"]' ||
               ', "opt": ' || CASE WHEN n_chars % 3 = 0 THEN 'null'
                                   ELSE '"v' || (n_chars % 3) || '"' END || '}' AS j
        FROM documents)
      SELECT doc_id,
             j -> 'lang' AS j_quoted,
             j ->> 'lang' AS j_unquoted,
             j -> 'len' AS j_num,
             j -> 'm' AS j_obj,
             j -> 'm' -> 'z' AS j_chain,
             j -> 'tags' -> 1 AS j_idx,
             j -> 'opt' AS j_opt,
             j -> 'missing' AS j_miss,
             list_extract(list_transform([lang], x -> 'k'), 1) AS j_lambda
      FROM p ORDER BY doc_id"""

  def q139JsonArrow(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    documents(s, d).createOrReplaceTempView("documents")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(jsonArrowSqlText))
  }

  /** DuckDB `UNION ALL BY NAME` through the passthrough — IDENTICAL
    * text on both engines: two per-language aggregates with PARTIALLY
    * OVERLAPPING schemas merge by column name, each side's missing
    * column NULL-filled (probed DuckDB semantics = Spark's
    * `unionByName(allowMissingColumns = true)`); explicit NULLS FIRST
    * pins the one default the engines disagree on (Spark sorts nulls
    * first ascending, DuckDB last).
    */
  private[graft] val unionByNameSqlText = """
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
      UNION ALL BY NAME
      SELECT lang, CAST(SUM(length(text)) AS BIGINT) AS n_chars
      FROM documents GROUP BY lang
      ORDER BY lang, n_docs NULLS FIRST, n_chars NULLS FIRST"""

  def q137UnionByName(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    documents(s, d).createOrReplaceTempView("documents")
    graft.operators.SqlStage("q137", unionByNameSqlText).apply(s, documents(s, d))
  }

  /** DuckDB `MAP {...}` literals through the passthrough (r13 —
    * previously a guided error) — IDENTICAL text on both engines:
    * literals rewrite to Spark `map(...)` ([[graft.operators
    * .GraftSqlParser.rewriteStructLiteral]]'s map branch), and an
    * IMMEDIATELY-subscripted literal claims DuckDB 1.0's LIST-shaped
    * lookup — `[v]` on a hit, `[]` on a miss (probed; later DuckDBs
    * return the scalar) — via a `map_contains_key` CASE guard. The
    * gate pins: key/value order preservation (map_keys/map_values),
    * computed values, cardinality, hit/miss/expression-key lookups,
    * and a non-VARCHAR (integer) key space. BIGINT cast pins
    * cardinality's width (DuckDB: UBIGINT); list outputs serialize via
    * `array_to_string` (both engines; the miss row pins its
    * empty-list→NULL rule), since the driver compare sorts scalar cells.
    */
  private[graft] val mapLiteralSqlText = """
      SELECT doc_id,
             array_to_string(map_keys(MAP {'lang': lang, 'upper': upper(lang)}), ',') AS ks,
             array_to_string(map_values(MAP {'a': n_chars + 1, 'b': n_chars * 2}), ',') AS vs,
             CAST(cardinality(MAP {'x': 1, 'y': 2}) AS BIGINT) AS n,
             array_to_string(MAP {'k': lang, 'j': 'z'}['k'], ',') AS hit,
             array_to_string(MAP {'k': lang}['nope'], ',') AS miss,
             array_to_string(MAP {1: lang, 2: 'other'}[2], ',') AS intkey
      FROM documents ORDER BY doc_id"""

  def q144MapLiteral(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    documents(s, d).createOrReplaceTempView("documents")
    s.sql(graft.operators.GraftSqlParser.rewriteAll(mapLiteralSqlText))
  }

  /** DuckDB `UPDATE`/`DELETE` statements against a session temp table
    * (r13 — previously unclaimed DML) — IDENTICAL batch text on both
    * engines: DuckDB mutates its temp table natively; the engine
    * re-registers the view as the mutated relation (localCheckpointed —
    * constant plan depth across statements, the COPY FROM treatment).
    * The batch pins: predicate delete, multi-column conditional update
    * whose RHS carries a dialect-ism (`len`), SIMULTANEOUS assignment
    * (`SET n_nationkey = n_regionkey, n_regionkey = n_nationkey` swaps
    * — every RHS reads the OLD row, probed against duckdb 1.0.0), a
    * second delete over UPDATED values, and the final read-back. BIGINT
    * casts pin the key widths; the swap row (24 → 40/24) only survives
    * if both engines agree on old-row semantics.
    */
  private[graft] val dmlSqlText = """
      CREATE OR REPLACE TEMP TABLE q152_nat AS
        SELECT n_nationkey, n_name, n_regionkey FROM nation;
      DELETE FROM q152_nat WHERE n_regionkey = 2;
      UPDATE q152_nat SET n_name = lower(n_name) || '/' || len(n_name),
                          n_regionkey = n_regionkey * 10
        WHERE n_nationkey % 2 = 0;
      UPDATE q152_nat SET n_nationkey = n_regionkey, n_regionkey = n_nationkey
        WHERE n_nationkey >= 20;
      DELETE FROM q152_nat WHERE n_name LIKE '%a%' AND n_regionkey > 30;
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name, CAST(n_regionkey AS BIGINT) AS rk
      FROM q152_nat ORDER BY k, rk, n_name"""

  /** DuckDB `ALTER TABLE` / `TRUNCATE` statements over session temp
    * tables (r13, the DDL half of the q152 DML surface) — IDENTICAL
    * batch text on both engines: RENAME COLUMN, ADD COLUMN with and
    * without DEFAULT (omitted default fills NULL, probed), DROP
    * COLUMN, SET DATA TYPE (int → VARCHAR — both engines render '5'),
    * RENAME TO (the old name dies, the new one reads), and TRUNCATE
    * (scalar-subquery count pins the emptied table). The engine
    * re-registers views under the altered shape; DuckDB alters
    * natively.
    */
  private[graft] val alterSqlText = """
      CREATE OR REPLACE TEMP TABLE q153_t AS
        SELECT n_nationkey, n_name, n_regionkey FROM nation;
      DROP TABLE IF EXISTS q153_u;
      ALTER TABLE q153_t RENAME COLUMN n_name TO nm;
      ALTER TABLE q153_t ADD COLUMN flag INTEGER DEFAULT 1;
      ALTER TABLE q153_t ADD COLUMN note VARCHAR;
      ALTER TABLE q153_t DROP COLUMN n_regionkey;
      ALTER TABLE q153_t ALTER COLUMN n_nationkey SET DATA TYPE VARCHAR;
      ALTER TABLE q153_t RENAME TO q153_u;
      CREATE OR REPLACE TEMP TABLE q153_scratch AS SELECT * FROM nation;
      TRUNCATE q153_scratch;
      SELECT nm, n_nationkey AS k, CAST(flag AS BIGINT) AS flag, note,
             (SELECT COUNT(*) FROM q153_scratch) AS n_trunc
      FROM q153_u ORDER BY nm"""

  def q153AlterStatements(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    graft.operators.SqlStage("q153", alterSqlText).apply(s, nation(s, d))
  }

  /** DuckDB typed-table + upsert statements (r13, the third DML/DDL
    * gate after q152/q153) — IDENTICAL batch text on both engines:
    * typed CREATE TEMP TABLE (PRIMARY KEY + NOT NULL + DEFAULT),
    * insert-from-select, column-list insert with DEFAULT fill, ON
    * CONFLICT DO UPDATE with `excluded.` and old-row qualified refs,
    * OR IGNORE (conflict skipped), OR REPLACE with a partial column
    * list (unlisted columns keep OLD values, probed), a conditional
    * self-referencing upsert (`WHERE q154_t.k < 102` keeps 102's old
    * row), and the final read-back. DuckDB executes natively; the
    * engine re-registers views through [[graft.operators.SqlStage]]'s
    * executeInsert with session [[graft.operators.GraftSqlParser
    * .TableMeta]] constraints.
    */
  private[graft] val upsertSqlText = """
      CREATE OR REPLACE TEMP TABLE q154_t (
        k INTEGER PRIMARY KEY, nm VARCHAR NOT NULL, rk INTEGER DEFAULT -1,
        pop BIGINT);
      INSERT INTO q154_t SELECT n_nationkey, n_name, n_regionkey, NULL FROM nation;
      INSERT INTO q154_t (k, nm) VALUES (100, 'ATLANTIS'), (101, 'ELDORADO');
      INSERT INTO q154_t VALUES (100, 'ATLANTIS2', 9, 1)
        ON CONFLICT (k) DO UPDATE SET nm = excluded.nm,
          pop = COALESCE(q154_t.pop, 0) + excluded.pop;
      INSERT OR IGNORE INTO q154_t (k, nm) VALUES (101, 'X'), (102, 'SHANGRILA');
      INSERT OR REPLACE INTO q154_t (k, nm) VALUES (102, 'SHANGRILA2');
      INSERT INTO q154_t SELECT k, nm, rk, 7 FROM q154_t WHERE k >= 100
        ON CONFLICT (k) DO UPDATE SET pop = excluded.pop WHERE q154_t.k < 102;
      SELECT k, nm, rk, pop FROM q154_t ORDER BY k"""

  def q154UpsertStatements(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    graft.operators.SqlStage("q154", upsertSqlText).apply(s, nation(s, d))
  }

  /** DuckDB's inline `ORDER BY` modifier inside aggregate calls (r13)
    * — IDENTICAL text on both engines: `string_agg(x, sep ORDER BY
    * keys)` (→ listagg WITHIN GROUP), DISTINCT string_agg (→ the
    * sorted-struct array_join path), `array_agg(x ORDER BY k1 DESC,
    * k2 DESC)` (→ struct-sort with the generated comparator,
    * array_to_string-serialized for the hash compare — the q50
    * pattern), and `first`/`last` with single-key (→ min_by/max_by)
    * and multi-key (→ sorted-struct head) forms. The QUALIFY dedup
    * makes (l_orderkey, l_linenumber) unique first — the synthetic
    * lineitem has duplicate pairs with differing flags (unlike real
    * TPC-H), and inline-agg ties are engine order in BOTH engines —
    * so every ORDER BY is total and the hashes can't diverge.
    */
  private[graft] val aggOrderSqlText = """
      WITH li AS (
        SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
               row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                                  ORDER BY l_returnflag, l_linestatus) AS rn
        FROM lineitem WHERE l_orderkey < 300
        QUALIFY rn = 1
      )
      SELECT l_linestatus AS st,
        string_agg(l_orderkey, ',' ORDER BY l_orderkey, l_linenumber) AS ks,
        string_agg(DISTINCT l_returnflag, '|' ORDER BY l_returnflag) AS flags,
        array_to_string(array_agg(l_linenumber ORDER BY l_orderkey DESC, l_linenumber DESC), ';') AS ln_desc,
        first(l_returnflag ORDER BY l_orderkey * 10 + l_linenumber) AS first_flag,
        last(l_returnflag ORDER BY l_orderkey, l_linenumber) AS last_flag
      FROM li GROUP BY l_linestatus ORDER BY st"""

  def q155AggOrderBy(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    lineitem(s, d).createOrReplaceTempView("lineitem")
    graft.operators.SqlStage("q155", aggOrderSqlText).apply(s, lineitem(s, d))
  }

  /** The r13 probe-batch function surface — IDENTICAL text on both
    * engines: quantile_cont scalar forms (×2/×4 integer casts pin the
    * interpolation exactly), quantile_disc (CAST absorbs the
    * documented DOUBLE-vs-element-type divergence), the product and
    * entropy aggregate natives (round(×1e4) absorbs entropy's
    * sum-order ulp — a ×1e6 TRUNCATING cast landed exactly on a
    * truncation boundary at every SF), fdiv/fmod (floored division and FLOORED modulo,
    * probed), format('{}-{}') → concat rewrite, scalar-position
    * range/generate_series with negative steps, list_intersect
    * (list_sort first — element order is hash order in DuckDB,
    * first-array order in Spark), and unicode/ord incl. the '' → -1
    * pin. product's input is magnitude-bounded so the double is exact.
    */
  private[graft] val probeBatchSqlText = """
      SELECT l_linestatus AS st,
        CAST(quantile_cont(l_orderkey, 0.5) * 2 AS BIGINT) AS med2,
        CAST(quantile_cont(l_orderkey, 0.25) * 4 AS BIGINT) AS q1x4,
        CAST(quantile_disc(l_orderkey, 0.25) AS BIGINT) AS q1d,
        CAST(product(CASE WHEN l_orderkey < 12 AND l_linenumber <= 2 THEN l_linenumber END) AS BIGINT) AS prod_s,
        CAST(round(entropy(l_returnflag) * 10000) AS BIGINT) AS ent_u,
        CAST(fdiv(max(l_orderkey), 7) AS BIGINT) AS fd,
        CAST(fmod(max(l_orderkey), 7) AS BIGINT) AS fm,
        format('{}-{}', count(*), max(l_linenumber)) AS tag,
        array_to_string(range(2, 12, 3), ',') AS r3,
        array_to_string(generate_series(5, 1, -2), ',') AS gs,
        array_to_string(list_sort(list_intersect([1,2,3,4], [3,4,5])), ',') AS li,
        unicode('€') AS uc, ord('') AS oc
      FROM lineitem GROUP BY l_linestatus ORDER BY st"""

  def q156ProbeBatchFns(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    lineitem(s, d).createOrReplaceTempView("lineitem")
    graft.operators.SqlStage("q156", probeBatchSqlText).apply(s, lineitem(s, d))
  }

  /** DuckDB's in-call `IGNORE NULLS` window modifier (r13) — IDENTICAL
    * text on both engines: the rewrite moves it to Spark's position
    * between the call and OVER. Orders' o_orderkey is unique, so the
    * window order is total and no tie can diverge.
    */
  private[graft] val ignoreNullsSqlText = """
      SELECT o_orderkey AS k,
        lag(CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END IGNORE NULLS)
          OVER (ORDER BY o_orderkey) AS prev_pri,
        first_value(CASE WHEN o_totalprice > 150000 THEN o_orderstatus END IGNORE NULLS)
          OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS big_first,
        lead(o_orderpriority, 2) OVER (ORDER BY o_orderkey) AS nxt2
      FROM orders WHERE o_orderkey < 500 ORDER BY k"""

  def q157IgnoreNulls(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    orders(s, d).createOrReplaceTempView("orders")
    graft.operators.SqlStage("q157", ignoreNullsSqlText).apply(s, orders(s, d))
  }

  /** The string-similarity native family (r13) — IDENTICAL text on
    * both engines: jaccard / jaro / jaro_winkler (round(×1e3/×1e5)
    * integer casts absorb float-op-order ulp between the two
    * implementations of the same formulas), damerau_levenshtein (FULL
    * DL) and hamming/mismatches (integer — compared raw), strip_accents
    * and nfc_normalize. All byte-based like DuckDB (probed).
    */
  private[graft] val textSimSqlText = """
      SELECT n_nationkey AS k,
        CAST(round(jaccard(n_name, 'NATION_1') * 1000) AS BIGINT) AS jac_m,
        CAST(round(jaro_winkler_similarity(n_name, 'NATION_1') * 100000) AS BIGINT) AS jw_m,
        CAST(round(jaro_similarity(n_name, 'NOTION_' || n_nationkey) * 100000) AS BIGINT) AS js_m,
        damerau_levenshtein(n_name, 'NATION_10') AS dl,
        hamming(lpad('' || n_nationkey, 2, '0'), '12') AS ham,
        mismatches(n_name || '!', n_name || '?') AS mm,
        strip_accents('âéïõü ' || n_name) AS sa,
        length(nfc_normalize('é')) AS nfc_len
      FROM nation ORDER BY k"""

  def q158TextSimilarity(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    graft.operators.SqlStage("q158", textSimSqlText).apply(s, nation(s, d))
  }

  /** Blocked fuzzy entity resolution (r13) — the classic record-linkage
    * shape on top of the byte-exact q158 metrics, IDENTICAL text on
    * both engines: deterministically corrupt one side (translate 0→O,
    * 1→l — the OCR-style typo model), sorted-neighborhood BLOCK on the
    * key bucket (`k // 10` — an equality join, so Spark shuffles/
    * broadcasts it like any join; never all-pairs), score each in-block
    * pair with the codegen'd jaro_winkler native (round ×1e5 absorbs
    * float-op-order ulp), and elect each dirty record's best match with
    * a QUALIFY row_number window (jw desc, key tiebreak). The `hit`
    * column audits realized accuracy in-gate (0.90 at sf0.01 — ties
    * where a neighbor matches equally elect the lower key, probed).
    * Scale shape: candidate pairs = N·blockSize, one shuffle on the
    * block key + one on the election partition — the same two-exchange
    * plan at any corpus size.
    */
  private[graft] val fuzzyMatchSqlText = """
      WITH dirty AS (
        SELECT c_custkey AS k, translate(c_name, '01', 'Ol') AS nm FROM customer
      ),
      cand AS (
        SELECT d.k AS dk, c.c_custkey AS ck,
               CAST(round(jaro_winkler_similarity(d.nm, c.c_name) * 100000) AS BIGINT) AS jw_m
        FROM dirty d JOIN customer c ON d.k // 10 = c.c_custkey // 10
      )
      SELECT dk, ck, jw_m,
             CASE WHEN dk = ck THEN 1 ELSE 0 END AS hit
      FROM cand
      QUALIFY row_number() OVER (PARTITION BY dk ORDER BY jw_m DESC, ck) = 1
      ORDER BY dk"""

  def q159FuzzyMatch(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    customer(s, d).createOrReplaceTempView("customer")
    graft.operators.SqlStage("q159", fuzzyMatchSqlText).apply(s, customer(s, d))
  }

  /** The r13 date/time probe-batch closures over the EVENTS stream —
    * IDENTICAL text on both engines: `time_bucket` (6-hour group
    * buckets + a 15-minute bucket pinned to the nanosecond through
    * epoch_ns — the native's 2000-01-03 origin shows in every value),
    * boundary-counting `date_diff` vs complete-interval `datesub` on
    * the same (min, max) pair (the two semantics differ and BOTH are
    * pinned), `dayname` (full names), `isodow`, `gcd`, and `even` on a
    * deterministic integer+0.5 input (float-free — even() jumps at
    * every even boundary, so a ulp-bearing avg would flip it).
    * Timestamps render via strftime (the raw-timestamp compare gotcha).
    */
  private[graft] val timeBucketSqlText = """
      SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M') AS bucket,
             event_type,
             count(*) AS n,
             date_diff('hour', min(ts), max(ts)) AS span_h,
             datesub('minute', min(ts), max(ts)) AS span_min_full,
             dayname(min(ts)) AS first_day,
             isodow(min(ts)) AS dow,
             epoch_ns(time_bucket(INTERVAL '15 minutes', min(ts))) AS bn,
             greatest_common_divisor(count(*), 12) AS g,
             CAST(even((count(*) % 7) + 0.5) AS BIGINT) AS ev
      FROM events
      GROUP BY 1, 2 ORDER BY 1, 2"""

  def q160TimeBucket(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    events(s, d).createOrReplaceTempView("events")
    graft.operators.SqlStage("q160", timeBucketSqlText).apply(s, events(s, d))
  }

  /** Window frame EXCLUDE gate (r13) — IDENTICAL text on both engines:
    * DuckDB executes the exclusion clause natively, Spark through
    * [[graft.operators.GraftSqlParser.rewriteFrameExclude]]'s
    * subtraction identities (full-frame aggregate minus the current
    * row's / the peer group's contribution — the peer group computed
    * via a RANGE CURRENT-ROW-both window). Covers all three modes over
    * sum/count/avg: EXCLUDE CURRENT ROW on a numeric RANGE neighborhood
    * (value-determined, so order-stable under the unique key), EXCLUDE
    * GROUP and TIES over a partitioned unbounded RANGE where ORDER BY n
    * carries heavy ties (the peer group is the whole n-tier), and
    * EXCLUDE CURRENT ROW on ROWS UNBOUNDED-both (order-insensitive).
    * Money is exact per-row cents (round before the sum — DuckDB's
    * double→BIGINT cast ROUNDS where Spark truncates); avg lands
    * through round(×1e4). Scale shape: one aggregate plus windows —
    * the rewrite adds no extra exchange (the peer window shares the
    * frame window's partitioning and sort).
    */
  private[graft] val frameExcludeSqlText = """
      WITH per AS (
        SELECT o_custkey AS k, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
      )
      SELECT k, n,
        CAST(sum(cents) OVER (ORDER BY k RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING
                         EXCLUDE CURRENT ROW) AS BIGINT) AS neigh_cents,
        count(*) OVER (ORDER BY k RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING
                       EXCLUDE CURRENT ROW) AS neigh_n,
        CAST(sum(cents) OVER (PARTITION BY k % 8 ORDER BY n RANGE BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS BIGINT) AS other_tier_cents,
        count(*) OVER (PARTITION BY k % 8 ORDER BY n RANGE BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS non_peer_n,
        CAST(round(avg(n) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) * 10000) AS BIGINT) AS avg_other_n
      FROM per ORDER BY k"""

  def q161FrameExclude(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    orders(s, d).createOrReplaceTempView("orders")
    graft.operators.SqlStage("q161", frameExcludeSqlText).apply(s, orders(s, d))
  }

  /** Regex-surface gate (r13) — IDENTICAL text on both engines, the
    * CORRECTNESS anchor for three silent-divergence fixes probed out of
    * DuckDB 1.0: regexp_replace replaces the FIRST match only (Spark's
    * builtin replaces all — renamed by the dialect layer to the
    * [[graft.functions.expressions.DuckRegexpReplace]] native), the
    * options-string 4th arg (`g`, `gi`), RE2 `\N` backrefs in the
    * replacement, RAW string literals (`'\d'` IS backslash-d —
    * rewriteRawLiterals; Spark's parser would unescape it to `d`), and
    * SIMILAR TO as whole-string regex (NOT the SQL-standard wildcard
    * form). strpos rides along. Row-local codegen'd expressions — no
    * exchange beyond the scan and final sort at any scale.
    */
  private[graft] val regexSurfaceSqlText = """
      SELECT c_custkey AS k,
        regexp_replace(c_name, '0', '*') AS first_zero,
        regexp_replace(c_name, '0+', '<z>', 'g') AS zero_runs,
        regexp_replace(c_name, '(\d)(\d)$', '\2\1', 'g') AS tail_swapped,
        regexp_replace(c_name, 'customer', 'CUST', 'gi') AS renamed,
        regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_masked,
        CASE WHEN c_name SIMILAR TO 'Customer#\d+' THEN 1 ELSE 0 END AS canonical,
        CASE WHEN c_mktsegment NOT SIMILAR TO '.*E.*' THEN 1 ELSE 0 END AS no_e,
        strpos(c_name, '#') AS hash_pos,
        strpos(c_mktsegment, 'O') AS o_pos
      FROM customer ORDER BY k"""

  def q162RegexSurface(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    customer(s, d).createOrReplaceTempView("customer")
    graft.operators.SqlStage("q162", regexSurfaceSqlText).apply(s, customer(s, d))
  }

  /** Collection-surface gate (r13) — IDENTICAL text on both engines:
    * DuckDB 1-based scalar subscripts incl. negative-from-end, `[0]`/
    * out-of-range NULL and 1-based string chars (the r13
    * rewriteSubscript pass — Spark's native subscript is 0-based, the
    * classic silent off-by-one), list_sort's ASC-NULLS-LAST default
    * and 'DESC' modifier, json_group_array/object (single-row groups —
    * DuckDB aggregates in input order, so multi-row groups would be
    * order-fragile), fractional-DOUBLE epoch, date_part's list→struct
    * form (to_json for a type-stable compare), and GROUP BY ALL.
    * Row-local work over one aggregate — a scan plus one exchange.
    */
  private[graft] val collectionSqlText = """
      WITH toks AS (
        SELECT doc_id, lang, n_chars, string_split(text, ' ') AS ts FROM documents
      )
      SELECT doc_id,
        ts[1] AS head_tok,
        ts[-1] AS tail_tok,
        COALESCE(ts[0], '<null>') AS zero_tok,
        COALESCE(ts[len(ts) + 5], '<null>') AS oob_tok,
        (list_sort(ts))[2] AS second_sorted,
        (list_sort(ts, 'DESC'))[1] AS max_tok,
        (ts[1])[1] AS head_char,
        (ts[1])[-2] AS head_penult,
        strpos(ts[1], 'e') AS e_pos,
        json_group_array(n_chars) AS chars_json,
        json_group_object(lang, n_chars) AS lang_json,
        CAST(round(epoch(TIMESTAMP '2024-01-01 00:00:01.5') * 10) AS BIGINT) AS ep,
        to_json(date_part(['year','month'], DATE '2024-03-05')) AS parts
      FROM toks
      GROUP BY ALL
      ORDER BY doc_id"""

  def q163Collections(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    documents(s, d).createOrReplaceTempView("documents")
    graft.operators.SqlStage("q163", collectionSqlText).apply(s, documents(s, d))
  }

  /** Operator-semantics gate (r13) — IDENTICAL text on both engines,
    * anchoring the fourth probe sweep's silent-divergence fixes:
    * DuckDB's `^` is EXPONENT (Spark's is XOR — rewriteCaret), 1-arg
    * `log` is LOG10 (Spark's is ln — the duck_log rename), `xor()` as
    * the bitwise function, left/right with NEGATIVE lengths (drop from
    * the other end), aggregate FILTER over WINDOW functions (Spark:
    * unsupported — rewritten to the CASE-guarded argument), and the
    * list folds (list_reduce no-init fold, list_median interpolated
    * midpoint, array_pop_back). round(×1e4) absorbs ln/exp ulp.
    * Row-local work plus two windows — scan-shaped at any scale.
    */
  private[graft] val operatorSemanticsSqlText = """
      SELECT n_nationkey AS k,
        CAST(round(2 ^ (n_nationkey % 5) * 100) AS BIGINT) AS pow2,
        CAST(round(log(n_nationkey + 1) * 10000) AS BIGINT) AS lg10,
        CAST(round(log(2, n_nationkey + 1) * 10000) AS BIGINT) AS lg2,
        xor(n_nationkey, 21) AS xr,
        left(n_name, -2) AS lcut,
        right(n_name, -2) AS rcut,
        count(*) FILTER (WHERE n_regionkey = 0) OVER (ORDER BY n_nationkey) AS r0_so_far,
        CAST(sum(n_regionkey) FILTER (WHERE n_nationkey % 2 = 0) OVER
             (ORDER BY n_nationkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS even_r,
        list_reduce([n_nationkey + 1, 2, 3], (a, b) -> a * b) AS folded,
        list_median([n_nationkey, 0, 10, 5]) AS med,
        array_to_string(array_pop_back(string_split(n_name, '_')), ',') AS stem
      FROM nation ORDER BY k"""

  def q167OperatorSemantics(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    graft.operators.SqlStage("q167", operatorSemanticsSqlText).apply(s, nation(s, d))
  }

  /** Joined-UPDATE statement gate (r13) — IDENTICAL batch text on both
    * engines: CTAS aggregate, multi-row INSERT, DELETE ... RETURNING
    * (executes mid-batch; DuckDB's batch rule keeps the LAST relation),
    * and `UPDATE ... SET ... FROM (subquery) WHERE join-pred` (each
    * target row takes its matching from-row's assignment — matches are
    * UNIQUE here, since an over-matched row is engine-arbitrary in
    * BOTH engines), closed by a full-state SELECT pinning every
    * mutation. The Spark exec: one join on the from-predicate + one
    * row-id join back ([[graft.operators.SqlStage]] executeUpdateFrom).
    */
  private[graft] val updateFromSqlText = """
      CREATE OR REPLACE TEMP TABLE adj AS
        SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n
        FROM customer GROUP BY 1;
      INSERT INTO adj VALUES ('AAA_FIRST', 7), ('ZZZ_LAST', 9);
      DELETE FROM adj WHERE seg = 'ZZZ_LAST' RETURNING seg, n;
      UPDATE adj SET n = adj.n + b.bonus
        FROM (SELECT 'HOUSEHOLD' AS s, 1000 AS bonus
              UNION ALL SELECT 'MACHINERY', 2000) b
        WHERE adj.seg = b.s;
      SELECT seg, n FROM adj ORDER BY seg"""

  def q164UpdateFrom(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    customer(s, d).createOrReplaceTempView("customer")
    graft.operators.SqlStage("q164", updateFromSqlText).apply(s, customer(s, d))
  }

  /** RETURNING-projection gate (r13) — the batch ENDS on an
    * `UPDATE ... FROM ... RETURNING expr-list`, so the compared
    * relation is the post-assignment affected rows themselves (probed:
    * DuckDB returns NEW values for UPDATE; check.py sorts rows, so the
    * unordered RETURNING relation compares stably).
    */
  private[graft] val returningSqlText = """
      CREATE OR REPLACE TEMP TABLE nat2 AS
        SELECT n_nationkey AS k, n_name AS nm, CAST(n_regionkey AS BIGINT) AS r
        FROM nation;
      UPDATE nat2 SET r = nat2.r * 100 + b.add
        FROM (SELECT 0 AS rk, 11 AS add UNION ALL SELECT 1, 22) b
        WHERE nat2.r = b.rk
        RETURNING k, nm, r, r // 10 AS r10"""

  def q165Returning(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    graft.operators.SqlStage("q165", returningSqlText).apply(s, nation(s, d))
  }

  def q152DmlStatements(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    graft.operators.SqlStage("q152", dmlSqlText).apply(s, nation(s, d))
  }

  /** Sorted-layout sink round-trip ([[graft.sources.Sources
    * .writeSorted]]): range-partition documents by (lang, doc_id), sort
    * within partitions, write parquet, read BACK and aggregate — the
    * gate proves the layout op loses/duplicates nothing (the aggregate
    * is layout-independent, so DuckDB replays it straight off the
    * original table), while PartitionSpec proves the pruning property
    * the layout exists for (pairwise-disjoint per-file key ranges).
    */
  def q127SortedLayout(s: SparkSession, d: String): DataFrame = {
    val dir = "/tmp/graft_q127_layout"
    graft.sources.Sources.writeSorted(
      documents(s, d), dir, Seq("lang", "doc_id"), files = 8)
    s.read.parquet(dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"))
  }

  /** Seeded `USING SAMPLE` gate (r14, VERDICT r13 #4) — IDENTICAL text
    * on both engines; both seeded spellings (`50% (bernoulli, 377)` and
    * `bernoulli(50%) REPEATABLE (377)`, probed duckdb 1.0.0) execute,
    * on Spark via `TABLESAMPLE ... REPEATABLE(seed)`. The two engines'
    * RNGs pick DIFFERENT rows for the same seed (no portable seeded
    * sampler exists), so the gate checks the INVARIANTS each engine
    * must satisfy on its own sample — the q37 sentinel pattern: exact
    * n_total (oracle-verified), a proper nonempty subset, the two
    * spellings yield the SAME set (seed determinism within a session),
    * and the sampled fraction lands within a 4-sigma band of 50%.
    */
  private[graft] val sampleSeededSqlText = """
      WITH s AS (SELECT doc_id FROM documents USING SAMPLE 50% (bernoulli, 377)),
           s2 AS (SELECT doc_id FROM documents USING SAMPLE bernoulli(50%) REPEATABLE (377))
      SELECT (SELECT count(*) FROM documents) AS n_total,
             (SELECT count(*) FROM s) > 0 AS sampled_some,
             (SELECT count(*) FROM s) < (SELECT count(*) FROM documents) AS sampled_proper,
             (SELECT count(*) FROM s) = (SELECT count(*) FROM s2) AS same_n,
             (SELECT count(*) FROM (SELECT doc_id FROM s EXCEPT SELECT doc_id FROM s2)) = 0 AS same_set,
             abs(CAST((SELECT count(*) FROM s) AS DOUBLE) / (SELECT count(*) FROM documents) - 0.5) < 0.25 AS frac_ok"""

  def q171SampleSeeded(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    documents(s, d).createOrReplaceTempView("documents")
    graft.operators.SqlStage("q171", sampleSeededSqlText).apply(s, documents(s, d))
  }

  /** `mad` aggregate gate (r14, VERDICT r13 #5) — IDENTICAL text on
    * both engines ([[graft.functions.expressions.GraftMad]]). Exactness
    * strategy: l_quantity is integral, so every order statistic and
    * .5-midpoint is exact in binary and the two engines' interpolation
    * formulas agree bit-for-bit; the 2-decimal money/discount columns
    * interpolate inexactly, so they land through round(·, 4/6) (far
    * from the rounding boundary — the frameExclude money treatment).
    */
  private[graft] val madSqlText = """
      SELECT l_returnflag,
             mad(CAST(l_quantity AS DOUBLE)) AS mad_qty,
             round(mad(CAST(l_extendedprice AS DOUBLE)), 4) AS mad_price,
             round(mad(CAST(l_discount AS DOUBLE)), 6) AS mad_disc,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  def q172Mad(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    lineitem(s, d).createOrReplaceTempView("lineitem")
    graft.operators.SqlStage("q172", madSqlText).apply(s, lineitem(s, d))
  }

  /** 3-arg `time_bucket` gate (r14, VERDICT r13 #5) — IDENTICAL text:
    * the OFFSET form (shift-bucket-unshift, [[graft.functions
    * .expressions.TimeBucketOffset]]) over fixed and month widths, and
    * the ORIGIN form ([[graft.functions.expressions.TimeBucketOrigin]])
    * with a time-bearing fixed-width origin, a month-width origin
    * (day/time discarded), and a DATE+DATE origin pair returning DATE.
    */
  private[graft] val timeBucket3SqlText = """
      SELECT strftime(time_bucket(INTERVAL '6 hours', ts, INTERVAL '90 minutes'), '%Y-%m-%d %H:%M') AS b_off,
             strftime(time_bucket(INTERVAL '7 days', ts, TIMESTAMP '2024-01-04 07:30:00'), '%Y-%m-%d %H:%M') AS b_org,
             strftime(time_bucket(INTERVAL '2 months', ts, INTERVAL '10 days'), '%Y-%m-%d') AS b_moff,
             strftime(time_bucket(INTERVAL '1 month', ts, TIMESTAMP '2000-06-15 07:30:00'), '%Y-%m-%d') AS b_morg,
             time_bucket(INTERVAL '7 days', CAST(ts AS DATE), DATE '2024-01-04') AS b_date,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2, 3, 4, 5"""

  def q173TimeBucket3(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    events(s, d).createOrReplaceTempView("events")
    graft.operators.SqlStage("q173", timeBucket3SqlText).apply(s, events(s, d))
  }

  /** r14 leftover-function gate — IDENTICAL text on both engines:
    * list_where (positional mask filter), list_select (1-based gather,
    * invalid→NULL), array_resize (2-arg; the 3-arg fill form crashes
    * duckdb 1.0.0 over an array_agg input — `std::bad_array_new_length`
    * — so it's pinned by DialectSpec literals instead), nextafter
    * (IEEE — bit-identical), and gamma/lgamma (Lanczos vs libm through
    * round(·, 6); arguments bounded so the rounding boundary is ≥ 9
    * orders away from the approximation error).
    */
  private[graft] val listOpsSqlText = """
      WITH g AS (SELECT l_orderkey AS k,
                        array_agg(CAST(l_quantity AS INT) ORDER BY l_linenumber) AS qs
                 FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey)
      SELECT k,
        array_to_string(list_where(qs, list_transform(qs, q -> q > 25)), ',') AS big,
        array_to_string(list_select(qs, [1, 3, 5]), ',') AS gather,
        array_to_string(array_resize(qs, 4), ',') AS r4,
        array_to_string(array_resize(qs, 6), ',') AS r6,
        nextafter(CAST(len(qs) AS DOUBLE), 100.0) AS na,
        round(lgamma(CAST(k % 40 AS DOUBLE) + 1.5), 6) AS lg,
        round(gamma(1 + (len(qs) % 5) * 0.5), 6) AS gm
      FROM g ORDER BY k"""

  def q174ListOps(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    lineitem(s, d).createOrReplaceTempView("lineitem")
    graft.operators.SqlStage("q174", listOpsSqlText).apply(s, lineitem(s, d))
  }

  /** EXPORT / IMPORT DATABASE round-trip gate (r14, VERDICT r13
    * missing #5): a session table exports (DuckDB-compatible
    * schema.sql + load.sql + one parquet file), is DROPPED, and comes
    * back via IMPORT — the final SELECT must reproduce the source
    * exactly, which the oracle independently recomputes from nation
    * (a property oracle: the two engines' seeded export DIRECTORIES
    * aren't comparable, the restored relation is). Runs in a FRESH
    * session so only this gate's table exports (DuckDB's EXPORT walks
    * the whole catalog the same way).
    */
  private[graft] def exportImportSqlText(dir: String) = s"""
      CREATE OR REPLACE TEMP TABLE q176_src AS
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS nm,
               CAST(n_regionkey AS BIGINT) AS rk FROM nation;
      EXPORT DATABASE '$dir' (FORMAT PARQUET);
      DROP TABLE q176_src;
      IMPORT DATABASE '$dir';
      SELECT k, nm, rk FROM q176_src ORDER BY k"""

  /** One derived session per caller session, cached: every live
    * SparkSession attaches listeners to the shared context bus, so a
    * session-per-invocation q176 would accumulate them across bench
    * passes (the r12 session-per-pass latency inflation).
    */
  private val q176Sessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  def q176ExportImport(s: SparkSession, d: String): DataFrame = {
    val s2 = q176Sessions.computeIfAbsent(s, _.newSession())
    graft.functions.expressions.GraftFunctions.register(s2)
    nation(s2, d).createOrReplaceTempView("nation")
    // per-derived-session directory — the q181 concurrent-stream
    // treatment (a shared path races EXPORT overwrite vs IMPORT read)
    graft.operators.SqlStage("q176", exportImportSqlText(
      s"/tmp/graft_q176_db_${Integer.toHexString(System.identityHashCode(s2))}"))
      .apply(s2, nation(s2, d))
  }

  /** Quantified comparisons + named-window EXCLUDE gate (r14) —
    * IDENTICAL text on both engines: `> ALL` / `> ANY` against a
    * value-set subquery, `= ANY` / `<> ALL` membership forms (the
    * 3VL-exact CASE lowering — [[graft.operators.GraftSqlParser
    * .rewriteQuantified]]), and a WINDOW-clause frame EXCLUDE
    * ([[graft.operators.GraftSqlParser.rewriteNamedWindows]] inlining
    * into the subtraction-identity rewrite). Money sums in exact
    * per-row cents (the frameExclude treatment).
    */
  private[graft] val quantifiedSqlText = """
      WITH t AS (SELECT o_orderkey AS k, o_custkey AS c,
                        CAST(o_totalprice AS DOUBLE) AS p
                 FROM orders WHERE o_orderkey < 400)
      SELECT k, c,
             p > ALL (SELECT CAST(o_totalprice AS DOUBLE) FROM orders WHERE o_orderkey < 40) AS gt_all,
             p > ANY (SELECT CAST(o_totalprice AS DOUBLE) FROM orders WHERE o_orderkey < 40) AS gt_any,
             c = ANY (SELECT c_custkey FROM customer WHERE c_custkey < 100) AS eq_any,
             c <> ALL (SELECT c_custkey FROM customer WHERE c_custkey < 100) AS ne_all,
             CAST(sum(CAST(round(p * 100) AS BIGINT)) OVER w AS BIGINT) AS neigh_cents
      FROM t
      WINDOW w AS (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW)
      ORDER BY k"""

  def q177Quantified(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    orders(s, d).createOrReplaceTempView("orders")
    customer(s, d).createOrReplaceTempView("customer")
    graft.operators.SqlStage("q177", quantifiedSqlText).apply(s, orders(s, d))
  }

  /** Sixth-sweep function gate (r14) — IDENTICAL text on both engines
    * covering the probe-sweep closures end-to-end: json_object/
    * json_extract[_string]/json_type/json_valid, ISO week/isoyear/
    * yearweek/julian/era, 2-arg regexp_extract (group 0) and
    * regexp_escape, format_bytes + the decimal variant, md5_number
    * halves (VARCHAR-cast — DuckDB renders UBIGINT, Spark
    * DECIMAL(20,0)), the parse_path family, strlen/isfinite/signbit/
    * trunc/to_hex/greatest-1-arg, vector list_dot_product over DECIMAL
    * literals, array_unique, and negative list_element.
    */
  private[graft] val sweep6SqlText = """
      SELECT l_orderkey AS k, l_linenumber AS ln,
             json_extract_string(json_object('q', CAST(l_quantity AS INT), 'f', l_returnflag), 'f') AS jf,
             json_extract(json_object('q', CAST(l_quantity AS INT)), '$.q') AS jq,
             json_type(json_object('q', CAST(l_quantity AS INT))) AS jt,
             json_valid(l_returnflag) AS jv,
             week(l_shipdate) AS wk, isoyear(l_shipdate) AS iy, yearweek(l_shipdate) AS yw,
             CAST(julian(l_shipdate) AS BIGINT) AS jd,
             era(l_shipdate) AS er,
             regexp_extract(l_linestatus || l_returnflag, '[A-Z]+') AS re1,
             regexp_escape(l_returnflag || '.' || l_linestatus) AS resc,
             format_bytes(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)) AS fb,
             formatReadableDecimalSize(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)) AS fd,
             CAST(md5_number_lower(l_returnflag || l_orderkey) AS STRING) AS ml,
             CAST(md5_number_upper(l_returnflag || l_orderkey) AS STRING) AS mu,
             parse_filename('/corpus/' || l_returnflag || '/' || l_orderkey || '.txt', true) AS pf,
             parse_dirpath('/corpus/' || l_returnflag || '/' || l_orderkey || '.txt') AS pd,
             array_to_string(parse_path('/corpus/' || l_returnflag || '/' || l_orderkey || '.txt'), '|') AS pp,
             strlen(l_returnflag || l_linestatus) AS sl,
             isfinite(CAST(l_discount AS DOUBLE)) AS fin,
             signbit(CAST(l_discount AS DOUBLE) - 0.05) AS sb,
             trunc(CAST(l_quantity AS DOUBLE) / 7) AS tr,
             to_hex(l_orderkey) AS hx,
             greatest(l_orderkey) AS g1,
             CAST(list_dot_product([CAST(l_quantity AS DOUBLE), 1.0], [2.0, 3.0]) AS BIGINT) AS dp,
             array_unique([l_returnflag, l_linestatus, l_returnflag]) AS au,
             list_element([l_orderkey, l_partkey], -1) AS le
      FROM lineitem WHERE l_orderkey < 120 ORDER BY k, ln"""

  def q178Sweep6(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    lineitem(s, d).createOrReplaceTempView("lineitem")
    graft.operators.SqlStage("q178", sweep6SqlText).apply(s, lineitem(s, d))
  }

  /** Seventh-sweep function gate (r15, VERDICT r14 #4) — IDENTICAL text
    * on both engines covering the sweep-7 closures end-to-end: the TIME
    * type family (make_time, hour/minute/second on TIME, TIME→VARCHAR,
    * the sub-minute millisecond/microsecond counts on TIME and
    * TIMESTAMP), make_timestamptz, session-zone timezone/timezone_hour/
    * timezone_minute, epoch_ns, 1-arg add/subtract, the like_escape
    * family, list_resize, array_cross_product, polymorphic
    * length(list), json_object()/json_array/json_structure/
    * json_contains, format-list try_strptime, and the BLOB
    * encode→octet_length/bit_length pair. Sweep-7 measures 396/414 of
    * DuckDB's own scalar catalog executing (gen_duck_probes.py +
    * graft.tools.Sweep7; the icu_collate_* family executes too — q183);
    * the 18-function remainder is BIT-typed probes and session-meta/
    * debug functions.
    */
  private[graft] val sweep7SqlText = """
      WITH t AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
               l_returnflag, l_linestatus, l_quantity,
               make_time(CAST(l_quantity AS INT) % 24,
                         CAST(l_partkey AS INT) % 60,
                         CAST(CAST(l_suppkey AS INT) % 60 AS DOUBLE) + 0.25) AS tm,
               make_time(CAST(l_quantity AS INT) % 24,
                         CAST(l_partkey AS INT) % 60,
                         CAST(CAST(l_suppkey AS INT) % 60 AS DOUBLE)) AS tms,
               CAST(l_shipdate AS TIMESTAMP)
                 + to_milliseconds(CAST(l_partkey AS INT) % 90000) AS ts
        FROM lineitem WHERE l_orderkey < 60)
      SELECT k, ln,
             CAST(tms AS VARCHAR) AS tmv,
             CAST(hour(tm) AS INT) AS th,
             CAST(minute(tm) AS INT) AS tmin,
             CAST(second(tm) AS INT) AS tsec,
             CAST(millisecond(tm) AS BIGINT) AS tm_ms,
             CAST(microsecond(tm) AS BIGINT) AS tm_us,
             CAST(millisecond(ts) AS BIGINT) AS ts_ms,
             CAST(timezone(ts) AS BIGINT) AS tz_s,
             CAST(timezone_hour(ts) AS BIGINT) AS tz_h,
             CAST(timezone_minute(ts) AS BIGINT) AS tz_m,
             CAST(epoch_ns(ts) AS BIGINT) AS ens,
             strftime(make_timestamptz(2024, 1, k % 28 + 1, 13, 30, 5.5), '%Y-%m-%d %H:%M:%S') AS mtz,
             CAST(add(k) AS BIGINT) AS a1,
             CAST(subtract(ln) AS BIGINT) AS s1,
             like_escape(l_returnflag || '%', l_returnflag || 'x%', 'x') AS le,
             ilike_escape(l_returnflag || '%', lower(l_returnflag) || 'x%', 'x') AS ile,
             not_like_escape(l_returnflag || '_', l_returnflag || 'x%', 'x') AS nle,
             not_ilike_escape(l_returnflag || '_', lower(l_returnflag) || 'x%', 'x') AS nile,
             array_to_string(list_resize([k, CAST(ln AS BIGINT)], 4), ',') AS lr,
             CAST(list_element(array_cross_product(
               [CAST(ln AS DOUBLE), 2.0, 3.0],
               [4.0, 5.0, CAST(k % 7 AS DOUBLE)]), 1) AS BIGINT) AS cp1,
             CAST(list_element(array_cross_product(
               [CAST(ln AS DOUBLE), 2.0, 3.0],
               [4.0, 5.0, CAST(k % 7 AS DOUBLE)]), 3) AS BIGINT) AS cp3,
             CAST(length([k, k, k]) AS INT) AS ll,
             json_array(k, l_returnflag, NULL) AS ja,
             json_object() AS jo0,
             json_structure(json_object('q', CAST(l_quantity AS INT), 'f', l_returnflag)) AS js,
             json_contains(json_object('f', l_returnflag), '"A"') AS jc,
             strftime(try_strptime(strftime(ts, '%Y-%m-%d'), ['%d/%m/%Y', '%Y-%m-%d']), '%Y-%m-%d') AS tsp,
             CAST(octet_length(encode(l_returnflag || l_linestatus)) AS INT) AS ol,
             CAST(bit_length(l_returnflag) AS INT) AS bl,
             bar(CAST(l_quantity AS DOUBLE), 0, 50, 10) AS br
      FROM t ORDER BY k, ln"""

  def q180Sweep7(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    lineitem(s, d).createOrReplaceTempView("lineitem")
    graft.operators.SqlStage("q180", sweep7SqlText).apply(s, lineitem(s, d))
  }

  /** Eighth-sweep function gate (r16, VERDICT r15 #1 — the catalog's
    * TERMINAL state) — IDENTICAL text on both engines covering the
    * sweep-8 closures end-to-end: `age` (Postgres-style symbolic
    * calendar subtraction in both directions, zero case, month/day
    * borrows, fraction trimming — graft renders DuckDB's
    * INTERVAL→VARCHAR form so the CAST text is byte-identical),
    * `md5_number` (little-endian SIGNED int128 digest, rendered as its
    * decimal digits — DuckDB's HUGEINT exceeds DECIMAL(38,0)),
    * `setseed` (returns NULL; seeds the session registry that makes
    * random() reproducible), `unpivot_list` and `gen_random_uuid`
    * (length-36 sentinel — values are nondeterministic by design).
    * With these, sweep-8 measures 401/414 of DuckDB's own scalar
    * catalog executing (gen_duck_probes.py + graft.tools.Sweep7); the
    * 13-function remainder is the PERMANENT exclusion table in
    * COVERAGE.md (BIT/TIMETZ-typed + session-meta/debug), each raising
    * a guided error — pinned in DialectSpec.
    */
  private[graft] val sweep8SqlText = """
      WITH t AS (
        SELECT l_orderkey AS k, l_linenumber AS ln, l_returnflag, l_linestatus,
               CAST(l_shipdate AS TIMESTAMP)
                 + to_milliseconds(CAST(l_partkey % 86399123 AS BIGINT)) AS ts1,
               CAST(l_shipdate AS TIMESTAMP)
                 + to_months(CAST(l_suppkey % 25 AS INT) - 12)
                 + to_days(CAST(l_partkey % 47 AS INT) - 23)
                 + to_milliseconds(CAST(l_suppkey % 77777777 AS BIGINT)) AS ts2
        FROM lineitem WHERE l_orderkey < 60)
      SELECT k, ln,
             CAST(age(ts1, ts2) AS VARCHAR) AS a12,
             CAST(age(ts2, ts1) AS VARCHAR) AS a21,
             CAST(age(ts1, ts1) AS VARCHAR) AS a0,
             CAST(age(TIMESTAMP '2024-03-01 00:00:00.5', ts2) AS VARCHAR) AS af,
             CAST(md5_number(l_returnflag || CAST(k AS VARCHAR)) AS VARCHAR) AS mn,
             setseed(0.25) IS NULL AS seeded,
             array_to_string(unpivot_list(l_returnflag, l_linestatus, CAST(ln AS VARCHAR)), ',') AS ul,
             CAST(length(CAST(gen_random_uuid() AS VARCHAR)) AS INT) AS gl
      FROM t ORDER BY k, ln"""

  def q184Sweep8(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    lineitem(s, d).createOrReplaceTempView("lineitem")
    graft.operators.SqlStage("q184", sweep8SqlText).apply(s, lineitem(s, d))
  }

  /** Option-bearing `read_csv` / `read_parquet` table functions (r17,
    * VERDICT r16 #5) — IDENTICAL text on both engines, the q124
    * write→read round-trip pattern (same single-runner /tmp-path
    * contract): the csv leg exercises `sample_size = -1` (Spark's
    * inference always reads the whole file — that exact behavior),
    * `all_varchar` (inference off; the CAST pins the width on both),
    * and `filename` (per-row source path, plain-path rendering — the
    * LIKE keeps the gate location-independent); the parquet leg writes
    * two DIFFERENT schemas and reads them back through a glob with
    * `union_by_name = true` (DuckDB's name-matched NULL-filling union
    * = Spark's mergeSchema, probed 1.0.0); the csv-glob leg (r18,
    * VERDICT r17 #3) writes two csvs with DIFFERENT headers and
    * re-reads them through `union_by_name = true` — the glob expands
    * and the per-file frames align by name with NULL fill
    * (`unionByName(allowMissing)`), first file's columns leading.
    */
  private[graft] val readOptsSqlText = """
      COPY (SELECT n_nationkey AS k, n_name AS name, n_regionkey AS rk FROM nation)
        TO '/tmp/graft_q186_opts.csv' (FORMAT CSV, HEADER);
      COPY (SELECT n_nationkey AS k, n_name AS name FROM nation WHERE n_regionkey = 0)
        TO '/tmp/graft_q186_u1.parquet' (FORMAT PARQUET);
      COPY (SELECT n_nationkey AS k, n_regionkey AS rk FROM nation WHERE n_regionkey = 1)
        TO '/tmp/graft_q186_u2.parquet' (FORMAT PARQUET);
      COPY (SELECT n_nationkey AS k, n_name AS name FROM nation WHERE n_regionkey = 2)
        TO '/tmp/graft_q186_c1.csv' (FORMAT CSV, HEADER);
      COPY (SELECT n_nationkey AS k, n_regionkey AS rk, n_name AS name
            FROM nation WHERE n_regionkey = 3)
        TO '/tmp/graft_q186_c2.csv' (FORMAT CSV, HEADER);
      SELECT CAST(c.k AS BIGINT) AS k, c.name, c.rk AS rk_str,
             c.fname LIKE '%graft_q186_opts.csv' AS from_csv,
             CAST(u.k2 AS BIGINT) AS uk, u.name2 AS uname, CAST(u.rk2 AS BIGINT) AS urk,
             cu.name3 AS cuname, CAST(cu.rk3 AS BIGINT) AS curk
      FROM (SELECT k, name, rk, filename AS fname
            FROM read_csv('/tmp/graft_q186_opts.csv', header = true,
                          sample_size = -1, all_varchar = true, filename = true)) c
      LEFT JOIN (SELECT k AS k2, name AS name2, rk AS rk2
                 FROM read_parquet('/tmp/graft_q186_u*.parquet', union_by_name = true)) u
        ON CAST(u.k2 AS BIGINT) = CAST(c.k AS BIGINT)
      LEFT JOIN (SELECT k AS k3, name AS name3, rk AS rk3
                 FROM read_csv('/tmp/graft_q186_c*.csv', header = true,
                               union_by_name = true)) cu
        ON CAST(cu.k3 AS BIGINT) = CAST(c.k AS BIGINT)
      ORDER BY k"""

  def q186ReadOptions(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    graft.operators.SqlStage("q186", readOptsSqlText).apply(s, nation(s, d))
  }

  /** format() fmt-spec battery (r17, VERDICT r16 "missing #3") —
    * IDENTICAL text on both engines: zero/fill/align padding, grouped
    * decimals, '#'-prefixed radixes, signed fixed/scientific/general
    * floats (fmt's exact-binary HALF_EVEN rounding — DuckSweep kernels,
    * differentially validated on 11k random (value, spec) pairs),
    * positional reuse with a spec, string width/truncation, and a
    * boolean. Doubles derive from integer columns divided by powers of
    * two, so both engines format the identical exact binary value.
    */
  private[graft] val fmtSpecsSqlText = """
      SELECT l_orderkey AS k, l_linenumber AS ln,
             format('{:08d}', l_orderkey - 3000) AS pad0,
             format('{:*>,12d}', l_orderkey * l_partkey) AS grp,
             format('{:#x}', l_suppkey) AS hexv,
             format('{:#o}', l_partkey) AS octv,
             format('{:b}', l_linenumber) AS binv,
             format('{:+.3f}', CAST(l_orderkey - 2000 AS DOUBLE) / 64) AS ffix,
             format('{:.5e}', CAST(l_partkey AS DOUBLE) / 256) AS fsci,
             format('{:.6g}', CAST(l_suppkey * l_orderkey AS DOUBLE) / 16) AS fgen,
             format('{0:^9}|{0:.2s}', l_returnflag || l_linestatus) AS strf,
             format('{:6}', l_linenumber % 2 = 0) AS boolstr,
             format('{: d}', l_suppkey - 50) AS sgn,
             printf('%05d|%,d', l_suppkey - 50, l_orderkey * l_partkey) AS pfd,
             printf('%x %#o %u', l_suppkey - 50, l_partkey, l_suppkey - 50) AS pfx,
             printf('%+.3f %.2e', CAST(l_orderkey - 2000 AS DOUBLE) / 64,
                    CAST(l_partkey AS DOUBLE) / 256) AS pff,
             printf('%8.1s|%s', l_returnflag || l_linestatus, l_linestatus) AS pfs,
             printf('%+x %.5d % .3u', l_suppkey - 50, l_suppkey - 50, l_linenumber) AS pfp,
             printf('%#.5o|%,.9d', l_partkey, l_orderkey * l_partkey) AS pfo,
             printf('%*d|%-*x', CAST(l_linenumber + 4 AS INT), l_suppkey,
                    CAST(l_linenumber AS INT), l_partkey) AS pfw,
             printf('%*.*f', CAST(8 AS INT), CAST(l_linenumber - 2 AS INT),
                    CAST(l_orderkey - 2000 AS DOUBLE) / 64) AS pfdw
      FROM lineitem WHERE l_orderkey < 40 ORDER BY k, ln"""

  def q187FmtSpecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    val li = graft.Tables.lineitem(s, d)
    li.createOrReplaceTempView("lineitem")
    graft.operators.SqlStage("q187", fmtSpecsSqlText).apply(s, li)
  }

  /** ICU-collation gate (r15) — IDENTICAL text on both engines: the
    * `icu_collate_<locale>` family orders a per-locale word battery
    * (each battery drawn from the locale's OWN alphabet) and the two
    * engines' orderings must agree byte-for-byte. The key BYTES differ
    * by design (DuckDB renders ICU sort keys, graft renders
    * java.text.Collator keys — see the DuckDialect registration notes),
    * so the gate hashes the ORDERING, the actual contract. 16 locales
    * spanning Latin-with-diacritics, digraph collations (es ch / cs ch
    * / hu cs / hr lj), expansion collations (de ß), Cyrillic, Greek,
    * Hebrew, CJK and Vietnamese; `icu_sort_key(s, 'locale')` rides the
    * de battery. Verified-diverging locales (fr backward accents, uk
    * Cyrillic ghe-upturn) are documented divergences and stay out.
    */
  private[graft] val icuCollateSqlText = """
      WITH b(loc, x) AS (VALUES
        ('de', 'apfel'), ('de', 'ähre'), ('de', 'azur'), ('de', 'ober'),
        ('de', 'öl'), ('de', 'ost'), ('de', 'strasse'), ('de', 'Straße'),
        ('de', 'szene'), ('de', 'ufer'), ('de', 'über'), ('de', 'zelt'),
        ('es', 'cama'), ('es', 'chico'), ('es', 'dardo'), ('es', 'lado'),
        ('es', 'llave'), ('es', 'luz'), ('es', 'nido'), ('es', 'ñu'), ('es', 'oso'),
        ('sv', 'apa'), ('sv', 'vem'), ('sv', 'wok'), ('sv', 'zebra'),
        ('sv', 'åka'), ('sv', 'ärta'), ('sv', 'öra'),
        ('cs', 'cena'), ('cs', 'čas'), ('cs', 'dub'), ('cs', 'hora'),
        ('cs', 'chata'), ('cs', 'ihla'), ('cs', 'rak'), ('cs', 'řeka'),
        ('cs', 'sad'), ('cs', 'šance'), ('cs', 'zub'), ('cs', 'žena'),
        ('da', 'abe'), ('da', 'zebra'), ('da', 'æble'), ('da', 'øre'), ('da', 'åben'),
        ('pl', 'as'), ('pl', 'bak'), ('pl', 'cena'), ('pl', 'ćma'),
        ('pl', 'lok'), ('pl', 'łok'), ('pl', 'noc'), ('pl', 'oko'),
        ('pl', 'ósemka'), ('pl', 'sad'), ('pl', 'śad'), ('pl', 'zad'),
        ('pl', 'źad'), ('pl', 'żad'),
        ('hu', 'cab'), ('hu', 'csak'), ('hu', 'dal'), ('hu', 'gaz'),
        ('hu', 'gyar'), ('hu', 'oda'), ('hu', 'ör'),
        ('tr', 'cam'), ('tr', 'çam'), ('tr', 'gaz'), ('tr', 'ise'),
        ('tr', 'ısı'), ('tr', 'oda'), ('tr', 'öde'), ('tr', 'su'),
        ('tr', 'şu'), ('tr', 'ulu'), ('tr', 'ünlü'),
        ('ru', 'азбука'), ('ru', 'буква'), ('ru', 'весна'), ('ru', 'если'),
        ('ru', 'ёлка'), ('ru', 'жизнь'), ('ru', 'зима'),
        ('el', 'αλφα'), ('el', 'βητα'), ('el', 'γαμμα'), ('el', 'δελτα'), ('el', 'ζητα'),
        ('ro', 'ac'), ('ro', 'ață'), ('ro', 'azi'), ('ro', 'sase'),
        ('ro', 'șase'), ('ro', 'tara'), ('ro', 'țara'), ('ro', 'zi'),
        ('hr', 'cica'), ('hr', 'čačak'), ('hr', 'ćup'), ('hr', 'dane'),
        ('hr', 'džep'), ('hr', 'đak'), ('hr', 'evo'), ('hr', 'luk'),
        ('hr', 'ljeto'), ('hr', 'noc'), ('hr', 'njega'), ('hr', 'on'),
        ('hr', 'sok'), ('hr', 'šok'), ('hr', 'zub'), ('hr', 'žut'),
        ('fi', 'aalto'), ('fi', 'vesi'), ('fi', 'zeta'), ('fi', 'åland'),
        ('fi', 'äiti'), ('fi', 'öljy'),
        ('he', 'אבא'), ('he', 'בית'), ('he', 'גמל'), ('he', 'דלת'),
        ('ja', 'あい'), ('ja', 'かき'), ('ja', 'さし'), ('ja', 'たち'),
        ('vi', 'an'), ('vi', 'ăn'), ('vi', 'ân'), ('vi', 'ba'),
        ('vi', 'đa'), ('vi', 'da'), ('vi', 'e'), ('vi', 'ê'))
      SELECT loc,
             string_agg(x, '|' ORDER BY
               CASE loc
                 WHEN 'de' THEN icu_collate_de(x)
                 WHEN 'es' THEN icu_collate_es(x)
                 WHEN 'sv' THEN icu_collate_sv(x)
                 WHEN 'cs' THEN icu_collate_cs(x)
                 WHEN 'da' THEN icu_collate_da(x)
                 WHEN 'pl' THEN icu_collate_pl(x)
                 WHEN 'hu' THEN icu_collate_hu(x)
                 WHEN 'tr' THEN icu_collate_tr(x)
                 WHEN 'ru' THEN icu_collate_ru(x)
                 WHEN 'el' THEN icu_collate_el(x)
                 WHEN 'ro' THEN icu_collate_ro(x)
                 WHEN 'hr' THEN icu_collate_hr(x)
                 WHEN 'fi' THEN icu_collate_fi(x)
                 WHEN 'he' THEN icu_collate_he(x)
                 WHEN 'ja' THEN icu_collate_ja(x)
                 ELSE icu_collate_vi(x)
               END, x) AS ordering,
             string_agg(CASE WHEN loc = 'de' THEN x END, '|' ORDER BY icu_sort_key(x, 'de'), x) AS ordering_de_key
      FROM b GROUP BY loc ORDER BY loc"""

  def q183IcuCollate(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    nation(s, d).createOrReplaceTempView("nation")
    graft.operators.SqlStage("q183", icuCollateSqlText).apply(s, nation(s, d))
  }

  /** ATTACH/DETACH gate (r15, VERDICT r14 missing #2): EXPORT a session
    * table, drop it, ATTACH the export directory (attach → detach →
    * re-attach exercises the alias lifecycle) and read it back
    * alias-qualified ([[graft.operators.GraftSqlParser.executeAttach]]
    * / [[graft.operators.GraftSqlParser.rewriteAttachedRefs]]). The
    * DuckDB oracle runs its own native ATTACH round-trip through a real
    * .db storage file — both engines attach, both read alias-qualified,
    * and the relations must agree. Fresh derived session, the q176
    * treatment (EXPORT walks every session table).
    */
  private[graft] def attachSqlText(dir: String) = s"""
      CREATE OR REPLACE TEMP TABLE q181_src AS
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS nm,
               CAST(n_regionkey AS BIGINT) AS rk FROM nation;
      EXPORT DATABASE '$dir' (FORMAT PARQUET);
      DROP TABLE q181_src;
      ATTACH '$dir' AS tmpdb;
      DETACH tmpdb;
      ATTACH '$dir' AS adb;
      SELECT k, nm, rk FROM adb.q181_src ORDER BY k"""

  def q181Attach(s: SparkSession, d: String): DataFrame = {
    val s2 = q176Sessions.computeIfAbsent(s, _.newSession())
    graft.functions.expressions.GraftFunctions.register(s2)
    nation(s2, d).createOrReplaceTempView("nation")
    // the export directory is PER DERIVED SESSION: the bench's ten
    // concurrent streams each run this gate, and a shared path would
    // race one stream's EXPORT overwrite against another's ATTACH read
    val dir = s"/tmp/graft_q181_db_${Integer.toHexString(System.identityHashCode(s2))}"
    // repeated invocations (bench passes) re-run the batch in the SAME
    // derived session: DETACH leftovers from the previous pass first
    graft.operators.SqlStage("q181",
      s"DETACH IF EXISTS tmpdb; DETACH IF EXISTS adb; ${attachSqlText(dir)}")
      .apply(s2, nation(s2, d))
  }

  /** Exact-n reservoir sample gate (r15, VERDICT r14 missing #3) —
    * IDENTICAL text on both engines, the q171 invariant pattern: both
    * engines draw their own reservoir(n ROWS) samples (different RNGs,
    * so the picked rows differ) and the gate pins the invariants DuckDB
    * guarantees: exactly n rows, a subset of the input, same seed →
    * same set, distinct rows stay distinct, and the size-first
    * `n ROWS (reservoir, seed)` spelling draws the same set as the
    * function spelling with that seed (true in both engines, probed).
    */
  private[graft] val reservoirSqlText = """
      WITH s AS (SELECT doc_id FROM documents USING SAMPLE reservoir(100 ROWS) REPEATABLE (42)),
           s2 AS (SELECT doc_id FROM documents USING SAMPLE reservoir(100 ROWS) REPEATABLE (42)),
           s3 AS (SELECT doc_id FROM documents USING SAMPLE 40 ROWS (reservoir, 7)),
           s4 AS (SELECT doc_id FROM documents USING SAMPLE reservoir(40 ROWS) REPEATABLE (7)),
           s5 AS (SELECT doc_id FROM documents USING SAMPLE reservoir(20%) REPEATABLE (11)),
           s6 AS (SELECT doc_id FROM documents USING SAMPLE 20% (reservoir, 11)),
           sc AS (SELECT doc_id FROM documents WHERE doc_id < 400),
           sc2 AS (SELECT * FROM sc USING SAMPLE reservoir(25%) REPEATABLE (13))
      SELECT (SELECT count(*) FROM s) AS n_s,
             (SELECT count(*) FROM sc2) AS n_cte_pct,
             (SELECT count(*) FROM (SELECT doc_id FROM sc2 EXCEPT SELECT doc_id FROM sc)) = 0 AS cte_subset_ok,
             (SELECT count(DISTINCT doc_id) FROM s) AS n_s_distinct,
             (SELECT count(*) FROM s3) AS n_s3,
             (SELECT count(*) FROM (SELECT doc_id FROM s EXCEPT SELECT doc_id FROM s2)) = 0 AS same_seed_same_set,
             (SELECT count(*) FROM (SELECT doc_id FROM s3 EXCEPT SELECT doc_id FROM s4)) = 0 AS spellings_agree,
             (SELECT count(*) FROM (SELECT doc_id FROM s EXCEPT SELECT doc_id FROM documents)) = 0 AS subset_ok,
             (SELECT count(*) FROM s5) AS n_pct,
             (SELECT count(*) FROM (SELECT doc_id FROM s5 EXCEPT SELECT doc_id FROM s6)) = 0 AS pct_spellings_agree,
             (SELECT count(*) FROM (SELECT doc_id FROM s5 EXCEPT SELECT doc_id FROM documents)) = 0 AS pct_subset_ok"""

  def q182Reservoir(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(s)
    documents(s, d).createOrReplaceTempView("documents")
    graft.operators.SqlStage("q182", reservoirSqlText).apply(s, documents(s, d))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_columns_sql"    -> (q113ColumnsSql _),
    "q133_comprehension"  -> (q133Comprehension _),
    "q134_div_pow"        -> (q134DivPow _),
    "q135_json_ops"       -> (q135JsonOps _),
    "q139_json_arrow"     -> (q139JsonArrow _),
    "q144_map_literal"    -> (q144MapLiteral _),
    "q137_union_by_name"  -> (q137UnionByName _),
    "q120_macro_sql"      -> (q120MacroSql _),
    "q121_describe_sql"   -> (q121DescribeSql _),
    "q124_copy_roundtrip" -> (q124CopyRoundtrip _),
    "q186_read_options"   -> (q186ReadOptions _),
    "q187_fmt_specs"      -> (q187FmtSpecs _),
    "q152_dml_statements" -> (q152DmlStatements _),
    "q153_alter_statements" -> (q153AlterStatements _),
    "q154_upsert_statements" -> (q154UpsertStatements _),
    "q155_agg_order_by"   -> (q155AggOrderBy _),
    "q156_probe_batch_fns" -> (q156ProbeBatchFns _),
    "q157_ignore_nulls"   -> (q157IgnoreNulls _),
    "q158_text_similarity" -> (q158TextSimilarity _),
    "q159_fuzzy_match"    -> (q159FuzzyMatch _),
    "q160_time_bucket"    -> (q160TimeBucket _),
    "q171_sample_seeded"  -> (q171SampleSeeded _),
    "q172_mad"            -> (q172Mad _),
    "q173_time_bucket3"   -> (q173TimeBucket3 _),
    "q174_list_ops"       -> (q174ListOps _),
    "q176_export_import"  -> (q176ExportImport _),
    "q177_quantified"     -> (q177Quantified _),
    "q180_sweep7"         -> (q180Sweep7 _),
    "q184_sweep8"         -> (q184Sweep8 _),
    "q181_attach"         -> (q181Attach _),
    "q182_reservoir"      -> (q182Reservoir _),
    "q183_icu_collate"    -> (q183IcuCollate _),
    "q178_sweep6"         -> (q178Sweep6 _),
    "q161_frame_exclude"  -> (q161FrameExclude _),
    "q162_regex_surface"  -> (q162RegexSurface _),
    "q163_collections"    -> (q163Collections _),
    "q164_update_from"    -> (q164UpdateFrom _),
    "q165_returning"      -> (q165Returning _),
    "q167_operator_semantics" -> (q167OperatorSemantics _),
    "q126_from_first"     -> (q126FromFirst _),
    "q127_sorted_layout"  -> (q127SortedLayout _),
    "q117_recursive_sql"  -> (q117RecursiveSql _),
    "q118_slice_sql"      -> (q118SliceSql _),
    "q119_argmax_sql"     -> (q119ArgmaxSql _),
    "q69_approx_distinct" -> (q69ApproxDistinct _),
    "q74_bit_aggs"        -> (q74BitAggs _),
    "q75_string_shape"    -> (q75StringShape _),
    "q76_conditionals"    -> (q76Conditionals _),
    "q71_regexp_extract"  -> (q71RegexpExtract _),
    "q72_in_subquery"     -> (q72InSubquery _),
    "q73_variance"        -> (q73Variance _),
    "q70_correlated_subq" -> (q70CorrelatedSubquery _),
    "q66_window_misc"   -> (q66WindowMisc _),
    "q67_listagg"       -> (q67ListAgg _),
    "q68_hash_sample"   -> (q68HashSample _),
    "q61_json_flatten"  -> (q61JsonFlatten _),
    "q62_topk_agg"      -> (q62TopkAgg _),
    "q63_explode"       -> (q63Explode _),
    "q64_multiset_ops"  -> (q64MultisetOps _),
    "q65_date_arith"    -> (q65DateArith _),
    "q46_embed_neardup" -> (q46EmbedNearDup _),
    "q47_pivot"         -> (q47Pivot _),
    "q48_range_frame"   -> (q48RangeFrame _),
    "q49_median"        -> (q49Median _),
    "q50_array_ops"     -> (q50ArrayOps _),
    "q80_approx_quantiles" -> (q80ApproxQuantiles _),
    "q87_upsert"        -> (q87Upsert _),
    "q81_range_join"    -> (q81RangeJoin _),
    "q60_pipeline_sql"  -> (q60PipelineSql _),
    "q105_pivot_sql"    -> (q105PivotSql _),
    "q106_unpivot_sql"  -> (q106UnpivotSql _),
    "q107_distinct_on_sql" -> (q107DistinctOnSql _),
    "q108_star_replace_sql" -> (q108StarReplaceSql _),
  )

  val sql: Map[String, String] = Map(
    // q105/q106: DuckDB executes the IDENTICAL statement text graft
    // auto-rewrites — the dialect layer itself is what's under test
    "q105_pivot_sql" -> pivotSqlText,
    "q106_unpivot_sql" -> unpivotSqlText,
    "q107_distinct_on_sql" -> distinctOnSqlText,
    "q108_star_replace_sql" -> starReplaceSqlText,
    "q113_columns_sql" -> columnsSqlText,
    "q117_recursive_sql" -> recursiveSqlText,
    "q118_slice_sql" -> sliceSqlText,
    // q133: DuckDB executes the IDENTICAL comprehension text natively
    "q133_comprehension" -> comprehensionSqlText,
    // q134: DuckDB executes the IDENTICAL // and ** text natively
    "q134_div_pow" -> opsSqlText,
    // q135: DuckDB executes the IDENTICAL ->/->>  text natively
    "q135_json_ops" -> jsonOpsSqlText,
    // q139: DuckDB executes the IDENTICAL terminal-> chain text natively
    "q139_json_arrow" -> jsonArrowSqlText,
    // q144: DuckDB executes the IDENTICAL MAP-literal text natively
    "q144_map_literal" -> mapLiteralSqlText,
    // q137: DuckDB executes the IDENTICAL UNION ALL BY NAME natively
    "q137_union_by_name" -> unionByNameSqlText,
    "q119_argmax_sql" -> argmaxSqlText,
    // q120: DuckDB executes the IDENTICAL multi-statement batch —
    // CREATE MACROs then the SELECT; the driver's duckdb.sql() returns
    // the last statement's relation (DuckDB's batch rule)
    "q120_macro_sql" -> macroSqlText,
    "q121_describe_sql" -> describeSqlText,
    // q124: DuckDB executes the identical COPY+read_csv_auto batch —
    // its own write→read round-trip over the same /tmp path
    "q124_copy_roundtrip" -> copySqlText,
    // q186: identical option-bearing read_csv/read_parquet batch —
    // sample_size/all_varchar/filename + union_by_name glob (r17)
    "q186_read_options" -> readOptsSqlText,
    // q187: identical fmt-spec format() battery — DuckDB runs its
    // bundled fmt, graft runs the DuckSweep kernels (r17)
    "q187_fmt_specs" -> fmtSpecsSqlText,
    // q152: DuckDB executes the identical DML batch natively — temp
    // CTAS, predicate DELETE, simultaneous-assignment UPDATEs, the
    // final read-back; the swap row pins old-row RHS semantics
    "q152_dml_statements" -> dmlSqlText,
    // q153: DuckDB executes the identical ALTER/TRUNCATE batch natively
    "q153_alter_statements" -> alterSqlText,
    // q154: DuckDB executes the identical typed-create/upsert batch
    "q154_upsert_statements" -> upsertSqlText,
    // q155: DuckDB executes the identical inline-agg-ORDER BY text
    "q155_agg_order_by" -> aggOrderSqlText,
    // q156/q157: DuckDB executes the identical function/window text
    "q156_probe_batch_fns" -> probeBatchSqlText,
    "q157_ignore_nulls" -> ignoreNullsSqlText,
    // q158: DuckDB executes the identical string-metric text
    "q158_text_similarity" -> textSimSqlText,
    // q159: DuckDB executes the identical blocked fuzzy-match text
    "q159_fuzzy_match" -> fuzzyMatchSqlText,
    // q160: DuckDB executes the identical time_bucket/date_diff text
    "q160_time_bucket" -> timeBucketSqlText,
    "q171_sample_seeded" -> sampleSeededSqlText,
    "q172_mad" -> madSqlText,
    "q173_time_bucket3" -> timeBucket3SqlText,
    "q174_list_ops" -> listOpsSqlText,
    "q177_quantified" -> quantifiedSqlText,
    "q178_sweep6" -> sweep6SqlText,
    // q180/q182: DuckDB executes the IDENTICAL sweep-7 / reservoir-
    // invariant text natively
    "q180_sweep7" -> sweep7SqlText,
    "q184_sweep8" -> sweep8SqlText,
    "q182_reservoir" -> reservoirSqlText,
    // q183: DuckDB executes the IDENTICAL collation-battery text — the
    // ORDERING is compared (key bytes differ by design)
    "q183_icu_collate" -> icuCollateSqlText,
    // q181: both engines ATTACH and read back alias-qualified — graft
    // mounts its EXPORT-DATABASE directory, DuckDB round-trips through
    // a real .db storage file; the restored relations must agree
    "q181_attach" -> """
      DETACH DATABASE IF EXISTS adb;
      ATTACH '/tmp/duck_q181.db' AS wdb;
      CREATE OR REPLACE TABLE wdb.q181_src AS
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS nm,
               CAST(n_regionkey AS BIGINT) AS rk FROM nation;
      DETACH wdb;
      ATTACH '/tmp/duck_q181.db' AS adb (READ_ONLY);
      SELECT k, nm, rk FROM adb.q181_src ORDER BY k""",
    // q176: property oracle — the restored relation must equal the
    // independently recomputed source (the export/import round-trip is
    // engine-local; the directories aren't cross-comparable)
    "q176_export_import" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS nm,
             CAST(n_regionkey AS BIGINT) AS rk
      FROM nation ORDER BY k""",
    // q161: DuckDB executes the identical frame-EXCLUDE text natively
    "q161_frame_exclude" -> frameExcludeSqlText,
    // q162: DuckDB executes the identical regexp/SIMILAR TO text
    "q162_regex_surface" -> regexSurfaceSqlText,
    // q163: DuckDB executes the identical subscript/list_sort text
    "q163_collections" -> collectionSqlText,
    // q164/q165: DuckDB executes the identical UPDATE FROM / RETURNING
    // batches natively
    "q164_update_from" -> updateFromSqlText,
    "q165_returning" -> returningSqlText,
    // q167: DuckDB executes the identical operator-semantics text
    "q167_operator_semantics" -> operatorSemanticsSqlText,
    "q126_from_first" -> fromFirstSqlText,
    // q127: the aggregate is layout-independent — DuckDB reads the
    // ORIGINAL table; any loss/dup/corruption in the sorted layout
    // round-trip breaks the hash
    "q127_sorted_layout" -> """
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM documents GROUP BY lang ORDER BY lang""",
    "q81_range_join" -> """
      WITH iv AS (
        SELECT i AS interval_id, 1704067200 + i * 7200 AS s_sec
        FROM generate_series(0, 359) t(i))
      SELECT interval_id,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events, iv
      WHERE epoch_us(ts) >= s_sec * 1000000
        AND epoch_us(ts) < (s_sec + 2700) * 1000000
      GROUP BY interval_id ORDER BY interval_id""",

    "q87_upsert" -> """
      WITH b AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
      u AS (SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
            FROM b WHERE o_orderkey % 100 = 0)
      SELECT * FROM u
      UNION ALL
      SELECT * FROM b WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
      ORDER BY o_orderkey""",

    "q80_approx_quantiles" -> """
      SELECT l_returnflag,
        quantile_cont(l_extendedprice, 0.5) AS exact_median,
        TRUE AS rank_within_bound
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q69_approx_distinct" -> """
      SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        TRUE AS orders_within_5pct,
        TRUE AS parts_within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q61_json_flatten" -> """
      SELECT event_id, event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events ORDER BY event_id""",

    "q62_topk_agg" -> """
      SELECT o_custkey,
        array_to_string((list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3], ',') AS top3
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""",

    "q74_bit_aggs" -> """
      SELECT l_returnflag,
        CAST(bit_and(l_linenumber) AS INT) AS band,
        CAST(bit_or(l_linenumber) AS INT) AS bor,
        CAST(bit_xor(l_linenumber) AS INT) AS bxor
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q75_string_shape" -> """
      SELECT n_nationkey,
        lpad(n_name, 12, '_') AS padded,
        rtrim(lpad(n_name, 12, ' ')) AS trimmed,
        reverse(n_name) AS rev,
        repeat(substr(n_name, 1, 2), 3) AS rep,
        translate(n_name, '_', '-') AS dashed
      FROM nation ORDER BY n_nationkey""",

    "q76_conditionals" -> """
      SELECT l_orderkey, l_linenumber,
        least(l_discount, l_tax) AS lo,
        greatest(l_discount, l_tax) AS hi,
        nullif(l_discount, 0.0) AS disc_or_null,
        coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q71_regexp_extract" -> """
      SELECT p_partkey,
        regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word,
        regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        CAST(instr(p_name, 'a') AS INT) AS first_a
      FROM part ORDER BY p_partkey""",

    "q72_in_subquery" -> """
      SELECT o_orderkey, o_custkey
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000.0)
      ORDER BY o_orderkey""",

    "q73_variance" -> """
      WITH a AS (
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sxx
        FROM orders GROUP BY o_orderstatus)
      SELECT o_orderstatus, n,
        round((sxx - sx * sx / n) / (n - 1), 2) AS var_samp,
        round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_samp
      FROM a ORDER BY o_orderstatus""",

    "q70_correlated_subq" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM orders i WHERE i.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""",

    "q66_window_misc" -> """
      SELECT c_custkey, c_mktsegment,
        RANK() OVER w AS rnk,
        DENSE_RANK() OVER w AS drnk,
        PERCENT_RANK() OVER w AS prnk,
        CUME_DIST() OVER w AS cdist,
        FIRST_VALUE(c_custkey) OVER wf AS poorest,
        LAST_VALUE(c_custkey) OVER wf AS richest
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
             wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY c_custkey""",

    "q67_listagg" -> """
      SELECT n_regionkey,
        array_to_string(list_sort(list(n_name)), ',') AS nations,
        COUNT(*) AS n
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "q68_hash_sample" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
      ORDER BY o_orderkey""",

    "q63_explode" -> """
      SELECT t AS token, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY t ORDER BY n DESC, token""",

    "q64_multiset_ops" -> """
      SELECT l_suppkey, COUNT(*) AS multiplicity FROM (
        SELECT l_suppkey FROM (
          SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
          INTERSECT ALL
          SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'N')
        EXCEPT ALL
        SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R') t
      GROUP BY l_suppkey ORDER BY l_suppkey""",

    "q65_date_arith" -> """
      SELECT o_orderkey,
        CAST(o_orderdate AS DATE) AS d,
        CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due,
        CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS week_before,
        datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days,
        last_day(CAST(o_orderdate AS DATE)) AS month_end
      FROM orders ORDER BY o_orderkey""",
    "q46_embed_neardup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_cosine_similarity(a.v, b.v) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.45
      ORDER BY id_a, id_b""",

    "q47_pivot" -> """
      SELECT o_orderstatus,
        CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS p1,
        CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0) AS BIGINT) AS p2,
        CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS BIGINT) AS p3,
        CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END), 0) AS BIGINT) AS p4,
        CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0) AS BIGINT) AS p5
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q48_range_frame" -> """
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
        COUNT(*) OVER w AS orders_30d,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS spend_30d
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""",

    "q49_median" -> """
      SELECT o_orderpriority,
        quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.9) AS p90,
        MIN(o_totalprice) AS lo,
        MAX(o_totalprice) AS hi
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q50_array_ops" -> """
      SELECT doc_id,
        LEN(list_distinct(string_split(text, ' '))) AS n_uniq,
        array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3,
        list_contains(string_split(text, ' '), 'spark') AS has_spark,
        string_split(text, ' ')[1] AS head_tok
      FROM documents ORDER BY doc_id""",

    "q60_pipeline_sql" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens
      FROM documents WHERE n_chars >= 100
      GROUP BY lang ORDER BY lang""",
  )
}
