package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: sweep DuckDB-isms through the FULL dialect layer
  * (graft.operators.SqlStage) and report which error — the r13 gap
  * finder that surfaced WITHIN GROUP (native), inline agg ORDER BY
  * (rewritten → q155) and frame EXCLUDE (guided). Keep adding probes
  * before claiming "the surface is covered".
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[2]").appName("probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).selectExpr("id AS i", "id % 3 AS g",
      "CASE WHEN id % 4 = 0 THEN NULL ELSE 'v' || id END AS v")
      .createOrReplaceTempView("t")
    val df = spark.table("t")
    def tryq(label: String, q: String): Unit =
      try println(s"$label OK: " + graft.operators.SqlStage("p", q)
        .apply(spark, df).collect().take(2).mkString(" | "))
      catch { case e: Exception =>
        println(s"$label ERR: " + Option(e.getMessage).getOrElse("?").replace('\n', ' ').take(140)) }
    // aggregates
    tryq("percentile_within", "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY i) AS m FROM t")
    tryq("mode", "SELECT mode(g) AS m FROM t")
    tryq("median", "SELECT median(i) AS m FROM t")
    tryq("quantile_cont", "SELECT quantile_cont(i, 0.5) AS m FROM t")
    tryq("quantile_list", "SELECT quantile_cont(i, [0.25, 0.75]) AS m FROM t")
    tryq("arg_max", "SELECT arg_max(v, i) AS m FROM t")
    tryq("arg_max_k", "SELECT arg_max(v, i, 2) AS m FROM t")
    tryq("max_k", "SELECT max(i, 3) AS m FROM t")
    tryq("min_k", "SELECT min(i, 3) AS m FROM t")
    tryq("bool_and", "SELECT bool_and(i < 100) AS m FROM t")
    tryq("bit_and", "SELECT bit_and(i + 1) AS m FROM t")
    tryq("product", "SELECT product(i + 1) AS m FROM t WHERE i < 5")
    tryq("entropy", "SELECT entropy(g) AS m FROM t")
    tryq("skewness", "SELECT skewness(i) AS m FROM t")
    tryq("kurtosis", "SELECT kurtosis(i) AS m FROM t")
    tryq("corr", "SELECT corr(i, i * 2) AS m FROM t")
    tryq("regr_slope", "SELECT regr_slope(i * 2, i) AS m FROM t")
    tryq("mad", "SELECT mad(i) AS m FROM t")
    tryq("histogram", "SELECT histogram(g) AS m FROM t")
    tryq("approx_cd", "SELECT approx_count_distinct(i) AS m FROM t")
    tryq("count_filter", "SELECT count(*) FILTER (WHERE i > 3) AS m FROM t")
    // window
    tryq("frame_exclude", "SELECT i, sum(i) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS s FROM t ORDER BY i LIMIT 3")
    tryq("ignore_nulls", "SELECT i, lag(v IGNORE NULLS) OVER (ORDER BY i) AS s FROM t ORDER BY i LIMIT 5")
    // scalar string / similarity
    tryq("levenshtein", "SELECT levenshtein('kitten', 'sitting') AS m")
    tryq("jaccard", "SELECT jaccard('duck', 'luck') AS m")
    tryq("jaro_winkler", "SELECT jaro_winkler_similarity('duck', 'luck') AAS".replace("AAS", "AS m"))
    tryq("damerau", "SELECT damerau_levenshtein('duck', 'ducky') AS m")
    tryq("hamming", "SELECT hamming('duck', 'luck') AS m")
    tryq("regexp_split", "SELECT regexp_split_to_array('a1b2c', '[0-9]') AS m")
    tryq("str_split_regex", "SELECT string_split_regex('a1b2c', '[0-9]') AS m")
    tryq("format", "SELECT format('{} x {}', 1, 'a') AS m")
    tryq("printf", "SELECT printf('%d-%s', 4, 'x') AS m")
    tryq("bar", "SELECT bar(5, 0, 10, 10) AS m")
    tryq("repeat_str", "SELECT repeat('ab', 3) AS m")
    tryq("translate", "SELECT translate('abc', 'ab', 'xy') AS m")
    tryq("unicode_fn", "SELECT unicode('a') AS m")
    tryq("ord", "SELECT ord('a') AS m")
    tryq("strip_accents", "SELECT strip_accents('âéïõü') AS m")
    tryq("nfc_normalize", "SELECT nfc_normalize('é') AS m")
    // numeric/bit
    tryq("gamma", "SELECT gamma(5) AS m")
    tryq("lgamma", "SELECT lgamma(5) AS m")
    tryq("bit_count_fn", "SELECT bit_count(7) AS m")
    tryq("to_base", "SELECT to_base(255, 16) AS m")
    tryq("from_base64", "SELECT from_base64('aGk=') AS m")
    tryq("divide_fn", "SELECT divide(7, 2) AS m")
    tryq("fdiv", "SELECT fdiv(7.0, 2.0) AS m")
    tryq("fmod", "SELECT fmod(7.5, 2.0) AS m")
    // list
    tryq("list_zip", "SELECT list_zip([1,2], ['a','b']) AS m")
    tryq("flatten", "SELECT flatten([[1,2],[3]]) AS m")
    tryq("list_grade_up", "SELECT list_grade_up([3,1,2]) AS m")
    tryq("range_fn", "SELECT range(1, 4) AS m")
    tryq("generate_series", "SELECT generate_series(1, 3) AS m")
    tryq("unnest_gs", "SELECT unnest(generate_series(1, 3)) AS m")
    tryq("list_reverse", "SELECT list_reverse([1,2,3]) AS m")
    tryq("list_intersect", "SELECT list_intersect([1,2,3], [2,3,4]) AS m")
    tryq("list_has_any", "SELECT list_has_any([1,2], [2,9]) AS m")
    tryq("list_position", "SELECT list_position([7,8,9], 8) AS m")
    // r13 second sweep: date/time + misc
    tryq("time_bucket", "SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-01-01 10:23:45') AS m")
    tryq("last_day", "SELECT last_day(DATE '2024-02-05') AS m")
    tryq("make_date", "SELECT make_date(2024, 2, 29) AS m")
    tryq("make_timestamp", "SELECT make_timestamp(2024, 2, 29, 10, 30, 12.5) AS m")
    tryq("date_diff3", "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-03-05') AS m")
    tryq("timestampdiff", "SELECT timestampdiff(DAY, DATE '2024-01-01', DATE '2024-03-05') AS m")
    tryq("datediff3", "SELECT datediff('hour', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 07:30:00') AS m")
    tryq("dayname", "SELECT dayname(DATE '2024-03-05') AS m")
    tryq("monthname", "SELECT monthname(DATE '2024-03-05') AS m")
    tryq("weekofyear", "SELECT weekofyear(DATE '2024-03-05') AS m")
    tryq("isodow", "SELECT isodow(DATE '2024-03-05') AS m")
    tryq("epoch_ns", "SELECT epoch_ns(TIMESTAMP '2024-01-01 00:00:01') AS m")
    tryq("cot", "SELECT cot(1.0) AS m")
    tryq("atan2", "SELECT atan2(1.0, 2.0) AS m")
    tryq("gcd", "SELECT greatest_common_divisor(12, 18) AS m")
    tryq("even", "SELECT even(2.5) AS m")
    spark.stop()
  }
}
