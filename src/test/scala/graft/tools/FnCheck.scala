package graft.tools

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Scratch: which DuckDB-ish function names does Spark 4.1 already ship?
  * (Decides what the dialect alias layer must add vs leave alone.)
  */
object FnCheck {
  def main(args: Array[String]): Unit = {
    val builtin = FunctionRegistry.builtin.listFunction().map(_.funcName.toLowerCase).toSet
    val candidates = Seq(
      "string_split", "string_split_regex", "str_split", "split",
      "len", "length", "cardinality", "array_size", "size",
      "list_transform", "transform", "list_filter", "filter",
      "list_contains", "array_contains", "list_distinct", "array_distinct",
      "list_sort", "sort_array", "array_sort",
      "list_cosine_similarity", "list_dot_product", "list_aggregate", "aggregate",
      "list_slice", "slice", "array_slice",
      "regexp_matches", "rlike", "regexp_like", "regexp_extract_all",
      "string_agg", "listagg", "group_concat", "array_agg", "collect_list",
      "strftime", "date_format", "strptime", "to_timestamp",
      "epoch", "epoch_ms", "unix_timestamp", "unix_millis", "to_unix_timestamp",
      "unnest", "explode", "ilike", "struct_pack", "named_struct",
      "list_value", "array", "date_part", "date_trunc", "datepart",
      "contains", "starts_with", "ends_with", "prefix", "suffix",
      "list_unique", "count_if", "countif", "regexp_full_match",
      "editdist3", "levenshtein", "jaccard", "hamming", "md5_number_lower",
      "to_base", "greatest", "least", "nullif", "try_cast", "typeof",
      "any_value", "bool_and", "bool_or", "bit_count", "gen_random_uuid", "uuid")
    candidates.foreach { c =>
      println(f"$c%-24s ${if (builtin.contains(c)) "BUILTIN" else "---"}")
    }
  }
}
