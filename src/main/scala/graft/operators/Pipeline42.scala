package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.55 round-14 batch 10 — Spark-4 scalar-surface closers: the
  * error-safe try_* family (the ingest-hardening primitives ANSI
  * mode makes mandatory — bad cells become NULLs instead of job
  * aborts), the VARIANT semi-structured type (Spark 4's parse_json /
  * variant_get path beside q_fn_json's string-path functions), and
  * STRUCT construction / lexicographic comparison / array-of-struct
  * sorting (graded against an encode-and-order DuckDB twin).
  */
object Pipeline42 extends graft.QueryModule {

  /** ERROR-SAFE try_* FAMILY — with ANSI on (the Spark 4 default,
    * and this session's), a zero divisor, malformed cast, or
    * out-of-bounds index ABORTS the job; the try_* forms return
    * NULL. Per line: try_divide against a sometimes-zero divisor,
    * try_cast of a mixed numeric/alpha string, try_element_at past
    * the array end, try_to_timestamp of a synthesized sometimes-
    * invalid date. The dirty-ingest survival kit every 100 TB corpus
    * load needs (a one-in-a-billion bad cell WILL appear at scale).
    *
    * 100 TB: pure narrow projection inside whole-stage codegen. */
  def fnTry(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
        expr("cast(round(l_quantity) as bigint)").as("q"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("pc"),
        col("l_returnflag").as("rf"))
      .select(col("l_orderkey"), col("ln"),
        expr("round(try_divide(pc, q - 25), 6)").as("per_unit_gap"),
        expr("try_cast(if(rf = 'R', cast(pc as string), rf) as bigint)")
          .as("mixed_num"),
        expr("try_element_at(array(q, pc), cast(ln as int))").as("el"),
        expr("try_to_timestamp(concat('2024-01-'," +
          " lpad(cast(q as string), 2, '0')))").as("maybe_ts"))
      .orderBy("l_orderkey", "ln")

  /** VARIANT SEMI-STRUCTURED PATH — Spark 4's open JSON type beside
    * q_fn_json's string-path functions: parse_json → variant_get
    * with a type (bigint / double / string renderings of the same
    * cell), a missing-path NULL probe, and try_parse_json over a
    * sometimes-corrupted payload (the shredded-ingest gate). DuckDB
    * twins via json_extract_string casts and json_valid.
    *
    * 100 TB: narrow projection; VARIANT parses once per row and the
    * three gets reuse it (common subexpression). */
  def fnVariant(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("props"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')")
          .as("k_big"),
        expr("variant_get(parse_json(props), '$.k', 'double')")
          .as("k_dbl"),
        expr("variant_get(parse_json(props), '$.k', 'string')")
          .as("k_str"),
        expr("variant_get(parse_json(props), '$.missing', 'bigint')" +
          " is null").as("missing_is_null"),
        expr("try_parse_json(concat(if(event_id % 7 = 0, '}', '')," +
          " props)) is null").as("corrupt"))
      .drop("props")
      .orderBy("event_id")

  /** STRUCT CONSTRUCTION + LEXICOGRAPHIC ORDER — per order: lines as
    * an array of (quantity, linenumber) structs; array_max picks the
    * lexicographic max (quantity first, linenumber tiebreak),
    * array_sort orders the whole family, and the first-3 render
    * flattens back to scalars (§2.0.8: no struct outputs). Graded
    * against a DuckDB encode-and-order twin (q·1000+ln carries the
    * same order because ln < 1000), so the STRUCT comparison
    * semantics themselves are what's checked.
    *
    * 100 TB: one hash agg on the key the scan already carries;
    * per-order arrays are line-count bounded (≤7). */
  def fnStruct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        expr("cast(round(l_quantity) as bigint)").as("q"),
        col("l_linenumber").cast("long").as("ln"))
      .groupBy("l_orderkey")
      .agg(expr("collect_list(struct(q, ln))").as("arr"))
      .selectExpr("l_orderkey",
        "cast(size(arr) as bigint) as n_lines",
        "array_max(arr).q as max_q",
        "array_max(arr).ln as max_q_ln",
        "array_min(arr).q as min_q",
        "concat_ws(',', transform(slice(array_sort(arr), 1, 3)," +
          " x -> concat(cast(x.q as string), ':'," +
          " cast(x.ln as string)))) as first3")
      .orderBy("l_orderkey")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_try" -> fnTry,
    "q_fn_variant" -> fnVariant,
    "q_fn_struct" -> fnStruct)

  def oracleSql: Map[String, String] = Map(
    "q_fn_try" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
        |  ROUND(CASE WHEN q = 25 THEN NULL
        |    ELSE pc / (q - 25) END, 6) AS per_unit_gap,
        |  TRY_CAST(CASE WHEN rf = 'R' THEN CAST(pc AS VARCHAR)
        |    ELSE rf END AS BIGINT) AS mixed_num,
        |  ([q, pc])[l_linenumber] AS el,
        |  TRY_CAST('2024-01-' || lpad(CAST(q AS VARCHAR), 2, '0')
        |    AS TIMESTAMP) AS maybe_ts
        |FROM (SELECT l_orderkey, l_linenumber,
        |    CAST(ROUND(l_quantity) AS BIGINT) AS q,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc,
        |    l_returnflag AS rf FROM lineitem)
        |ORDER BY l_orderkey, ln""".stripMargin,
    "q_fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_big,
        |  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract_string(props, '$.missing') IS NULL
        |    AS missing_is_null,
        |  NOT json_valid(CASE WHEN event_id % 7 = 0 THEN '}' ELSE '' END
        |    || props) AS corrupt
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_struct" ->
      """WITH b AS (SELECT l_orderkey,
        |    CAST(ROUND(l_quantity) AS BIGINT) AS q,
        |    CAST(l_linenumber AS BIGINT) AS ln FROM lineitem),
        |g AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    MAX(q * 1000 + ln) AS max_enc, MIN(q) AS min_q,
        |    array_to_string((list(CAST(q AS VARCHAR) || ':' ||
        |      CAST(ln AS VARCHAR) ORDER BY q, ln))[1:3], ',') AS first3
        |  FROM b GROUP BY l_orderkey)
        |SELECT l_orderkey, n_lines,
        |  CAST(max_enc // 1000 AS BIGINT) AS max_q,
        |  CAST(max_enc % 1000 AS BIGINT) AS max_q_ln,
        |  CAST(min_q AS BIGINT) AS min_q, first3
        |FROM g ORDER BY l_orderkey""".stripMargin)
}
