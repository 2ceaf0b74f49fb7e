package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.7 scalar function families (SURVEY.md) — one graded query per
  * family, every function a codegen'd Spark built-in (no UDFs in the
  * hot path, §4.2).
  *
  * Oracle dialect notes baked into the SQL (probed against DuckDB 1.0):
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all; dayofweek is Sunday=0 (Spark: Sunday=1);
  *    date_trunc returns DATE (Spark: TIMESTAMP); epoch() is DOUBLE;
  *    integer-ish results are cast to BIGINT on both sides so parquet
  *    types line up for the driver's hash compare.
  */
object Scalars extends graft.QueryModule {

  def fnString(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 10, 5).as("sub"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("cw"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("lp"),
        length(col("c_name")).cast("long").as("len"),
        regexp_replace(col("c_name"), "[0-9]", "X").as("masked"),
        element_at(split(col("c_name"), "#"), 2).as("num_part"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        levenshtein(col("c_name"), lit("Customer#000000001")).cast("long").as("lev"))
      .orderBy("c_custkey")

  def fnDate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("mon_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_95"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  def fnMath(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") / 7, 4).as("div7"),
        abs(col("l_discount") - 0.05).as("absdev"),
        ceil(col("l_quantity") / 3).cast("long").as("ceil3"),
        floor(col("l_quantity") / 3).cast("long").as("floor3"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        signum(col("l_discount") - 0.05).cast("int").as("sig"),
        pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(13))
          .cast("long").as("pm13"))
      .orderBy("l_orderkey", "l_linenumber")

  /** List results are projected as comma-joined micro-int strings
    * (round(x,6)*1e6 is within 1e-9 of an integer, so the bigint cast
    * is engine-exact): a list-typed output column crashes the graded
    * gate's pandas row sort, and float-list string rendering differs
    * across engines (output-type rule — see Aggregates). */
  def fnArray(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("e", expr("transform(embedding, x -> cast(x AS double))"))
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        expr("concat_ws(',', transform(slice(e, 1, 3), " +
          "x -> cast(cast(round(round(x, 6) * 1000000) AS bigint) AS string)))")
          .as("head3"),
        expr("round(element_at(e, 5), 6)").as("el5"),
        expr("round(array_max(e), 6)").as("amax"),
        expr("round(sqrt(aggregate(e, cast(0 AS double), (acc, x) -> acc + x*x)), 6)")
          .as("l2norm"),
        expr("concat_ws(',', transform(" +
          "array_sort(transform(slice(e, 1, 8), x -> round(x, 6))), " +
          "x -> cast(cast(round(x * 1000000) AS bigint) AS string)))")
          .as("sorted8"))
      .orderBy("vec_id")

  def fnExplode(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .where(col("col") =!= "")
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("ord"),
        col("col").as("token"))
      .orderBy("doc_id", "ord")

  def fnJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"), lit("k INT")).getItem("k").as("k_schema"))
      .orderBy("event_id")

  /** Map construction — NO oracle (DuckDB map ordering differs);
    * ScalarsSpec pins it against the token table instead. */
  def fnMap(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr("array_distinct(split(text, ' '))"))
      .withColumn("m", expr("map_from_arrays(toks, transform(toks, x -> length(x)))"))
      .select(col("doc_id"),
        size(col("m")).cast("long").as("n_keys"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys_sorted"),
        element_at(col("m"), lit("spark")).cast("long").as("spark_len"))
      .orderBy("doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_string" -> fnString,
    "q_fn_date" -> fnDate,
    "q_fn_math" -> fnMath,
    "q_fn_array" -> fnArray,
    "q_fn_explode" -> fnExplode,
    "q_fn_json" -> fnJson,
    "q_fn_map" -> fnMap)

  def oracleSql: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  substring(c_name, 10, 5) AS sub,
        |  concat_ws('-', c_mktsegment, c_name) AS cw,
        |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS lp,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked,
        |  split_part(c_name, '#', 2) AS num_part,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT) AS lev
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
        |  date_trunc('month', o_orderdate) AS mon_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(l_extendedprice / 7, 4) AS div7,
        |  abs(l_discount - 0.05) AS absdev,
        |  CAST(ceil(l_quantity / 3) AS BIGINT) AS ceil3,
        |  CAST(floor(l_quantity / 3) AS BIGINT) AS floor3,
        |  power(l_quantity, 2) AS qty_sq,
        |  ROUND(sqrt(l_extendedprice), 6) AS sqrt_price,
        |  ROUND(ln(l_extendedprice), 6) AS ln_price,
        |  ROUND(exp(l_discount), 6) AS exp_disc,
        |  CAST(sign(l_discount - 0.05) AS INT) AS sig,
        |  CAST((l_orderkey * 7 + l_linenumber) % 13 AS BIGINT) AS pm13
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_fn_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  array_to_string(list_transform((embedding::DOUBLE[])[1:3],
        |    x -> CAST(CAST(round(round(x, 6) * 1000000) AS BIGINT) AS VARCHAR)), ',') AS head3,
        |  round((embedding::DOUBLE[])[5], 6) AS el5,
        |  round(list_max(embedding::DOUBLE[]), 6) AS amax,
        |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS l2norm,
        |  array_to_string(list_transform(
        |    list_sort(list_transform((embedding::DOUBLE[])[1:8], x -> round(x, 6))),
        |    x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS VARCHAR)), ',') AS sorted8
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_fn_explode" ->
      """SELECT doc_id, CAST(s AS BIGINT) AS ord, tokens[s] AS token
        |FROM (SELECT doc_id, tokens, unnest(range(1, len(tokens)+1)) AS s
        |      FROM (SELECT doc_id, str_split(text, ' ') AS tokens FROM documents))
        |WHERE tokens[s] <> ''
        |ORDER BY doc_id, ord""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_schema
        |FROM events ORDER BY event_id""".stripMargin)
}
