package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.52 round-14 batch 7 — last SQL-surface rungs: the exact
  * interpolated percentile report (the grouped quartile/p90 readout
  * beside the single exact median and the KLL sketch twins), the
  * regexp scalar family (extract/replace/rlike — graded against
  * DuckDB's RE2 on the portable-pattern subset), and the bitwise
  * AGGREGATES (bit_or/bit_and/bit_xor roll-ups beside q_fn_bitwise's
  * scalar ops).
  */
object Pipeline39 extends graft.QueryModule {

  /** EXACT INTERPOLATED PERCENTILES per order status — p25/p50/p75/p90
    * of total-price cents via Spark's exact `percentile` (linear
    * interpolation on the sorted group, the SQL-standard
    * PERCENTILE_CONT semantics) against DuckDB's quantile_cont: both
    * engines interpolate pos = p·(n−1) over identical integer inputs,
    * so the doubles agree to the rounded rendering. The grouped
    * quartile report every profiling pass starts with; the KLL twin
    * (q_agg_kll_quantiles) is the sketch path when exact per-group
    * sort is too hot.
    *
    * 100 TB: one grouped exact percentile (sort within the 3-status
    * domain — mergeable partial per group). */
  def aggPercentileCont(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus").as("st"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .groupBy("st")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(cents, 0.25D)"), 4).as("p25"),
        round(expr("percentile(cents, 0.5D)"), 4).as("p50"),
        round(expr("percentile(cents, 0.75D)"), 4).as("p75"),
        round(expr("percentile(cents, 0.9D)"), 4).as("p90"))
      .orderBy("st")

  /** REGEXP SCALAR FAMILY — extract / global replace / rlike over the
    * document text, graded against DuckDB's RE2 twins on the
    * portable-pattern subset (character classes, literal words,
    * greedy + on a class — semantics Java regex and RE2 define
    * identically; lookarounds/backrefs are exactly what this key does
    * NOT claim). Per doc: the first '…ing' word, the vowel count via
    * strip-replace, and a literal-word flag.
    *
    * 100 TB: a pure narrow projection — regexp stays inside
    * whole-stage codegen. */
  def fnRegexp(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("regexp_extract(text, '([a-z]+ing)', 1)").as("first_ing"),
        length(expr("regexp_replace(text, '[^aeiou]', '')"))
          .cast("long").as("n_vowels"),
        expr("text rlike 'data'").as("mentions_data"))
      .orderBy("doc_id")

  /** BITWISE AGGREGATES — per order: OR / AND / XOR roll-ups of the
    * per-line flag mask (bit 0 = returned, bit 1 = shipped-late-ish
    * high quantity, bit 2 = discounted), then the distribution of OR
    * masks: the flag-set union/intersection/parity readout a
    * permission or feature-flag system aggregates at scale. All
    * integers.
    *
    * 100 TB: two hash aggs (order grain, then mask grain) — the first
    * is map-side-partial on the join key the scan already carries. */
  def aggBitOps(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        (when(col("l_returnflag") === "R", 1L).otherwise(0L) +
          when(expr("cast(round(l_quantity) as bigint)") >= 40L, 2L)
            .otherwise(0L) +
          when(expr("cast(round(l_discount * 100) as bigint)") >= 5L, 4L)
            .otherwise(0L)).as("mask"))
      .groupBy("l_orderkey")
      .agg(expr("bit_or(mask)").as("m_or"),
        expr("bit_and(mask)").as("m_and"),
        expr("bit_xor(mask)").as("m_xor"))
      .groupBy("m_or")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("if(m_and = m_or, 1L, 0L)")).as("n_uniform"),
        sum(expr("if(m_xor = 0, 1L, 0L)")).as("n_xor_zero"))
      .orderBy("m_or")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_percentile_cont" -> aggPercentileCont,
    "q_fn_regexp" -> fnRegexp,
    "q_agg_bit_ops" -> aggBitOps)

  def oracleSql: Map[String, String] = Map(
    "q_agg_percentile_cont" ->
      """SELECT o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT),
        |    0.25), 4) AS p25,
        |  ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT),
        |    0.5), 4) AS p50,
        |  ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT),
        |    0.75), 4) AS p75,
        |  ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT),
        |    0.9), 4) AS p90
        |FROM orders GROUP BY st ORDER BY st""".stripMargin,
    "q_fn_regexp" ->
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+ing)', 1) AS first_ing,
        |  CAST(length(regexp_replace(text, '[^aeiou]', '', 'g'))
        |    AS BIGINT) AS n_vowels,
        |  regexp_matches(text, 'data') AS mentions_data
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_agg_bit_ops" ->
      """WITH m AS (SELECT l_orderkey,
        |    (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        |     + CASE WHEN CAST(ROUND(l_quantity) AS BIGINT) >= 40
        |       THEN 2 ELSE 0 END
        |     + CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) >= 5
        |       THEN 4 ELSE 0 END) AS mask
        |  FROM lineitem),
        |o AS (SELECT l_orderkey,
        |    CAST(bit_or(mask) AS BIGINT) AS m_or,
        |    CAST(bit_and(mask) AS BIGINT) AS m_and,
        |    CAST(bit_xor(mask) AS BIGINT) AS m_xor
        |  FROM m GROUP BY l_orderkey)
        |SELECT m_or, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN m_and = m_or THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_uniform,
        |  CAST(SUM(CASE WHEN m_xor = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_xor_zero
        |FROM o GROUP BY m_or ORDER BY m_or""".stripMargin)
}
