package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.48 round-14 batch 3 — the last two SQL-surface join/subquery
  * rungs: the null-safe equality join (`<=>` / IS NOT DISTINCT FROM —
  * the join every slowly-changing-dimension merge needs when keys are
  * nullable) and the EXISTS / NOT EXISTS correlated subquery pair
  * (the declarative form of the semi/anti join family). */
object Pipeline35 extends graft.QueryModule {

  /** NULL-SAFE EQUALITY JOIN — orders bucketed by a NULLABLE derived
    * key (order status with 'P' nulled out — a third of the fixture)
    * joined to a status dimension carrying the same NULL member with
    * `<=>`: NULL↔NULL MATCHES, which plain `=` silently drops — the
    * SCD-merge footgun this key grades. Catalyst plans EqualNullSafe
    * as a proper hash-join key (no fallback to BNLJ), which is the
    * whole point of the operator.
    *
    * 100 TB: a broadcast hash equi-join on the 3-row dim; the derived
    * key is a narrow codegen'd projection. */
  def joinNullSafe(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("nullif(o_orderstatus, 'P')").as("k"))
    val dim = Tables.orders(s, dir)
      .select(expr("nullif(o_orderstatus, 'P')").as("k"))
      .distinct()
      .select(col("k").as("dk"),
        coalesce(concat(lit("status_"), col("k")), lit("status_unknown"))
          .as("label"))
    o.join(broadcast(dim), col("k") <=> col("dk"))
      .groupBy(col("k"), col("label"))
      .agg(count(lit(1)).as("n_orders"))
      .select(col("k"), col("label"), col("n_orders"))
      .orderBy(col("k").asc_nulls_first)
  }

  /** EXISTS / NOT EXISTS correlated subqueries — customers with at
    * least one urgent order and NO finished order, written as the
    * declarative subquery pair every SQL user reaches for first.
    * Catalyst decorrelates them into one LeftSemi + one LeftAnti hash
    * join on o_custkey — the identical physical plan as the explicit
    * q_join_semi / q_join_anti keys, which is exactly what this key
    * pins: the subquery FORM costs nothing over the join form.
    *
    * 100 TB: two partitioned hash joins on the same key — at most one
    * shuffle of each side; the orders scans push their status/
    * priority filters down. */
  def subExists(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_ex_customer")
    Tables.orders(s, dir).createOrReplaceTempView("graft_ex_orders")
    s.sql(
      """SELECT c_custkey, c_nationkey,
        |  cast(c_acctbal as double) AS acctbal
        |FROM graft_ex_customer c
        |WHERE EXISTS (SELECT 1 FROM graft_ex_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM graft_ex_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_null_safe" -> joinNullSafe,
    "q_sub_exists" -> subExists)

  def oracleSql: Map[String, String] = Map(
    "q_join_null_safe" ->
      """WITH o AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS k
        |           FROM orders),
        |dim AS (SELECT k AS dk,
        |    COALESCE('status_' || k, 'status_unknown') AS label
        |  FROM (SELECT DISTINCT nullif(o_orderstatus, 'P') AS k
        |        FROM orders))
        |SELECT o.k, dim.label, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM o JOIN dim ON o.k IS NOT DISTINCT FROM dim.dk
        |GROUP BY o.k, dim.label
        |ORDER BY o.k NULLS FIRST""".stripMargin,
    "q_sub_exists" ->
      """SELECT c_custkey, c_nationkey,
        |  CAST(c_acctbal AS DOUBLE) AS acctbal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
}
