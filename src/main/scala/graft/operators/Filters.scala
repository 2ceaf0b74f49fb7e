package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** §2.2 projections / filters / predicates (SURVEY.md).
  *
  * Scale notes: every predicate here is a plain Catalyst filter —
  * pushed to the parquet scan (PushedFilters) and column-pruned, so at
  * 100 TB the scan skips row groups and never materializes unused
  * columns. Plan-shape tests pin this (PlanShapeSpec).
  */
object Filters extends graft.QueryModule {

  /** Comparison + BETWEEN predicates, pushed to the scan. */
  def filterCompare(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_quantity") > 45 &&
        col("l_discount").between(0.05, 0.07))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")

  /** IN-list + LIKE prefix predicates. */
  def filterInLike(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_orderstatus").like("F%"))
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .orderBy("o_orderkey")

  /** Null-safe equality (<=>) on derived nullable columns. */
  def filterNullSafe(s: SparkSession, dir: String): DataFrame = {
    val a = nullif(col("l_returnflag"), lit("N"))
    val b = when(col("l_linestatus") === "O", lit(null).cast("string"))
      .otherwise(col("l_returnflag"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        a.as("flag_or_null"), b.as("masked_flag"))
      .where(a <=> b)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** CASE WHEN / coalesce / nullif derived columns. */
  def projectCase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("price_bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending"))
          .as("status_or_pending"),
        nullif(col("o_orderpriority"), lit("5-LOW")).as("prio_or_null"))
      .orderBy("o_orderkey")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_filter_compare" -> filterCompare,
    "q_filter_in_like" -> filterInLike,
    "q_filter_null_safe" -> filterNullSafe,
    "q_project_case" -> projectCase)

  def oracleSql: Map[String, String] = Map(
    "q_filter_compare" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount BETWEEN 0.05 AND 0.07
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_in_like" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_orderstatus LIKE 'F%'
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_null_safe" ->
      """SELECT l_orderkey, l_linenumber,
        |  NULLIF(l_returnflag,'N') AS flag_or_null,
        |  CASE WHEN l_linestatus='O' THEN NULL ELSE l_returnflag END AS masked_flag
        |FROM lineitem
        |WHERE NULLIF(l_returnflag,'N') IS NOT DISTINCT FROM
        |      (CASE WHEN l_linestatus='O' THEN NULL ELSE l_returnflag END)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_project_case" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS price_bucket,
        |  COALESCE(NULLIF(o_orderstatus,'P'),'pending') AS status_or_pending,
        |  NULLIF(o_orderpriority,'5-LOW') AS prio_or_null
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin)
}
