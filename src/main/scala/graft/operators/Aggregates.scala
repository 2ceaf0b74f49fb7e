package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.4 aggregation operators (SURVEY.md). Determinism rules §2.0 apply:
  * decimal-cast before SUM/AVG over doubles, total ORDER BY with unique
  * tie-break, no nondeterministic functions.
  *
  * Scale notes: every query here is a partial+final HashAggregate in
  * Spark (map-side combine), so the shuffle carries one row per group,
  * not per input row — the shape that survives a 100 TB fact table.
  */
object Aggregates extends graft.QueryModule {

  /** All money/qty doubles in the fixtures carry <=2 fractional digits
    * (FIXTURES.md), so casting the RAW column to DECIMAL(12,2) is
    * unambiguous in both engines. Derived arithmetic then stays in exact
    * decimal — never cast a COMPUTED double to decimal (Spark rounds the
    * double's shortest string repr, DuckDB the exact binary value; they
    * disagree at scale boundaries). SURVEY.md §2.0.2.
    */
  private def dec2(c: String) = col(c).cast("decimal(12,2)")

  /** Flagship: TPC-H Q1 pricing summary on lineitem. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val one = lit(1).cast("decimal(12,2)")
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2("l_quantity")).cast("decimal(18,4)").as("sum_qty"),
        sum(dec2("l_extendedprice")).cast("decimal(18,4)").as("sum_base_price"),
        sum(dec2("l_extendedprice") * (one - dec2("l_discount")))
          .cast("decimal(18,4)").as("sum_disc_price"),
        sum(dec2("l_extendedprice") * (one - dec2("l_discount")) *
          (one + dec2("l_tax"))).cast("decimal(18,6)").as("sum_charge"),
        round(sum(dec2("l_quantity")).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(dec2("l_extendedprice")).cast("double") / count(lit(1)), 4).as("avg_price"),
        round(sum(dec2("l_discount")).cast("double") / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DECIMAL(18,6)) AS sum_charge,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing_summary" -> ((s, d) => pricingSummary(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing_summary" -> pricingSummarySql
  )
}
