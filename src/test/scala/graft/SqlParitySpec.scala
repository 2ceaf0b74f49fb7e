package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 1 three-way check (SURVEY.md §3 EP3 / §5): the DSL-built result
  * must equal Spark's own SQL engine running an equivalent statement —
  * catches DSL-authoring mistakes independently of the DuckDB oracle. */
class SqlParitySpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def register(): Unit =
    Tables.names.foreach { t =>
      Tables.t(spark, dir, t).createOrReplaceTempView(t)
    }

  private def sameAs(name: String, sql: String): Unit = {
    register()
    val dsl = SparkEntry.queries(name)(spark, dir)
    val viaSql = spark.sql(sql)
    assert(dsl.exceptAll(viaSql).isEmpty && viaSql.exceptAll(dsl).isEmpty,
      s"$name DSL differs from spark.sql twin")
  }

  test("pricing summary: DSL == spark.sql") {
    sameAs("q_agg_pricing_summary", operators.Aggregates.pricingSummarySql
      .replace("TIMESTAMP '1998-09-02 00:00:00'", "timestamp'1998-09-02'"))
  }

  test("semi join: DSL == spark.sql EXISTS form") {
    sameAs("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  test("window rank family: DSL == spark.sql") {
    sameAs("q_win_rank",
      """SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk, drnk, quartile,
        |  (1000000 * (rn - 1)) div (n - 1) AS pct_rank_ppm,
        |  (1000000 * rn) div n AS cume_ppm
        |FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
        |    DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile,
        |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC))
        |ORDER BY c_nationkey, rn""".stripMargin)
  }
}
