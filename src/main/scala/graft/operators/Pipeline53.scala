package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64c round-14 batch 21 — the last cell of the test matrix:
  * Wilcoxon signed-rank (TWO related samples, nonparametric — the
  * design q_ml_paired_ttest grades parametrically, q_ml_mannwhitney
  * grades UNPAIRED, and q_ml_friedman grades for k > 2).
  */
object Pipeline53 extends graft.QueryModule {

  /** WILCOXON SIGNED-RANK TEST on the within-user first-half vs
    * second-half mean-value deltas (q_ml_paired_ttest's exact micro
    * grid): zero deltas drop, |d| gets EXACT average-tie ranks in
    * DOUBLED integer units from the banded prefix-sum machinery
    * (2·r̄ = 2·cum_below + ties + 1 — the q_ml_mannwhitney
    * discipline, no global sort), W⁺ folds as an integer sum of
    * positive-delta ranks, and z carries the standard tie
    * correction Σ(t³−t)/48 from the same tie frame.
    *
    * 100 TB: one (user, half) agg is the only full pass; ranks and
    * the statistic run on the distinct-|d| domain frame via banded
    * cumsums. */
  def mlWilcoxonSigned(s: SparkSession, dir: String): DataFrame = {
    val deltas = Tables.events(s, dir)
      .select(col("user_id"),
        (col("ts") >= lit("2024-01-16").cast("timestamp")).as("h2"),
        expr("cast(round(value * 100) as bigint)").as("x"))
      .groupBy("user_id", "h2")
      .agg(count(lit(1)).as("c"), sum("x").as("sv"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("halves"),
        max(when(col("h2"), expr("(sv * 1000000) div c"))).as("m2"),
        max(when(!col("h2"), expr("(sv * 1000000) div c"))).as("m1"))
      .where(col("halves") === 2L)
      .select((col("m2") - col("m1")).as("d"))
      .where(col("d") =!= 0L)
      .select(col("d"), abs(col("d")).as("ad"))
      .localCheckpoint(true)
    val dom = deltas.groupBy("ad").agg(count(lit(1)).as("tv"),
      sum(expr("if(d > 0, 1L, 0L)")).as("tpos"))
    val ranked = graft.api.Dist.bandedCumSum(dom, Seq(), "ad",
        bandWidth = 100000000L, sumCols = Seq("tv"), inclusive = false)
      .select(col("ad"), col("tv"), col("tpos"),
        (lit(2L) * col("cum_tv") + col("tv") + 1L).as("r2"))
    ranked
      .agg(sum("tv").as("n"),
        sum(expr("tpos * r2")).as("w2"),
        sum(expr("cast(tv as decimal(38,0)) * tv * tv - tv")).as("tie3"))
      .selectExpr("n", "w2",
        "round((w2 / 2.0D - n * (n + 1) / 4.0D)" +
          " / sqrt(n * cast(n + 1 as double) * (2 * n + 1) / 24.0D" +
          " - cast(tie3 as double) / 48.0D), 6) as z",
        "abs((w2 / 2.0D - n * (n + 1) / 4.0D)" +
          " / sqrt(n * cast(n + 1 as double) * (2 * n + 1) / 24.0D" +
          " - cast(tie3 as double) / 48.0D)) > 1.959963984540054D" +
          " as reject5")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_wilcoxon_signed" -> mlWilcoxonSigned)

  def oracleSql: Map[String, String] = Map(
    "q_ml_wilcoxon_signed" ->
      """WITH halves AS (SELECT user_id,
        |    (ts >= TIMESTAMP '2024-01-16') AS h2,
        |    CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sv
        |  FROM events GROUP BY user_id, h2),
        |users AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS halves,
        |    MAX(CASE WHEN h2 THEN (sv * 1000000) // c END) AS m2,
        |    MAX(CASE WHEN NOT h2 THEN (sv * 1000000) // c END) AS m1
        |  FROM halves GROUP BY user_id),
        |d AS (SELECT CAST(m2 - m1 AS BIGINT) AS d,
        |    CAST(abs(m2 - m1) AS BIGINT) AS ad
        |  FROM users WHERE halves = 2 AND m2 - m1 <> 0),
        |dom AS (SELECT ad, CAST(COUNT(*) AS BIGINT) AS tv,
        |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tpos
        |  FROM d GROUP BY ad),
        |rk AS (SELECT ad, tv, tpos,
        |    2 * CAST(COALESCE(SUM(tv) OVER (ORDER BY ad
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) + tv + 1 AS r2
        |  FROM dom),
        |g AS (SELECT CAST(SUM(tv) AS BIGINT) AS n,
        |    CAST(SUM(tpos * r2) AS BIGINT) AS w2,
        |    CAST(SUM(CAST(tv AS HUGEINT) * tv * tv - tv) AS HUGEINT)
        |      AS tie3
        |  FROM rk)
        |SELECT n, w2,
        |  ROUND((w2 / 2.0 - n * (n + 1) / 4.0)
        |    / sqrt(n * CAST(n + 1 AS DOUBLE) * (2 * n + 1) / 24.0
        |    - CAST(tie3 AS DOUBLE) / 48.0), 6) AS z,
        |  abs((w2 / 2.0 - n * (n + 1) / 4.0)
        |    / sqrt(n * CAST(n + 1 AS DOUBLE) * (2 * n + 1) / 24.0
        |    - CAST(tie3 AS DOUBLE) / 48.0)) > 1.959963984540054
        |    AS reject5
        |FROM g""".stripMargin)
}
