package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.63 round-14 batch 18 — nonparametric closers: the Friedman
  * rank test across related samples (blocks = days, treatments =
  * event types — the repeated-measures ANOVA the independent-sample
  * q_ml_anova_select / q_ml_mannwhitney can't grade) and the
  * Wald-Wolfowitz runs test on OLS residual signs (the randomness
  * check beside q_ml_durbin_watson's serial-correlation magnitude).
  */
object Pipeline50 extends graft.QueryModule {

  /** FRIEDMAN RANK TEST — daily revenues ranked WITHIN each complete
    * day-block across the event types; χ²_F from the per-type rank
    * sums. Average-tie ranks in exact DOUBLED units (2·r̄ = 2·rank +
    * ties − 1 — all integers from per-day rank/count windows, the
    * day partitions are |types|-row frames), so Σ(2R)² is exact and
    * χ²_F = 3·Σ(2R)²/(n·k(k+1)) − 3n(k+1) renders in one dag.
    *
    * 100 TB: one daily agg full pass; ranks run in |types|-row
    * day partitions (bounded per-key state); the test statistic
    * folds on the k-row rank-sum frame. */
  def mlFriedman(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      .localCheckpoint(true)
    val k = daily.select("event_type").distinct().count()
    val complete = daily.groupBy("d").agg(count(lit(1)).as("nt"))
      .where(col("nt") === k).select("d")
    val wd = Window.partitionBy("d").orderBy("y")
    val ranked = daily.join(complete, "d")
      .withColumn("rk", rank().over(wd))
      .withColumn("ties", count(lit(1)).over(
        Window.partitionBy("d", "y")))
      .select(col("event_type"),
        (lit(2L) * col("rk") + col("ties") - 1L).as("r2"))
    ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("r2").as("rs2"))
      .agg(count(lit(1)).as("k"), max("n").as("n"),
        sum(expr("cast(rs2 as decimal(38,0)) * rs2")).as("sr2"))
      .selectExpr("n as n_blocks", "k",
        "round(3.0D * cast(sr2 as double) / (n * k * (k + 1))" +
          " - 3.0D * n * (k + 1), 6) as chi2_f",
        "k - 1 as df",
        "3.0D * cast(sr2 as double) / (n * k * (k + 1))" +
          " - 3.0D * n * (k + 1) > 9.487729036781154D as reject5")
  }

  /** WALD-WOLFOWITZ RUNS TEST on the q_ml_linfit residual signs —
    * are the +/− residuals randomly ordered, or do they clump (the
    * yes/no companion to Durbin-Watson's magnitude)? Residuals via
    * the bitwise OLS dag quantized to milli-cents; zero residuals
    * drop; runs counted by a lag window over the day order; z from
    * the exact n⁺/n⁻ moments in one dag.
    *
    * 100 TB: daily agg full pass; signs/runs on the days×types
    * support frame. */
  def mlRunsTest(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      .select(col("event_type"),
        expr("cast(datediff(d, date '1970-01-01') as bigint)").as("x"),
        col("y"))
      .localCheckpoint(true)
    val ab = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"),
        sum(expr("cast(x as decimal(19,0)) * y")).as("sxy"))
      .selectExpr("event_type", "n", "sx", "sy",
        "cast(cast(n as decimal(38,0)) * sxy" +
          " - cast(sx as decimal(38,0)) * sy as double)" +
          " / cast(n * sxx - sx * sx as double) as b")
      .selectExpr("event_type",
        "(cast(sy as double) - b * sx) / n as a", "b")
    val w = Window.partitionBy("event_type").orderBy("x")
    daily.join(broadcast(ab), "event_type")
      .select(col("event_type"), col("x"),
        expr("cast(round((cast(y as double) - a - b * x) * 1000)" +
          " as bigint)").as("e"))
      .where(col("e") =!= 0L)
      .withColumn("sgn", expr("if(e > 0, 1L, -1L)"))
      .withColumn("flip",
        expr("if(lag(sgn, 1) over (partition by event_type order by x)" +
          " is null, 1L, if(sgn <> lag(sgn, 1) over" +
          " (partition by event_type order by x), 1L, 0L))"))
      .groupBy("event_type")
      .agg(sum(expr("if(sgn = 1, 1L, 0L)")).as("n_pos"),
        sum(expr("if(sgn = -1, 1L, 0L)")).as("n_neg"),
        sum("flip").as("runs"))
      .selectExpr("event_type", "n_pos", "n_neg", "runs",
        "round((runs - (2.0D * n_pos * n_neg / (n_pos + n_neg) + 1))" +
          " / sqrt(2.0D * n_pos * n_neg" +
          " * (2.0D * n_pos * n_neg - n_pos - n_neg)" +
          " / ((n_pos + n_neg) * (n_pos + n_neg)" +
          " * (n_pos + n_neg - 1.0D))), 6) as z")
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_friedman" -> mlFriedman,
    "q_ml_runs_test" -> mlRunsTest)

  def oracleSql: Map[String, String] = Map(
    "q_ml_friedman" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, d),
        |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
        |  FROM daily),
        |complete AS (SELECT d FROM daily CROSS JOIN kk
        |  GROUP BY d, k HAVING COUNT(*) = MAX(k)),
        |ranked AS (SELECT event_type,
        |    2 * rank() OVER (PARTITION BY daily.d ORDER BY y)
        |      + COUNT(*) OVER (PARTITION BY daily.d, y) - 1 AS r2
        |  FROM daily JOIN complete ON daily.d = complete.d),
        |rs AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r2) AS BIGINT) AS rs2
        |  FROM ranked GROUP BY event_type),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(MAX(n) AS BIGINT) AS n,
        |    SUM(CAST(rs2 AS HUGEINT) * rs2) AS sr2
        |  FROM rs)
        |SELECT n AS n_blocks, k,
        |  ROUND(3.0 * CAST(sr2 AS DOUBLE) / (n * k * (k + 1))
        |    - 3.0 * n * (k + 1), 6) AS chi2_f,
        |  k - 1 AS df,
        |  3.0 * CAST(sr2 AS DOUBLE) / (n * k * (k + 1))
        |    - 3.0 * n * (k + 1) > 9.487729036781154 AS reject5
        |FROM f""".stripMargin,
    "q_ml_runs_test" ->
      """WITH daily AS (SELECT event_type,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS x,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(x AS BIGINT) * x) AS BIGINT) AS sxx,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM daily GROUP BY event_type),
        |ab AS (SELECT event_type, n, sx, sy,
        |    CAST(CAST(n AS HUGEINT) * sxy
        |        - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS b
        |  FROM m),
        |ab2 AS (SELECT event_type,
        |    (CAST(sy AS DOUBLE) - b * sx) / n AS a, b FROM ab),
        |e AS (SELECT daily.event_type, x,
        |    CAST(ROUND((CAST(y AS DOUBLE) - a - b * x) * 1000)
        |      AS BIGINT) AS e
        |  FROM daily JOIN ab2 USING (event_type)),
        |sg AS (SELECT event_type, x,
        |    CASE WHEN e > 0 THEN 1 ELSE -1 END AS sgn
        |  FROM e WHERE e <> 0),
        |fl AS (SELECT event_type, sgn,
        |    CASE WHEN lag(sgn) OVER
        |        (PARTITION BY event_type ORDER BY x) IS NULL THEN 1
        |      WHEN sgn <> lag(sgn) OVER
        |        (PARTITION BY event_type ORDER BY x) THEN 1
        |      ELSE 0 END AS flip
        |  FROM sg),
        |g AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos,
        |    CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neg,
        |    CAST(SUM(flip) AS BIGINT) AS runs
        |  FROM fl GROUP BY event_type)
        |SELECT event_type, n_pos, n_neg, runs,
        |  ROUND((runs - (2.0 * n_pos * n_neg / (n_pos + n_neg) + 1))
        |    / sqrt(2.0 * n_pos * n_neg
        |    * (2.0 * n_pos * n_neg - n_pos - n_neg)
        |    / ((n_pos + n_neg) * (n_pos + n_neg)
        |    * (n_pos + n_neg - 1.0))), 6) AS z
        |FROM g ORDER BY event_type""".stripMargin)
}
