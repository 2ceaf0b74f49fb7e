package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.53 round-14 batch 8 — statistical-tests II: the four classical
  * diagnostics the §2 test family (t/KS/chi²/ANOVA/Mann-Whitney)
  * still lacked. Jarque-Bera normality from exact power sums,
  * Brown-Forsythe variance homogeneity (the median-centered Levene),
  * McNemar's paired-classifier test (pure discordant counting), and
  * Durbin-Watson residual autocorrelation on the q_ml_linfit OLS
  * series. Every key folds integer moments and renders doubles once
  * (+, −, ×, /, sqrt only — all IEEE-exact, so the DuckDB twins are
  * bitwise), rounded at the output.
  */
object Pipeline40 extends graft.QueryModule {

  /** JARQUE-BERA normality test per return flag — skewness g1 and
    * excess kurtosis g2 from EXACT integer power sums (Σq..Σq⁴ in
    * int64/decimal(38,0) — portable to HUGEINT), central moments via
    * the standard power-sum expansion in one fixed double dag, then
    * JB = n/6·(g1² + g2²/4) against the χ²₂ 95% cut. No pow(): g1
    * uses m2·sqrt(m2) so every op is IEEE-correctly-rounded and the
    * DuckDB twin is bitwise. The distribution-shape gate beside
    * q_agg_skewkurt's raw readout (which grades the same moments but
    * not the test decision).
    *
    * 100 TB: one map-side-partial agg over the scan; moments are
    * mergeable integer cells. */
  def mlJarqueBera(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        expr("cast(round(l_quantity) as bigint)").as("q"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("q").as("s1"),
        sum(expr("q * q")).as("s2"),
        sum(expr("cast(q as decimal(38,0)) * q * q")).as("s3"),
        sum(expr("cast(q as decimal(38,0)) * q * q * q")).as("s4"))
      .selectExpr("l_returnflag", "n",
        "cast(s1 as double) / n as mu", "cast(s2 as double) / n as r2",
        "cast(s3 as double) / n as r3", "cast(s4 as double) / n as r4")
      .selectExpr("l_returnflag", "n",
        "r2 - mu * mu as m2",
        "r3 - 3 * mu * r2 + 2 * mu * mu * mu as m3",
        "r4 - 4 * mu * r3 + 6 * mu * mu * r2" +
          " - 3 * mu * mu * mu * mu as m4")
      .selectExpr("l_returnflag", "n",
        "m3 / (m2 * sqrt(m2)) as g1", "m4 / (m2 * m2) - 3 as g2")
      .selectExpr("l_returnflag", "n",
        "round(g1, 6) as skew_g1", "round(g2, 6) as ex_kurt_g2",
        "round(n / 6.0D * (g1 * g1 + g2 * g2 / 4), 4) as jb",
        "n / 6.0D * (g1 * g1 + g2 * g2 / 4)" +
          " > 5.991464547107979D as reject5")
      .orderBy("l_returnflag")

  /** BROWN-FORSYTHE variance-homogeneity test (the median-centered
    * Levene — the robust form) across the return-flag groups: the
    * equal-variance precondition check q_ml_ab_ttest's pooled-SD
    * arithmetic silently assumes. Quantities group to the ≤50-value
    * domain first; group medians via Spark's weighted exact
    * percentile on the domain frame (vs DuckDB quantile_cont on raw
    * rows — identical pos=(n−1)/2 interpolation); |x−med| doubles to
    * EXACT integers z2 = 2·|x−med| (medians are .5-grid), and the
    * one-way ANOVA F on z2 folds Σsᵢ²/nᵢ in group order (the ordered
    * list_reduce discipline — the only order-sensitive double sum).
    *
    * 100 TB: one map-side-partial (flag, q) count agg is the only
    * full pass; medians, z-stats, and the fold all run on the
    * ≤3×50-cell domain frame. */
  def mlLevene(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"),
        expr("cast(round(l_quantity) as bigint)").as("q"))
      .groupBy("g", "q").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val med = cells.groupBy("g")
      .agg(expr("percentile(q, 0.5D, c)").as("med"))
    cells.join(broadcast(med), "g")
      .select(col("g"), col("c"),
        expr("cast(round(2 * abs(q - med)) as bigint)").as("z2"))
      .groupBy("g")
      .agg(sum("c").as("ni"), sum(expr("c * z2")).as("si"),
        sum(expr("cast(c as decimal(38,0)) * z2 * z2")).as("qi"))
      .agg(count(lit(1)).as("k"), sum("ni").as("n"),
        sum("si").as("st"), sum("qi").as("qt"),
        expr("array_sort(collect_list(struct(g, ni, si)))").as("l"))
      .selectExpr("k", "n", "st", "qt",
        "aggregate(l, 0D, (a, x) ->" +
          " a + cast(x.si as double) * x.si / x.ni) as t")
      .selectExpr("k", "n",
        "round(((t - cast(st as double) * st / n) / (k - 1))" +
          " / ((cast(qt as double) - t) / (n - k)), 6) as f_bf",
        "k - 1 as df1", "n - k as df2")
  }

  /** McNEMAR'S TEST per line status — do two cheap return-predictors
    * (high quantity vs meaningful discount) disagree more than
    * chance on the SAME rows? The paired-classifier comparison the
    * unpaired q_ml_ab_ttest family can't grade: only the discordant
    * counts b (A right, B wrong) and c (B right, A wrong) matter.
    * χ²_cc = (max(|b−c|−1, 0))²/(b+c) with continuity correction —
    * pure integer counting, one double division at the end.
    *
    * 100 TB: one map-side-partial count agg; nothing else. */
  def mlMcnemar(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_linestatus").as("ls"),
        (col("l_returnflag") === "R").as("t"),
        (expr("cast(round(l_quantity) as bigint)") >= 25L).as("pa"),
        (expr("cast(round(l_discount * 100) as bigint)") >= 5L).as("pb"))
      .groupBy("ls")
      .agg(count(lit(1)).as("n"),
        sum(expr("if(pa = t, 1L, 0L)")).as("correct_a"),
        sum(expr("if(pb = t, 1L, 0L)")).as("correct_b"),
        sum(expr("if(pa = t and pb <> t, 1L, 0L)")).as("b_only"),
        sum(expr("if(pa <> t and pb = t, 1L, 0L)")).as("c_only"))
      .selectExpr("ls", "n", "correct_a", "correct_b", "b_only",
        "c_only",
        "round(case when b_only + c_only = 0 then 0.0D" +
          " else cast(greatest(abs(b_only - c_only) - 1, 0L) as double)" +
          " * greatest(abs(b_only - c_only) - 1, 0L)" +
          " / (b_only + c_only) end, 6) as chi2_cc",
        "case when b_only + c_only = 0 then false" +
          " else cast(greatest(abs(b_only - c_only) - 1, 0L) as double)" +
          " * greatest(abs(b_only - c_only) - 1, 0L)" +
          " / (b_only + c_only) > 3.841458820694124D end as reject5")
      .orderBy("ls")

  /** DURBIN-WATSON residual autocorrelation on the q_ml_linfit OLS
    * daily-revenue series (Pipeline11.mlLinfit's exact-moment
    * slope/intercept dag, re-stated verbatim so both engines derive
    * bitwise-identical a, b): residuals quantize to EXACT milli-cent
    * integers off the identical double dag, then DW = Σ(Δe)²/Σe²
    * from decimal(38,0) sums — the "is the trend model missing
    * serial structure" diagnostic every forecasting pipeline runs
    * after q_ml_linfit and before q_events_forecast. rho1 ≈ 1−DW/2
    * rendered beside it.
    *
    * 100 TB: the daily cents agg is the only full-data pass; the
    * regression, residual join (broadcast ≤|types| rows), lag
    * window, and sums all run on the days×types support frame. */
  def mlDurbinWatson(s: SparkSession, dir: String): DataFrame = {
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
      .withColumn("ep", lag(col("e"), 1).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(expr("cast(e as decimal(38,0)) * e")).as("se2"),
        sum(expr("case when ep is null then cast(0 as decimal(38,0))" +
          " else cast(e - ep as decimal(38,0)) * (e - ep) end"))
          .as("sd2"))
      .selectExpr("event_type", "n_days",
        "round(cast(sd2 as double) / cast(se2 as double), 6) as dw",
        "round(1.0D - cast(sd2 as double) / cast(se2 as double) / 2, 6)" +
          " as rho1")
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_jarque_bera" -> mlJarqueBera,
    "q_ml_levene" -> mlLevene,
    "q_ml_mcnemar" -> mlMcnemar,
    "q_ml_durbin_watson" -> mlDurbinWatson)

  def oracleSql: Map[String, String] = Map(
    "q_ml_jarque_bera" ->
      """WITH m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(q) AS BIGINT) AS s1,
        |    CAST(SUM(q * q) AS BIGINT) AS s2,
        |    SUM(CAST(q AS HUGEINT) * q * q) AS s3,
        |    SUM(CAST(q AS HUGEINT) * q * q * q) AS s4
        |  FROM (SELECT l_returnflag,
        |      CAST(ROUND(l_quantity) AS BIGINT) AS q FROM lineitem)
        |  GROUP BY l_returnflag),
        |r AS (SELECT l_returnflag, n, CAST(s1 AS DOUBLE) / n AS mu,
        |    CAST(s2 AS DOUBLE) / n AS r2, CAST(s3 AS DOUBLE) / n AS r3,
        |    CAST(s4 AS DOUBLE) / n AS r4 FROM m),
        |c AS (SELECT l_returnflag, n, r2 - mu * mu AS m2,
        |    r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
        |    r4 - 4 * mu * r3 + 6 * mu * mu * r2
        |      - 3 * mu * mu * mu * mu AS m4 FROM r),
        |g AS (SELECT l_returnflag, n, m3 / (m2 * sqrt(m2)) AS g1,
        |    m4 / (m2 * m2) - 3 AS g2 FROM c)
        |SELECT l_returnflag, n, ROUND(g1, 6) AS skew_g1,
        |  ROUND(g2, 6) AS ex_kurt_g2,
        |  ROUND(n / 6.0 * (g1 * g1 + g2 * g2 / 4), 4) AS jb,
        |  n / 6.0 * (g1 * g1 + g2 * g2 / 4)
        |    > 5.991464547107979 AS reject5
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "q_ml_levene" ->
      """WITH cells AS (SELECT l_returnflag AS g,
        |    CAST(ROUND(l_quantity) AS BIGINT) AS q,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY g, q),
        |med AS (SELECT l_returnflag AS g,
        |    quantile_cont(CAST(ROUND(l_quantity) AS BIGINT), 0.5) AS med
        |  FROM lineitem GROUP BY g),
        |z AS (SELECT cells.g, c,
        |    CAST(ROUND(2 * ABS(q - med)) AS BIGINT) AS z2
        |  FROM cells JOIN med USING (g)),
        |grp AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ni,
        |    CAST(SUM(c * z2) AS BIGINT) AS si,
        |    SUM(CAST(c AS HUGEINT) * z2 * z2) AS qi
        |  FROM z GROUP BY g),
        |top AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(ni) AS BIGINT) AS n, CAST(SUM(si) AS BIGINT) AS st,
        |    CAST(SUM(qi) AS HUGEINT) AS qt,
        |    list_reduce(list(CAST(si AS DOUBLE) * si / ni ORDER BY g),
        |      (a, b) -> a + b) AS t
        |  FROM grp)
        |SELECT k, n,
        |  ROUND(((t - CAST(st AS DOUBLE) * st / n) / (k - 1))
        |    / ((CAST(qt AS DOUBLE) - t) / (n - k)), 6) AS f_bf,
        |  k - 1 AS df1, n - k AS df2 FROM top""".stripMargin,
    "q_ml_mcnemar" ->
      """WITH b AS (SELECT l_linestatus AS ls, (l_returnflag = 'R') AS t,
        |    (CAST(ROUND(l_quantity) AS BIGINT) >= 25) AS pa,
        |    (CAST(ROUND(l_discount * 100) AS BIGINT) >= 5) AS pb
        |  FROM lineitem),
        |g AS (SELECT ls, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN pa = t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS correct_a,
        |    CAST(SUM(CASE WHEN pb = t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS correct_b,
        |    CAST(SUM(CASE WHEN pa = t AND pb <> t THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b_only,
        |    CAST(SUM(CASE WHEN pa <> t AND pb = t THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c_only
        |  FROM b GROUP BY ls)
        |SELECT ls, n, correct_a, correct_b, b_only, c_only,
        |  ROUND(CASE WHEN b_only + c_only = 0 THEN 0.0
        |    ELSE CAST(greatest(abs(b_only - c_only) - 1, 0) AS DOUBLE)
        |      * greatest(abs(b_only - c_only) - 1, 0)
        |      / (b_only + c_only) END, 6) AS chi2_cc,
        |  CASE WHEN b_only + c_only = 0 THEN FALSE
        |    ELSE CAST(greatest(abs(b_only - c_only) - 1, 0) AS DOUBLE)
        |      * greatest(abs(b_only - c_only) - 1, 0)
        |      / (b_only + c_only) > 3.841458820694124 END AS reject5
        |FROM g ORDER BY ls""".stripMargin,
    "q_ml_durbin_watson" ->
      """WITH daily AS (
        |  SELECT event_type, (CAST(ts AS DATE) - DATE '1970-01-01') AS x,
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
        |l AS (SELECT event_type, e,
        |    lag(e) OVER (PARTITION BY event_type ORDER BY x) AS ep
        |  FROM e),
        |f AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    SUM(CAST(e AS HUGEINT) * e) AS se2,
        |    SUM(CASE WHEN ep IS NULL THEN CAST(0 AS HUGEINT)
        |      ELSE CAST(e - ep AS HUGEINT) * (e - ep) END) AS sd2
        |  FROM l GROUP BY event_type)
        |SELECT event_type, n_days,
        |  ROUND(CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE), 6) AS dw,
        |  ROUND(1.0 - CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE) / 2, 6)
        |    AS rho1
        |FROM f ORDER BY event_type""".stripMargin)
}
