package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.62 round-14 batch 17 — causal/survival closers: Granger
  * causality (does yesterday's click revenue predict today's
  * purchase revenue beyond its own lag — the two-regressor OLS
  * F-test, all moments exact), and the Kaplan-Meier product-limit
  * survival curve WITH right-censoring (the estimator
  * q_events_hazard's raw discrete rates feed; censored users leave
  * the risk set without counting as deaths).
  */
object Pipeline49 extends graft.QueryModule {

  /** GRANGER CAUSALITY click→purchase — restricted p_t ~ p_{t−1} vs
    * unrestricted p_t ~ p_{t−1} + c_{t−1} on the daily-cents series;
    * F = ΔSSE/(SSE_u/(n−3)). The 3×3 normal equations solve by
    * Cramer's rule in ONE fixed double dag from exact decimal(38,0)
    * moments; both models' residuals quantize to exact milli-cents
    * (the q_ml_durbin_watson discipline), so both SSEs are order-free
    * integer sums. Lag alignment is a day+1 EQUI-join — no global
    * window, no SinglePartition exchange; the 1-row coefficient
    * frame broadcasts back over the day rows (count-pinned BNLJ).
    *
    * 100 TB: the daily agg is the only full pass; lags, moments, and
    * the solve run on the days-sized support frame. */
  def timeGranger(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .where(col("event_type").isin("purchase", "click"))
      .groupBy(expr("cast(datediff(to_date(ts), date '1970-01-01')" +
        " as bigint)").as("x"))
      .agg(sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)")).otherwise(0L))
          .as("p"),
        sum(when(col("event_type") === "click",
          expr("cast(round(value * 100) as bigint)")).otherwise(0L))
          .as("c"))
      .localCheckpoint(true)
    val rows = daily.select(col("x"), col("p").as("y"))
      .join(daily.select((col("x") + 1L).as("x"), col("p").as("x1"),
        col("c").as("x2")), "x")
      .localCheckpoint(true)
    val m = rows.agg(count(lit(1)).as("n"),
        sum("y").as("sy"), sum("x1").as("s1"), sum("x2").as("s2"),
        sum(expr("cast(x1 as decimal(38,0)) * x1")).as("s11"),
        sum(expr("cast(x2 as decimal(38,0)) * x2")).as("s22"),
        sum(expr("cast(x1 as decimal(38,0)) * x2")).as("s12"),
        sum(expr("cast(x1 as decimal(38,0)) * y")).as("s1y"),
        sum(expr("cast(x2 as decimal(38,0)) * y")).as("s2y"))
      .selectExpr("n",
        "cast(n as double) as nd", "cast(sy as double) as syd",
        "cast(s1 as double) as s1d", "cast(s2 as double) as s2d",
        "cast(s11 as double) as s11d", "cast(s22 as double) as s22d",
        "cast(s12 as double) as s12d", "cast(s1y as double) as s1yd",
        "cast(s2y as double) as s2yd")
      // Cramer on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]·[a,b,g]=[sy,s1y,s2y]
      .selectExpr("n", "nd", "syd", "s1d", "s11d", "s1yd",
        "nd * (s11d * s22d - s12d * s12d)" +
          " - s1d * (s1d * s22d - s12d * s2d)" +
          " + s2d * (s1d * s12d - s11d * s2d) as det",
        "syd * (s11d * s22d - s12d * s12d)" +
          " - s1d * (s1yd * s22d - s12d * s2yd)" +
          " + s2d * (s1yd * s12d - s11d * s2yd) as deta",
        "nd * (s1yd * s22d - s12d * s2yd)" +
          " - syd * (s1d * s22d - s12d * s2d)" +
          " + s2d * (s1d * s2yd - s1yd * s2d) as detb",
        "nd * (s11d * s2yd - s1yd * s12d)" +
          " - s1d * (s1d * s2yd - s1yd * s2d)" +
          " + syd * (s1d * s12d - s11d * s2d) as detg")
      .selectExpr("n",
        "deta / det as ua", "detb / det as ub", "detg / det as ug",
        "(nd * s1yd - s1d * syd) / (nd * s11d - s1d * s1d) as rb",
        "nd", "syd", "s1d")
      .selectExpr("n", "ua", "ub", "ug", "rb",
        "(syd - rb * s1d) / nd as ra")
    rows.crossJoin(broadcast(m))
      .select(col("n"), col("ub"), col("ug"),
        expr("cast(round((cast(y as double) - ua - ub * x1 - ug * x2)" +
          " * 1000) as bigint)").as("eu"),
        expr("cast(round((cast(y as double) - ra - rb * x1) * 1000)" +
          " as bigint)").as("er"))
      .groupBy("n", "ub", "ug")
      .agg(sum(expr("cast(eu as decimal(38,0)) * eu")).as("sseu"),
        sum(expr("cast(er as decimal(38,0)) * er")).as("sser"))
      .selectExpr("n", "round(ub, 6) as beta_own_lag",
        "round(ug, 6) as gamma_click_lag",
        "round((cast(sser as double) - cast(sseu as double))" +
          " / (cast(sseu as double) / (n - 3)), 4) as f_stat",
        "n - 3 as df2")
  }

  /** KAPLAN-MEIER SURVIVAL CURVE with right-censoring — user
    * "lifetime" = first→last activity span; users still active on
    * the corpus's last day are CENSORED (they leave the risk set
    * without counting as deaths — the distinction q_events_hazard's
    * raw rates ignore). Ŝ(t) = Π_{i≤t}(1 − dᵢ/nᵢ) with each log-term
    * quantized to exact nano units and prefix-summed by a theta join
    * over the broadcast duration frame (the hazard-key discipline:
    * no global cumsum window); a duration that empties the risk set
    * pins Ŝ = 0 exactly from there on.
    *
    * 100 TB: one per-user agg is the only full pass; risk sets and
    * the product-limit fold run on the ≤|days| duration frame. */
  def eventsSurvivalKm(s: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("first_d"),
        max(to_date(col("ts"))).as("last_d"))
    val maxD = spans.agg(max("last_d")).head.getDate(0).toString
    val terms = spans
      .select(expr("cast(datediff(last_d, first_d) as bigint)")
          .as("dur"),
        (col("last_d") === to_date(lit(maxD))).as("cens"))
      .groupBy("dur")
      .agg(sum(when(col("cens"), 0L).otherwise(1L)).as("deaths"),
        sum(when(col("cens"), 1L).otherwise(0L)).as("censored"),
        count(lit(1)).as("n_ending"))
      .localCheckpoint(true)
    val risk = terms
      .join(broadcast(terms.select(col("dur").as("d2"),
        col("n_ending").as("n2"))), col("d2") >= col("dur"))
      .groupBy("dur", "deaths", "censored")
      .agg(sum("n2").as("at_risk"))
      .select(col("dur"), col("deaths"), col("censored"), col("at_risk"),
        expr("case when deaths >= at_risk then cast(null as bigint)" +
          " else cast(round(ln(1 - deaths / cast(at_risk as double))" +
          " * 1000000000) as bigint) end").as("t_nano"))
      .localCheckpoint(true)
    risk
      .join(broadcast(risk.select(col("dur").as("d2"),
        col("t_nano").as("t2"),
        when(col("t_nano").isNull, 1L).otherwise(0L).as("z2"))),
        col("d2") <= col("dur"))
      .groupBy("dur", "deaths", "censored", "at_risk")
      .agg(sum("t2").as("s_nano"), sum("z2").as("n_zero"))
      .selectExpr("dur as duration_days", "at_risk", "deaths",
        "censored",
        "case when n_zero > 0 then 0.0D" +
          " else round(exp(s_nano / 1000000000.0D), 6) end as survival")
      .orderBy("duration_days")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_granger" -> timeGranger,
    "q_events_survival_km" -> eventsSurvivalKm)

  def oracleSql: Map[String, String] = Map(
    "q_time_granger" ->
      """WITH daily AS (SELECT
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS p,
        |    CAST(SUM(CASE WHEN event_type = 'click'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |  GROUP BY x),
        |r AS (SELECT t.x, t.p AS y, l.p AS x1, l.c AS x2
        |  FROM daily t JOIN daily l ON t.x = l.x + 1),
        |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x1) AS BIGINT) AS s1,
        |    CAST(SUM(x2) AS BIGINT) AS s2,
        |    SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
        |    SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
        |    SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
        |    SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
        |    SUM(CAST(x2 AS HUGEINT) * y) AS s2y
        |  FROM r),
        |md AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(s1 AS DOUBLE) AS s1d,
        |    CAST(s2 AS DOUBLE) AS s2d, CAST(s11 AS DOUBLE) AS s11d,
        |    CAST(s22 AS DOUBLE) AS s22d, CAST(s12 AS DOUBLE) AS s12d,
        |    CAST(s1y AS DOUBLE) AS s1yd, CAST(s2y AS DOUBLE) AS s2yd
        |  FROM mm),
        |dets AS (SELECT n, nd, syd, s1d, s11d, s1yd,
        |    nd * (s11d * s22d - s12d * s12d)
        |      - s1d * (s1d * s22d - s12d * s2d)
        |      + s2d * (s1d * s12d - s11d * s2d) AS det,
        |    syd * (s11d * s22d - s12d * s12d)
        |      - s1d * (s1yd * s22d - s12d * s2yd)
        |      + s2d * (s1yd * s12d - s11d * s2yd) AS deta,
        |    nd * (s1yd * s22d - s12d * s2yd)
        |      - syd * (s1d * s22d - s12d * s2d)
        |      + s2d * (s1d * s2yd - s1yd * s2d) AS detb,
        |    nd * (s11d * s2yd - s1yd * s12d)
        |      - s1d * (s1d * s2yd - s1yd * s2d)
        |      + syd * (s1d * s12d - s11d * s2d) AS detg
        |  FROM md),
        |co AS (SELECT n, deta / det AS ua, detb / det AS ub,
        |    detg / det AS ug,
        |    (nd * s1yd - s1d * syd) / (nd * s11d - s1d * s1d) AS rb,
        |    nd, syd, s1d
        |  FROM dets),
        |co2 AS (SELECT n, ua, ub, ug, rb,
        |    (syd - rb * s1d) / nd AS ra FROM co),
        |e AS (SELECT n, ub, ug,
        |    CAST(ROUND((CAST(y AS DOUBLE) - ua - ub * x1 - ug * x2)
        |      * 1000) AS BIGINT) AS eu,
        |    CAST(ROUND((CAST(y AS DOUBLE) - ra - rb * x1) * 1000)
        |      AS BIGINT) AS er
        |  FROM r CROSS JOIN co2),
        |sse AS (SELECT n, ub, ug,
        |    SUM(CAST(eu AS HUGEINT) * eu) AS sseu,
        |    SUM(CAST(er AS HUGEINT) * er) AS sser
        |  FROM e GROUP BY n, ub, ug)
        |SELECT n, ROUND(ub, 6) AS beta_own_lag,
        |  ROUND(ug, 6) AS gamma_click_lag,
        |  ROUND((CAST(sser AS DOUBLE) - CAST(sseu AS DOUBLE))
        |    / (CAST(sseu AS DOUBLE) / (n - 3)), 4) AS f_stat,
        |  n - 3 AS df2
        |FROM sse""".stripMargin,
    "q_events_survival_km" ->
      """WITH spans AS (SELECT user_id,
        |    MIN(CAST(ts AS DATE)) AS first_d,
        |    MAX(CAST(ts AS DATE)) AS last_d
        |  FROM events GROUP BY user_id),
        |mx AS (SELECT MAX(last_d) AS maxd FROM spans),
        |terms AS (SELECT (last_d - first_d) AS dur,
        |    CAST(SUM(CASE WHEN last_d = maxd THEN 0 ELSE 1 END)
        |      AS BIGINT) AS deaths,
        |    CAST(SUM(CASE WHEN last_d = maxd THEN 1 ELSE 0 END)
        |      AS BIGINT) AS censored,
        |    CAST(COUNT(*) AS BIGINT) AS n_ending
        |  FROM spans CROSS JOIN mx GROUP BY dur),
        |risk AS (SELECT t.dur, t.deaths, t.censored,
        |    CAST(SUM(t2.n_ending) AS BIGINT) AS at_risk
        |  FROM terms t JOIN terms t2 ON t2.dur >= t.dur
        |  GROUP BY t.dur, t.deaths, t.censored),
        |tn AS (SELECT dur, deaths, censored, at_risk,
        |    CASE WHEN deaths >= at_risk THEN NULL
        |      ELSE CAST(ROUND(ln(1 - deaths / CAST(at_risk AS DOUBLE))
        |        * 1000000000) AS BIGINT) END AS t_nano
        |  FROM risk),
        |pre AS (SELECT a.dur, a.deaths, a.censored, a.at_risk,
        |    CAST(SUM(b.t_nano) AS BIGINT) AS s_nano,
        |    CAST(SUM(CASE WHEN b.t_nano IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_zero
        |  FROM tn a JOIN tn b ON b.dur <= a.dur
        |  GROUP BY a.dur, a.deaths, a.censored, a.at_risk)
        |SELECT CAST(dur AS BIGINT) AS duration_days, at_risk, deaths,
        |  censored,
        |  CASE WHEN n_zero > 0 THEN 0.0
        |    ELSE ROUND(exp(s_nano / 1000000000.0), 6) END AS survival
        |FROM pre ORDER BY duration_days""".stripMargin)
}
