package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64p round-14 batch 34 — the per-feature drift matrix (the
  * monitoring table a feature store alerts on), the cumulative reach
  * curve (running DISTINCT users without a distinct-over-window), and
  * Wilson score intervals (the rate CI that behaves at small n and
  * extreme p, unlike the Wald interval).
  */
object Pipeline66 extends graft.QueryModule {

  /** PER-FEATURE DRIFT MATRIX: the two-sample KS statistic between
    * early (< 1998-07-01 shipments) and late lineitems, for THREE
    * features at once (quantity, price kilodollar bucket, discount
    * bp) — the q_ml_ks_test machinery widened to a feature table: one
    * union frame keyed (feature, value), the CDF gap via banded
    * cumsums PARTITIONED BY FEATURE, the max gap in exact ppm
    * integers. The per-feature drift report q_profile_drift's single-
    * column PSI can't give.
    *
    * 100 TB: one full pass builds the (feature, value, side) counts;
    * everything after runs on the feature-domain frame. */
  def profileFeatureDrift(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .select((col("l_shipdate") <
        lit("1998-07-01").cast("timestamp")).as("early"),
        expr("cast(round(l_quantity) as bigint)").as("f_quantity"),
        expr("cast(round(l_extendedprice * 100) as bigint)" +
          " div 100000").as("f_price_kd"),
        expr("cast(round(l_discount * 100) as bigint)").as("f_disc"))
    val long = base.selectExpr("early",
        "stack(3, 'quantity', f_quantity, 'price_kd', f_price_kd," +
          " 'discount', f_disc) as (feature, v)")
      .groupBy("feature", "v")
      .agg(sum(expr("if(early, 1L, 0L)")).as("n1"),
        sum(expr("if(early, 0L, 1L)")).as("n2"))
    val tot = long.groupBy("feature")
      .agg(sum("n1").as("na"), sum("n2").as("nb"))
    graft.api.Dist.bandedCumSum(long, Seq("feature"), "v",
        bandWidth = 64L, sumCols = Seq("n1", "n2"))
      .join(broadcast(tot), "feature")
      .select(col("feature"), col("na"), col("nb"),
        expr("cast(abs(cast(cum_n1 as decimal(19,0)) * nb" +
          " - cast(cum_n2 as decimal(19,0)) * na) * 1000000" +
          " div (cast(na as decimal(38,0)) * nb) as bigint)")
          .as("ppm"))
      .groupBy("feature")
      .agg(max("na").as("n_early"), max("nb").as("n_late"),
        max("ppm").as("ks_ppm"))
      .orderBy("feature")
  }

  /** CUMULATIVE REACH: running DISTINCT users per event type, day by
    * day — WITHOUT a distinct-over-window (unsupported and quadratic
    * anyway): each user contributes on their FIRST active day per
    * type (one min-day agg), daily new-user counts left-join onto the
    * observed (type, day) activity frame, and a cumsum window turns
    * them into the reach curve. The "how fast is the audience
    * growing" curve q_events_dau_mau's per-day uniques can't give.
    *
    * 100 TB: one (type, user) min agg + one (type, day) agg + a
    * type-partitioned cumsum on the calendar-bounded frame. */
  def eventsCumulativeReach(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type").as("t"), to_date(col("ts")).as("d"))
      .groupBy("t", "d").agg(count(lit(1)).as("n_events"))
    val firstDay = Tables.events(s, dir)
      .select(col("event_type").as("t"), col("user_id"),
        to_date(col("ts")).as("d"))
      .groupBy("t", "user_id").agg(min("d").as("d"))
      .groupBy("t", "d").agg(count(lit(1)).as("new_users"))
    val w = Window.partitionBy("t").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(firstDay, Seq("t", "d"), "left")
      .select(col("t"), col("d"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .select(col("t").as("event_type"), col("d").as("day"),
        col("new_users"),
        sum("new_users").over(Window.partitionBy("t").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_users"))
      .orderBy("event_type", "day")
  }

  /** WILSON SCORE INTERVALS (95%) for the high-value share per event
    * type: the rate CI that stays inside [0, 1] and behaves at small
    * n, where the naive Wald interval collapses — p̂ and the interval
    * bounds as one fixed IEEE dag from exact integer counts and the
    * literal z = 1.959963984540054.
    *
    * 100 TB: one map-side-partial two-count agg per type. */
  def mlWilsonCi(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .select(col("event_type"), (col("value") > 250.0).as("hi"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("hi"), 1L).otherwise(0L)).as("x"))
      .selectExpr("event_type", "n", "x",
        "cast(x as double) / n as p",
        "1.959963984540054D * 1.959963984540054D / n as zz")
      .selectExpr("event_type", "n", "x", "round(p, 6) as p_hat",
        "round((p + zz / 2D - 1.959963984540054D" +
          " * sqrt(p * (1D - p) / n + zz / (4D * n)))" +
          " / (1D + zz), 6) as wilson_lo",
        "round((p + zz / 2D + 1.959963984540054D" +
          " * sqrt(p * (1D - p) / n + zz / (4D * n)))" +
          " / (1D + zz), 6) as wilson_hi")
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_feature_drift" -> profileFeatureDrift,
    "q_events_cumulative_reach" -> eventsCumulativeReach,
    "q_ml_wilson_ci" -> mlWilsonCi)

  def oracleSql: Map[String, String] = Map(
    "q_profile_feature_drift" ->
      """WITH base AS (SELECT
        |    (l_shipdate < TIMESTAMP '1998-07-01') AS early,
        |    CAST(ROUND(l_quantity) AS BIGINT) AS f_quantity,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) // 100000
        |      AS f_price_kd,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS f_disc
        |  FROM lineitem),
        |long AS (
        |  SELECT early, 'quantity' AS feature, f_quantity AS v
        |    FROM base
        |  UNION ALL SELECT early, 'price_kd', f_price_kd FROM base
        |  UNION ALL SELECT early, 'discount', f_disc FROM base),
        |g AS (SELECT feature, v,
        |    CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n2
        |  FROM long GROUP BY 1, 2),
        |tot AS (SELECT feature, CAST(SUM(n1) AS BIGINT) AS na,
        |    CAST(SUM(n2) AS BIGINT) AS nb FROM g GROUP BY feature),
        |cdf AS (SELECT g.feature, v,
        |    CAST(SUM(n1) OVER (PARTITION BY g.feature ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_n1,
        |    CAST(SUM(n2) OVER (PARTITION BY g.feature ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_n2
        |  FROM g),
        |ppm AS (SELECT cdf.feature, na, nb,
        |    CAST(abs(CAST(cum_n1 AS HUGEINT) * nb
        |      - CAST(cum_n2 AS HUGEINT) * na) * 1000000
        |      // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS ppm
        |  FROM cdf JOIN tot ON cdf.feature = tot.feature)
        |SELECT feature, MAX(na) AS n_early, MAX(nb) AS n_late,
        |  CAST(MAX(ppm) AS BIGINT) AS ks_ppm
        |FROM ppm GROUP BY feature ORDER BY feature""".stripMargin,
    "q_events_cumulative_reach" ->
      """WITH daily AS (SELECT event_type AS t, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |fd AS (SELECT t, d, CAST(COUNT(*) AS BIGINT) AS new_users
        |  FROM (SELECT event_type AS t, user_id,
        |          MIN(CAST(ts AS DATE)) AS d
        |        FROM events GROUP BY 1, 2)
        |  GROUP BY t, d)
        |SELECT daily.t AS event_type, daily.d AS day,
        |  COALESCE(fd.new_users, 0) AS new_users,
        |  CAST(SUM(COALESCE(fd.new_users, 0)) OVER (
        |    PARTITION BY daily.t ORDER BY daily.d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_users
        |FROM daily LEFT JOIN fd ON daily.t = fd.t AND daily.d = fd.d
        |ORDER BY event_type, day""".stripMargin,
    "q_ml_wilson_ci" ->
      """WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN value > 250.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM events GROUP BY event_type),
        |f AS (SELECT event_type, n, x, CAST(x AS DOUBLE) / n AS p,
        |    1.959963984540054 * 1.959963984540054 / n AS zz
        |  FROM g)
        |SELECT event_type, n, x, ROUND(p, 6) AS p_hat,
        |  ROUND((p + zz / 2 - 1.959963984540054
        |    * sqrt(p * (1 - p) / n + zz / (4 * n))) / (1 + zz), 6)
        |    AS wilson_lo,
        |  ROUND((p + zz / 2 + 1.959963984540054
        |    * sqrt(p * (1 - p) / n + zz / (4 * n))) / (1 + zz), 6)
        |    AS wilson_hi
        |FROM f ORDER BY event_type""".stripMargin)
}
