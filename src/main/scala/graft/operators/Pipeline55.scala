package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64e round-14 batch 23 — homogeneity/trend closers: Cochran's Q
  * (k RELATED binary treatments — the k>2 extension of q_ml_mcnemar),
  * Bartlett's test (the parametric variance-homogeneity twin of
  * q_ml_levene / q_ml_brown_forsythe), and the rolling OLS slope (the
  * windowed twin of q_ml_linfit's global trend).
  */
object Pipeline55 extends graft.QueryModule {

  /** COCHRAN'S Q over k=3 related binary "treatments": for each
    * (user, day) BLOCK, did the user emit at least one click / view /
    * purchase that day? (Whole-user blocks degenerate — every user
    * eventually does all three, so the k*sumR - sumR^2 denominator is
    * exactly 0 at every SF; the daily panel keeps real variability.)
    * Q = (k-1)(k*sum C_j^2 - (sum C_j)^2) / (k*sum R_i - sum R_i^2)
    * over column totals C_j and row totals R_i — pure integer
    * counting, one nullif-guarded double division (the q_ml_mcnemar
    * discipline, generalized past two treatments).
    *
    * 100 TB: one distinct (user, day, type) pass; R and C are hash
    * aggs on the block / type frames; the assembly is a 1-row
    * broadcast. */
  def mlCochranQ(s: SparkSession, dir: String): DataFrame = {
    val inc = Tables.events(s, dir)
      .where(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type")).distinct()
      .localCheckpoint(true)
    val r = inc.groupBy("user_id", "d").agg(count(lit(1)).as("ri"))
      .agg(count(lit(1)).as("blocks"), sum("ri").as("sr"),
        sum(expr("ri * ri")).as("srr"))
    val c = inc.groupBy("event_type").agg(count(lit(1)).as("cj"))
      .agg(sum("cj").as("sc"), sum(expr("cj * cj")).as("scc"))
    r.crossJoin(broadcast(c))
      .selectExpr("blocks",
        "round(2.0D * (3 * scc - sc * sc)" +
          " / nullif(3 * sr - srr, 0), 6) as q",
        "2.0D * (3 * scc - sc * sc) / nullif(3 * sr - srr, 0)" +
          " > 5.991464547107979D as reject5")
  }

  /** BARTLETT'S TEST for variance homogeneity of the event value
    * across the 5 event types — the PARAMETRIC twin of q_ml_levene's
    * Brown-Forsythe: per-group sample variances from exact integer
    * moments ((n*ss - s^2) stays decimal(38,0)/HUGEINT; doubles only
    * at the division), the three order-sensitive double folds
    * (sum (n_i-1)ln v_i, sum (n_i-1)v_i, sum 1/(n_i-1)) run as
    * ordered HOF folds over the group-sorted 5-row frame (the
    * q_ml_levene determinism idiom), Bartlett correction factor C in
    * the denominator.
    *
    * 100 TB: one map-side-partial moment agg to a |types| frame;
    * everything after is fixed-dag arithmetic. */
  def mlBartlett(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .select(col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("ni"),
        sum("x").as("si"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("qi"))
      .select(col("g"), col("ni"),
        expr("cast(ni * qi - cast(si as decimal(38,0)) * si as double)")
          .as("vnum"))
      .agg(count(lit(1)).as("k"), sum("ni").as("n"),
        expr("array_sort(collect_list(struct(g, ni, vnum)))").as("l"))
      .selectExpr("k", "n",
        "aggregate(l, 0D, (a, x) -> a + x.vnum / x.ni) as sb",
        "aggregate(l, 0D, (a, x) -> a + (x.ni - 1)" +
          " * ln(x.vnum / (x.ni * cast(x.ni - 1 as double)))) as sa",
        "aggregate(l, 0D, (a, x) -> a + 1D / (x.ni - 1)) as sc")
      .selectExpr("k", "n",
        "round(((n - k) * ln(sb / (n - k)) - sa)" +
          " / (1D + (sc - 1D / (n - k)) / (3D * (k - 1))), 6)" +
          " as bartlett_t",
        "k - 1 as df",
        "((n - k) * ln(sb / (n - k)) - sa)" +
          " / (1D + (sc - 1D / (n - k)) / (3D * (k - 1)))" +
          " > 9.487729036781154D as reject5")
  }

  /** ROLLING OLS SLOPE of daily revenue per event type — a
    * 14-OBSERVATION trailing regression (rowsBetween(-13, 0) over the
    * (type, day) frame: 14 most recent observed days, which spans
    * MORE than 14 calendar days when days are missing — the ROWS
    * frame is what the DuckDB oracle mirrors) of the exact-integer
    * daily cents on the
    * epoch-day index, from windowed integer moment sums (the
    * q_ml_linfit moment discipline under a window): slope =
    * (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), NULL while the window holds a
    * single day. The windowed twin of q_ml_linfit's global trend and
    * q_time_rolling_corr's cross-series frame.
    *
    * 100 TB: the daily agg is the only full pass; the window runs
    * partitioned by event_type over the calendar-bounded
    * (type x day) frame. */
  def timeRollingSlope(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        expr("cast(round(value * 100) as bigint)").as("v"))
      .groupBy("event_type", "d")
      .agg(sum("v").as("y"))
      .select(col("event_type"), col("d"),
        expr("cast(datediff(d, date '2024-01-01') as bigint)").as("x"),
        col("y"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(-13, Window.currentRow)
    daily
      .select(col("event_type"), col("d"),
        count(lit(1)).over(w).as("wn"),
        sum("x").over(w).as("sx"),
        sum("y").over(w).as("sy"),
        sum(expr("x * y")).over(w).as("sxy"),
        sum(expr("x * x")).over(w).as("sxx"))
      .selectExpr("event_type", "d", "wn",
        "case when wn * sxx - sx * sx = 0 then null" +
          " else round((wn * cast(sxy as double) - cast(sx as double)" +
          " * sy) / (wn * cast(sxx as double) - cast(sx as double)" +
          " * sx), 6) end as slope")
      .orderBy("event_type", "d")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_cochran_q" -> mlCochranQ,
    "q_ml_bartlett" -> mlBartlett,
    "q_time_rolling_slope" -> timeRollingSlope)

  def oracleSql: Map[String, String] = Map(
    "q_ml_cochran_q" ->
      """WITH inc AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
        |    event_type FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')),
        |r AS (SELECT CAST(COUNT(*) AS BIGINT) AS blocks,
        |    CAST(SUM(ri) AS BIGINT) AS sr,
        |    CAST(SUM(ri * ri) AS BIGINT) AS srr
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS ri FROM inc
        |        GROUP BY user_id, d)),
        |c AS (SELECT CAST(SUM(cj) AS BIGINT) AS sc,
        |    CAST(SUM(cj * cj) AS BIGINT) AS scc
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cj FROM inc
        |        GROUP BY event_type))
        |SELECT blocks,
        |  ROUND(2.0 * (3 * scc - sc * sc)
        |    / nullif(3 * sr - srr, 0), 6) AS q,
        |  2.0 * (3 * scc - sc * sc) / nullif(3 * sr - srr, 0)
        |    > 5.991464547107979 AS reject5
        |FROM r, c""".stripMargin,
    "q_ml_bartlett" ->
      """WITH grp AS (SELECT event_type AS g,
        |    CAST(COUNT(*) AS BIGINT) AS ni,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS si,
        |    SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT)
        |      * CAST(ROUND(value * 100) AS BIGINT)) AS qi
        |  FROM events GROUP BY g),
        |v AS (SELECT g, ni,
        |    CAST(ni * qi - CAST(si AS HUGEINT) * si AS DOUBLE)
        |      AS vnum FROM grp),
        |top AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(ni) AS BIGINT) AS n,
        |    list_reduce(list(vnum / ni ORDER BY g),
        |      (a, b) -> a + b) AS sb,
        |    list_reduce(list((ni - 1)
        |      * ln(vnum / (ni * CAST(ni - 1 AS DOUBLE))) ORDER BY g),
        |      (a, b) -> a + b) AS sa,
        |    list_reduce(list(1.0 / (ni - 1) ORDER BY g),
        |      (a, b) -> a + b) AS sc
        |  FROM v)
        |SELECT k, n,
        |  ROUND(((n - k) * ln(sb / (n - k)) - sa)
        |    / (1.0 + (sc - 1.0 / (n - k)) / (3.0 * (k - 1))), 6)
        |    AS bartlett_t,
        |  k - 1 AS df,
        |  ((n - k) * ln(sb / (n - k)) - sa)
        |    / (1.0 + (sc - 1.0 / (n - k)) / (3.0 * (k - 1)))
        |    > 9.487729036781154 AS reject5
        |FROM top""".stripMargin,
    "q_time_rolling_slope" ->
      """WITH rows_ AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v FROM events),
        |daily AS (SELECT event_type, d,
        |    CAST(datediff('day', DATE '2024-01-01', d) AS BIGINT) AS x,
        |    CAST(SUM(v) AS BIGINT) AS y
        |  FROM rows_ GROUP BY event_type, d),
        |w AS (SELECT event_type, d,
        |    CAST(COUNT(*) OVER win AS BIGINT) AS wn,
        |    CAST(SUM(x) OVER win AS BIGINT) AS sx,
        |    CAST(SUM(y) OVER win AS BIGINT) AS sy,
        |    CAST(SUM(x * y) OVER win AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) OVER win AS BIGINT) AS sxx
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY d
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, d, wn,
        |  CASE WHEN wn * sxx - sx * sx = 0 THEN NULL
        |    ELSE ROUND((wn * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * sy) / (wn * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * sx), 6) END AS slope
        |FROM w ORDER BY event_type, d""".stripMargin)
}
