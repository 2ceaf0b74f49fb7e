package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.51 round-14 batch 6 — statistics-family completion rungs:
  * geometric/harmonic means (the two Pythagorean means the arithmetic
  * q_agg_stats lacks), Cohen's d / Hedges' g effect size (the
  * magnitude readout the q_ml_ab_ttest p-value lacks), Spearman rank
  * correlation (the monotone sibling of Pearson q_agg_corr, exact
  * integer ranks from the banded machinery), and the paired t-test on
  * micro-grid per-user deltas (the within-subject design
  * q_ml_ab_ttest's unpaired form can't grade).
  */
object Pipeline38 extends graft.QueryModule {

  /** GEOMETRIC + HARMONIC MEAN of order quantity per return flag —
    * the two Pythagorean means beside q_agg_stats' arithmetic one
    * (rate-style columns average harmonically; multiplicative growth
    * geometrically). Quantities live on a ≤50-value integer domain,
    * so both means fold COUNTS over the domain frame in sorted order
    * (the q_agg_entropy discipline): geo = exp(Σ c·ln q / n),
    * harm = n / Σ c/q; each renders once, rounded to 6.
    *
    * 100 TB: one map-side-partial (flag, quantity) count agg; the
    * folds run on the ≤3×50-cell domain frame. */
  def aggGeomean(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        expr("cast(round(l_quantity) as bigint)").as("q"))
      .groupBy("l_returnflag", "q").agg(count(lit(1)).as("c"))
      .groupBy("l_returnflag")
      .agg(sum("c").as("n"),
        expr("array_sort(collect_list(struct(q," +
          " c * ln(cast(q as double)) as lq," +
          " cast(c as double) / q as rq)))").as("l"))
      .selectExpr("l_returnflag", "n",
        "round(exp(aggregate(l, 0D, (a, x) -> a + x.lq) / n), 6)" +
          " as geomean",
        "round(n / aggregate(l, 0D, (a, x) -> a + x.rq), 6)" +
          " as harmonic")
      .orderBy("l_returnflag")

  /** COHEN'S D + HEDGES' G — the effect-size magnitude of the
    * purchase-vs-click value gap (the readout q_ml_ab_ttest's
    * p-value and q_ml_mannwhitney's z lack: HOW BIG, not how
    * unlikely). Moments exact in decimal(38,0) cents from one hash
    * agg; pooled-SD arithmetic runs once on the 1-row frame in
    * doubles with the identical expression shape on both engines.
    *
    * 100 TB: one map-side-partial agg over the scan; nothing else. */
  def mlEffectSize(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .where(col("event_type").isin("purchase", "click"))
      .select((col("event_type") === "purchase").as("g1"),
        expr("cast(round(value * 100) as bigint)").as("x"))
      .agg(
        sum(when(col("g1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("g1"), 0L).otherwise(1L)).as("n2"),
        sum(when(col("g1"), expr("cast(x as decimal(38,0))"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("s1"),
        sum(when(!col("g1"), expr("cast(x as decimal(38,0))"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("s2"),
        sum(when(col("g1"), expr("cast(x as decimal(38,0)) * x"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("ss1"),
        sum(when(!col("g1"), expr("cast(x as decimal(38,0)) * x"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("ss2"))
      .selectExpr("n1", "n2",
        "cast(s1 as double) / n1 as m1", "cast(s2 as double) / n2 as m2",
        "(cast(ss1 as double) - cast(s1 as double) * s1 / n1) / (n1 - 1)" +
          " as v1",
        "(cast(ss2 as double) - cast(s2 as double) * s2 / n2) / (n2 - 1)" +
          " as v2")
      .selectExpr("n1", "n2", "round(m1, 4) as mean1_cents",
        "round(m2, 4) as mean2_cents",
        "round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)" +
          " / (n1 + n2 - 2)), 6) as cohen_d",
        "round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)" +
          " / (n1 + n2 - 2))" +
          " * (1.0D - 3.0D / (4 * (n1 + n2) - 9)), 6) as hedges_g")

  /** SPEARMAN RANK CORRELATION of quantity vs extended price — the
    * monotone-association sibling of Pearson (q_agg_corr), graded
    * with EXACT average-tie ranks and NO global sort: per variable,
    * the distinct-value frame gets below-counts from the banded
    * prefix-sum machinery, average ranks in exact DOUBLED units
    * (2·rank = 2·cum_below + ties + 1 — all integers), rows take rx
    * from a broadcast of the tiny x-rank frame and every moment folds
    * at the y-value grain (Σ_rows rx·ry = Σ_y ry·Σ_{y} rx — exact
    * integers, so the regroup is identity), and rho is Pearson on the
    * doubled ranks (the ½ scaling cancels) from decimal(38,0)
    * moments. The variance cross-product would overflow
    * decimal(38,0), so each factor casts to double BEFORE the final
    * multiply (same shape both engines).
    *
    * 100 TB: one broadcast rank attach + one y-grain agg + one banded
    * cumsum + one moment agg — no row-scale join or sort anywhere. */
  def mlSpearman(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .select(expr("cast(round(l_quantity * 100) as bigint)").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y"))
    def doubledRanks(v: String, bw: Long): DataFrame = {
      val g = base.groupBy(v).agg(count(lit(1)).as("tv"))
      graft.api.Dist.bandedCumSum(g, Seq(), v, bandWidth = bw,
          sumCols = Seq("tv"), inclusive = false)
        .select(col(v), (lit(2L) * col("cum_tv") + col("tv") + 1L)
          .as(s"r$v"))
    }
    // r16 rewrite: rx rides a BROADCAST join of the tiny x-rank frame
    // (≤|x-domain| rows), then everything folds at the y-VALUE grain —
    // per y: row count tv and the exact decimal Σrx / Σrx² — so the
    // y-rank never re-joins row-scale data (the old plan's 600k×600k
    // sort-merge join and the eager base checkpoint are gone; every
    // moment is the identical integer: Σ_rows rx·ry = Σ_y ry·Σ_{y} rx).
    val yg = base
      .join(broadcast(doubledRanks("x", 500L)), "x")
      .groupBy("y")
      .agg(count(lit(1)).as("tv"),
        sum(expr("cast(rx as decimal(38,0))")).as("srx"),
        sum(expr("cast(rx as decimal(38,0)) * rx")).as("srx2"))
    graft.api.Dist.bandedCumSum(yg, Seq(), "y", bandWidth = 200000L,
        sumCols = Seq("tv"), inclusive = false)
      .select(col("tv"), col("srx"), col("srx2"),
        (lit(2L) * col("cum_tv") + col("tv") + 1L).as("ry"))
      .agg(sum("tv").as("n"),
        sum("srx").as("sx"),
        sum(expr("cast(tv as decimal(38,0)) * ry")).as("sy"),
        sum("srx2").as("sxx"),
        sum(expr("cast(tv as decimal(38,0)) * ry * ry")).as("syy"),
        sum(expr("srx * ry")).as("sxy"))
      .selectExpr("n",
        "round(cast(n * sxy - sx * sy as double)" +
          " / (sqrt(cast(n * sxx - sx * sx as double))" +
          " * sqrt(cast(n * syy - sy * sy as double))), 6) as rho")
  }

  /** PAIRED T-TEST on per-user micro-grid deltas — the
    * within-subject design (same users, first half vs second half of
    * the month) q_ml_ab_ttest's unpaired form can't grade: per user
    * with events in BOTH halves, the mean-value delta on the EXACT
    * micro grid (d = s2·10⁶ div c2 − s1·10⁶ div c1 — integer floors,
    * so Σd and Σd² are exact integers and the t-statistic needs no
    * float fold at any user count). t = d̄ / (s_d/√n), df = n−1.
    *
    * 100 TB: one (user, half) agg → one user-grain projection → one
    * global moment agg; no windows, no row-scale funnel. */
  def mlPairedTtest(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
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
      .agg(count(lit(1)).as("n_users"),
        sum(expr("cast(d as decimal(38,0))")).as("sd"),
        sum(expr("cast(d as decimal(38,0)) * d")).as("sdd"))
      .selectExpr("n_users",
        "round(cast(sd as double) / n_users / 1e6, 6)" +
          " as mean_delta_cents",
        "round((cast(sd as double) / n_users)" +
          " / sqrt(((cast(sdd as double)" +
          " - cast(sd as double) * sd / n_users) / (n_users - 1))" +
          " / n_users), 6) as t_stat",
        "n_users - 1 as df")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_geomean" -> aggGeomean,
    "q_ml_effect_size" -> mlEffectSize,
    "q_ml_spearman" -> mlSpearman,
    "q_ml_paired_ttest" -> mlPairedTtest)

  def oracleSql: Map[String, String] = Map(
    "q_agg_geomean" ->
      """WITH cells AS (SELECT l_returnflag,
        |    CAST(ROUND(l_quantity) AS BIGINT) AS q,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY l_returnflag, q)
        |SELECT l_returnflag, CAST(SUM(c) AS BIGINT) AS n,
        |  ROUND(exp(list_reduce(list(c * ln(CAST(q AS DOUBLE))
        |      ORDER BY q), (a, b) -> a + b) / SUM(c)), 6) AS geomean,
        |  ROUND(SUM(c) / list_reduce(list(CAST(c AS DOUBLE) / q
        |      ORDER BY q), (a, b) -> a + b), 6) AS harmonic
        |FROM cells GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_ml_effect_size" ->
      """WITH base AS (SELECT (event_type = 'purchase') AS g1,
        |    CAST(ROUND(value * 100) AS BIGINT) AS x
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |m AS (SELECT
        |    CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS n2,
        |    SUM(CASE WHEN g1 THEN CAST(x AS DECIMAL(38,0)) ELSE 0 END)
        |      AS s1,
        |    SUM(CASE WHEN g1 THEN 0 ELSE CAST(x AS DECIMAL(38,0)) END)
        |      AS s2,
        |    SUM(CASE WHEN g1 THEN CAST(x AS DECIMAL(38,0)) * x
        |      ELSE 0 END) AS ss1,
        |    SUM(CASE WHEN g1 THEN 0
        |      ELSE CAST(x AS DECIMAL(38,0)) * x END) AS ss2
        |  FROM base),
        |v AS (SELECT n1, n2,
        |    CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
        |    (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
        |      / (n1 - 1) AS v1,
        |    (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
        |      / (n2 - 1) AS v2
        |  FROM m)
        |SELECT n1, n2, ROUND(m1, 4) AS mean1_cents,
        |  ROUND(m2, 4) AS mean2_cents,
        |  ROUND((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
        |    / (n1 + n2 - 2)), 6) AS cohen_d,
        |  ROUND((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
        |    / (n1 + n2 - 2))
        |    * (1.0 - 3.0 / (4 * (n1 + n2) - 9)), 6) AS hedges_g
        |FROM v""".stripMargin,
    "q_ml_spearman" ->
      """WITH base AS (SELECT
        |    CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |gx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS tv FROM base
        |       GROUP BY x),
        |rx AS (SELECT x, 2 * CAST(COALESCE(SUM(tv) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) + tv + 1 AS rx FROM gx),
        |gy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS tv FROM base
        |       GROUP BY y),
        |ry AS (SELECT y, 2 * CAST(COALESCE(SUM(tv) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) + tv + 1 AS ry FROM gy),
        |j AS (SELECT rx.rx, ry.ry FROM base
        |      JOIN rx USING (x) JOIN ry USING (y)),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(rx AS DECIMAL(38,0))) AS sx,
        |    SUM(CAST(ry AS DECIMAL(38,0))) AS sy,
        |    SUM(CAST(rx AS DECIMAL(38,0)) * rx) AS sxx,
        |    SUM(CAST(ry AS DECIMAL(38,0)) * ry) AS syy,
        |    SUM(CAST(rx AS DECIMAL(38,0)) * ry) AS sxy
        |  FROM j)
        |SELECT n, ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
        |FROM m""".stripMargin,
    "q_ml_paired_ttest" ->
      """WITH halves AS (SELECT user_id,
        |    (ts >= TIMESTAMP '2024-01-16') AS h2,
        |    CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sv
        |  FROM events GROUP BY user_id, h2),
        |d AS (SELECT user_id,
        |    MAX(CASE WHEN h2 THEN (sv * 1000000) // c END)
        |      - MAX(CASE WHEN NOT h2 THEN (sv * 1000000) // c END) AS d
        |  FROM halves GROUP BY user_id HAVING COUNT(*) = 2),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    SUM(CAST(d AS DECIMAL(38,0))) AS sd,
        |    SUM(CAST(d AS DECIMAL(38,0)) * d) AS sdd
        |  FROM d)
        |SELECT n_users,
        |  ROUND(CAST(sd AS DOUBLE) / n_users / 1e6, 6)
        |    AS mean_delta_cents,
        |  ROUND((CAST(sd AS DOUBLE) / n_users)
        |    / sqrt(((CAST(sdd AS DOUBLE)
        |      - CAST(sd AS DOUBLE) * sd / n_users) / (n_users - 1))
        |      / n_users), 6) AS t_stat,
        |  CAST(n_users - 1 AS BIGINT) AS df
        |FROM m""".stripMargin)
}
