package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64d round-14 batch 22 — rank-association closers: Kendall's
  * tau-b (the pair-concordance twin of q_ml_spearman's rank-Pearson),
  * the Mann-Kendall monotonic-trend test (the hypothesis-test twin of
  * q_time_theil_sen's slope estimate), and Lin's concordance
  * correlation coefficient (agreement, not just association — penalizes
  * scale/location shift that Pearson ignores).
  */
object Pipeline54 extends graft.QueryModule {

  /** KENDALL TAU-B between l_quantity and l_discount: both variables
    * live on tiny integer domains (50 x 11 after cents integerization),
    * so concordant/discordant pairs are computed on the JOINT FREQUENCY
    * FRAME (<= 550 cells), never on row pairs — C and D are sums of
    * n_a * n_b over strictly-dominating cell pairs, tie terms n1/n2
    * come from the per-axis marginals, and tau_b =
    * (C - D) / sqrt((n0 - n1) * (n0 - n2)) with the variance factors
    * cast to double BEFORE the multiply (the q_ml_spearman overflow
    * discipline: (n0-n1)*(n0-n2) ~ 3e22 at sf0.1 exceeds bigint).
    *
    * 100 TB: one groupBy(x, y) full pass; the theta self-join runs on
    * the domain-constant cell frame (bounded broadcast BNLJ), so the
    * pair stage costs O(d^2) regardless of row count. */
  def mlKendallTau(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .select(expr("cast(round(l_quantity * 100) as bigint)").as("x"),
        expr("cast(round(l_discount * 100) as bigint)").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val a = cells.select(col("x").as("xa"), col("y").as("ya"),
      col("n").as("na"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"),
      col("n").as("nb"))
    val pairs = a.join(broadcast(b), col("xb") > col("xa"))
      .agg(
        sum(when(col("yb") > col("ya"),
          col("na") * col("nb")).otherwise(0L)).as("c"),
        sum(when(col("yb") < col("ya"),
          col("na") * col("nb")).otherwise(0L)).as("d"))
    val ties = cells
      .agg(sum("n").as("nn"))
      .select(col("nn"), expr("nn * (nn - 1) div 2").as("n0"))
    val tx = cells.groupBy("x").agg(sum("n").as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n1"))
    val ty = cells.groupBy("y").agg(sum("n").as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n2"))
    pairs.crossJoin(broadcast(ties)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .selectExpr("nn as n", "c as concordant", "d as discordant",
        "round((c - d) / sqrt(cast(n0 - n1 as double)" +
          " * cast(n0 - n2 as double)), 6) as tau_b")
  }

  /** MANN-KENDALL TREND TEST on the daily mean event value (exact
    * integer micro-units via the q_ml_wilcoxon_signed discipline):
    * S = sum of pairwise sign(v_j - v_i) over day-ordered pairs,
    * Var(S) with the tie correction sum t(t-1)(2t+5), z with the
    * continuity correction (S -> S-sign(S)).
    *
    * 100 TB: the daily agg is the only full pass; the pair join runs
    * on the <= |days| (30) frame — a domain constant. */
  def timeMannKendall(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"),
        expr("cast(round(value * 100) as bigint)").as("x"))
      .groupBy("d")
      .agg(count(lit(1)).as("c"), sum("x").as("sv"))
      .select(col("d"), expr("(sv * 1000000) div c").as("v"))
      .localCheckpoint(true)
    val a = daily.select(col("d").as("da"), col("v").as("va"))
    val b = daily.select(col("d").as("db"), col("v").as("vb"))
    val sStat = a.join(broadcast(b), col("db") > col("da"))
      .agg(sum(expr("cast(sign(vb - va) as bigint)")).as("s"))
    val tie = daily.groupBy("v").agg(count(lit(1)).as("t"))
      .agg(count(lit(1)).as("dv"),
        sum(expr("t * (t - 1) * (2 * t + 5)")).as("tt"))
    val n = daily.agg(count(lit(1)).as("n"))
    sStat.crossJoin(broadcast(n)).crossJoin(broadcast(tie))
      .selectExpr("n", "s",
        "round((s - cast(sign(s) as bigint))" +
          " / sqrt((n * cast(n - 1 as double) * (2 * n + 5) - tt)" +
          " / 18.0D), 6) as z",
        "case when (s - cast(sign(s) as bigint))" +
          " / sqrt((n * cast(n - 1 as double) * (2 * n + 5) - tt)" +
          " / 18.0D) > 1.959963984540054D then 'increasing'" +
          " when (s - cast(sign(s) as bigint))" +
          " / sqrt((n * cast(n - 1 as double) * (2 * n + 5) - tt)" +
          " / 18.0D) < -1.959963984540054D then 'decreasing'" +
          " else 'no_trend' end as trend")
  }

  /** LIN'S CONCORDANCE CORRELATION between o_totalprice and the
    * pre-tax order revenue rebuilt from lineitem (sum of
    * cents(extendedprice) * (100 - pct(discount)), exact 1e-4-dollar
    * integer units — no computed-double rounding anywhere). CCC
    * penalizes the systematic ~tax-factor shift Pearson ignores:
    * ccc = 2*(n*sxy - sx*sy) / ((n*sxx - sx^2) + (n*syy - sy^2)
    * + (sx - sy)^2), every term an exact decimal(38,0)/HUGEINT
    * (~1e29 max at sf0.1), cast to double only for the final ratio;
    * Pearson r from the same moments with factors cast to double
    * before the product (q_ml_spearman overflow rule).
    *
    * 100 TB: one lineitem groupBy + one equi-join on o_orderkey
    * (both sides pre-partitioned by the join key), one moment agg. */
  def mlCcc(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        (expr("cast(round(l_extendedprice * 100) as bigint)")
          * (lit(100L) -
            expr("cast(round(l_discount * 100) as bigint)"))).as("r"))
      .groupBy("l_orderkey").agg(sum("r").as("y"))
    val paired = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (expr("cast(round(o_totalprice * 100) as bigint)") * 100L)
          .as("x"))
      .join(rev, col("o_orderkey") === col("l_orderkey"))
    val m = paired.agg(
      count(lit(1)).as("n"),
      sum(expr("cast(x as decimal(38,0))")).as("sx"),
      sum(expr("cast(y as decimal(38,0))")).as("sy"),
      sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
      sum(expr("cast(y as decimal(38,0)) * y")).as("syy"),
      sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"))
    m.selectExpr("n",
        "cast(n * sxy - sx * sy as double) as cov_n2",
        "cast(n * sxx - sx * sx as double) as vx_n2",
        "cast(n * syy - sy * sy as double) as vy_n2",
        "cast(sx - sy as double) as shift_n")
      .selectExpr("n",
        "round(cov_n2 / sqrt(vx_n2 * vy_n2), 6) as pearson_r",
        "round(2.0D * cov_n2" +
          " / (vx_n2 + vy_n2 + shift_n * shift_n), 6) as ccc")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_kendall_tau" -> mlKendallTau,
    "q_time_mann_kendall" -> timeMannKendall,
    "q_ml_ccc" -> mlCcc)

  def oracleSql: Map[String, String] = Map(
    "q_ml_kendall_tau" ->
      """WITH cells AS (SELECT
        |    CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |pairs AS (SELECT
        |    CAST(SUM(CASE WHEN b.y > a.y THEN a.n * b.n
        |      ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN b.y < a.y THEN a.n * b.n
        |      ELSE 0 END) AS BIGINT) AS d
        |  FROM cells a JOIN cells b ON b.x > a.x),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(n) AS BIGINT) * (CAST(SUM(n) AS BIGINT) - 1) // 2
        |      AS n0 FROM cells),
        |txa AS (SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n1
        |  FROM (SELECT CAST(SUM(n) AS BIGINT) AS t
        |        FROM cells GROUP BY x)),
        |tya AS (SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n2
        |  FROM (SELECT CAST(SUM(n) AS BIGINT) AS t
        |        FROM cells GROUP BY y))
        |SELECT nn AS n, c AS concordant, d AS discordant,
        |  ROUND((c - d) / sqrt(CAST(n0 - n1 AS DOUBLE)
        |    * CAST(n0 - n2 AS DOUBLE)), 6) AS tau_b
        |FROM pairs, tot, txa, tya""".stripMargin,
    "q_time_mann_kendall" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    (CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      * 1000000) // CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(SUM(CAST(sign(b.v - a.v) AS BIGINT))
        |      AS BIGINT) AS s
        |  FROM daily a JOIN daily b ON b.d > a.d),
        |tie AS (SELECT
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
        |        FROM daily GROUP BY v)),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
        |SELECT n, s,
        |  ROUND((s - CAST(sign(s) AS BIGINT))
        |    / sqrt((n * CAST(n - 1 AS DOUBLE) * (2 * n + 5) - tt)
        |    / 18.0), 6) AS z,
        |  CASE WHEN (s - CAST(sign(s) AS BIGINT))
        |    / sqrt((n * CAST(n - 1 AS DOUBLE) * (2 * n + 5) - tt)
        |    / 18.0) > 1.959963984540054 THEN 'increasing'
        |  WHEN (s - CAST(sign(s) AS BIGINT))
        |    / sqrt((n * CAST(n - 1 AS DOUBLE) * (2 * n + 5) - tt)
        |    / 18.0) < -1.959963984540054 THEN 'decreasing'
        |  ELSE 'no_trend' END AS trend
        |FROM s, n, tie""".stripMargin,
    "q_ml_ccc" ->
      """WITH rev AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |paired AS (SELECT
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) * 100 AS x, y
        |  FROM orders JOIN rev ON o_orderkey = l_orderkey),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        |  FROM paired),
        |f AS (SELECT n,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n2,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS vx_n2,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS vy_n2,
        |    CAST(sx - sy AS DOUBLE) AS shift_n
        |  FROM m)
        |SELECT n,
        |  ROUND(cov_n2 / sqrt(vx_n2 * vy_n2), 6) AS pearson_r,
        |  ROUND(2.0 * cov_n2
        |    / (vx_n2 + vy_n2 + shift_n * shift_n), 6) AS ccc
        |FROM f""".stripMargin)
}
