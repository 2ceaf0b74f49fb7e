package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64f round-14 batch 24 — model-diagnostics trio over the exact
  * normal-equation machinery: exact SHAP attribution for a linear
  * model, Cook's-distance influence ranking, and variance-inflation
  * factors — the "explain and debug the fitted model" cells a training
  * pipeline needs after q_ml_linfit / q_ml_corr_matrix fit it.
  */
object Pipeline56 extends graft.QueryModule {

  /** Per-order design frame shared by the diagnostics keys: x1 = line
    * count, x2 = total quantity (integer units), y = totalprice cents
    * — all exact integers so every moment is decimal-exact. */
  private def design(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("x1"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x2"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("y"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "x1", "x2", "y")
  }

  /** EXACT SHAP ATTRIBUTION for a linear model: fit y ~ x1 + x2 by the
    * closed-form 2-feature normal equations (centered moments
    * n·Sab − Sa·Sb stay decimal(38,0)-exact; the 2x2 solve runs in
    * doubles — the q_ml_spearman cast-before-multiply rule, the cross
    * products reach ~1e33 at sf0.1), then use the linear-model
    * identity phi_ij = w_j(x_ij − mean x_j): mean |phi_j| =
    * |w_j|·Σ|n·x_ij − Sx_j| / n², with the absolute-deviation sum an
    * EXACT integer (|x − Sx/n| = |n·x − Sx|/n).
    *
    * 100 TB: two map-side-partial passes (moments, deviations vs a
    * 1-row broadcast); the solve is driver-free fixed-dag
    * arithmetic. */
  def mlShapLinear(s: SparkSession, dir: String): DataFrame = {
    val d = design(s, dir).localCheckpoint(true)
    val m = d.agg(
      count(lit(1)).as("n"),
      sum(expr("cast(x1 as decimal(38,0))")).as("s1"),
      sum(expr("cast(x2 as decimal(38,0))")).as("s2"),
      sum(expr("cast(y as decimal(38,0))")).as("sy"),
      sum(expr("cast(x1 as decimal(38,0)) * x1")).as("s11"),
      sum(expr("cast(x1 as decimal(38,0)) * x2")).as("s12"),
      sum(expr("cast(x2 as decimal(38,0)) * x2")).as("s22"),
      sum(expr("cast(x1 as decimal(38,0)) * y")).as("s1y"),
      sum(expr("cast(x2 as decimal(38,0)) * y")).as("s2y"))
      .selectExpr("n", "s1", "s2",
        "cast(n * s11 - s1 * s1 as double) as c11",
        "cast(n * s12 - s1 * s2 as double) as c12",
        "cast(n * s22 - s2 * s2 as double) as c22",
        "cast(n * s1y - s1 * sy as double) as c1y",
        "cast(n * s2y - s2 * sy as double) as c2y")
      .selectExpr("n", "s1", "s2",
        "(c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) as w1",
        "(c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) as w2")
    val dev = d.crossJoin(broadcast(m))
      .agg(first("n").as("n"), first("w1").as("w1"),
        first("w2").as("w2"),
        sum(expr("abs(cast(n as decimal(38,0)) * x1 - s1)")).as("a1"),
        sum(expr("abs(cast(n as decimal(38,0)) * x2 - s2)")).as("a2"))
    dev.selectExpr(
        "'lines' as feature", "round(w1, 6) as weight",
        "round(abs(w1) * cast(a1 as double) / (cast(n as double) * n)," +
          " 6) as mean_abs_shap")
      .unionAll(dev.selectExpr(
        "'quantity' as feature", "round(w2, 6) as weight",
        "round(abs(w2) * cast(a2 as double) / (cast(n as double) * n)," +
          " 6) as mean_abs_shap"))
      .orderBy("feature")
  }

  /** COOK'S DISTANCE influence ranking for the simple regression
    * y ~ x2 (totalprice cents on total quantity): slope/intercept and
    * SSE all from exact centered moments (SSE = (Syyc − Sxyc²/Sxxc)/n
    * — never a row-ordered double sum), leverage h_i = 1/n +
    * (n·x_i − Sx)²/(n·Sxxc) with an exact-integer numerator, residual
    * per row as one fixed IEEE dag, D_i = e_i²·h_i/(p·s²·(1−h_i)²);
    * top 10 by rounded D with the o_orderkey tie-break.
    *
    * 100 TB: one moment pass + one residual pass against a 1-row
    * broadcast; the top-k is a TakeOrdered, never a global sort. */
  def mlInfluence(s: SparkSession, dir: String): DataFrame = {
    val d = design(s, dir).localCheckpoint(true)
    val m = d.agg(
      count(lit(1)).as("n"),
      sum(expr("cast(x2 as decimal(38,0))")).as("sx"),
      sum(expr("cast(y as decimal(38,0))")).as("sy"),
      sum(expr("cast(x2 as decimal(38,0)) * x2")).as("sxx"),
      sum(expr("cast(x2 as decimal(38,0)) * y")).as("sxy"),
      sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      .selectExpr("n", "sx", "sy",
        "cast(n * sxx - sx * sx as double) as cxx",
        "cast(n * sxy - sx * sy as double) as cxy",
        "cast(n * syy - sy * sy as double) as cyy")
      .selectExpr("n", "sx", "sy", "cxx",
        "cxy / cxx as b",
        "(cyy - cxy * cxy / cxx) / (cast(n as double) * n * (n - 2))" +
          " as s2")
    d.crossJoin(broadcast(m))
      .selectExpr("o_orderkey",
        "y - (cast(sy as double) - b * cast(sx as double)) / n" +
          " - b * x2 as e",
        "1D / n + cast(abs(cast(n as decimal(38,0)) * x2 - sx)" +
          " as double) * cast(abs(cast(n as decimal(38,0)) * x2 - sx)" +
          " as double) / (cast(n as double) * cxx) as h",
        "s2")
      .selectExpr("o_orderkey", "round(h, 6) as leverage",
        "round(e * e * h / (2D * s2 * (1D - h) * (1D - h)), 6)" +
          " as cooks_d")
      .orderBy(col("cooks_d").desc, col("o_orderkey"))
      .limit(10)
  }

  /** VARIANCE INFLATION FACTORS for the 3-feature design (lines,
    * quantity, price): pairwise Pearson r from exact moments (the
    * q_ml_corr_matrix discipline, one agg pass), then the closed-form
    * 3x3 inverse diagonal — VIF_1 = (1−r23²)/det with det = 1 +
    * 2·r12·r13·r23 − r12² − r13² − r23² — as one fixed IEEE dag.
    *
    * 100 TB: one map-side-partial 9-moment agg; arithmetic after. */
  def mlVif(s: SparkSession, dir: String): DataFrame = {
    val r = design(s, dir).agg(
      count(lit(1)).as("n"),
      sum(expr("cast(x1 as decimal(38,0))")).as("s1"),
      sum(expr("cast(x2 as decimal(38,0))")).as("s2"),
      sum(expr("cast(y as decimal(38,0))")).as("s3"),
      sum(expr("cast(x1 as decimal(38,0)) * x1")).as("s11"),
      sum(expr("cast(x1 as decimal(38,0)) * x2")).as("s12"),
      sum(expr("cast(x1 as decimal(38,0)) * y")).as("s13"),
      sum(expr("cast(x2 as decimal(38,0)) * x2")).as("s22"),
      sum(expr("cast(x2 as decimal(38,0)) * y")).as("s23"),
      sum(expr("cast(y as decimal(38,0)) * y")).as("s33"))
      .selectExpr(
        "cast(n * s12 - s1 * s2 as double)" +
          " / sqrt(cast(n * s11 - s1 * s1 as double)" +
          " * cast(n * s22 - s2 * s2 as double)) as r12",
        "cast(n * s13 - s1 * s3 as double)" +
          " / sqrt(cast(n * s11 - s1 * s1 as double)" +
          " * cast(n * s33 - s3 * s3 as double)) as r13",
        "cast(n * s23 - s2 * s3 as double)" +
          " / sqrt(cast(n * s22 - s2 * s2 as double)" +
          " * cast(n * s33 - s3 * s3 as double)) as r23")
      .selectExpr("r12", "r13", "r23",
        "1D + 2D * r12 * r13 * r23 - r12 * r12 - r13 * r13" +
          " - r23 * r23 as det")
    r.selectExpr("'lines' as feature",
        "round((1D - r23 * r23) / det, 6) as vif")
      .unionAll(r.selectExpr("'quantity' as feature",
        "round((1D - r13 * r13) / det, 6) as vif"))
      .unionAll(r.selectExpr("'price' as feature",
        "round((1D - r12 * r12) / det, 6) as vif"))
      .orderBy("feature")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_shap_linear" -> mlShapLinear,
    "q_ml_influence" -> mlInfluence,
    "q_ml_vif" -> mlVif)

  private val designSql: String =
    """des AS (SELECT o_orderkey,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y, x1, x2
      |  FROM orders JOIN (SELECT l_orderkey,
      |      CAST(COUNT(*) AS BIGINT) AS x1,
      |      CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
      |        AS x2
      |    FROM lineitem GROUP BY l_orderkey) li
      |  ON o_orderkey = l_orderkey)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_ml_shap_linear" ->
      s"""WITH $designSql,
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
        |    CAST(SUM(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
        |    CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
        |    CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
        |    CAST(SUM(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
        |    CAST(SUM(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
        |  FROM des),
        |c AS (SELECT n, s1, s2,
        |    CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
        |    CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
        |    CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
        |    CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
        |    CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y
        |  FROM m),
        |w AS (SELECT n, s1, s2,
        |    (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS w1,
        |    (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS w2
        |  FROM c),
        |dev AS (SELECT ANY_VALUE(n) AS n, ANY_VALUE(w1) AS w1,
        |    ANY_VALUE(w2) AS w2,
        |    CAST(SUM(abs(CAST(n AS HUGEINT) * x1 - s1)) AS HUGEINT)
        |      AS a1,
        |    CAST(SUM(abs(CAST(n AS HUGEINT) * x2 - s2)) AS HUGEINT)
        |      AS a2
        |  FROM des, w)
        |SELECT 'lines' AS feature, ROUND(w1, 6) AS weight,
        |  ROUND(abs(w1) * CAST(a1 AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * n), 6) AS mean_abs_shap FROM dev
        |UNION ALL
        |SELECT 'quantity', ROUND(w2, 6),
        |  ROUND(abs(w2) * CAST(a2 AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * n), 6) FROM dev
        |ORDER BY feature""".stripMargin,
    "q_ml_influence" ->
      s"""WITH $designSql,
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x2 AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        |  FROM des),
        |c AS (SELECT n, sx, sy,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS cyy
        |  FROM m),
        |f AS (SELECT n, sx, sy, cxx, cxy / cxx AS b,
        |    (cyy - cxy * cxy / cxx)
        |      / (CAST(n AS DOUBLE) * n * (n - 2)) AS s2
        |  FROM c),
        |rows_ AS (SELECT o_orderkey,
        |    y - (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |      / n - b * x2 AS e,
        |    1.0 / n + CAST(abs(CAST(n AS HUGEINT) * x2 - sx)
        |      AS DOUBLE) * CAST(abs(CAST(n AS HUGEINT) * x2 - sx)
        |      AS DOUBLE) / (CAST(n AS DOUBLE) * cxx) AS h,
        |    s2
        |  FROM des, f)
        |SELECT o_orderkey, ROUND(h, 6) AS leverage,
        |  ROUND(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
        |    AS cooks_d
        |FROM rows_
        |ORDER BY cooks_d DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_ml_vif" ->
      s"""WITH $designSql,
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
        |    CAST(SUM(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS s3,
        |    CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
        |    CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
        |    CAST(SUM(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s13,
        |    CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
        |    CAST(SUM(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s23,
        |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s33
        |  FROM des),
        |r AS (SELECT
        |    CAST(n * s12 - s1 * s2 AS DOUBLE)
        |      / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
        |      * CAST(n * s22 - s2 * s2 AS DOUBLE)) AS r12,
        |    CAST(n * s13 - s1 * s3 AS DOUBLE)
        |      / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
        |      * CAST(n * s33 - s3 * s3 AS DOUBLE)) AS r13,
        |    CAST(n * s23 - s2 * s3 AS DOUBLE)
        |      / sqrt(CAST(n * s22 - s2 * s2 AS DOUBLE)
        |      * CAST(n * s33 - s3 * s3 AS DOUBLE)) AS r23
        |  FROM m),
        |d AS (SELECT r12, r13, r23,
        |    1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13
        |      - r23 * r23 AS det
        |  FROM r)
        |SELECT 'lines' AS feature,
        |  ROUND((1.0 - r23 * r23) / det, 6) AS vif FROM d
        |UNION ALL
        |SELECT 'quantity', ROUND((1.0 - r13 * r13) / det, 6) FROM d
        |UNION ALL
        |SELECT 'price', ROUND((1.0 - r12 * r12) / det, 6) FROM d
        |ORDER BY feature""".stripMargin)
}
