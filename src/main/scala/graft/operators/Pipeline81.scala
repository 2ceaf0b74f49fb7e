package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.76 round-15 batch 49 — closed-form regularized/spectral
  * closers: exact RIDGE regression (the shrinkage path of
  * q_ml_linfit's OLS, closed-form so it oracle-checks — unlike
  * q_ml_linreg's iterative elastic-net wrapper) and exact 2×2 PCA
  * (eigenvalues + component slope of the covariance in closed form —
  * the oracle-checkable sibling of the no-oracle q_ml_pca wrapper).
  */
object Pipeline81 extends graft.QueryModule {

  /** EXACT RIDGE — per event type the daily-revenue trend refit with
    * L2 shrinkage at λ ∈ {0, 4, 16} (day² units, intercept
    * unpenalized): slope_λ = Sxy / (Sxx + λ·n) over centered exact
    * moments (n·Σxy − Σx·Σy in decimal(38,0); Sxx likewise;
    * λ·n·n² matches the scaling), intercept = ȳ − slope·x̄, and the
    * shrinkage ratio vs OLS — the regularization-path readout the
    * iterative q_ml_linreg can't grade exactly. λ = 0 reproduces
    * q_ml_linfit (spec-pinned).
    *
    * 100 TB: the daily agg is the only full pass; the 3-λ explode
    * runs on the ≤|types| moment frame. */
  def mlRidgeExact(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      .select(col("event_type"),
        expr("cast(datediff(d, date '1970-01-01') as bigint)").as("x"),
        col("y"))
    val m = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"))
    m.withColumn("lam", explode(expr("array(0L, 4L, 16L)")))
      .select(col("event_type"), col("lam"), col("n"),
        expr("(cast(n as decimal(38,0)) * sxy - cast(sx as" +
          " decimal(38,0)) * sy)").as("sxy_c"),
        expr("(cast(n as decimal(38,0)) * sxx - cast(sx as" +
          " decimal(38,0)) * sx)").as("sxx_c"),
        col("sx"), col("sy"))
      .select(col("event_type"), col("lam"), col("n"),
        expr("cast(sxy_c as double) / (cast(sxx_c as double)" +
          " + cast(lam as double) * n * n * n)").as("slope"),
        expr("cast(sxy_c as double) / cast(sxx_c as double)")
          .as("slope_ols"),
        col("sx"), col("sy"))
      .select(col("event_type"), col("lam"), col("n"),
        round(col("slope"), 6).as("slope"),
        round(expr("cast(sy as double) / n - slope *" +
          " (cast(sx as double) / n)"), 4).as("intercept"),
        round(col("slope") / col("slope_ols"), 6).as("shrinkage"))
      .orderBy("event_type", "lam")
  }

  /** EXACT 2×2 PCA of (line quantity, line price cents) — the
    * covariance eigensystem in closed form from exact integer
    * moments: λ± = tr/2 ± √((a−c)²/4 + b²), explained-variance
    * ratio λ₁/(λ₁+λ₂), and the principal-component SLOPE
    * (λ₁−a)/b (a ratio, not an angle — no atan2 cross-engine
    * hazard). The oracle-checkable sibling of the no-oracle
    * q_ml_pca library wrapper; the spec cross-checks the
    * eigen-identities (trace and determinant).
    *
    * 100 TB: one map-side moment agg; the eigen arithmetic is one
    * row. */
  def mlPca2Exact(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.lineitem(s, dir)
      .select(expr("cast(l_quantity as bigint)").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"))
    m
      .select(col("n"),
        expr("(cast(n as decimal(38,0)) * sxx - cast(sx as" +
          " decimal(38,0)) * sx)").as("vxx"),
        expr("(cast(n as decimal(38,0)) * syy - cast(sy as" +
          " decimal(38,0)) * sy)").as("vyy"),
        expr("(cast(n as decimal(38,0)) * sxy - cast(sx as" +
          " decimal(38,0)) * sy)").as("vxy"))
      .select(col("n"),
        expr("cast(vxx as double) / (cast(n as double) * (n - 1))")
          .as("a"),
        expr("cast(vyy as double) / (cast(n as double) * (n - 1))")
          .as("c"),
        expr("cast(vxy as double) / (cast(n as double) * (n - 1))")
          .as("b"))
      .select(col("n"), col("a"), col("c"), col("b"),
        expr("sqrt((a - c) * (a - c) / 4D + b * b)").as("disc"))
      .select(col("n"),
        round(expr("(a + c) / 2D + disc"), 6).as("lambda1"),
        round(expr("(a + c) / 2D - disc"), 6).as("lambda2"),
        round(expr("((a + c) / 2D + disc) / (a + c)"), 6)
          .as("explained_ratio"),
        round(expr("(((a + c) / 2D + disc) - a) / b"), 6)
          .as("pc1_slope"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_ridge_exact" -> mlRidgeExact,
    "q_ml_pca2_exact" -> mlPca2Exact)

  def oracleSql: Map[String, String] = Map(
    "q_ml_ridge_exact" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1, 2),
        |pts AS (SELECT event_type,
        |    CAST(d - DATE '1970-01-01' AS BIGINT) AS x, y FROM daily),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM pts GROUP BY event_type),
        |lams AS (SELECT event_type, n, sx, sy, sxx, sxy,
        |    unnest([0, 4, 16]) AS lam FROM m),
        |c AS (SELECT event_type, lam, n,
        |    CAST(CAST(n AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS sxy_c,
        |    CAST(CAST(n AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS sxx_c,
        |    sx, sy
        |  FROM lams),
        |r AS (SELECT event_type, lam, n,
        |    sxy_c / (sxx_c + CAST(lam AS DOUBLE) * n * n * n)
        |      AS slope,
        |    sxy_c / sxx_c AS slope_ols, sx, sy
        |  FROM c)
        |SELECT event_type, CAST(lam AS BIGINT) AS lam, n,
        |  ROUND(slope, 6) AS slope,
        |  ROUND(CAST(sy AS DOUBLE) / n
        |    - slope * (CAST(sx AS DOUBLE) / n), 4) AS intercept,
        |  ROUND(slope / slope_ols, 6) AS shrinkage
        |FROM r ORDER BY event_type, lam""".stripMargin,
    "q_ml_pca2_exact" ->
      """WITH pts AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM pts),
        |cv AS (SELECT n,
        |    CAST(CAST(n AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (n - 1)) AS a,
        |    CAST(CAST(n AS HUGEINT) * syy
        |      - CAST(sy AS HUGEINT) * sy AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (n - 1)) AS c,
        |    CAST(CAST(n AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (n - 1)) AS b
        |  FROM m),
        |e AS (SELECT n, a, c, b,
        |    sqrt((a - c) * (a - c) / 4.0 + b * b) AS disc FROM cv)
        |SELECT n, ROUND((a + c) / 2.0 + disc, 6) AS lambda1,
        |  ROUND((a + c) / 2.0 - disc, 6) AS lambda2,
        |  ROUND(((a + c) / 2.0 + disc) / (a + c), 6)
        |    AS explained_ratio,
        |  ROUND((((a + c) / 2.0 + disc) - a) / b, 6) AS pc1_slope
        |FROM e""".stripMargin)
}
