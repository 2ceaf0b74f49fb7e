package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64i round-14 batch 27 — partial autocorrelation (the
  * lag-k-given-shorter-lags twin of q_events_autocorr's raw ACF), the
  * grid-bucketed SPATIAL JOIN (2D containment rewritten from theta to
  * equi via binning — the join-family scale pattern), and the
  * higher-order-function surface over embedding arrays.
  */
object Pipeline59 extends graft.QueryModule {

  /** PARTIAL AUTOCORRELATION (lags 1-3) of the daily mean value per
    * event type, via Durbin-Levinson from the exact-moment ACF:
    * centered values c_t = n·v_t − S are EXACT integers, r_k =
    * Σc_t·c_{t−k} / Σc_t² with products in decimal(38,0), then
    * φ11 = r1, φ22 = (r2−r1²)/(1−r1²), φ33 from the order-2 solve —
    * "is the lag-k link real or inherited from shorter lags", the
    * question q_events_autocorr's raw ACF can't answer.
    *
    * 100 TB: the daily agg is the only full pass; lags are windows
    * PARTITIONED BY event_type over the calendar-bounded frame. */
  def timePacf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .select(col("event_type").as("t"), to_date(col("ts")).as("d"),
        expr("cast(round(value * 100) as bigint)").as("x"))
      .groupBy("t", "d")
      .agg(count(lit(1)).as("c"), sum("x").as("sv"))
      .select(col("t"), col("d"), expr("(sv * 1000000) div c").as("v"))
    val stats = daily.groupBy("t")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val cent = daily.join(stats, "t")
      .select(col("t"), col("d"),
        expr("cast(n * v - sv as decimal(38,0))").as("cv"))
    val w = Window.partitionBy("t").orderBy("d")
    val acf = cent
      .select(col("t"), col("cv"),
        lag("cv", 1).over(w).as("l1"),
        lag("cv", 2).over(w).as("l2"),
        lag("cv", 3).over(w).as("l3"))
      .groupBy("t")
      .agg(sum(expr("cv * cv")).as("c0"),
        sum(expr("cv * l1")).as("c1"),
        sum(expr("cv * l2")).as("c2"),
        sum(expr("cv * l3")).as("c3"))
      .selectExpr("t",
        "cast(c1 as double) / cast(c0 as double) as r1",
        "cast(c2 as double) / cast(c0 as double) as r2",
        "cast(c3 as double) / cast(c0 as double) as r3")
    acf
      .selectExpr("t", "r1", "r2", "r3",
        "(r2 - r1 * r1) / (1D - r1 * r1) as p22")
      .selectExpr("t", "r1", "r2", "r3", "p22",
        "r1 * (1D - p22) as p21")
      .selectExpr("t as event_type",
        "round(r1, 6) as acf1", "round(r2, 6) as acf2",
        "round(r3, 6) as acf3",
        "round(r1, 6) as pacf1",
        "round(p22, 6) as pacf2",
        "round((r3 - p21 * r2 - p22 * r1)" +
          " / (1D - p21 * r1 - p22 * r2), 6) as pacf3")
      .orderBy("event_type")
  }

  /** GRID-BUCKETED SPATIAL JOIN: points (value cents, hashed event
    * spread) against 25 deterministic query rectangles — the 2D
    * containment theta join REWRITTEN as an equi-join on grid cells
    * (cell 5000x5000; each box explodes to its <=2x2 covering cells,
    * each point joins on ITS one cell, so a matching pair meets in
    * exactly one cell — no post-join dedup) + a residual exact
    * containment filter. The binning pattern that turns any
    * range/box/interval join broadcast- or shuffle-equi at 100 TB
    * (the 1D version is q_join_range_bucketed; this is its 2D
    * member).
    *
    * 100 TB: the point side shuffles once on its grid cell (or
    * broadcasts the exploded 25-box cell list, as here); no
    * BNLJ, no cross product. */
  def joinSpatialGrid(s: SparkSession, dir: String): DataFrame = {
    val points = Tables.events(s, dir)
      .select(col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("px"),
        expr("(event_id * 2654435761) % 50000").as("py"))
      .select(col("event_id"), col("px"), col("py"),
        expr("px div 5000").as("cx"), expr("py div 5000").as("cy"))
    val boxes = Tables.nation(s, dir)
      .selectExpr("cast(n_nationkey as bigint) as box_id",
        "cast((n_nationkey * 7919) % 45000 as bigint) as xmin",
        "cast((n_nationkey * 104729) % 45000 as bigint) as ymin")
      .selectExpr("box_id", "xmin", "xmin + 3000 as xmax",
        "ymin", "ymin + 4000 as ymax")
    val boxCells = boxes
      .select(col("box_id"), col("xmin"), col("xmax"), col("ymin"),
        col("ymax"),
        explode(expr("sequence(xmin div 5000, xmax div 5000)"))
          .as("cx"))
      .select(col("box_id"), col("xmin"), col("xmax"), col("ymin"),
        col("ymax"), col("cx"),
        explode(expr("sequence(ymin div 5000, ymax div 5000)"))
          .as("cy"))
    points.join(broadcast(boxCells), Seq("cx", "cy"))
      .where(col("px") >= col("xmin") && col("px") <= col("xmax") &&
        col("py") >= col("ymin") && col("py") <= col("ymax"))
      .groupBy("box_id")
      .agg(count(lit(1)).as("n_points"), sum("px").as("sum_x"))
      .orderBy("box_id")
  }

  /** HIGHER-ORDER-FUNCTION surface over the embedding arrays: per
    * vector, the positive-component count (filter + size), the L2
    * norm (left-fold aggregate of squares), and the component mean
    * (left-fold sum / size) — the transform/filter/aggregate lambda
    * trio as first-class citizens, folding IN ARRAY ORDER on both
    * engines so the float->double sums are bit-identical.
    *
    * 100 TB: pure per-row projection — no shuffle at all before the
    * output sort. */
  def fnLambda(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir)
      .selectExpr("vec_id",
        "size(filter(embedding, x -> x > 0F)) as n_pos",
        "round(sqrt(aggregate(embedding, 0D," +
          " (a, x) -> a + cast(x as double) * cast(x as double))), 6)" +
          " as l2_norm",
        "round(aggregate(embedding, 0D," +
          " (a, x) -> a + cast(x as double)) / size(embedding), 6)" +
          " as mean_comp")
      .selectExpr("vec_id", "cast(n_pos as bigint) as n_pos",
        "l2_norm", "mean_comp")
      .orderBy("vec_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_pacf" -> timePacf,
    "q_join_spatial_grid" -> joinSpatialGrid,
    "q_fn_lambda" -> fnLambda)

  def oracleSql: Map[String, String] = Map(
    "q_time_pacf" ->
      """WITH rows_ AS (SELECT event_type AS t, CAST(ts AS DATE) AS d,
        |    CAST(ROUND(value * 100) AS BIGINT) AS x FROM events),
        |daily AS (SELECT t, d,
        |    (CAST(SUM(x) AS BIGINT) * 1000000)
        |      // CAST(COUNT(*) AS BIGINT) AS v
        |  FROM rows_ GROUP BY t, d),
        |st AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS sv FROM daily GROUP BY t),
        |cent AS (SELECT daily.t, d,
        |    CAST(n * v - sv AS HUGEINT) AS cv
        |  FROM daily JOIN st ON daily.t = st.t),
        |lagd AS (SELECT t, cv,
        |    lag(cv, 1) OVER w AS l1, lag(cv, 2) OVER w AS l2,
        |    lag(cv, 3) OVER w AS l3
        |  FROM cent WINDOW w AS (PARTITION BY t ORDER BY d)),
        |acf AS (SELECT t,
        |    CAST(SUM(cv * l1) AS DOUBLE)
        |      / CAST(SUM(cv * cv) AS DOUBLE) AS r1,
        |    CAST(SUM(cv * l2) AS DOUBLE)
        |      / CAST(SUM(cv * cv) AS DOUBLE) AS r2,
        |    CAST(SUM(cv * l3) AS DOUBLE)
        |      / CAST(SUM(cv * cv) AS DOUBLE) AS r3
        |  FROM lagd GROUP BY t),
        |p2 AS (SELECT t, r1, r2, r3,
        |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22 FROM acf),
        |p3 AS (SELECT t, r1, r2, r3, p22,
        |    r1 * (1.0 - p22) AS p21 FROM p2)
        |SELECT t AS event_type, ROUND(r1, 6) AS acf1,
        |  ROUND(r2, 6) AS acf2, ROUND(r3, 6) AS acf3,
        |  ROUND(r1, 6) AS pacf1, ROUND(p22, 6) AS pacf2,
        |  ROUND((r3 - p21 * r2 - p22 * r1)
        |    / (1.0 - p21 * r1 - p22 * r2), 6) AS pacf3
        |FROM p3 ORDER BY event_type""".stripMargin,
    "q_join_spatial_grid" ->
      """WITH points AS (SELECT event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS px,
        |    (event_id * 2654435761) % 50000 AS py FROM events),
        |boxes AS (SELECT CAST(n_nationkey AS BIGINT) AS box_id,
        |    CAST((n_nationkey * 7919) % 45000 AS BIGINT) AS xmin,
        |    CAST((n_nationkey * 7919) % 45000 + 3000 AS BIGINT)
        |      AS xmax,
        |    CAST((n_nationkey * 104729) % 45000 AS BIGINT) AS ymin,
        |    CAST((n_nationkey * 104729) % 45000 + 4000 AS BIGINT)
        |      AS ymax
        |  FROM nation)
        |SELECT box_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(px) AS BIGINT) AS sum_x
        |FROM points JOIN boxes
        |  ON px >= xmin AND px <= xmax AND py >= ymin AND py <= ymax
        |GROUP BY box_id ORDER BY box_id""".stripMargin,
    "q_fn_lambda" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)
        |    AS n_pos,
        |  ROUND(sqrt(list_reduce(
        |    list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |    (a, b) -> a + b)), 6) AS l2_norm,
        |  ROUND(list_reduce(
        |    list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |    (a, b) -> a + b) / len(embedding), 6) AS mean_comp
        |FROM embeddings ORDER BY vec_id""".stripMargin)
}
