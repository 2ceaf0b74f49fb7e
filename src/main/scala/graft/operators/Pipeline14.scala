package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.27 round-9 batch 4 — concentration, risk and survival analytics
  * plus the isotonic-calibration ML wrapper: Herfindahl market
  * concentration, max drawdown of the revenue series, a Kaplan–Meier
  * hazard table over user lifetimes (all exact-oracle), and MLlib
  * IsotonicRegression calibrating the int8 embedding score
  * (spec-bounded like the other seeded/approx ML wrappers).
  */
object Pipeline14 extends graft.QueryModule {

  /** HERFINDAHL–HIRSCHMAN market concentration of supplier revenue per
    * nation — "is this market monopolized": HHI = Σ(share²) emitted in
    * ppm as the exact rational Σx²·10⁶/(Σx)², plus the top supplier's
    * share. Every product forms in decimal(38,0)/HUGEINT (per-supplier
    * cents ≈ 1e13 at 100 TB → Σx² ≈ 1e32; (Σx)² ≈ 1e38 is the
    * documented headroom edge — shard by sub-market past that).
    *
    * 100 TB: the per-supplier roll-up shuffles on suppkey, the
    * supplier-dim join is co-keyed, nation is a broadcast dim; the
    * moment agg carries three numbers per nation. */
  def aggHhi(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_suppkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("x"))
      .join(Tables.supplier(s, dir).select(col("s_suppkey"),
        col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("nation")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(expr("cast(x as decimal(38,0))")).as("sx"),
        sum(expr("cast(x as decimal(19,0)) * x")).as("sxx"),
        max("x").as("mx"))
      .select(col("nation"), col("n_suppliers"),
        expr("cast(sxx * 1000000 div (sx * sx) as bigint)").as("hhi_ppm"),
        expr("cast(cast(mx as decimal(38,0)) * 1000000 div sx as bigint)")
          .as("top_share_ppm"))
      .orderBy("nation")

  /** MAX DRAWDOWN of the daily revenue series per event type — the
    * risk readout of any cumulative series: running peak minus current
    * value, maximized, with the (earliest) trough day. The full-data
    * pass is ONE daily cents agg; the running peak is a window over
    * the checkpointed support-sized (type × day) frame, and the argmax
    * resolves by broadcast-joining the 1-row-per-type max back — the
    * q_ml_ks_test argmax pattern.
    *
    * 100 TB: support-frame windows partitioned by type; nothing
    * row-scale ever sorts. */
  def winDrawdown(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the daily frame feeds the window AND the argmax
    // join; without it both replay the full-data agg
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("v"))
      .localCheckpoint()
    val w = Window.partitionBy("event_type").orderBy(col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = daily.withColumn("peak", max("v").over(w))
      .withColumn("dd", col("peak") - col("v"))
    val mx = dd.groupBy("event_type").agg(max("dd").as("max_dd_cents"))
      .withColumnRenamed("event_type", "et2") // self-join disambiguation
    dd.join(broadcast(mx), col("event_type") === col("et2") &&
        col("dd") === col("max_dd_cents"))
      .groupBy("event_type", "max_dd_cents")
      .agg(min("d").as("trough_day"))
      .select("event_type", "max_dd_cents", "trough_day")
      .orderBy("event_type")
  }

  /** KAPLAN–MEIER hazard table over user LIFETIMES (first → last event
    * day): for each observed duration d, the users ending exactly at d,
    * the at-risk set (duration ≥ d) and the discrete hazard in ppm —
    * the survival-analysis primitive behind churn curves. The duration
    * domain is DOMAIN-bounded (≤ observation window in days), so
    * at-risk comes from a theta self-join over the broadcast
    * support frame — deliberately no descending global cumsum.
    *
    * 100 TB: one per-user hash agg is the only full-data pass;
    * everything after is ≤|days|-row arithmetic. */
  def eventsHazard(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(expr("cast(datediff(max(to_date(ts)), min(to_date(ts)))" +
        " as bigint)").as("dur"))
      .groupBy("dur").agg(count(lit(1)).as("n_ending"))
    cnt.join(broadcast(cnt.select(col("dur").as("d2"),
        col("n_ending").as("n2"))), col("d2") >= col("dur"))
      .groupBy(col("dur").as("duration_days"), col("n_ending"))
      .agg(sum("n2").as("at_risk"))
      .select(col("duration_days"), col("n_ending"), col("at_risk"),
        expr("n_ending * 1000000L div at_risk").as("hazard_ppm"))
      .orderBy("duration_days")
  }

  /** ISOTONIC calibration of the int8 embedding score against the
    * binary label — the monotone-regression ML wrapper
    * (spark.ml.regression.IsotonicRegression, parallel PAVA): fits
    * P(label ≥ 5 | score) as a non-decreasing step function and emits
    * it at every distinct observed score. NO oracle (MLlib internals
    * own the pool merging); Pipeline14Spec bounds monotonicity, the
    * [0,1] range, mass conservation (Σpred = Σy is the PAVA
    * invariant) and run-to-run determinism.
    *
    * 100 TB: PAVA state is per-partition pools merged on the driver —
    * bounded by distinct scores (≤16k by the score DOMAIN bound), not
    * rows; only transform touches every row. */
  def mlIsotonic(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.regression.IsotonicRegression
    val sc = Pipeline12.scored(s, dir)
      .select(col("score"), col("score").cast("double").as("x"),
        when(col("pos"), 1.0d).otherwise(0.0d).as("y"))
    val model = new IsotonicRegression()
      .setFeaturesCol("x").setLabelCol("y").fit(sc)
    model.transform(sc.select("score", "x").distinct())
      .select(col("score"), round(col("prediction"), 6).as("iso_pred"))
      .orderBy("score")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_hhi" -> aggHhi,
    "q_win_drawdown" -> winDrawdown,
    "q_events_hazard" -> eventsHazard,
    "q_ml_isotonic" -> mlIsotonic)

  def oracleSql: Map[String, String] = Map(
    "q_agg_hhi" ->
      """WITH sup AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM lineitem GROUP BY l_suppkey),
        |j AS (
        |  SELECT n_name AS nation, x
        |  FROM sup JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |m AS (
        |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |    SUM(CAST(x AS HUGEINT)) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    MAX(x) AS mx
        |  FROM j GROUP BY nation)
        |SELECT nation, n_suppliers,
        |  CAST(sxx * 1000000 // (sx * sx) AS BIGINT) AS hhi_ppm,
        |  CAST(CAST(mx AS HUGEINT) * 1000000 // sx AS BIGINT)
        |    AS top_share_ppm
        |FROM m ORDER BY nation""".stripMargin,
    "q_win_drawdown" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |dd AS (
        |  SELECT event_type, d, v,
        |    MAX(v) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v AS dd
        |  FROM daily),
        |mx AS (SELECT event_type, MAX(dd) AS max_dd_cents
        |       FROM dd GROUP BY event_type)
        |SELECT dd.event_type AS event_type, mx.max_dd_cents,
        |  MIN(dd.d) AS trough_day
        |FROM dd JOIN mx ON dd.event_type = mx.event_type
        |  AND dd.dd = mx.max_dd_cents
        |GROUP BY dd.event_type, mx.max_dd_cents
        |ORDER BY dd.event_type""".stripMargin,
    "q_events_hazard" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) AS BIGINT)
        |      AS dur
        |  FROM events GROUP BY user_id),
        |cnt AS (SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_ending
        |        FROM per GROUP BY dur)
        |SELECT a.dur AS duration_days, a.n_ending,
        |  CAST(SUM(b.n_ending) AS BIGINT) AS at_risk,
        |  CAST(a.n_ending * 1000000 // SUM(b.n_ending) AS BIGINT)
        |    AS hazard_ppm
        |FROM cnt a JOIN cnt b ON b.dur >= a.dur
        |GROUP BY a.dur, a.n_ending ORDER BY duration_days""".stripMargin)
}
