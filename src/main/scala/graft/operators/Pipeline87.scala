package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.82 round-16 batch 55 — outlier-test, rater-agreement,
  * experimentation and intermittent-demand closers: the Grubbs
  * statistic on exact integer moments, quadratic/linear weighted
  * Cohen's kappa (exact integer double-sums), uplift by activity
  * band under a deterministic assignment, and Croston's method on
  * the fixed-point α=1/2 EWMA discipline.
  */
object Pipeline87 extends graft.QueryModule {

  /** GRUBBS STATISTIC per event type — G = max|x−x̄|/s entirely from
    * exact integer cent moments: the argmax deviation is the exact
    * integer |n·c − Σc| (ties to the smaller event_id), and
    * G = (maxdev/n)/√(var) with var from the decimal (Σc, Σc²)
    * moments — a fixed double dag, no row-ordered float fold.
    *
    * 100 TB: one moment agg per type + one argmax re-scan join; both
    * map-side partial. */
  def mlGrubbs(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("c"))
    val m = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("sc"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("qc"))
    val dev = ev.join(broadcast(m), "event_type")
      .select(col("event_type"), col("event_id"), col("n"), col("sc"),
        col("qc"), abs(col("n") * col("c") - col("sc")).as("ndev"))
    // argmax via max-agg + achiever re-filter, NOT a per-type window:
    // a window here sorts every row of the type on one reducer — the
    // two-agg shape is map-side partial end to end
    val mx = dev.groupBy("event_type").agg(max("ndev").as("maxdev"))
    dev.join(broadcast(mx), "event_type")
      .where(col("ndev") === col("maxdev"))
      .groupBy("event_type", "n", "sc", "qc", "ndev")
      .agg(min("event_id").as("outlier_event"))
      .select(col("event_type"), col("n"),
        col("outlier_event"),
        round(expr(
          "(cast(ndev as double) / n) / " +
            "sqrt(cast(cast(n as decimal(38,0)) * qc - " +
            "cast(sc as decimal(38,0)) * sc as double) / " +
            "(cast(n as double) * (n - 1)))"), 6).as("g"))
      .orderBy("event_type")
  }

  /** WEIGHTED COHEN'S KAPPA — agreement between the order priority
    * rank (1..5 from the label prefix) and a fixed price band
    * (1..5), quadratic AND linear disagreement weights:
    * κ_w = 1 − n·Σw_ij·n_ij / Σw_ij·a_i·b_j. Every sum is an exact
    * integer over the ≤25-cell contingency — fully deterministic.
    *
    * 100 TB: one hash agg to the contingency; marginal products are
    * a bounded pair frame. */
  def mlWeightedKappa(s: SparkSession, dir: String): DataFrame = {
    val rated = Tables.orders(s, dir)
      .select(expr("cast(substring(o_orderpriority, 1, 1) as bigint)")
        .as("ra"),
        expr("least(4L, cast(round(o_totalprice * 100) as bigint)" +
          " div 5000000) + 1").as("rb"))
    val cells = rated.groupBy("ra", "rb").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val obs = cells.agg(sum("c").as("n"),
      sum(expr("(ra - rb) * (ra - rb) * c")).as("oq"),
      sum(expr("abs(ra - rb) * c")).as("ol"))
    val ai = cells.groupBy("ra").agg(sum("c").as("a"))
    val bj = cells.groupBy("rb").agg(sum("c").as("b"))
    val exp_ = ai.crossJoin(bj)
      .agg(sum(expr("(ra - rb) * (ra - rb) * a * b")).as("eq"),
        sum(expr("abs(ra - rb) * a * b")).as("el"))
    obs.crossJoin(exp_)
      .select(col("n"),
        round(expr("1D - cast(n as double) * oq / eq"), 6)
          .as("kappa_quadratic"),
        round(expr("1D - cast(n as double) * ol / el"), 6)
          .as("kappa_linear"))
  }

  /** UPLIFT BY ACTIVITY BAND — the experimentation readout: users
    * split by a DETERMINISTIC assignment (user_id parity — the
    * hash-split family), outcome = converted (any purchase), banded
    * by total activity; per band: arm sizes, conversions, and the
    * uplift in ppm (two exact integer divs — no float rate math).
    *
    * 100 TB: one per-user agg (the only shuffle), then a partial agg
    * onto the ≤5-band domain. */
  def eventsUplift(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      .select(expr("least(4L, greatest(0L, (n_events - 40) div 10))")
        .as("band"),
        expr("user_id % 2").as("treat"), col("converted"))
      .groupBy("band")
      .agg(sum(when(col("treat") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("treat") === 0, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("treat") === 1, col("converted")).otherwise(0L))
          .as("conv_treat"),
        sum(when(col("treat") === 0, col("converted")).otherwise(0L))
          .as("conv_ctrl"))
      .select(col("band"), col("n_treat"), col("n_ctrl"),
        col("conv_treat"), col("conv_ctrl"),
        expr("case when n_treat = 0 or n_ctrl = 0 then null" +
          " else (1000000 * conv_treat) div n_treat" +
          " - (1000000 * conv_ctrl) div n_ctrl end").as("uplift_ppm"))
      .orderBy("band")

  /** CROSTON'S METHOD per event type — the intermittent-demand
    * forecast: α=1/2 EWMA of the nonzero daily demand sizes (cents)
    * and of the inter-demand intervals (days), both as EXACT
    * power-of-2 weighted integer sums (the q_time_ewma fixed-point
    * discipline: z_k·2^(k−1) = d_1 + Σ_{i≥2} d_i·2^(i−2), an
    * int64 — identical on any engine), forecast = size/interval
    * with the common power cancelling to an exact integer ratio.
    * Demands are indexed by a per-type window over ≤‖calendar‖ rows.
    * PRECONDITION (the q_time_ewma int64 envelope): demand cents ·
    * 2^(k−2) must stay under 2^63 — at ~1e8 cents/day that bounds
    * the demand count k at ~35; a longer horizon truncates to the
    * trailing window first (α=1/2 weights below 2^-35 are zero at
    * output precision anyway).
    *
    * 100 TB: one daily agg is the full pass; everything after runs
    * on the calendar-bounded demand frame. */
  def timeCroston(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val demands = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("d"))
      .where(col("d") > 0)
      .withColumn("i", row_number().over(w))
      .withColumn("gap", expr(
        "cast(datediff(day, lag(day, 1) over " +
          "(partition by event_type order by day)) as bigint)"))
    demands.groupBy("event_type")
      .agg(count(lit(1)).as("k"),
        sum(expr("case when i = 1 then d else d * shiftleft(1L, i - 2) end"))
          .as("nz"),
        sum(expr("case when i = 2 then gap" +
          " when i > 2 then gap * shiftleft(1L, i - 3) else 0L end"))
          .as("np"))
      .where(col("k") >= 2)
      .select(col("event_type"), col("k"),
        round(expr("cast(nz as double) / shiftleft(1L, cast(k as int) - 1)" +
          " / 100D"), 6).as("z_size"),
        round(expr("cast(np as double) / shiftleft(1L, cast(k as int) - 2)"),
          6).as("p_interval"),
        round(expr("cast(nz as double) / (2D * np) / 100D"), 6)
          .as("croston_forecast"))
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_grubbs" -> mlGrubbs,
    "q_ml_weighted_kappa" -> mlWeightedKappa,
    "q_events_uplift" -> eventsUplift,
    "q_time_croston" -> timeCroston)

  def oracleSql: Map[String, String] = Map(
    "q_ml_grubbs" ->
      """WITH ev AS (SELECT event_type, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS sc,
        |    SUM(CAST(c AS HUGEINT) * c) AS qc
        |  FROM ev GROUP BY event_type),
        |dev AS (SELECT ev.event_type, ev.event_id, m.n, m.sc, m.qc,
        |    abs(m.n * ev.c - m.sc) AS ndev,
        |    row_number() OVER (PARTITION BY ev.event_type
        |      ORDER BY abs(m.n * ev.c - m.sc) DESC, ev.event_id ASC)
        |      AS rn
        |  FROM ev JOIN m ON m.event_type = ev.event_type)
        |SELECT event_type, n, CAST(event_id AS BIGINT) AS outlier_event,
        |  ROUND((CAST(ndev AS DOUBLE) / n) /
        |    sqrt(CAST(CAST(n AS HUGEINT) * qc
        |      - CAST(sc AS HUGEINT) * sc AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (n - 1))), 6) AS g
        |FROM dev WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_ml_weighted_kappa" ->
      """WITH rated AS (SELECT
        |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS ra,
        |    least(4, CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |      // 5000000) + 1 AS rb
        |  FROM orders),
        |cells AS MATERIALIZED (SELECT ra, rb,
        |    CAST(COUNT(*) AS BIGINT) AS c FROM rated GROUP BY 1, 2),
        |obs AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM((ra - rb) * (ra - rb) * c) AS BIGINT) AS oq,
        |    CAST(SUM(abs(ra - rb) * c) AS BIGINT) AS ol FROM cells),
        |ai AS (SELECT ra, CAST(SUM(c) AS BIGINT) AS a
        |  FROM cells GROUP BY ra),
        |bj AS (SELECT rb, CAST(SUM(c) AS BIGINT) AS b
        |  FROM cells GROUP BY rb),
        |ex AS (SELECT
        |    CAST(SUM((ra - rb) * (ra - rb) * a * b) AS BIGINT) AS eq,
        |    CAST(SUM(abs(ra - rb) * a * b) AS BIGINT) AS el
        |  FROM ai CROSS JOIN bj)
        |SELECT n,
        |  ROUND(1.0 - CAST(n AS DOUBLE) * oq / eq, 6)
        |    AS kappa_quadratic,
        |  ROUND(1.0 - CAST(n AS DOUBLE) * ol / el, 6) AS kappa_linear
        |FROM obs, ex""".stripMargin,
    "q_events_uplift" ->
      """WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS converted
        |  FROM events GROUP BY user_id),
        |banded AS (SELECT least(4, greatest(0, (n_events - 40) // 10))
        |    AS band,
        |    user_id % 2 AS treat, converted FROM u)
        |SELECT band,
        |  CAST(SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_treat,
        |  CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ctrl,
        |  CAST(SUM(CASE WHEN treat = 1 THEN converted ELSE 0 END)
        |    AS BIGINT) AS conv_treat,
        |  CAST(SUM(CASE WHEN treat = 0 THEN converted ELSE 0 END)
        |    AS BIGINT) AS conv_ctrl,
        |  CAST(CASE WHEN SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) = 0
        |      OR SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) = 0
        |    THEN NULL
        |    ELSE (1000000 * SUM(CASE WHEN treat = 1 THEN converted
        |      ELSE 0 END)) // SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END)
        |    - (1000000 * SUM(CASE WHEN treat = 0 THEN converted
        |      ELSE 0 END)) // SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END)
        |    END AS BIGINT) AS uplift_ppm
        |FROM banded GROUP BY band ORDER BY band""".stripMargin,
    "q_time_croston" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS d
        |  FROM events GROUP BY 1, 2),
        |dem AS (SELECT event_type, day, d,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY day) AS BIGINT) AS i,
        |    CAST(day - lag(day, 1) OVER (PARTITION BY event_type
        |      ORDER BY day) AS BIGINT) AS gap
        |  FROM daily WHERE d > 0),
        |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(CASE WHEN i = 1 THEN d
        |      ELSE d * (CAST(1 AS BIGINT) << CAST(i - 2 AS INTEGER))
        |      END) AS BIGINT) AS nz,
        |    CAST(SUM(CASE WHEN i = 2 THEN gap WHEN i > 2 THEN
        |      gap * (CAST(1 AS BIGINT) << CAST(i - 3 AS INTEGER))
        |      ELSE 0 END) AS BIGINT) AS np
        |  FROM dem GROUP BY event_type)
        |SELECT event_type, k,
        |  ROUND(CAST(nz AS DOUBLE)
        |    / (CAST(1 AS BIGINT) << CAST(k - 1 AS INTEGER)) / 100.0, 6)
        |    AS z_size,
        |  ROUND(CAST(np AS DOUBLE)
        |    / (CAST(1 AS BIGINT) << CAST(k - 2 AS INTEGER)), 6)
        |    AS p_interval,
        |  ROUND(CAST(nz AS DOUBLE) / (2.0 * np) / 100.0, 6)
        |    AS croston_forecast
        |FROM agg WHERE k >= 2 ORDER BY event_type""".stripMargin)
}
