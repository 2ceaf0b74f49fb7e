package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.56 round-14 batch 11 — time-series + window-surface closers:
  * the DFT power spectrum (the frequency-domain seasonality readout
  * beside q_events_seasonality's weekday buckets and
  * q_time_decompose's moving averages), moving-average crossover
  * signals (the trend-change detector beside q_events_changepoint's
  * CUSUM), and ratio-to-report window shares (the share-of-total /
  * running-share form the §2 window family lacked).
  */
object Pipeline43 extends graft.QueryModule {

  /** DFT POWER SPECTRUM (k = 1..4) of the per-type daily-revenue
    * series — a_k = Σ y_t·cos(2πkt/N), b_k = Σ y_t·sin(2πkt/N),
    * with the trig factors quantized to EXACT micro units per
    * (t, k) so the spectral sums are order-free integer
    * decimal(38,0) sums (the one cross-engine trig render per cell
    * is grid-quantized — the q_graph_pagerank integer-mass
    * discipline applied to Fourier); amplitude = √(a²+b²)/N renders
    * once. The "is there a weekly line" spectral check.
    *
    * 100 TB: the daily agg is the only full pass; the spectrum runs
    * on the (days × 4) support frame. */
  def timeFourier(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
    val idx = daily
      .withColumn("t",
        expr("cast(datediff(d, date '1970-01-01') as bigint)") -
          min(expr("cast(datediff(d, date '1970-01-01') as bigint)"))
            .over(Window.partitionBy("event_type")))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("event_type")))
    idx.withColumn("k", explode(expr("sequence(1L, 4L)")))
      .select(col("event_type"), col("k"), col("n"), col("y"),
        expr("cast(round(cos(2 * pi() * k * t / n) * 1000000)" +
          " as bigint)").as("c"),
        expr("cast(round(sin(2 * pi() * k * t / n) * 1000000)" +
          " as bigint)").as("sn"))
      .groupBy("event_type", "k")
      .agg(max("n").as("n_days"),
        sum(expr("cast(y as decimal(38,0)) * c")).as("a"),
        sum(expr("cast(y as decimal(38,0)) * sn")).as("b"))
      .selectExpr("event_type", "k", "n_days",
        "round(cast(a as double) / 1000000, 2) as a_cents",
        "round(cast(b as double) / 1000000, 2) as b_cents",
        "round(sqrt(cast(a as double) * a + cast(b as double) * b)" +
          " / n_days / 1000000, 4) as amplitude_cents")
      .orderBy("event_type", "k")
  }

  /** MOVING-AVERAGE CROSSOVER SIGNALS — 7-day vs 28-day trailing
    * means of the per-type daily revenue, compared in EXACT integers
    * (s7/7 > s28/28 ⟺ 4·s7 > s28 on full windows — no float means
    * anywhere), golden/death crosses counted where the signal flips.
    * The trend-change readout beside q_events_changepoint's CUSUM
    * (level shift) and q_time_holt's smoother (forecast).
    *
    * 100 TB: daily agg full pass; ROWS windows partition by type on
    * the days-sized support frame. */
  def timeSmaCrossover(s: SparkSession, dir: String): DataFrame = {
    val byT = Window.partitionBy("event_type").orderBy("d")
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      .withColumn("idx", row_number().over(byT))
      .withColumn("s7", sum("y").over(byT.rowsBetween(-6, 0)))
      .withColumn("s28", sum("y").over(byT.rowsBetween(-27, 0)))
      .where(col("idx") >= 28)
      .withColumn("sig", col("s7") * 4 > col("s28"))
      .withColumn("prev", lag(col("sig"), 1).over(byT))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_obs"),
        sum(expr("if(sig and prev = false, 1L, 0L)")).as("golden"),
        sum(expr("if(not sig and prev = true, 1L, 0L)")).as("death"),
        sum(expr("if(sig, 1L, 0L)")).as("days_above"))
      .orderBy("event_type")
  }

  /** RATIO-TO-REPORT WINDOW SHARES — per market segment: each
    * customer's open-order revenue share (ppm, exact integer
    * division), the running cumulative share walking customers
    * largest-first, and the dense revenue rank. The share-of-total /
    * "top N customers cover X%" window form (partition-total
    * aggregate + running ratio) the §2.1 window family lacked.
    *
    * 100 TB: segment partitions are row-scale — the graded form is
    * the standard window; the banded prefix-sum machinery
    * (Dist.bandedCumSum, q_win_pareto) is the documented swap when a
    * partition outgrows one task. */
  def winRatioToReport(s: SparkSession, dir: String): DataFrame = {
    val seg = Window.partitionBy("seg")
    val ord = seg.orderBy(col("cents").desc, col("o_custkey"))
    Tables.orders(s, dir)
      .where(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)"))
        .as("cents"))
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("total", sum("cents").over(seg))
      .withColumn("cum", sum("cents").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rk", row_number().over(ord))
      .selectExpr("seg", "o_custkey", "cents",
        "1000000 * cents div total as share_ppm",
        "1000000 * cum div total as cum_ppm",
        "cast(rk as bigint) as revenue_rank")
      .orderBy("seg", "revenue_rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_fourier" -> timeFourier,
    "q_time_sma_crossover" -> timeSmaCrossover,
    "q_win_ratio_to_report" -> winRatioToReport)

  def oracleSql: Map[String, String] = Map(
    "q_time_fourier" ->
      """WITH daily AS (SELECT event_type,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS d0,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |idx AS (SELECT event_type, y,
        |    d0 - MIN(d0) OVER (PARTITION BY event_type) AS t,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily),
        |sp AS (SELECT event_type, k, n, y,
        |    CAST(ROUND(cos(2 * pi() * k * t / n) * 1000000) AS BIGINT)
        |      AS c,
        |    CAST(ROUND(sin(2 * pi() * k * t / n) * 1000000) AS BIGINT)
        |      AS sn
        |  FROM idx CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS k)),
        |agg AS (SELECT event_type, CAST(k AS BIGINT) AS k,
        |    CAST(MAX(n) AS BIGINT) AS n_days,
        |    SUM(CAST(y AS HUGEINT) * c) AS a,
        |    SUM(CAST(y AS HUGEINT) * sn) AS b
        |  FROM sp GROUP BY event_type, k)
        |SELECT event_type, k, n_days,
        |  ROUND(CAST(a AS DOUBLE) / 1000000, 2) AS a_cents,
        |  ROUND(CAST(b AS DOUBLE) / 1000000, 2) AS b_cents,
        |  ROUND(sqrt(CAST(a AS DOUBLE) * a + CAST(b AS DOUBLE) * b)
        |    / n_days / 1000000, 4) AS amplitude_cents
        |FROM agg ORDER BY event_type, k""".stripMargin,
    "q_time_sma_crossover" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, d),
        |w AS (SELECT event_type, d, y,
        |    row_number() OVER
        |      (PARTITION BY event_type ORDER BY d) AS idx,
        |    SUM(y) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7,
        |    SUM(y) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS s28
        |  FROM daily),
        |sg AS (SELECT event_type, (s7 * 4 > s28) AS sig,
        |    lag(s7 * 4 > s28) OVER
        |      (PARTITION BY event_type ORDER BY d) AS prev
        |  FROM w WHERE idx >= 28),
        |f AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(CASE WHEN sig AND prev = false THEN 1 ELSE 0 END)
        |      AS BIGINT) AS golden,
        |    CAST(SUM(CASE WHEN NOT sig AND prev = true THEN 1 ELSE 0 END)
        |      AS BIGINT) AS death,
        |    CAST(SUM(CASE WHEN sig THEN 1 ELSE 0 END) AS BIGINT)
        |      AS days_above
        |  FROM sg GROUP BY event_type)
        |SELECT * FROM f ORDER BY event_type""".stripMargin,
    "q_win_ratio_to_report" ->
      """WITH rev AS (SELECT o_custkey,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey),
        |j AS (SELECT c.c_mktsegment AS seg, r.o_custkey, r.cents
        |  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey),
        |w AS (SELECT seg, o_custkey, cents,
        |    SUM(cents) OVER (PARTITION BY seg) AS total,
        |    SUM(cents) OVER (PARTITION BY seg
        |      ORDER BY cents DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    row_number() OVER (PARTITION BY seg
        |      ORDER BY cents DESC, o_custkey) AS rk
        |  FROM j)
        |SELECT seg, o_custkey, cents,
        |  CAST((1000000 * cents) // total AS BIGINT) AS share_ppm,
        |  CAST((1000000 * cum) // total AS BIGINT) AS cum_ppm,
        |  CAST(rk AS BIGINT) AS revenue_rank
        |FROM w ORDER BY seg, revenue_rank""".stripMargin)
}
