package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.43 round-13 batch 6 — the last family rungs: a fixed-point
  * HOLT-WINTERS additive seasonal smoother (completing the smoothing
  * ladder EWMA → Holt → Holt-Winters in the same integer-weight
  * discipline), the KMEANS ELBOW curve (the model-selection staple
  * over the shared feature frame), and the WINSORIZED mean (the
  * clamp twin of q_agg_trimmed's drop).
  */
object Pipeline30 extends graft.QueryModule {

  /** Holt-Winters contribution weights over the 16-day window — the
    * single source both engines read. State u = (l, b, s_t,
    * s_{t−1}..s_{t−6}); with α = β = γ = 1/2 the update is
    * u_t = M·u_{t−1} + c·x_t with 4M and 4c integer
    * (l: (2l + 2b − 2s₇ + 2x)/4; b: (−l + 3b − s₇ + x)/4;
    * s: (−l − b + 3s₇ + x)/4; seasonal lags shift), so over zero
    * initial state u_t = Σ_k M^k c x_{t−k} and the day-k weights on
    * the common denominator 4^16 are the exact integers
    * W_k = (4M)^k (4c) · 4^{15−k}. The smoother's roots keep
    * |W_k| ≤ 2^31 (max at k = 0; verified in Pipeline30Spec), the
    * same envelope as q_time_holt. */
  private[graft] val hwWeights: IndexedSeq[(Int, Long, Long, Long)] = {
    val n = 9
    val m = Array.fill(n, n)(0L)
    m(0)(0) = 2; m(0)(1) = 2; m(0)(8) = -2
    m(1)(0) = -1; m(1)(1) = 3; m(1)(8) = -1
    m(2)(0) = -1; m(2)(1) = -1; m(2)(8) = 3
    for (k <- 1 to 6) m(2 + k)(1 + k) = 4
    var v = Array[Long](2, 1, 1, 0, 0, 0, 0, 0, 0)
    (0 to 15).map { k =>
      val scale = 1L << (2 * (15 - k))
      val res = (k, v(0) * scale, v(1) * scale, v(2) * scale)
      v = Array.tabulate(n)(i => (0 until n).map(j => m(i)(j) * v(j)).sum)
      res
    }
  }

  /** FIXED-POINT HOLT-WINTERS additive seasonal smoother
    * (α = β = γ = 1/2, weekly period, 16-day window, absent days are
    * zero revenue) over daily revenue cents per event type — the
    * seasonal rung above q_time_holt in the identical NO-floating-
    * point discipline: each day's cents v contributes v·(wl, wb, ws)
    * to the (level, trend, seasonal) state of the day k ahead
    * ([[hwWeights]]), the three weighted sums run in decimal(38,0)
    * (so unlike Holt's int64 sums there is NO headroom precondition
    * at all), and the final division by 4^16 truncates toward zero
    * via sign-split. Engine-exact by construction — the weight table
    * is interpolated verbatim into both plans.
    *
    * 100 TB: one full-data daily agg; the 16-way weighted explode and
    * re-agg run on the support-sized (type × day) frame — the
    * q_time_ewma/q_time_holt topology exactly. */
  def timeHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val wArr = hwWeights.map { case (k, wl, wb, ws) =>
      s"named_struct('k', $k, 'wl', ${wl}L, 'wb', ${wb}L, 'ws', ${ws}L)"
    }.mkString("array(", ", ", ")")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("v"))
      .localCheckpoint()
    val contrib = daily
      .withColumn("w", explode(expr(wArr)))
      .groupBy(col("event_type"), expr("date_add(d, w.k)").as("d"))
      .agg(sum(expr("cast(v as decimal(38,0)) * w.wl")).as("lnum"),
        sum(expr("cast(v as decimal(38,0)) * w.wb")).as("bnum"),
        sum(expr("cast(v as decimal(38,0)) * w.ws")).as("snum"))
    def tdiv(c: String) = // truncate-toward-zero by 4^16, sign-split
      s"cast(case when $c >= 0 then $c div 4294967296" +
        s" else -((-$c) div 4294967296) end as bigint)"
    daily.join(contrib, Seq("event_type", "d"))
      .select(col("event_type"), col("d"), col("v").as("v_cents"),
        expr(tdiv("lnum")).as("level_cents"),
        expr(tdiv("bnum")).as("trend_cents"),
        expr(tdiv("snum")).as("seas_cents"))
      .orderBy("event_type", "d")
  }

  /** KMEANS ELBOW CURVE — the model-selection staple before any
    * clustering choice: seeded KMeans over the shared feature frame
    * at k ∈ {2, 4, 8, 16}, per k the training cost (within-cluster
    * sum of squared distances, rounded 3 dp) and the non-empty
    * cluster count. NO oracle (seeded iterative fits);
    * Pipeline30Spec pins rerun determinism, cost > 0, strict
    * cost decrease from k=2 to k=16, and non-empty counts ≤ k.
    *
    * 100 TB: each fit carries k·d centroid state over the persisted
    * (released post-fits) feature frame; readouts are 1-row aggs. */
  def mlKmeansElbow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val feats = VectorOps.sharedRawFeats(s, dir).persist()
    try {
      Seq(2, 4, 8, 16).map { k =>
        val m = new KMeans().setK(k).setSeed(42L).setMaxIter(5)
          .setFeaturesCol("raw").setPredictionCol("c").fit(feats)
        val nonEmpty = m.transform(feats)
          .agg(countDistinct("c").as("n_clusters")).collect().head.getLong(0)
        feats.sparkSession.range(1).select(
          lit(k.toLong).as("k"),
          lit(BigDecimal(m.summary.trainingCost)
            .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
            .as("cost"),
          lit(nonEmpty).as("n_clusters"))
      }.reduce(_.unionAll(_)).orderBy("k")
    } finally { feats.unpersist(false); () }
  }

  /** WINSORIZED MEAN per event type — the CLAMP twin of
    * q_agg_trimmed's drop (values outside the exact p5/p95 ceil-rank
    * bounds are pulled TO the bounds instead of discarded, so n is
    * preserved): identical bound derivation (per-type sort window,
    * rank (p·n+99) div 100), then mean of least(greatest(cents, lo),
    * hi) rounded 6 dp from exact integer sums.
    *
    * 100 TB: the per-type rank window is the exact-percentile dial
    * (KLL bounds are the documented swap — the q_agg_trimmed_kll
    * precedent); the clamp pass is one more map-side agg. */
  def aggWinsorized(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir).select(col("event_type").as("g"),
      expr("cast(round(value * 100) as bigint)").as("cents"))
    val n = c.groupBy("g").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("g").orderBy("cents")
    val bounds = c.join(n, "g")
      .withColumn("rk", row_number().over(w))
      .groupBy("g", "n").agg(
        min(when(col("rk") === expr("(5 * n + 99) div 100"),
          col("cents"))).as("lo_cents"),
        min(when(col("rk") === expr("(95 * n + 99) div 100"),
          col("cents"))).as("hi_cents"))
    c.join(broadcast(bounds), "g")
      .groupBy(col("g"), col("n"), col("lo_cents"), col("hi_cents"))
      .agg(sum(expr("least(greatest(cents, lo_cents), hi_cents)")).as("sw"))
      .select(col("g").as("event_type"), col("n"), col("lo_cents"),
        col("hi_cents"),
        round(col("sw").cast("double") / col("n") / 100.0, 6)
          .as("wins_mean"))
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_holt_winters" -> timeHoltWinters,
    "q_ml_kmeans_elbow" -> mlKmeansElbow,
    "q_agg_winsorized" -> aggWinsorized)

  private def hwWeightsSql: String = hwWeights
    .map { case (k, wl, wb, ws) => s"($k, $wl, $wb, $ws)" }.mkString(", ")

  def oracleSql: Map[String, String] = Map(
    "q_time_holt_winters" ->
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |w(k, wl, wb, ws) AS (VALUES $hwWeightsSql),
        |contrib AS (SELECT event_type, d + CAST(k AS INTEGER) AS d,
        |    SUM(CAST(v AS HUGEINT) * wl) AS lnum,
        |    SUM(CAST(v AS HUGEINT) * wb) AS bnum,
        |    SUM(CAST(v AS HUGEINT) * ws) AS snum
        |  FROM daily CROSS JOIN w
        |  GROUP BY event_type, d + CAST(k AS INTEGER))
        |SELECT daily.event_type, daily.d,
        |  CAST(daily.v AS BIGINT) AS v_cents,
        |  CAST(CASE WHEN lnum >= 0 THEN lnum // 4294967296
        |    ELSE -((-lnum) // 4294967296) END AS BIGINT) AS level_cents,
        |  CAST(CASE WHEN bnum >= 0 THEN bnum // 4294967296
        |    ELSE -((-bnum) // 4294967296) END AS BIGINT) AS trend_cents,
        |  CAST(CASE WHEN snum >= 0 THEN snum // 4294967296
        |    ELSE -((-snum) // 4294967296) END AS BIGINT) AS seas_cents
        |FROM daily JOIN contrib
        |  ON contrib.event_type = daily.event_type
        | AND contrib.d = daily.d
        |ORDER BY daily.event_type, daily.d""".stripMargin,
    "q_agg_winsorized" ->
      """WITH c AS (SELECT event_type AS g,
        |             CAST(ROUND(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |n AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY g),
        |r AS (SELECT c.g, c.cents, n.n,
        |        row_number() OVER (PARTITION BY c.g ORDER BY c.cents)
        |          AS rk
        |      FROM c JOIN n ON n.g = c.g),
        |b AS (SELECT g, n,
        |        MIN(CASE WHEN rk = (5 * n + 99) // 100
        |          THEN cents END) AS lo_cents,
        |        MIN(CASE WHEN rk = (95 * n + 99) // 100
        |          THEN cents END) AS hi_cents
        |      FROM r GROUP BY g, n)
        |SELECT b.g AS event_type, b.n,
        |  CAST(b.lo_cents AS BIGINT) AS lo_cents,
        |  CAST(b.hi_cents AS BIGINT) AS hi_cents,
        |  ROUND(CAST(SUM(LEAST(GREATEST(c.cents, b.lo_cents),
        |      b.hi_cents)) AS DOUBLE) / b.n / 100.0, 6) AS wins_mean
        |FROM c JOIN b ON b.g = c.g
        |GROUP BY b.g, b.n, b.lo_cents, b.hi_cents
        |ORDER BY event_type""".stripMargin)
}
