package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.26 round-9 analytics wideners, batch 3 — the statistical-test and
  * sampling ops completing the eval/analytics leg, every one with an
  * exact DuckDB oracle: a two-sample Kolmogorov–Smirnov distance (the
  * distribution-shift sibling of q_ml_ab_ttest's mean test), RFM
  * customer segmentation, the chi-square independence contribution
  * table, and deterministic class-balanced downsampling (the
  * q_sample_pps banded-rank pattern per label).
  */
object Pipeline13 extends graft.QueryModule {

  /** Two-sample KOLMOGOROV–SMIRNOV distance between the purchase and
    * click value distributions — "did the SHAPE shift", where
    * q_ml_ab_ttest only tests the mean: D = max over observed cents c
    * of |F_pur(c) − F_clk(c)|, computed EXACTLY as integer cross
    * products |cum1·n2 − cum2·n1| (≤ n² ≈ 1e24 at 1e12 events —
    * decimal(38,0)/HUGEINT) and emitted in ppm with the achieving
    * value (smallest such c). No global sort: the value domain groups
    * to ≤ ~49k distinct cents (DOMAIN-bounded), and the inclusive CDF
    * scan is a per-band window + broadcast band offsets — the
    * q_sample_pps prefix-sum pattern (band = c div 1024, monotone).
    *
    * 100 TB: one filtered map-side-partial hash agg is the only
    * full-data pass. */
  def mlKsTest(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(s, dir)
      .where(col("event_type").isin("purchase", "click"))
      .select((col("event_type") === "purchase").as("isP"),
        expr("cast(round(value * 100) as bigint)").as("c"))
      .groupBy("c")
      .agg(sum(when(col("isP"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("isP"), 0L).otherwise(1L)).as("n2"))
    val tot = g.agg(sum("n1").as("n_purchase"), sum("n2").as("n_click"))
    val cdf = graft.api.Dist.bandedCumSum(g, Seq(), "c",
        bandWidth = 1024L, sumCols = Seq("n1", "n2"))
      .crossJoin(broadcast(tot))
      .select(col("c"), col("n_purchase"), col("n_click"),
        expr("cast(abs(cast(cum_n1 as decimal(19,0)) * n_click" +
          " - cast(cum_n2 as decimal(19,0)) * n_purchase)" +
          " * 1000000 div (cast(n_purchase as decimal(38,0)) * n_click)" +
          " as bigint)").as("ppm"))
      .localCheckpoint() // support-sized; feeds the max and the argmax
    val mx = cdf.agg(max("ppm").as("d_ppm"))
    cdf.join(broadcast(mx), col("ppm") === col("d_ppm"))
      .groupBy("n_purchase", "n_click", "d_ppm")
      .agg(min("c").as("d_at_cents"))
      .select("n_purchase", "n_click", "d_ppm", "d_at_cents")
  }

  /** RFM segmentation of the user base — recency / frequency /
    * monetary scored 1–3 on FIXED literal thresholds (engine-neutral
    * integer compares; quantile edges would need a global sort and
    * drift between runs), rolled up to segment counts and exact
    * purchase cents. Recency anchors on the observed max event date
    * (1-row broadcast, the q_profile_freshness pattern).
    *
    * 100 TB: one per-user hash agg (map-side partial) + a ≤27-row
    * roll-up; nothing wider than three small ints and a cents sum
    * crosses the second shuffle. */
  def eventsRfm(s: SparkSession, dir: String): DataFrame = {
    val ref = Tables.events(s, dir).agg(max(to_date(col("ts"))).as("refd"))
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_d"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("freq"),
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)")).otherwise(0L))
          .as("cents"))
      .crossJoin(broadcast(ref))
      .select(
        expr("case when datediff(refd, last_d) <= 2 then 3L" +
          " when datediff(refd, last_d) <= 7 then 2L else 1L end")
          .as("r_score"),
        expr("case when freq >= 5 then 3L when freq >= 2 then 2L" +
          " else 1L end").as("f_score"),
        expr("case when cents >= 50000 then 3L when cents >= 10000" +
          " then 2L else 1L end").as("m_score"),
        col("cents"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"), sum("cents").as("tot_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** CHI-SQUARE independence table: market segment × order priority,
    * one row per cell with observed count, expected count in milli
    * (exact decimal div of the R·C·1000/N rational) and the cell's
    * χ² contribution (O−E)²/E as ONE fixed per-cell double dag —
    * deliberately NO summed χ² column: a cross-cell double SUM's
    * addition order is engine- and partition-dependent, while every
    * per-cell value here is deterministic. Marginals come from tiny
    * aggs over the checkpointed 25-row cell frame, joined back by
    * broadcast — no SinglePartition window.
    *
    * 100 TB: the fact join is co-keyed on custkey; one hash agg to
    * |segments|·|priorities| rows; everything after is support-sized
    * arithmetic. */
  def mlChisq(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("segment"), col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_obs"))
      .localCheckpoint() // 25 rows; three marginal consumers
    val rTot = cells.groupBy("segment").agg(sum("n_obs").as("rt"))
    val cTot = cells.groupBy("priority").agg(sum("n_obs").as("ct"))
    val nTot = cells.agg(sum("n_obs").as("nt"))
    cells.join(broadcast(rTot), "segment")
      .join(broadcast(cTot), "priority")
      .crossJoin(broadcast(nTot))
      .select(col("segment"), col("priority"), col("n_obs"),
        expr("cast(cast(rt as decimal(38,0)) * ct * 1000 div nt" +
          " as bigint)").as("expected_milli"),
        expr("round((n_obs - cast(rt as double) * ct / nt)" +
          " * (n_obs - cast(rt as double) * ct / nt)" +
          " / (cast(rt as double) * ct / nt), 6)").as("contrib"))
      .orderBy("segment", "priority")
  }

  /** Deterministic class-BALANCED downsample of the embedding corpus:
    * every label keeps exactly min-class-count vectors, selected by
    * the smallest values of the q_sample_pps integer hash (ties by
    * vec_id) — reproducible on any engine, partitioning or schedule,
    * unlike rand()-based samplers. The per-label rank is banded
    * two-phase (hash-band row_number + broadcast band offsets), never
    * a per-label global sort.
    *
    * 100 TB: the hash is uniform so (label, band) partitions are
    * balanced by construction; the min-class target is a ≤|labels|-row
    * broadcast. Selection emits (label, vec_id, pick_rank). */
  def sampleBalanced(s: SparkSession, dir: String): DataFrame = {
    val p = 1000000007L
    // vec_id is reduced mod p BEFORE the LCG multiply: (p-1)·1103515245
    // ≈ 1.1e18 < 2^63, so the hash stays exact int64 for ANY vec_id,
    // where the raw vec_id·a form wraps (Spark) / raises (DuckDB) past
    // vec_id ≈ 8.4e9 — i.e. at the claimed 100 TB id domain (ADVICE r9).
    val base = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"), col("vec_id"),
        expr(s"pmod(pmod(vec_id, ${p}L) * 1103515245L + 12345L, ${p}L)")
          .as("h"))
    val tgt = broadcast(base.groupBy("label").agg(count(lit(1)).as("cnt"))
      .agg(min("cnt").as("target")))
    graft.api.Dist.bandedRank(base, Seq("label"), "h", "vec_id",
        bandWidth = p / 64 + 1)
      .withColumnRenamed("rank", "pick_rank")
      .crossJoin(tgt)
      .where(col("pick_rank") <= col("target"))
      .select("label", "vec_id", "pick_rank")
      .orderBy("label", "pick_rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_ks_test" -> mlKsTest,
    "q_events_rfm" -> eventsRfm,
    "q_ml_chisq" -> mlChisq,
    "q_sample_balanced" -> sampleBalanced)

  def oracleSql: Map[String, String] = Map(
    "q_ml_ks_test" ->
      """WITH v AS (
        |  SELECT (event_type = 'purchase') AS isp,
        |    CAST(ROUND(value * 100) AS BIGINT) AS c
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |g AS (
        |  SELECT c,
        |    CAST(SUM(CASE WHEN isp THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN isp THEN 0 ELSE 1 END) AS BIGINT) AS n2
        |  FROM v GROUP BY c),
        |t AS (SELECT CAST(SUM(n1) AS BIGINT) AS n_purchase,
        |             CAST(SUM(n2) AS BIGINT) AS n_click FROM g),
        |cdf AS (
        |  SELECT c, n_purchase, n_click,
        |    CAST(abs(CAST(SUM(n1) OVER w AS HUGEINT) * n_click
        |           - CAST(SUM(n2) OVER w AS HUGEINT) * n_purchase)
        |      * 1000000 // (CAST(n_purchase AS HUGEINT) * n_click)
        |      AS BIGINT) AS ppm
        |  FROM g, t
        |  WINDOW w AS (ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |mx AS (SELECT MAX(ppm) AS d_ppm FROM cdf)
        |SELECT n_purchase, n_click, d_ppm,
        |  CAST(MIN(c) AS BIGINT) AS d_at_cents
        |FROM cdf JOIN mx ON ppm = d_ppm
        |GROUP BY n_purchase, n_click, d_ppm""".stripMargin,
    "q_events_rfm" ->
      """WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS refd FROM events),
        |per AS (
        |  SELECT user_id, MAX(CAST(ts AS DATE)) AS last_d,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS freq,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |scored AS (
        |  SELECT
        |    CASE WHEN refd - last_d <= 2 THEN 3 WHEN refd - last_d <= 7
        |      THEN 2 ELSE 1 END AS r_score,
        |    CASE WHEN freq >= 5 THEN 3 WHEN freq >= 2 THEN 2 ELSE 1 END
        |      AS f_score,
        |    CASE WHEN cents >= 50000 THEN 3 WHEN cents >= 10000 THEN 2
        |      ELSE 1 END AS m_score,
        |    cents
        |  FROM per, ref)
        |SELECT CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(cents) AS BIGINT) AS tot_cents
        |FROM scored GROUP BY 1, 2, 3
        |ORDER BY r_score, f_score, m_score""".stripMargin,
    "q_ml_chisq" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |    CAST(COUNT(*) AS BIGINT) AS n_obs
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT segment, SUM(n_obs) AS rt FROM cells GROUP BY segment),
        |c AS (SELECT priority, SUM(n_obs) AS ct FROM cells GROUP BY priority),
        |n AS (SELECT SUM(n_obs) AS nt FROM cells)
        |SELECT segment, priority, n_obs,
        |  CAST(CAST(rt AS HUGEINT) * ct * 1000 // nt AS BIGINT)
        |    AS expected_milli,
        |  round((n_obs - CAST(rt AS DOUBLE) * ct / nt)
        |    * (n_obs - CAST(rt AS DOUBLE) * ct / nt)
        |    / (CAST(rt AS DOUBLE) * ct / nt), 6) AS contrib
        |FROM cells JOIN r USING (segment) JOIN c USING (priority), n
        |ORDER BY segment, priority""".stripMargin,
    "q_sample_balanced" ->
      """WITH h AS (
        |  SELECT CAST(label AS BIGINT) AS label, vec_id,
        |    ((vec_id % 1000000007) * 1103515245 + 12345) % 1000000007 AS hh
        |  FROM embeddings),
        |t AS (SELECT MIN(cnt) AS target FROM
        |  (SELECT COUNT(*) AS cnt FROM h GROUP BY label)),
        |r AS (
        |  SELECT label, vec_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY label
        |      ORDER BY hh, vec_id) AS BIGINT) AS pick_rank
        |  FROM h)
        |SELECT label, vec_id, pick_rank
        |FROM r, t WHERE pick_rank <= target
        |ORDER BY label, pick_rank""".stripMargin)
}
