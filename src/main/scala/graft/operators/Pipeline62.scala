package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64l round-14 batch 30 — operating-cost threshold selection (the
  * business-weighted sibling of q_ml_youden_j / q_ml_f1_threshold),
  * the as-of join WITH TOLERANCE (pandas merge_asof's third knob), and
  * the id-sequence gap profiler (banded, no global sort).
  */
object Pipeline62 extends graft.QueryModule {

  /** COST-OPTIMAL THRESHOLD: minimize 10*FN + 1*FP over the banded
    * int8-score curve — the asymmetric-cost operating point (a missed
    * positive costs 10x a false alarm) that q_ml_youden_j's balanced
    * J and q_ml_f1_threshold's F1 both ignore. Exact integer costs;
    * ties break to the lowest threshold.
    *
    * 100 TB: one map-side-partial score agg; curve + argmin on the
    * <=16k-score domain frame (the q_ml_pr_curve banded machinery). */
  def mlCostThreshold(s: SparkSession, dir: String): DataFrame = {
    val g = Pipeline12.scored(s, dir).groupBy("score")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
      .withColumn("sh", expr("score + 8192L"))
    val tot = g.agg(sum("np").as("n_pos"), sum("nn").as("n_neg"))
    graft.api.Dist.bandedCumSum(g, Seq(), "sh", bandWidth = 128L,
        sumCols = Seq("np", "nn"), inclusive = false)
      .crossJoin(broadcast(tot))
      .selectExpr("score as threshold",
        "n_pos - cum_np as tp", "n_neg - cum_nn as fp",
        "cum_np as fn", "cum_nn as tn",
        "10 * cum_np + (n_neg - cum_nn) as cost")
      .orderBy(col("cost").asc, col("threshold").asc)
      .limit(1)
  }

  /** AS-OF JOIN WITH TOLERANCE: for every (supplier, ship-day), the
    * most recent STRICTLY-EARLIER shipment day of the same supplier —
    * but only if it happened within 30 days, else NULL (pandas
    * merge_asof's `tolerance` knob, which q_join_asof /
    * q_join_asof_nearest lack). Union-merge as-of (the q_join_asof
    * plan): probes sort BEFORE references at equal timestamps so the
    * carried last-reference is strictly earlier (the self-row never
    * matches itself); the tolerance is a post-carry filter, exact
    * because the latest ref < t is also the latest inside [t-30d, t)
    * whenever it qualifies at all. The probe identity is the DISTINCT
    * (supplier, day) frame — the fixture's (orderkey, linenumber)
    * pair is NOT unique at sf0.01, so row-level probes would be
    * nondeterministic.
    *
    * 100 TB: ONE shuffle on l_suppkey, no join blowup (the naive
    * range join materializes |days| x |per-supplier-days-in-window|
    * and inherits supplier skew). */
  def joinAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.lineitem(s, dir)
      .select(col("l_suppkey").as("k"),
        expr("cast(l_shipdate as date)").as("d"),
        expr("cast(round(l_quantity) as bigint)").as("q"))
      .groupBy("k", "d")
      .agg(sum("q").as("qty"))
      .localCheckpoint(true)
    // probes sort before refs at equal t (side 0 < side 1) -> the
    // carried ref at a probe row is STRICTLY earlier
    val probes = days.select(col("k"), col("d"), lit(0).as("side"),
      lit(null).cast("date").as("ref_d"),
      lit(null).cast("long").as("ref_qty"))
    val refs = days.select(col("k"), col("d"), lit(1).as("side"),
      col("d").as("ref_d"), col("qty").as("ref_qty"))
    val w = Window.partitionBy("k")
      .orderBy(col("d").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.unionByName(refs)
      .select(col("k"), col("side"), col("d"),
        last(col("ref_d"), ignoreNulls = true).over(w).as("pd"),
        last(col("ref_qty"), ignoreNulls = true).over(w).as("pq"))
      .where(col("side") === 0)
      .selectExpr("k as suppkey", "d as ship_day",
        // string + sentinel: a NULL DATE renders differently through
        // the driver's two read paths (pandas 'NULL' vs duckdb 'NaT')
        "coalesce(cast(case when pd is not null" +
          " and datediff(d, pd) <= 30 then pd end as string), 'none')" +
          " as prev_day",
        "case when pd is not null and datediff(d, pd) <= 30" +
          " then cast(datediff(d, pd) as bigint) end as gap_days",
        "case when pd is not null and datediff(d, pd) <= 30" +
          " then pq end as prev_qty")
      .orderBy("suppkey", "ship_day")
  }

  /** ID-SEQUENCE GAP PROFILER: the ten largest holes in the
    * o_orderkey domain of the FINISHED ('F') orders — data-
    * completeness forensics for an id stream with missing ranges
    * (the full fixture keyspace is dense, so the status slice is the
    * gap-bearing stream a late-arriving-data monitor would watch).
    * NO GLOBAL SORT: within-band gaps come from a lead window
    * partitioned by the 16384-wide band; cross-band gaps from the
    * band summary frame ranked with the banded machinery and joined
    * on consecutive RANK (robust to empty bands).
    *
    * 100 TB: one band-partitioned window over the key scan + a
    * band-count-sized summary frame; the top-k is a TakeOrdered. */
  def profileSequenceGaps(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.orders(s, dir)
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("key"),
        expr("o_orderkey div 16384").as("band"))
      .localCheckpoint(true)
    val wb = Window.partitionBy("band").orderBy("key")
    val within = keys
      .withColumn("nxt", lead("key", 1).over(wb))
      .where(col("nxt") - col("key") > 1L)
      .selectExpr("key + 1 as gap_start", "nxt - 1 as gap_end",
        "nxt - key - 1 as gap_len")
    val bands = keys.groupBy("band")
      .agg(min("key").as("mn"), max("key").as("mx"))
    val ranked = graft.api.Dist.bandedRank(bands, Seq(), "band",
      "band", bandWidth = 1024L)
    val cross = ranked.select(col("rank").as("r"), col("mx"))
      .join(ranked.select((col("rank") - 1L).as("r"),
        col("mn").as("nmn")), "r")
      .where(col("nmn") - col("mx") > 1L)
      .selectExpr("mx + 1 as gap_start", "nmn - 1 as gap_end",
        "nmn - mx - 1 as gap_len")
    within.unionByName(cross)
      .orderBy(col("gap_len").desc, col("gap_start").asc)
      .limit(10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_cost_threshold" -> mlCostThreshold,
    "q_join_asof_tolerance" -> joinAsofTolerance,
    "q_profile_sequence_gaps" -> profileSequenceGaps)

  def oracleSql: Map[String, String] = Map(
    "q_ml_cost_threshold" ->
      """WITH sc AS (
        |  SELECT (label >= 5) AS pos,
        |    CAST(list_sum(list_transform(embedding::DOUBLE[],
        |      x -> CAST(floor(x * 127.0) AS BIGINT))) AS BIGINT)
        |      AS score
        |  FROM embeddings),
        |g AS (SELECT score,
        |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |    CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
        |  FROM sc GROUP BY score),
        |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(nn) AS BIGINT) AS n_neg FROM g),
        |cum AS (SELECT score,
        |    CAST(COALESCE(SUM(np) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_np,
        |    CAST(COALESCE(SUM(nn) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_nn
        |  FROM g)
        |SELECT score AS threshold, n_pos - cum_np AS tp,
        |  n_neg - cum_nn AS fp, cum_np AS fn, cum_nn AS tn,
        |  10 * cum_np + (n_neg - cum_nn) AS cost
        |FROM cum CROSS JOIN tot
        |ORDER BY cost ASC, threshold ASC LIMIT 1""".stripMargin,
    "q_join_asof_tolerance" ->
      """WITH days AS (SELECT l_suppkey AS k,
        |    CAST(l_shipdate AS DATE) AS d,
        |    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
        |      AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT p.k, p.d, r.d AS prev_day,
        |    CAST(date_diff('day', r.d, p.d) AS BIGINT) AS gap_days,
        |    r.qty AS prev_qty,
        |    ROW_NUMBER() OVER (PARTITION BY p.k, p.d
        |      ORDER BY r.d DESC) AS rn
        |  FROM days p JOIN days r ON p.k = r.k AND r.d < p.d
        |    AND r.d >= p.d - 30)
        |SELECT days.k AS suppkey, days.d AS ship_day,
        |  COALESCE(CAST(m.prev_day AS VARCHAR), 'none') AS prev_day,
        |  m.gap_days, m.prev_qty
        |FROM days LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        |  ON days.k = m.k AND days.d = m.d
        |ORDER BY suppkey, ship_day""".stripMargin,
    "q_profile_sequence_gaps" ->
      """WITH k AS (SELECT o_orderkey AS key,
        |    lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
        |  FROM orders WHERE o_orderstatus = 'F')
        |SELECT key + 1 AS gap_start, nxt - 1 AS gap_end,
        |  nxt - key - 1 AS gap_len
        |FROM k WHERE nxt - key > 1
        |ORDER BY gap_len DESC, gap_start ASC LIMIT 10""".stripMargin)
}
