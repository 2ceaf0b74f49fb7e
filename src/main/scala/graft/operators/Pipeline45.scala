package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.58 round-14 batch 13 — last statistics rungs: PERCENTILE_DISC
  * (the discrete sibling of q_agg_percentile_cont — the value a real
  * row holds, not an interpolation), the two-proportion z-test (the
  * conversion-rate A/B form beside q_ml_ab_ttest's means), Theil-Sen
  * robust slope (the median-of-pairwise-slopes trend beside
  * q_ml_linfit's OLS), and the Hosmer-Lemeshow calibration test (the
  * decision statistic on top of q_ml_calibration's per-bucket
  * readout).
  */
object Pipeline45 extends graft.QueryModule {

  /** PERCENTILE_DISC per order status — the SQL-standard discrete
    * percentile (min value whose cume_dist ≥ p) at p = ¼, ½, ¾, ⅞:
    * every p is exactly representable in binary, so the cum ≥ p·n
    * gate is unambiguous on both engines (0.9·n is NOT — the double
    * literal overshoots integer boundaries). The oracle re-derives
    * from the explicit window definition rather than DuckDB's
    * quantile_disc (whose index convention differs).
    *
    * 100 TB: one grouped ordered-agg within the 3-status domain
    * (mergeable partials, same budget class as percentile_cont). */
  def aggPercentileDisc(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus").as("st"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .groupBy("st")
      .agg(count(lit(1)).as("n"),
        // percentile_disc renders DOUBLE; the picked value is a real
        // integer row value, so the bigint cast is exact
        expr("cast(percentile_disc(0.25) within group (order by cents)" +
          " as bigint)").as("p25"),
        expr("cast(percentile_disc(0.5) within group (order by cents)" +
          " as bigint)").as("p50"),
        expr("cast(percentile_disc(0.75) within group (order by cents)" +
          " as bigint)").as("p75"),
        expr("cast(percentile_disc(0.875) within group (order by cents)" +
          " as bigint)").as("p875"))
      .orderBy("st")

  /** TWO-PROPORTION Z-TEST on purchase rate — variant by event-id
    * parity (the deterministic assignment; event grain keeps both
    * arms populated at every SF — the 15-user sf0.001 frame
    * degenerates to p̂ = 1 and a zero radical), success = purchase;
    * pooled z = (p1−p2)/√(p̂(1−p̂)(1/n1+1/n2)) from FOUR integers in
    * one fixed dag. The rate-comparison form the mean-comparison
    * q_ml_ab_ttest can't grade.
    *
    * 100 TB: one map-side-partial 4-integer reduction. */
  def mlPropZtest(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select((col("event_id") % 2 === 0).as("a"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("conv"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("a"), col("conv")).otherwise(0L)).as("k1"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n2"),
        sum(when(!col("a"), col("conv")).otherwise(0L)).as("k2"))
      .selectExpr("n1", "k1", "n2", "k2",
        "round(cast(k1 as double) / n1, 6) as p1",
        "round(cast(k2 as double) / n2, 6) as p2",
        "round((cast(k1 as double) / n1 - cast(k2 as double) / n2)" +
          " / sqrt((cast(k1 + k2 as double) / (n1 + n2))" +
          " * (1 - cast(k1 + k2 as double) / (n1 + n2))" +
          " * (1.0D / n1 + 1.0D / n2)), 6) as z",
        "abs((cast(k1 as double) / n1 - cast(k2 as double) / n2)" +
          " / sqrt((cast(k1 + k2 as double) / (n1 + n2))" +
          " * (1 - cast(k1 + k2 as double) / (n1 + n2))" +
          " * (1.0D / n1 + 1.0D / n2))) > 1.959963984540054D as reject5")

  /** THEIL-SEN ROBUST SLOPE per event type — the median of all
    * pairwise slopes of the daily-revenue series (+ the standard
    * median-residual intercept at that slope): outlier days move the
    * OLS q_ml_linfit but barely move this. Pair slopes are identical
    * doubles on both engines (exact integer deltas, one division);
    * both medians interpolate the same multiset.
    *
    * 100 TB: the daily agg is the only full pass; the pair join is an
    * EQUI-join on event_type over the days-sized support frame
    * (days²/2 pairs per type — bounded by the calendar, not rows). */
  def timeTheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      .select(col("event_type"),
        expr("cast(datediff(d, date '1970-01-01') as bigint)").as("x"),
        col("y"))
      .localCheckpoint(true)
    val slopes = daily.as("a")
      .join(daily.as("b"), Seq("event_type"))
      .where(col("a.x") < col("b.x"))
      .select(col("event_type"),
        expr("cast(b.y - a.y as double) / (b.x - a.x)").as("sl"))
    val med = slopes.groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(sl, 0.5D)").as("slope"))
    daily.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), max("n_pairs").as("n_pairs"),
        max("slope").as("slope"),
        expr("percentile(y - slope * x, 0.5D)").as("intercept"))
      .selectExpr("event_type", "n_days", "n_pairs",
        "round(slope, 6) as slope", "round(intercept, 4) as intercept")
      .orderBy("event_type")
  }

  /** HOSMER-LEMESHOW calibration test on the shared int8-score map
    * (q_ml_calibration's per-bucket readout → the DECISION): fixed
    * milli-probability bins (the scale-safe HL-H variant — ranked
    * deciles would be a row-scale global sort), per-bin observed vs
    * expected positives with E from EXACT milli sums, χ² folded in
    * bin order, χ²₍bins−2₎ 95% cut. Degenerate bins (E = 0 or
    * E = n) drop on both engines.
    *
    * 100 TB: one map-side-partial hash agg to the ≤10-bin frame. */
  def mlHosmerLemeshow(s: SparkSession, dir: String): DataFrame =
    Pipeline12.scored(s, dir)
      .select(col("pos"),
        expr("((score + 8128) * 1000) div 16256").as("p_milli"))
      .groupBy(expr("least(p_milli div 100, 9L)").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("o1"),
        sum("p_milli").as("e1_milli"))
      .where(col("e1_milli") > 0 && col("e1_milli") < col("n") * 1000L)
      .agg(count(lit(1)).as("n_bins"), sum("n").as("n"),
        expr("array_sort(collect_list(struct(bin, n, o1, e1_milli)))")
          .as("l"))
      .selectExpr("n", "n_bins",
        "aggregate(l, 0D, (a, x) -> a" +
          " + (x.o1 - x.e1_milli / 1000.0D) * (x.o1 - x.e1_milli / 1000.0D)" +
          " * (1.0D / (x.e1_milli / 1000.0D)" +
          "    + 1.0D / (x.n - x.e1_milli / 1000.0D))) as chi2")
      .selectExpr("n", "n_bins", "round(chi2, 6) as chi2",
        "n_bins - 2 as df",
        "chi2 > 15.50731305586545D as reject5")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_percentile_disc" -> aggPercentileDisc,
    "q_ml_prop_ztest" -> mlPropZtest,
    "q_time_theil_sen" -> timeTheilSen,
    "q_ml_hosmer_lemeshow" -> mlHosmerLemeshow)

  def oracleSql: Map[String, String] = Map(
    "q_agg_percentile_disc" ->
      """WITH b AS (SELECT o_orderstatus AS st,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |w AS (SELECT st, cents,
        |    CAST(COUNT(*) OVER (PARTITION BY st ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(COUNT(*) OVER (PARTITION BY st) AS BIGINT) AS n
        |  FROM b)
        |SELECT st, MAX(n) AS n,
        |  MIN(CASE WHEN cum >= 0.25 * n THEN cents END) AS p25,
        |  MIN(CASE WHEN cum >= 0.5 * n THEN cents END) AS p50,
        |  MIN(CASE WHEN cum >= 0.75 * n THEN cents END) AS p75,
        |  MIN(CASE WHEN cum >= 0.875 * n THEN cents END) AS p875
        |FROM w GROUP BY st ORDER BY st""".stripMargin,
    "q_ml_prop_ztest" ->
      """WITH u AS (SELECT event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        |  FROM events),
        |g AS (SELECT
        |    CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN event_id % 2 = 0 THEN conv ELSE 0 END)
        |      AS BIGINT) AS k1,
        |    CAST(SUM(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN event_id % 2 <> 0 THEN conv ELSE 0 END)
        |      AS BIGINT) AS k2
        |  FROM u)
        |SELECT n1, k1, n2, k2,
        |  ROUND(CAST(k1 AS DOUBLE) / n1, 6) AS p1,
        |  ROUND(CAST(k2 AS DOUBLE) / n2, 6) AS p2,
        |  ROUND((CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2)
        |    / sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
        |    * (1 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
        |    * (1.0 / n1 + 1.0 / n2)), 6) AS z,
        |  abs((CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2)
        |    / sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
        |    * (1 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
        |    * (1.0 / n1 + 1.0 / n2))) > 1.959963984540054 AS reject5
        |FROM g""".stripMargin,
    "q_time_theil_sen" ->
      """WITH daily AS (SELECT event_type,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS x,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |sl AS (SELECT a.event_type,
        |    CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS sl
        |  FROM daily a JOIN daily b ON a.event_type = b.event_type
        |    AND a.x < b.x),
        |med AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    quantile_cont(sl, 0.5) AS slope
        |  FROM sl GROUP BY event_type),
        |f AS (SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    MAX(n_pairs) AS n_pairs, MAX(slope) AS slope,
        |    quantile_cont(y - slope * x, 0.5) AS intercept
        |  FROM daily d JOIN med USING (event_type)
        |  GROUP BY d.event_type)
        |SELECT event_type, n_days, n_pairs,
        |  ROUND(slope, 6) AS slope, ROUND(intercept, 4) AS intercept
        |FROM f ORDER BY event_type""".stripMargin,
    "q_ml_hosmer_lemeshow" ->
      ("""WITH sc AS (
        |  SELECT (label >= 5) AS pos,
        |    CAST(list_sum(list_transform(embedding::DOUBLE[],
        |      x -> CAST(floor(x * 127.0) AS BIGINT))) AS BIGINT) AS score
        |  FROM embeddings),
        |p AS (SELECT pos,
        |    ((score + 8128) * 1000) // 16256 AS p_milli FROM sc),
        |b AS (SELECT least(p_milli // 100, 9) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS o1,
        |    CAST(SUM(p_milli) AS BIGINT) AS e1_milli
        |  FROM p GROUP BY bin),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
        |    CAST(SUM(n) AS BIGINT) AS n,
        |    list_reduce(list(
        |      (o1 - e1_milli / 1000.0) * (o1 - e1_milli / 1000.0)
        |      * (1.0 / (e1_milli / 1000.0)
        |         + 1.0 / (n - e1_milli / 1000.0)) ORDER BY bin),
        |      (a, b) -> a + b) AS chi2
        |  FROM b WHERE e1_milli > 0 AND e1_milli < n * 1000)
        |SELECT n, n_bins, ROUND(chi2, 6) AS chi2, n_bins - 2 AS df,
        |  chi2 > 15.50731305586545 AS reject5
        |FROM g""".stripMargin))
}
