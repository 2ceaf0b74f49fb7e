package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.19 round-7 closers: the remaining classic pipeline operators a
  * 100 TB corpus/telemetry run leans on — time-series gap-fill with
  * forward-fill (resampling), blocked edit-distance fuzzy dedup (the
  * order-sensitive rung MinHash misses), Tukey-fence outlier profiling
  * (data quality), and an equi-width histogram (distribution profile).
  * All four have exact DuckDB oracle twins.
  */
object Pipeline6 extends graft.QueryModule {

  /** Dense per-user hourly series from the irregular events stream:
    * one row per hour between each user's first and last event, quiet
    * hours zero-filled, last observed hourly max carried forward
    * (graft.api.Events.gapfillHourly). */
  def eventsGapfill(s: SparkSession, dir: String): DataFrame =
    graft.api.Events.gapfillHourly(Tables.events(s, dir),
        "user_id", "ts", "value")
      .orderBy("user_id", "hr")

  /** Fuzzy near-duplicate PAIRS by Levenshtein distance of 64-char
    * prefixes, candidates blocked on (lang, length-div-64 bucket,
    * FIRST-8-CHARS) so the quadratic DP never leaves a near-dup-sized
    * block (graft.api.Dedup.fuzzyPairs). The first-8-char component
    * is the r8 scale fix: the coarse (lang, length) key alone made
    * ~46 corpus-fraction blocks (quadratic pair space, ~tens of
    * reducers); conjoining the text head cuts the sf0.1 pair space
    * ~390x while keeping 100% of sub-threshold pairs on every SF
    * (edit-near prefixes agree on the head; measured, Pipeline6Spec).
    * Distance <= 20 keeps true prefix-level rewrites, not topic-level
    * similarity — the order-SENSITIVE complement of the
    * MinHash/Jaccard set family. */
  def dedupLevenshtein(s: SparkSession, dir: String): DataFrame =
    graft.api.Dedup.fuzzyPairs(Tables.documents(s, dir), "doc_id",
        "text", struct(col("lang"), expr("length(text) div 64"),
          expr("substring(text, 1, 8)")),
        prefixLen = 64, maxDist = 20)
      .orderBy("a_id", "b_id")

  /** Tukey-fence outlier profile of event values per event type
    * (graft.api.Profile.iqrOutliers): exact p25/p75 fences (rounded
    * to 6 dp before classifying), strict-outside counts and ppm. */
  def profileOutliers(s: SparkSession, dir: String): DataFrame =
    graft.api.Profile.iqrOutliers(Tables.events(s, dir),
        "event_type", "value")
      .orderBy("event_type")

  /** KLL twin of q_profile_outliers — same Tukey-fence report, p25/p75
    * from the mergeable KLL sketch instead of exact `percentile` (the
    * 100 TB path: bounded per-group agg state, map-side partial merge,
    * no whole-group buffer on one reducer; graded no-oracle, bounded
    * by Pipeline6Spec's fence rank-band test against the exact twin —
    * the q_agg_trimmed / q_agg_trimmed_kll pattern). */
  def profileOutliersKll(s: SparkSession, dir: String): DataFrame =
    graft.api.Profile.iqrOutliers(Tables.events(s, dir),
        "event_type", "value", approx = true)
      .orderBy("event_type")

  /** Equi-width HISTOGRAM of lineitem price in $5000 buckets — the
    * one-pass distribution profile: bucket ids from exact integer
    * CENTS arithmetic (round-then-cast per the §2.0 minmax_by rule —
    * Spark truncates raw double->bigint where DuckDB rounds), count +
    * exact cent-sum per bucket rendered as dollars. One map-side
    * partial hash-agg over a 2-column scan; output is |buckets| rows
    * regardless of input size. */
  def aggHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(expr("cast(round(l_extendedprice * 100) as bigint)")
        .as("cents"))
      .select(expr("cents div 500000").as("bucket"), col("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_items"),
        (sum("cents").cast("double") / 100).as("sum_price"))
      .orderBy("bucket")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_gapfill" -> eventsGapfill,
    "q_dedup_levenshtein" -> dedupLevenshtein,
    "q_profile_outliers" -> profileOutliers,
    "q_profile_outliers_kll" -> profileOutliersKll,
    "q_agg_histogram" -> aggHistogram)

  def oracleSql: Map[String, String] = Map(
    "q_events_gapfill" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS n_events,
        |         MAX(value) AS hr_max
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |  FROM hourly GROUP BY 1),
        |spine AS (
        |  SELECT user_id,
        |         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM bounds)
        |SELECT s.user_id, s.hr,
        |       COALESCE(h.n_events, 0) AS n_events,
        |       last_value(h.hr_max IGNORE NULLS) OVER (
        |         PARTITION BY s.user_id ORDER BY s.hr
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS ffill_max
        |FROM spine s LEFT JOIN hourly h USING (user_id, hr)
        |ORDER BY s.user_id, s.hr""".stripMargin,
    "q_dedup_levenshtein" ->
      """WITH s AS (
        |  SELECT doc_id, lang, length(text) // 64 AS lb,
        |         substring(text, 1, 8) AS p8,
        |         substring(text, 1, 64) AS pre FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS lev
        |FROM s a JOIN s b
        |  ON a.lang = b.lang AND a.lb = b.lb AND a.p8 = b.p8
        |  AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.pre, b.pre) <= 20
        |ORDER BY a_id, b_id""".stripMargin,
    "q_profile_outliers" ->
      """WITH f AS (
        |  SELECT event_type,
        |    ROUND(quantile_cont(value, 0.25) - 1.5*(quantile_cont(value, 0.75)
        |      - quantile_cont(value, 0.25)), 6) AS lo,
        |    ROUND(quantile_cont(value, 0.75) + 1.5*(quantile_cont(value, 0.75)
        |      - quantile_cont(value, 0.25)), 6) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST((1000000 * CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
        |    THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*) AS BIGINT)
        |    AS outlier_ppm,
        |  MAX(f.lo) AS lo, MAX(f.hi) AS hi
        |FROM events e JOIN f USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q_agg_histogram" ->
      """SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) // 500000
        |    AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |    / 100 AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
}
