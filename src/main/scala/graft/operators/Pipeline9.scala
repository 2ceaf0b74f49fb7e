package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.22 round-8 analytics closers: the remaining ops an analyst runs
  * weekly over the same 100 TB events table — gaps-and-islands streak
  * detection (the consecutive-run window idiom), a data-freshness
  * monitor (is any series stale?), and a Welch two-sample t-test
  * computed from exact integer moments (A/B readout without trusting
  * either engine's variance kernel). All with exact DuckDB oracles.
  */
object Pipeline9 extends graft.QueryModule {

  /** Longest consecutive-day activity STREAK per user — the classic
    * gaps-and-islands window: distinct (user, day) activity frame
    * FIRST (support-sized), island key = day minus row_number days
    * (consecutive days share it), runs = one hash agg over islands,
    * best run per user by (length desc, start asc) — deterministic.
    * Output: (user_id, n_active_days, best_streak, streak_start).
    *
    * 100 TB: the only full-data pass is the distinct projection; both
    * windows partition by user over the support-sized activity/run
    * frames — no global sort, state bounded by a user's active-day
    * count. */
  def winStreak(s: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val runs = act
      .withColumn("isl", expr("date_sub(d, row_number() over " +
        "(partition by user_id order by d))"))
      .groupBy("user_id", "isl")
      .agg(count(lit(1)).as("len"), min("d").as("start"))
    val w2 = Window.partitionBy(col("user_id"))
      .orderBy(col("len").desc, col("start").asc)
    val totals = act.groupBy("user_id")
      .agg(count(lit(1)).as("n_active_days"))
    runs.withColumn("rk", row_number().over(w2)).where(col("rk") === 1)
      .join(totals, "user_id")
      .select(col("user_id"), col("n_active_days"),
        col("len").as("best_streak"), col("start").as("streak_start"))
      .orderBy("user_id")
  }

  /** Data-FRESHNESS monitor: per event series, event count, last seen
    * ts, and integer minutes behind the newest event anywhere — the
    * staleness gate run before trusting a day's ingest. One hash agg
    * plus a 1-row broadcast of the global max. */
  def profileFreshness(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
    val top = per.agg(max(col("last_ts")).as("max_ts"))
    per.crossJoin(broadcast(top))
      .select(col("event_type"), col("n_events"), col("last_ts"),
        expr("(unix_micros(max_ts) - unix_micros(last_ts))" +
          " div 60000000").as("behind_min"))
      .orderBy("event_type")
  }

  /** Welch two-sample t-test between purchase and click values — the
    * A/B readout, computed ENTIRELY from exact integer moments
    * (n, Σcents, Σcents² per side) so neither engine's variance kernel
    * is trusted: the numerator n·Σx² − (Σx)² is formed in
    * decimal(38,0) (Spark) / HUGEINT (DuckDB) — exact to ~1e38, so
    * even n≈1e12 rows of 1e4-cent values (n·Σx² ≈ 1e32) stay exact,
    * where the old int64 form wrapped at ~30× sf0.1 — then the
    * IDENTICAL integer casts to double in both engines and divides
    * sequentially by n, (n−1), n as doubles (never forming the
    * int64-overflowable n·(n−1) product). t = (m1 − m2)/√(s1²/n1 +
    * s2²/n2) as one fixed dag of IEEE-exact double ops, rounded 6 dp.
    * Means in dollars. One filtered scan, two 1-row agg branches,
    * broadcast cross. */
  def mlAbTtest(s: SparkSession, dir: String): DataFrame = {
    def side(tpe: String, tag: String) =
      Tables.events(s, dir).where(col("event_type") === tpe)
        .select(expr("cast(round(value * 100) as bigint)").as("c"))
        .agg(count(lit(1)).as(s"n$tag"), sum("c").as(s"s$tag"),
          // Σc² in decimal: at ~1e12 rows of 1e4-cent values the int64
          // sum (~1e20) would wrap; decimal(38,0) is exact to ~1e38.
          sum(expr("cast(c as decimal(19,0)) * c")).as(s"ss$tag"))
    def varTerm(tag: String): String =
      s"cast(cast(n$tag as decimal(38,0)) * ss$tag" +
        s" - cast(s$tag as decimal(38,0)) * s$tag as double)" +
        s" / n$tag / (n$tag - 1) / n$tag"
    side("purchase", "1").crossJoin(broadcast(side("click", "2")))
      .select(col("n1"), col("n2"),
        expr("round(cast(s1 as double) / n1 / 100, 6)").as("mean_1"),
        expr("round(cast(s2 as double) / n2 / 100, 6)").as("mean_2"),
        expr("round((cast(s1 as double) / n1 - cast(s2 as double) / n2)" +
          s" / sqrt(${varTerm("1")} + ${varTerm("2")}), 6)").as("t_stat"))
  }

  /** Event-sequence PATTERN detection — the MATCH_RECOGNIZE gap:
    * find every user position where click → error → purchase occur as
    * three CONSECUTIVE events (by (ts, event_id) order), reporting
    * the match span. A lead-chain over one per-user window: Spark
    * evaluates all three lookaheads in a single window pass, so the
    * cost is one key shuffle + per-user sort regardless of pattern
    * length — the standard Spark encoding of fixed-length
    * MATCH_RECOGNIZE patterns. */
  def winPattern(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .withColumn("end_id", lead(col("event_id"), 2).over(w))
      .withColumn("end_ts", lead(col("ts"), 2).over(w))
      .where(col("event_type") === "click" && col("t1") === "error" &&
        col("t2") === "purchase")
      .select(col("user_id"), col("event_id").as("start_id"),
        col("ts").as("start_ts"), col("end_id"),
        (expr("unix_micros(end_ts)") - expr("unix_micros(ts)"))
          .as("span_us"))
      .orderBy("user_id", "start_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_streak" -> winStreak,
    "q_win_pattern" -> winPattern,
    "q_profile_freshness" -> profileFreshness,
    "q_ml_ab_ttest" -> mlAbTtest)

  def oracleSql: Map[String, String] = Map(
    "q_win_streak" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |isl AS (
        |  SELECT user_id, d,
        |    d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY d) AS INTEGER) AS isl
        |  FROM act),
        |runs AS (
        |  SELECT user_id, isl, CAST(COUNT(*) AS BIGINT) AS len,
        |         MIN(d) AS start
        |  FROM isl GROUP BY user_id, isl),
        |best AS (
        |  SELECT user_id, len, start,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, start ASC) AS rk
        |  FROM runs),
        |tot AS (SELECT user_id, CAST(COUNT(*) AS BIGINT)
        |          AS n_active_days FROM act GROUP BY user_id)
        |SELECT b.user_id, t.n_active_days, b.len AS best_streak,
        |       b.start AS streak_start
        |FROM best b JOIN tot t USING (user_id)
        |WHERE b.rk = 1 ORDER BY b.user_id""".stripMargin,
    "q_win_pattern" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2,
        |    lead(event_id, 2) OVER w AS end_id,
        |    lead(ts, 2) OVER w AS end_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS start_id, ts AS start_ts, end_id,
        |  CAST(epoch_us(end_ts) - epoch_us(ts) AS BIGINT) AS span_us
        |FROM seq
        |WHERE event_type = 'click' AND t1 = 'error' AND t2 = 'purchase'
        |ORDER BY user_id, start_id""".stripMargin,
    "q_profile_freshness" ->
      """WITH per AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |         MAX(ts) AS last_ts
        |  FROM events GROUP BY event_type),
        |top AS (SELECT MAX(last_ts) AS max_ts FROM per)
        |SELECT event_type, n_events, last_ts,
        |  CAST((epoch_us(max_ts) - epoch_us(last_ts)) // 60000000
        |    AS BIGINT) AS behind_min
        |FROM per CROSS JOIN top
        |ORDER BY event_type""".stripMargin,
    "q_ml_ab_ttest" ->
      """WITH a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n1,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s1,
        |    SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT)
        |           * CAST(ROUND(value * 100) AS BIGINT)) AS ss1
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n2,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s2,
        |    SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT)
        |           * CAST(ROUND(value * 100) AS BIGINT)) AS ss2
        |  FROM events WHERE event_type = 'click')
        |SELECT n1, n2,
        |  ROUND(CAST(s1 AS DOUBLE) / n1 / 100, 6) AS mean_1,
        |  ROUND(CAST(s2 AS DOUBLE) / n2 / 100, 6) AS mean_2,
        |  ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        |    / sqrt(
        |      CAST(CAST(n1 AS HUGEINT) * ss1
        |           - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
        |        / n1 / (n1 - 1) / n1
        |    + CAST(CAST(n2 AS HUGEINT) * ss2
        |           - CAST(s2 AS HUGEINT) * s2 AS DOUBLE)
        |        / n2 / (n2 - 1) / n2
        |    ), 6) AS t_stat
        |FROM a CROSS JOIN b""".stripMargin)
}
