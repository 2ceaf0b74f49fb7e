package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64k round-14 batch 29 — product-analytics closers: time-to-
  * convert (the LATENCY of the funnel q_events_funnel counts),
  * audience overlap (pairwise Jaccard between event-type audiences),
  * and week-over-week growth (the reporting twin of q_time_sma /
  * q_time_ewma's smoothers).
  */
object Pipeline61 extends graft.QueryModule {

  /** TIME TO CONVERT: per user, seconds from FIRST click to FIRST
    * purchase (only counting purchases after the click), with the
    * converter share and exact p50/p90 of the latency distribution —
    * the "how long does the funnel take" readout q_events_funnel's
    * stage counts and q_events_attribution's credit split don't give.
    * Second-resolution deltas are exact integers on both engines
    * (floor-of-epoch difference == boundary-crossing count).
    *
    * 100 TB: one (user, type) min-ts hash agg; the percentile runs on
    * the converters-only user frame with mergeable partials. */
  def eventsTimeToConvert(s: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(s, dir)
      .where(col("event_type").isin("click", "purchase"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "click", col("ts"))).as("c"),
        min(when(col("event_type") === "purchase", col("ts"))).as("p"))
      .where(col("c").isNotNull)
      .select(col("user_id"),
        when(col("p") >= col("c"),
          expr("cast(p as long) - cast(c as long)")).as("delta_s"))
    firsts.agg(
        count(lit(1)).as("n_clicked"),
        sum(expr("if(delta_s is not null, 1L, 0L)")).as("n_converted"),
        expr("(1000000 * sum(if(delta_s is not null, 1L, 0L)))" +
          " div count(1)").as("conversion_ppm"),
        round(expr("percentile(delta_s, 0.5D)"), 4).as("p50_seconds"),
        round(expr("percentile(delta_s, 0.9D)"), 4).as("p90_seconds"))
  }

  /** AUDIENCE OVERLAP: for every ordered event-type pair, the number
    * of users doing both, the union size, and the Jaccard similarity
    * of the two audiences — the "are clickers also buyers" matrix a
    * growth team reads weekly. Pure integer counting from ONE
    * distinct (user, type) frame; the pair join is an EQUI join on
    * user_id (the t2 > t1 predicate is a post-join filter, not a
    * theta join).
    *
    * 100 TB: one distinct pass; the user-keyed self-join is
    * co-partitioned; per-type sizes broadcast onto the <=|types|^2
    * pair frame. */
  def eventsAudienceOverlap(s: SparkSession, dir: String): DataFrame = {
    val inc = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint(true)
    val sizes = inc.groupBy("event_type").agg(count(lit(1)).as("sz"))
    val inter = inc.select(col("user_id"), col("event_type").as("ta"))
      .join(inc.select(col("user_id"), col("event_type").as("tb")),
        "user_id")
      .where(col("tb") > col("ta"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("ta"),
        col("sz").as("sza"))), "ta")
      .join(broadcast(sizes.select(col("event_type").as("tb"),
        col("sz").as("szb"))), "tb")
      .selectExpr("ta as type_a", "tb as type_b", "inter",
        "sza + szb - inter as union_sz",
        "round(cast(inter as double) / (sza + szb - inter), 6)" +
          " as jaccard")
      .orderBy("type_a", "type_b")
  }

  /** WEEK-OVER-WEEK GROWTH: weekly revenue cents per event type
    * (ISO-Monday week on both engines) with the previous week and the
    * growth rate in ppm — the report row q_time_sma_crossover's
    * signals and q_time_ewma's smoother sit on top of. Revenue stays
    * exact integer cents; the ratio is one double division (no
    * integer div — its truncation direction differs across engines
    * for negative growth).
    *
    * 100 TB: one (type, week) hash agg; the lag window runs on the
    * calendar-bounded (type x week) frame partitioned by type. */
  def timeWowGrowth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekly = Tables.events(s, dir)
      .select(col("event_type"),
        expr("cast(date_trunc('week', ts) as date)").as("week"),
        expr("cast(round(value * 100) as bigint)").as("v"))
      .groupBy("event_type", "week")
      .agg(sum("v").as("rev_cents"))
    val w = Window.partitionBy("event_type").orderBy("week")
    weekly
      .withColumn("prev_cents", lag("rev_cents", 1).over(w))
      .selectExpr("event_type", "week", "rev_cents", "prev_cents",
        "round((rev_cents - prev_cents) * 1000000.0D / prev_cents, 4)" +
          " as growth_ppm")
      .orderBy("event_type", "week")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_time_to_convert" -> eventsTimeToConvert,
    "q_events_audience_overlap" -> eventsAudienceOverlap,
    "q_time_wow_growth" -> timeWowGrowth)

  def oracleSql: Map[String, String] = Map(
    "q_events_time_to_convert" ->
      """WITH firsts AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS c,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY user_id),
        |d AS (SELECT user_id,
        |    CASE WHEN p >= c
        |      THEN date_diff('second', c, p) END AS delta_s
        |  FROM firsts WHERE c IS NOT NULL)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_clicked,
        |  CAST(SUM(CASE WHEN delta_s IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_converted,
        |  (1000000 * CAST(SUM(CASE WHEN delta_s IS NOT NULL THEN 1
        |    ELSE 0 END) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
        |    AS conversion_ppm,
        |  ROUND(quantile_cont(delta_s, 0.5), 4) AS p50_seconds,
        |  ROUND(quantile_cont(delta_s, 0.9), 4) AS p90_seconds
        |FROM d""".stripMargin,
    "q_events_audience_overlap" ->
      """WITH inc AS (SELECT DISTINCT user_id, event_type FROM events),
        |sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM inc GROUP BY event_type),
        |inter AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM inc a JOIN inc b ON a.user_id = b.user_id
        |  WHERE b.event_type > a.event_type
        |  GROUP BY ta, tb)
        |SELECT ta AS type_a, tb AS type_b, inter,
        |  sa.sz + sb.sz - inter AS union_sz,
        |  ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6)
        |    AS jaccard
        |FROM inter JOIN sizes sa ON sa.event_type = ta
        |JOIN sizes sb ON sb.event_type = tb
        |ORDER BY type_a, type_b""".stripMargin,
    "q_time_wow_growth" ->
      """WITH weekly AS (SELECT event_type,
        |    CAST(date_trunc('week', ts) AS DATE) AS week,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS rev_cents
        |  FROM events GROUP BY event_type, week)
        |SELECT event_type, week, rev_cents,
        |  lag(rev_cents, 1) OVER (PARTITION BY event_type
        |    ORDER BY week) AS prev_cents,
        |  ROUND((rev_cents - lag(rev_cents, 1) OVER (
        |    PARTITION BY event_type ORDER BY week)) * 1000000.0
        |    / lag(rev_cents, 1) OVER (PARTITION BY event_type
        |    ORDER BY week), 4) AS growth_ppm
        |FROM weekly ORDER BY event_type, week""".stripMargin)
}
