package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** §2.77 round-15 batch 50 — seasonality closers: the day-of-week ×
  * hour activity matrix (the load-profile heatmap behind every
  * capacity plan) and autocorrelation-based PERIOD DETECTION (argmax
  * ACF lag — "what cycle does this series actually have", decided by
  * EXACT integer moment comparison so the winner can never flip on
  * float noise).
  */
object Pipeline82 extends graft.QueryModule {

  /** DOW × HOUR ACTIVITY MATRIX — events and exact value cents per
    * (ISO weekday, hour-of-day) cell with each cell's ppm share of
    * the corpus: the 7×24 load profile capacity planning reads
    * (q_events_seasonality profiles weekdays only). dayofweek is
    * rendered through the engine-neutral epoch-day mod 7 arithmetic
    * (1970-01-01 was a Thursday → (epoch_day + 3) % 7 + 1 gives
    * ISO Mon=1) — never a locale-dependent extract.
    *
    * 100 TB: one map-side-partial hash agg to ≤168 cells; the share
    * attach broadcasts the 1-row total. */
  def eventsDowHour(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .select(
        expr("(datediff(cast(ts as date), date '1970-01-01') + 3)" +
          " % 7 + 1").cast("long").as("iso_dow"),
        hour(col("ts")).cast("long").as("hr"),
        expr("cast(round(value * 100) as bigint)").as("c"))
      .groupBy("iso_dow", "hr")
      .agg(count(lit(1)).as("n"), sum("c").as("cents"))
    val tot = cells.agg(sum("n").as("t"))
    cells.crossJoin(broadcast(tot))
      .select(col("iso_dow"), col("hr"), col("n"), col("cents"),
        expr("(1000000 * n) div t").as("share_ppm"))
      .orderBy("iso_dow", "hr")
  }

  /** PERIOD DETECTION — the dominant cycle of the HOURLY per-type
    * count series as the argmax autocorrelation lag over 2..48
    * hours: centered values n·v − S are exact integers, the lag
    * moments c_k = Σ cv·cv_{−k} share the c0 denominator, so the
    * winner is an EXACT integer argmax (max c_k, ties to the
    * smaller lag) — float noise can never flip the detected period.
    * Emits the winning lag, its ACF value, and the runner-up for
    * contrast (a 24-hour fixture cycle should win).
    *
    * 100 TB: hourly agg full pass; all 47 lag moments come from ONE
    * rank-indexed self equi-join on the calendar-bounded frame (a
    * 47-lag window tower measured ~3x the CPU in codegen alone);
    * the argmax ranks the ≤47-row lag frame per type. */
  def timePeriodDetect(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type").as("t"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val stats = hourly.groupBy("t")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val cent = hourly.join(broadcast(stats), "t")
      .select(col("t"), col("h"),
        expr("cast(n * x - sx as decimal(38,0))").as("cv"))
    // ONE rank-indexed self equi-join computes all 47 lag moments
    // (a 47-lag window tower costs ~10 CPU-s of codegen on this
    // support frame; the exploded join is one hash join on
    // (t, rn - lag) over <= 47x the calendar-bounded frame)
    val idx = cent.withColumn("rn", row_number().over(
      Window.partitionBy("t").orderBy("h")))
      .localCheckpoint(true)
    val c0 = idx.groupBy("t")
      .agg(sum(expr("cv * cv")).as("c0"))
    val probes = idx
      .withColumn("lag", explode(expr("sequence(2L, 48L)")))
      .select(col("t"), col("lag"), (col("rn") - col("lag")).as("rn"),
        col("cv").as("cv2"))
    val longf = idx.join(probes, Seq("t", "rn"))
      .groupBy("t", "lag")
      .agg(sum(expr("cv * cv2")).as("ck"))
      .join(broadcast(c0), "t")
    longf
      .withColumn("rn", row_number().over(Window.partitionBy("t")
        .orderBy(col("ck").desc, col("lag").asc)))
      .where(col("rn") <= 2)
      .groupBy("t")
      .agg(min(when(col("rn") === 1, col("lag"))).as("period_hours"),
        max(when(col("rn") === 1,
          round(expr("cast(ck as double) / cast(c0 as double)"), 6)))
          .as("acf_peak"),
        min(when(col("rn") === 2, col("lag"))).as("runner_up"),
        max(when(col("rn") === 2,
          round(expr("cast(ck as double) / cast(c0 as double)"), 6)))
          .as("acf_runner_up"))
      .select(col("t").as("event_type"), col("period_hours"),
        col("acf_peak"), col("runner_up"), col("acf_runner_up"))
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_dow_hour" -> eventsDowHour,
    "q_time_period_detect" -> timePeriodDetect)

  def oracleSql: Map[String, String] = Map(
    "q_events_dow_hour" ->
      """WITH cells AS (SELECT
        |    (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      + 3) % 7 + 1 AS iso_dow,
        |    CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells)
        |SELECT CAST(iso_dow AS BIGINT) AS iso_dow, hr, n, cents,
        |  CAST((1000000 * n) // t AS BIGINT) AS share_ppm
        |FROM cells CROSS JOIN t ORDER BY iso_dow, hr""".stripMargin,
    "q_time_period_detect" ->
      ("""WITH hourly AS (SELECT event_type AS t,
        |    date_trunc('hour', ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx FROM hourly GROUP BY t),
        |cent AS (SELECT hourly.t, h,
        |    CAST(st.n * x - st.sx AS HUGEINT) AS cv
        |  FROM hourly JOIN st ON st.t = hourly.t),
        |lagged AS (SELECT t, cv,
        |""".stripMargin +
        (2 to 48).map(k =>
          s"    lag(cv, $k) OVER (PARTITION BY t ORDER BY h) AS l$k")
          .mkString(",\n") +
        """
        |  FROM cent),
        |m AS (SELECT t, SUM(cv * cv) AS c0,
        |""".stripMargin +
        (2 to 48).map(k => s"    SUM(cv * l$k) AS c$k").mkString(",\n") +
        """
        |  FROM lagged GROUP BY t),
        |longf AS (SELECT t, c0, lag, ck FROM (
        |    SELECT t, c0, unnest(range(2, 49)) AS lag,
        |      unnest([""".stripMargin +
        (2 to 48).map(k => s"c$k").mkString(", ") +
        """]) AS ck FROM m) WHERE ck IS NOT NULL),
        |rk AS (SELECT t, lag, ck, c0,
        |    row_number() OVER (PARTITION BY t
        |      ORDER BY ck DESC, lag ASC) AS rn
        |  FROM longf)
        |SELECT t AS event_type,
        |  CAST(MIN(CASE WHEN rn = 1 THEN lag END) AS BIGINT)
        |    AS period_hours,
        |  MAX(CASE WHEN rn = 1 THEN
        |    ROUND(CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE), 6) END)
        |    AS acf_peak,
        |  CAST(MIN(CASE WHEN rn = 2 THEN lag END) AS BIGINT)
        |    AS runner_up,
        |  MAX(CASE WHEN rn = 2 THEN
        |    ROUND(CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE), 6) END)
        |    AS acf_runner_up
        |FROM rk WHERE rn <= 2 GROUP BY t
        |ORDER BY event_type""".stripMargin))
}
