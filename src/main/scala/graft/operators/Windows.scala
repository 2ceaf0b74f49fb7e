package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** §2.5 window functions (SURVEY.md).
  *
  * Scale notes: a window is one shuffle on the partition key plus a
  * per-partition sort — the same cost class as groupBy. Every window
  * here partitions on a real key (nation / customer / user / supplier)
  * so at 100 TB the work distributes; none uses a global (empty)
  * partition, which would funnel all rows to one task.
  */
object Windows extends graft.QueryModule {
  import Det._

  /** Ranking family over a provably-unique order (acctbal, custkey).
    * percent_rank/cume_dist are emitted as EXACT ppm integers computed
    * from (rn, partition count) — rounding the builtins' double output
    * hits exact-half boundaries (k/n with n=600 at sf0.1 produced a
    * 1-ulp Spark/DuckDB divergence; §2.0.2). With a unique order,
    * percent_rank = (rn-1)/(n-1) and cume_dist = rn/n identically. */
  def rankFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val wAll = Window.partitionBy(col("c_nationkey"))
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        count(lit(1)).over(wAll).as("n"))
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        col("rn"), col("rnk"), col("drnk"), col("quartile"),
        // n=1 guard: pct_rank of a single-row partition is 0 by
        // definition; unguarded, Spark's div returns NULL and DuckDB's
        // // errors outright (ADVICE.md round 1).
        expr("CASE WHEN n > 1 THEN (1000000 * (rn - 1)) div (n - 1) " +
          "ELSE 0 END").as("pct_rank_ppm"),
        expr("(1000000 * rn) div n").as("cume_ppm"))
      .orderBy("c_nationkey", "rn")
  }

  /** lag/lead per user event stream (µs gaps stay exact integers). */
  def lagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy("event_id")
  }

  /** ROWS frames: running total + 7-row moving average per customer. */
  def frameRows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w7 = w.rowsBetween(-6, 0)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec2("o_totalprice")).over(run)
          .cast("double").as("run_total"),
        round(sum(dec2("o_totalprice")).over(w7).cast("double") /
          count(lit(1)).over(w7), 4).as("avg7"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE frame: 30-day trailing sum per customer over epoch-day
    * numbers (dodges interval-type mismatches across engines, §2.5). */
  def frameRange(s: SparkSession, dir: String): DataFrame = {
    val dayNo = datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_no"))
      .rangeBetween(-29, 0)
    Tables.orders(s, dir)
      .withColumn("day_no", dayNo)
      .select(col("o_custkey"), col("o_orderkey"), col("day_no"),
        sum(dec2("o_totalprice")).over(w)
          .cast("double").as("sum_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Top-3 parts by revenue per supplier (rank-filter pattern). The
    * rank orders on the EXACT decimal revenue; only the projected
    * column is cast to double (output-type rule, see Aggregates). */
  def topkGroup(s: SparkSession, dir: String): DataFrame = {
    // Plain declarative shape — no hand-pinned repartition. Three
    // rounds of hand-tuning this query (r3 repartition-after-agg, r5
    // repartition-before-agg) each LOST to the naive plan once
    // measured in a quiet JVM with fair JIT ordering (Scratch lab,
    // r6): naive ~3.1 CPU-s / 2.4 s wall steady vs 10-26 CPU-s for
    // repartition-before-agg (the full-width decimal partial+final
    // agg stacked post-shuffle is the burner) and ~4.8 CPU-s for
    // repartition-after-agg. What the naive plan gets right, and the
    // pinned ones fought: (1) map-side partial agg runs on the
    // columnar scan; (2) the optimizer inserts WindowGroupLimit
    // PARTIAL below the window exchange — each map task forwards at
    // most 3 rows per supplier into the shuffle, which at 100 TB is
    // the difference between shuffling the whole agg output and
    // shuffling ~top-3-per-group; (3) AQE sizes the post-shuffle
    // partitions. PlanShapeSpec pins the Partial-below-exchange
    // topology so a regression rebreaks loudly (VERDICT r5 #1).
    val rev = Tables.lineitem(s, dir)
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(revenue).as("rev_dec"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("rev_dec").desc, col("l_partkey").asc)
    rev.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("l_suppkey"), col("l_partkey"),
        col("rev_dec").cast("double").as("part_revenue"), col("rn"))
      .orderBy("l_suppkey", "rn")
  }

  /** Gap-based batch sessionization — the batch twin of
    * q_stream_session's `session_window` (30-min gap): a new session
    * starts where the gap to the previous event exceeds the threshold;
    * session id = running count of session starts. The canonical
    * two-window stack (lag, then running sum) + one agg, all
    * partitioned by user_id — at 100 TB each user's event stream sorts
    * within its partition, no global sort, and the agg reuses the
    * window's partitioning (no second shuffle). */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeEvents(Tables.events(s, dir))

  /** Parametric form over any (user_id, event_id, ts, value) frame —
    * split out so the exact-gap boundary rule is unit-testable with
    * synthetic events (the fixture happens to contain no exact-30-min
    * gap, so the batch==stream equality test alone cannot pin it). */
  private[graft] def sessionizeEvents(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 30L * 60 * 1000 * 1000
    events
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wOrd)))
      // STRICT >: session_window MERGES an event arriving exactly
      // `gap` after its predecessor (empirically pinned by the
      // synthetic exact-gap test in ExtraSpec — Spark's merge
      // condition is inclusive of the window end), so the batch twin
      // splits only when the gap EXCEEDS the threshold. An r6 review
      // pass argued for >= from the q_stream_session oracle's
      // (then-untested) boundary; the synthetic test proved the
      // opposite and both oracles now use > as well.
      .withColumn("new_s",
        when(col("gap_us").isNull || col("gap_us") > lit(gapUs), 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_s")).over(wRun))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(dec2("value")).cast("double").as("sum_value"))
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
      .orderBy("user_id", "session_seq")
  }

  /** first_value / last_value with an explicit full frame (the default
    * frame stops at CURRENT ROW — a classic silent-wrong-answer). */
  def firstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        count(lit(1)).over(w).as("order_cnt"))
      .distinct()
      .orderBy("o_custkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank" -> rankFamily,
    "q_win_lag_lead" -> lagLead,
    "q_win_frame_rows" -> frameRows,
    "q_win_frame_range" -> frameRange,
    "q_win_topk_group" -> topkGroup,
    "q_win_sessionize" -> sessionize,
    "q_win_first_last" -> firstLast)

  def oracleSql: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk, drnk, quartile,
        |  CASE WHEN n > 1 THEN (1000000 * (rn - 1)) // (n - 1) ELSE 0 END AS pct_rank_ppm,
        |  (1000000 * rn) // n AS cume_ppm
        |FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
        |    DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile,
        |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC))
        |ORDER BY c_nationkey, rn""".stripMargin,
    "q_win_lag_lead" ->
      """SELECT event_id, user_id,
        |  epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS gap_us,
        |  LEAD(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "q_win_frame_rows" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w7 AS DOUBLE) /
        |    COUNT(*) OVER w7, 4) AS avg7
        |FROM orders
        |WINDOW w7 AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_frame_range" ->
      """SELECT o_custkey, o_orderkey,
        |  date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_no,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_custkey
        |     ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |     RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_topk_group" ->
      """SELECT l_suppkey, l_partkey, CAST(rev_dec AS DOUBLE) AS part_revenue, rn FROM (
        |  SELECT l_suppkey, l_partkey, rev_dec,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY rev_dec DESC, l_partkey ASC) AS rn
        |  FROM (
        |    SELECT l_suppkey, l_partkey,
        |      SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rev_dec
        |    FROM lineitem GROUP BY l_suppkey, l_partkey)
        |) WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "q_win_sessionize" ->
      """SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
        |FROM (
        |  SELECT user_id, ts, value,
        |    SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_seq
        |  FROM (
        |    SELECT user_id, event_id, ts, value,
        |      epoch_us(ts) - epoch_us(LAG(ts, 1)
        |        OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |        AS gap_us
        |    FROM events))
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q_win_first_last" ->
      """SELECT DISTINCT o_custkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  LAST_VALUE(o_orderkey) OVER w AS last_order,
        |  COUNT(*) OVER w AS order_cnt
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey""".stripMargin)
}
