package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64s round-14 batch 37 — distribution-shape and evaluation-depth
  * closers: the Hill tail-index estimator (how heavy is the money
  * tail — the extreme-value cell q_agg_skewkurt's moments blur), the
  * Murphy decomposition of the Brier score (WHY is the forecaster
  * good: reliability vs resolution), and the Markov entropy rate (how
  * predictable is the event stream the q_events_markov matrix
  * describes).
  */
object Pipeline69 extends graft.QueryModule {

  /** HILL TAIL-INDEX of order totals: alpha = k / sum ln(x_i /
    * x_(k+1)) over the k = 100 largest values — the Pareto-tail
    * heaviness readout moments can't give (they diverge exactly when
    * it matters). The top-(k+1) is a TakeOrdered (never a global
    * sort); the k log-ratios fold IN SORTED ORDER over the collected
    * 101-value array (the levene determinism idiom) — x_(k+1) is the
    * array's min, whose own ratio term is ln(1) = 0.
    *
    * 100 TB: TakeOrdered(k+1) is a per-partition heap + one tiny
    * merge; the fold is constant work. */
  def aggTailIndex(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .select(expr("cast(round(o_totalprice * 100) as bigint)")
        .as("cents"))
      .orderBy(col("cents").desc)
      .limit(101)
      .agg(min("cents").as("xmin"),
        expr("array_sort(collect_list(cents))").as("l"))
      .selectExpr("100L as k", "xmin as xk1_cents",
        "round(100D / aggregate(l, 0D," +
          " (a, x) -> a + ln(cast(x as double) / xmin)), 6)" +
          " as hill_alpha")
  }

  /** MURPHY DECOMPOSITION of the Brier score over 10 probability
    * bins: Brier = REL − RES + UNC, where reliability punishes
    * miscalibration, resolution rewards separating the classes, and
    * uncertainty is the base-rate floor — WHY the q_ml_brier_score
    * number is what it is. Bin sums stay exact integers (milli-prob
    * units, the q_ml_brier_score scale); the three bin folds run
    * bin-ordered (levene idiom); the identity REL − RES + UNC ==
    * Brier is spec-pinned.
    *
    * 100 TB: one scored-frame pass to 10 bins; folds on the 10-row
    * frame. */
  def mlBrierDecomposition(s: SparkSession, dir: String): DataFrame = {
    val scored = Pipeline12.scored(s, dir)
      .select((col("score") + 8128L).as("shift"), col("pos"))
      .select(expr("(shift * 1000) div 16256").as("p_milli"),
        when(col("pos"), 1L).otherwise(0L).as("y"))
      .select(col("p_milli"), col("y"),
        least(expr("p_milli div 100"), lit(9L)).as("bin"))
    scored.groupBy("bin")
      .agg(count(lit(1)).as("nk"), sum("p_milli").as("sp"),
        sum("y").as("sy"))
      .agg(sum("nk").as("n"), sum("sy").as("so"),
        expr("array_sort(collect_list(struct(bin, nk, sp, sy)))")
          .as("l"))
      .selectExpr("n", "so",
        "aggregate(l, 0D, (a, x) -> a + x.nk *" +
          " (cast(x.sp as double) / x.nk / 1000D" +
          " - cast(x.sy as double) / x.nk)" +
          " * (cast(x.sp as double) / x.nk / 1000D" +
          " - cast(x.sy as double) / x.nk)) as rel_n",
        "aggregate(l, 0D, (a, x) -> a + x.nk *" +
          " (cast(x.sy as double) / x.nk" +
          " - cast(so as double) / n)" +
          " * (cast(x.sy as double) / x.nk" +
          " - cast(so as double) / n)) as res_n")
      .selectExpr("n",
        "round(rel_n / n, 6) as reliability",
        "round(res_n / n, 6) as resolution",
        "round(cast(so as double) / n" +
          " * (1D - cast(so as double) / n), 6) as uncertainty",
        "round(rel_n / n - res_n / n + cast(so as double) / n" +
          " * (1D - cast(so as double) / n), 6) as brier")
  }

  /** MARKOV ENTROPY RATE of the event stream: H = −Σ_st (n_st/N)
    * ln(n_st/n_s) over the empirical transition cells — how
    * PREDICTABLE the stream q_events_markov models actually is, with
    * the efficiency 1 − H/ln(k) against the uniform ceiling (the
    * readout q_events_markov_eval's top-1 accuracy only samples).
    * Counts exact; the ≤\|types\|² cell fold runs (from, to)-ordered.
    *
    * 100 TB: one user-partitioned lead window to transition counts;
    * the fold is on the cell frame. */
  def eventsEntropyRate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val cells = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("f"))
      .withColumn("t", lead("f", 1).over(w))
      .where(col("t").isNotNull)
      .groupBy("f", "t").agg(count(lit(1)).as("n"))
    val fromTot = cells.groupBy("f").agg(sum("n").as("nf"))
    cells.join(broadcast(fromTot), "f")
      .agg(sum("n").as("nn"),
        countDistinct("f").as("n_states"),
        expr("array_sort(collect_list(struct(f, t, n, nf)))").as("l"))
      .selectExpr("nn as n_transitions", "n_states",
        "aggregate(l, 0D, (a, x) -> a - cast(x.n as double)" +
          " * ln(cast(x.n as double) / x.nf)) / nn as h")
      .selectExpr("n_transitions", "n_states",
        "round(h, 6) as entropy_rate_nats",
        "round(ln(cast(n_states as double)), 6) as max_entropy_nats",
        "round(1D - h / ln(cast(n_states as double)), 6)" +
          " as predictability")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_tail_index" -> aggTailIndex,
    "q_ml_brier_decomposition" -> mlBrierDecomposition,
    "q_events_entropy_rate" -> eventsEntropyRate)

  def oracleSql: Map[String, String] = Map(
    "q_agg_tail_index" ->
      """WITH top AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |    AS cents
        |  FROM orders ORDER BY cents DESC LIMIT 101),
        |mn AS (SELECT CAST(MIN(cents) AS BIGINT) AS xmin FROM top),
        |m AS (SELECT xmin,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(ln(CAST(cents AS DOUBLE) / xmin) ORDER BY cents)),
        |      (a, b) -> a + b) AS lsum
        |  FROM top CROSS JOIN mn GROUP BY xmin)
        |SELECT CAST(100 AS BIGINT) AS k, xmin AS xk1_cents,
        |  ROUND(100.0 / lsum, 6) AS hill_alpha
        |FROM m""".stripMargin,
    "q_ml_brier_decomposition" ->
      """WITH sc AS (
        |  SELECT (label >= 5) AS pos,
        |    CAST(list_sum(list_transform(embedding::DOUBLE[],
        |      x -> CAST(floor(x * 127.0) AS BIGINT))) AS BIGINT)
        |      AS score
        |  FROM embeddings),
        |p AS (SELECT ((score + 8128) * 1000) // 16256 AS p_milli,
        |    CASE WHEN pos THEN 1 ELSE 0 END AS y FROM sc),
        |b AS (SELECT least(p_milli // 100, 9) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS nk,
        |    CAST(SUM(p_milli) AS BIGINT) AS sp,
        |    CAST(SUM(y) AS BIGINT) AS sy
        |  FROM p GROUP BY 1),
        |tot AS (SELECT CAST(SUM(nk) AS BIGINT) AS n,
        |    CAST(SUM(sy) AS BIGINT) AS so FROM b),
        |g AS (SELECT n, so,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(nk * (CAST(sp AS DOUBLE) / nk / 1000.0
        |        - CAST(sy AS DOUBLE) / nk)
        |        * (CAST(sp AS DOUBLE) / nk / 1000.0
        |        - CAST(sy AS DOUBLE) / nk) ORDER BY bin)),
        |      (a, b) -> a + b) AS rel_n,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(nk * (CAST(sy AS DOUBLE) / nk
        |        - CAST(so AS DOUBLE) / n)
        |        * (CAST(sy AS DOUBLE) / nk
        |        - CAST(so AS DOUBLE) / n)
        |        ORDER BY bin)), (a, b) -> a + b) AS res_n
        |  FROM b CROSS JOIN tot GROUP BY n, so)
        |SELECT n, ROUND(rel_n / n, 6) AS reliability,
        |  ROUND(res_n / n, 6) AS resolution,
        |  ROUND(CAST(so AS DOUBLE) / n
        |    * (1.0 - CAST(so AS DOUBLE) / n), 6) AS uncertainty,
        |  ROUND(rel_n / n - res_n / n + CAST(so AS DOUBLE) / n
        |    * (1.0 - CAST(so AS DOUBLE) / n), 6) AS brier
        |FROM g""".stripMargin,
    "q_events_entropy_rate" ->
      """WITH seq AS (SELECT event_type AS f,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS t
        |  FROM events),
        |cells AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE t IS NOT NULL GROUP BY f, t),
        |ft AS (SELECT f AS f2, CAST(SUM(n) AS BIGINT) AS nf
        |  FROM cells GROUP BY f),
        |g AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(COUNT(DISTINCT f) AS BIGINT) AS n_states,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(-CAST(n AS DOUBLE)
        |        * ln(CAST(n AS DOUBLE) / nf) ORDER BY f, t)),
        |      (a, b) -> a + b) AS hsum
        |  FROM cells JOIN ft ON cells.f = ft.f2)
        |SELECT nn AS n_transitions, n_states,
        |  ROUND(hsum / nn, 6) AS entropy_rate_nats,
        |  ROUND(ln(CAST(n_states AS DOUBLE)), 6) AS max_entropy_nats,
        |  ROUND(1.0 - (hsum / nn) / ln(CAST(n_states AS DOUBLE)), 6)
        |    AS predictability
        |FROM g""".stripMargin)
}
