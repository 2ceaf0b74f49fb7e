package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64q round-14 batch 35 — model-evaluation closers: the langid
  * CONFUSION MATRIX against the labeled lang column (how good is the
  * q_text_langid heuristic, not just what it says), MASE (forecast
  * error scaled by the naive benchmark — the scale-free accuracy
  * number MAPE breaks on near-zero series), and the power analysis /
  * required-sample-size planner that q_ml_ab_ttest consumers ask for
  * first.
  */
object Pipeline67 extends graft.QueryModule {

  /** LANGID CONFUSION MATRIX: the q_text_langid heuristic's
    * predictions crossed with the labeled documents.lang — per
    * (true, predicted) cell count plus the per-cell share of the true
    * class in ppm; the EVALUATION of the classifier the langid key
    * only runs. Pure composition: the stored heuristic output joins
    * the label column on doc_id.
    *
    * 100 TB: the langid pass itself (token-lexicon broadcast join +
    * per-doc agg) + one equi-join on doc_id + a <=36-cell agg. */
  def textLangidEval(s: SparkSession, dir: String): DataFrame = {
    val pred = ExtraText.textLangid(s, dir).select("doc_id", "pred")
    val truth = Tables.documents(s, dir).select("doc_id", "lang")
    val cells = truth.join(pred, "doc_id")
      .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
    val classTot = cells.groupBy("lang").agg(sum("n").as("ct"))
    cells.join(broadcast(classTot), "lang")
      .selectExpr("lang", "pred", "n",
        "(1000000 * n) div ct as share_ppm")
      .orderBy("lang", "pred")
  }

  /** MASE per event type: the seasonal-naive (lag-7) forecast's MAE
    * scaled by the one-step naive (lag-1) in-sample MAE — Hyndman's
    * scale-free forecast benchmark that stays defined where MAPE
    * divides by a near-zero actual. Absolute errors are exact
    * integer cents; the scaling keeps both means as (sum, count)
    * integer pairs so MASE = (S7·C1)/(S1·C7) is one double division
    * of exact products.
    *
    * 100 TB: daily agg only full pass; lag windows partitioned by
    * type on the calendar-bounded frame. */
  def timeMase(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type").as("t"), to_date(col("ts")).as("d"),
        expr("cast(round(value * 100) as bigint)").as("v"))
      .groupBy("t", "d").agg(sum("v").as("y"))
    val w = Window.partitionBy("t").orderBy("d")
    daily
      .select(col("t"),
        abs(col("y") - lag("y", 1).over(w)).as("e1"),
        abs(col("y") - lag("y", 7).over(w)).as("e7"))
      .groupBy("t")
      .agg(count(lit(1)).as("n_days"),
        sum("e1").as("s1"),
        sum(expr("if(e1 is not null, 1L, 0L)")).as("c1"),
        sum("e7").as("s7"),
        sum(expr("if(e7 is not null, 1L, 0L)")).as("c7"))
      .selectExpr("t as event_type", "n_days",
        "round(cast(s1 as double) / c1, 4) as mae_naive_cents",
        "round(cast(s7 as double) / c7, 4) as mae_snaive_cents",
        "round(cast(s7 * c1 as double) / cast(s1 * c7 as double), 6)" +
          " as mase")
      .orderBy("event_type")
  }

  /** POWER ANALYSIS / REQUIRED SAMPLE SIZE: how many click and view
    * events per arm would a future A/B test need to detect the
    * OBSERVED click-vs-view mean gap with power 0.80 at two-sided
    * alpha 0.05? n_per_arm = ceil((z_a + z_b)^2 (s1^2 + s2^2) / d^2)
    * from exact integer moments and the literal z pair — the
    * experiment-design step that comes BEFORE q_ml_ab_ttest /
    * q_ml_sprt ever run.
    *
    * 100 TB: one map-side-partial two-group moment agg. */
  def mlPowerAnalysis(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .where(col("event_type").isin("click", "view"))
      .select(col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"))
      .agg(
        max(when(col("g") === "click", col("n"))).as("n1"),
        max(when(col("g") === "click", col("sx"))).as("s1"),
        max(when(col("g") === "click", col("sxx"))).as("q1"),
        max(when(col("g") === "view", col("n"))).as("n2"),
        max(when(col("g") === "view", col("sx"))).as("s2"),
        max(when(col("g") === "view", col("sxx"))).as("q2"))
      .selectExpr("n1", "n2",
        "cast(s1 as double) / n1 - cast(s2 as double) / n2 as diff",
        "cast(n1 * q1 - s1 * s1 as double)" +
          " / (cast(n1 as double) * n1 * (n1 - 1)) * n1 as v1",
        "cast(n2 * q2 - s2 * s2 as double)" +
          " / (cast(n2 as double) * n2 * (n2 - 1)) * n2 as v2")
      .selectExpr("n1", "n2", "round(diff, 6) as diff_cents",
        "round(sqrt(v1), 6) as sd_click",
        "round(sqrt(v2), 6) as sd_view",
        "cast(ceil((1.959963984540054D + 0.8416212335729143D)" +
          " * (1.959963984540054D + 0.8416212335729143D)" +
          " * (v1 + v2) / (diff * diff)) as bigint) as n_per_arm")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_langid_eval" -> textLangidEval,
    "q_time_mase" -> timeMase,
    "q_ml_power_analysis" -> mlPowerAnalysis)

  def oracleSql: Map[String, String] = Map(
    "q_text_langid_eval" -> {
      val langid = ExtraText.oracleSql("q_text_langid")
      s"""WITH p AS ($langid),
        |cells AS (SELECT d.lang, p.pred,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents d JOIN p ON d.doc_id = p.doc_id
        |  GROUP BY 1, 2),
        |ct AS (SELECT lang AS lang2, CAST(SUM(n) AS BIGINT) AS ct
        |  FROM cells GROUP BY lang)
        |SELECT lang, pred, n, (1000000 * n) // ct AS share_ppm
        |FROM cells JOIN ct ON cells.lang = ct.lang2
        |ORDER BY lang, pred""".stripMargin
    },
    "q_time_mase" ->
      """WITH daily AS (SELECT event_type AS t, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1, 2),
        |e AS (SELECT t,
        |    abs(y - lag(y, 1) OVER w) AS e1,
        |    abs(y - lag(y, 7) OVER w) AS e7
        |  FROM daily WINDOW w AS (PARTITION BY t ORDER BY d)),
        |g AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(e1) AS BIGINT) AS s1,
        |    CAST(SUM(CASE WHEN e1 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(SUM(e7) AS BIGINT) AS s7,
        |    CAST(SUM(CASE WHEN e7 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c7
        |  FROM e GROUP BY t)
        |SELECT t AS event_type, n_days,
        |  ROUND(CAST(s1 AS DOUBLE) / c1, 4) AS mae_naive_cents,
        |  ROUND(CAST(s7 AS DOUBLE) / c7, 4) AS mae_snaive_cents,
        |  ROUND(CAST(s7 * c1 AS DOUBLE) / CAST(s1 * c7 AS DOUBLE), 6)
        |    AS mase
        |FROM g ORDER BY event_type""".stripMargin,
    "q_ml_power_analysis" ->
      """WITH g AS (SELECT event_type AS g,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sx,
        |    SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT)
        |      * CAST(ROUND(value * 100) AS BIGINT)) AS sxx
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |w AS (SELECT
        |    MAX(CASE WHEN g = 'click' THEN n END) AS n1,
        |    MAX(CASE WHEN g = 'click' THEN sx END) AS s1,
        |    MAX(CASE WHEN g = 'click' THEN sxx END) AS q1,
        |    MAX(CASE WHEN g = 'view' THEN n END) AS n2,
        |    MAX(CASE WHEN g = 'view' THEN sx END) AS s2,
        |    MAX(CASE WHEN g = 'view' THEN sxx END) AS q2
        |  FROM g),
        |f AS (SELECT n1, n2,
        |    CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS diff,
        |    CAST(n1 * q1 - s1 * s1 AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1)) * n1 AS v1,
        |    CAST(n2 * q2 - s2 * s2 AS DOUBLE)
        |      / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)) * n2 AS v2
        |  FROM w)
        |SELECT n1, n2, ROUND(diff, 6) AS diff_cents,
        |  ROUND(sqrt(v1), 6) AS sd_click,
        |  ROUND(sqrt(v2), 6) AS sd_view,
        |  CAST(ceil((1.959963984540054 + 0.8416212335729143)
        |    * (1.959963984540054 + 0.8416212335729143)
        |    * (v1 + v2) / (diff * diff)) AS BIGINT) AS n_per_arm
        |FROM f""".stripMargin)
}
