package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64 round-14 batch 19 — training-pipeline closers: the Youden-J
  * optimal operating point (the ROC-side threshold picker beside
  * q_ml_f1_threshold's PR-side one) and the temporal feature/label
  * split (the leakage-safe label builder every churn/propensity
  * training set needs — features strictly before the cutoff, labels
  * strictly after).
  */
object Pipeline51 extends graft.QueryModule {

  /** YOUDEN-J OPTIMAL THRESHOLD — J = sensitivity + specificity − 1
    * maximized over the banded int8-score curve (the q_ml_pr_curve
    * banded-cumsum machinery — no global sort): the ROC-side
    * operating point q_ml_f1_threshold's PR-side argmax ignores
    * class balance for. Exact ppm integers throughout; ties break to
    * the lowest threshold.
    *
    * 100 TB: one map-side-partial score agg; the curve and argmax
    * live on the ≤16k-score domain frame. */
  def mlYoudenJ(s: SparkSession, dir: String): DataFrame = {
    val g = Pipeline12.scored(s, dir).groupBy("score")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
      .withColumn("sh", expr("score + 8192L"))
    val tot = g.agg(sum("np").as("n_pos"), sum("nn").as("n_neg"))
    graft.api.Dist.bandedCumSum(g, Seq(), "sh", bandWidth = 128L,
        sumCols = Seq("np", "nn"), inclusive = false)
      .crossJoin(broadcast(tot))
      .select(col("score").as("threshold"),
        (col("n_pos") - col("cum_np")).as("tp"),
        (col("n_neg") - col("cum_nn")).as("fp"),
        col("n_pos"), col("n_neg"))
      .selectExpr("threshold", "tp", "fp",
        "1000000 * tp div n_pos as sens_ppm",
        "1000000 * (n_neg - fp) div n_neg as spec_ppm",
        "1000000 * tp div n_pos" +
          " + 1000000 * (n_neg - fp) div n_neg - 1000000 as j_ppm")
      .orderBy(col("j_ppm").desc, col("threshold").asc)
      .limit(1)
  }

  /** TEMPORAL FEATURE/LABEL SPLIT — the leakage-safe churn/propensity
    * training frame: cutoff = last corpus day − 14; RFM features
    * computed STRICTLY before the cutoff, the purchase label
    * STRICTLY after, and a deterministic user-parity train/test
    * assignment. Users with no pre-cutoff history drop (no feature
    * row → no silent label-only leakage). The builder every
    * time-based model needs instead of the random split that leaks
    * tomorrow into training.
    *
    * 100 TB: two per-user aggs (map-side partial on user_id) + one
    * equi-join; no windows. */
  def mlLabelTemporal(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val maxD = ev.agg(max(to_date(col("ts")))).head.getDate(0).toString
    val feat = ev
      .where(expr(s"to_date(ts) <= date_sub(date '$maxD', 14)"))
      .groupBy("user_id")
      .agg(
        expr(s"cast(datediff(date_sub(date '$maxD', 14)," +
          " max(to_date(ts))) as bigint)").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)")).otherwise(0L))
          .as("monetary_cents"))
    val label = ev
      .where(expr(s"to_date(ts) > date_sub(date '$maxD', 14)"))
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("lbl"))
    feat.join(label, Seq("user_id"), "left")
      .selectExpr("user_id", "recency_days", "frequency",
        "monetary_cents", "coalesce(lbl, 0L) as label",
        "if(user_id % 10 < 8, 'train', 'test') as split")
      .orderBy("user_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_youden_j" -> mlYoudenJ,
    "q_ml_label_temporal" -> mlLabelTemporal)

  def oracleSql: Map[String, String] = Map(
    "q_ml_youden_j" ->
      """WITH sc AS (
        |  SELECT (label >= 5) AS pos,
        |    CAST(list_sum(list_transform(embedding::DOUBLE[],
        |      x -> CAST(floor(x * 127.0) AS BIGINT))) AS BIGINT) AS score
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
        |  FROM g),
        |j AS (SELECT score AS threshold,
        |    n_pos - cum_np AS tp, n_neg - cum_nn AS fp,
        |    CAST((1000000 * (n_pos - cum_np)) // n_pos AS BIGINT)
        |      AS sens_ppm,
        |    CAST((1000000 * (n_neg - (n_neg - cum_nn))) // n_neg
        |      AS BIGINT) AS spec_ppm
        |  FROM cum CROSS JOIN tot)
        |SELECT threshold, tp, fp, sens_ppm, spec_ppm,
        |  sens_ppm + spec_ppm - 1000000 AS j_ppm
        |FROM j ORDER BY j_ppm DESC, threshold ASC LIMIT 1""".stripMargin,
    "q_ml_label_temporal" ->
      """WITH mx AS (SELECT MAX(CAST(ts AS DATE)) - 14 AS cutoff
        |  FROM events),
        |feat AS (SELECT user_id,
        |    CAST(cutoff - MAX(CAST(ts AS DATE)) AS BIGINT)
        |      AS recency_days,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS monetary_cents
        |  FROM events CROSS JOIN mx
        |  WHERE CAST(ts AS DATE) <= cutoff
        |  GROUP BY user_id, cutoff),
        |lbl AS (SELECT user_id,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS lbl
        |  FROM events CROSS JOIN mx
        |  WHERE CAST(ts AS DATE) > cutoff
        |  GROUP BY user_id)
        |SELECT f.user_id, recency_days, frequency, monetary_cents,
        |  COALESCE(lbl, 0) AS label,
        |  CASE WHEN f.user_id % 10 < 8 THEN 'train' ELSE 'test' END
        |    AS split
        |FROM feat f LEFT JOIN lbl USING (user_id)
        |ORDER BY user_id""".stripMargin)
}
