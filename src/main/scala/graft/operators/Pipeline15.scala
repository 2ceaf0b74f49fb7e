package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.28 round-9 batch 5 — forecasting backtest + the gradient-boosted
  * tree wrapper: a seasonal-naive forecast scored against actuals with
  * exact integer error metrics (oracle-checked), and MLlib
  * GBTClassifier on the embedding corpus (spec-bounded like the other
  * seeded tree/ensemble wrappers).
  */
object Pipeline15 extends graft.QueryModule {

  /** SEASONAL-NAIVE forecast BACKTEST per event type: predict each
    * day's revenue cents as the value 7 calendar days earlier (the
    * standard baseline every forecasting pipeline must beat), scored
    * where both days observed — days scored, MAE in exact integer
    * cents, and the SIGNED total error (emitted as a sum, not a mean:
    * an integer division of a possibly-negative sum would hit the
    * Spark-trunc vs DuckDB-floor semantics split; MAE's operands are
    * non-negative so its `div` is engine-neutral). The 7-day shift is
    * a calendar equi-join on (type, d−7), NOT a lag(7) row offset —
    * robust to gap days.
    *
    * 100 TB: one full-data daily agg; the shift join and metrics run
    * on the checkpointed support-sized (type × day) frame. */
  def eventsForecast(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: both join sides read the same daily frame
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("v"))
      .localCheckpoint()
    val pred = daily.select(col("event_type"),
      expr("date_add(d, 7)").as("d"), col("v").as("vp"))
    daily.join(pred, Seq("event_type", "d"))
      .select(col("event_type"), (col("v") - col("vp")).as("err"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("err"))).as("sae"), sum("err").as("sum_err_cents"))
      .select(col("event_type"), col("n_days"),
        expr("sae div n_days").as("mae_cents"), col("sum_err_cents"))
      .orderBy("event_type")
  }

  /** GRADIENT-BOOSTED TREES on the embedding corpus — the boosting
    * sibling of q_ml_rf_eval: GBTClassifier (binary by API contract)
    * predicts label ≥ 5 from the raw 64-dim vectors, trained on 4/5
    * of vec_ids (the deterministic mod split) and scored held-out;
    * per-class confusion with exact ppm precision/recall. NO oracle
    * (seeded MLlib fit); Pipeline15Spec bounds accuracy above the
    * majority-class floor and pins determinism across two fits.
    *
    * 100 TB: boosting fits trees sequentially but each tree
    * aggregates per-node sufficient statistics (state ~ nodes ×
    * features × bins, independent of rows); only transform touches
    * every row. */
  def mlGbtEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.GBTClassifier
    val feats = VectorOps.sharedRawFeats(s, dir)
      .join(Tables.embeddings(s, dir).select(col("vec_id"), col("label")),
        "vec_id")
      .withColumn("t", (col("label") >= 5).cast("double"))
    val train = graft.api.Ml.exceptFold(feats, "vec_id", 5, 0).persist()
    val gbt = try {
      new GBTClassifier().setMaxIter(10).setMaxDepth(4).setSeed(42L)
        .setLabelCol("t").setFeaturesCol("raw").fit(train)
    } finally train.unpersist(false)
    val scored = gbt.transform(graft.api.Ml.fold(feats, "vec_id", 5, 0))
      .select(col("t").cast("long").as("label"),
        col("prediction").cast("long").as("pred"))
    graft.api.Ml.confusionSummary(scored, "label", "pred").orderBy("label")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_forecast" -> eventsForecast,
    "q_ml_gbt_eval" -> mlGbtEval)

  def oracleSql: Map[String, String] = Map(
    "q_events_forecast" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type, a.v - p.v AS err
        |  FROM daily a JOIN daily p
        |    ON a.event_type = p.event_type AND a.d = p.d + 7)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(abs(err)) // COUNT(*) AS BIGINT) AS mae_cents,
        |  CAST(SUM(err) AS BIGINT) AS sum_err_cents
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin)
}
