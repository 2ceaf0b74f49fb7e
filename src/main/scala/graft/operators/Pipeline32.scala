package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.45 round-13 batch 8 — the two binary-eval closers every deployed
  * classifier needs: the OPTIMAL-F1 THRESHOLD (the operating point
  * picked off the exact PR curve) and the BRIER SCORE (calibration's
  * scalar summary beside q_ml_calibration's reliability bins). Both
  * exactly oracle-able on the shared integer-score harness.
  */
object Pipeline32 extends graft.QueryModule {

  /** OPTIMAL-F1 THRESHOLD — the operating point a deployed binary
    * classifier actually ships: the score threshold maximizing F1 on
    * the SAME exact banded PR curve q_ml_pr_curve reports (reused
    * verbatim — Pipeline17.mlPrCurve), ties to the LOWEST score
    * (prefer recall at equal F1; deterministic on both engines). One
    * row: the threshold and its tp/fp/precision/recall/F1.
    *
    * 100 TB: the curve is the banded-cumulative support frame
    * (≤16k rows); the argmax is TakeOrdered(1) — the q_ml_tree_stump
    * pattern. */
  def mlF1Threshold(s: SparkSession, dir: String): DataFrame =
    Pipeline17.mlPrCurve(s, dir)
      .orderBy(col("f1_ppm").desc, col("score").asc)
      .limit(1)
      .select(col("score").as("threshold"), col("tp"), col("fp"),
        col("precision_ppm"), col("recall_ppm"), col("f1_ppm"))

  /** BRIER SCORE of the int8 embedding score against the binary
    * label — the scalar calibration summary beside q_ml_calibration's
    * reliability bins: the score maps to a probability on the milli
    * grid (p_milli = ((score + 8128)·1000) div 16256 — min-max over
    * the [−8128, 8128] score domain, truncation mirrored), and
    * brier_micro = Σ (p_milli − 1000·y)² div n — exactly 10⁶ × the
    * mean squared probability error, all integer.
    *
    * 100 TB: ONE map-side-partial hash agg over the scan; no joins,
    * no windows. */
  def mlBrierScore(s: SparkSession, dir: String): DataFrame =
    Pipeline12.scored(s, dir)
      .select(col("pos"),
        expr("((score + 8128) * 1000) div 16256").as("p_milli"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(expr("(p_milli - if(pos, 1000, 0))" +
          " * (p_milli - if(pos, 1000, 0))")).as("se"))
      .select(col("n"), col("n_pos"),
        expr("se div n").as("brier_micro"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_f1_threshold" -> mlF1Threshold,
    "q_ml_brier_score" -> mlBrierScore)

  def oracleSql: Map[String, String] = Map(
    "q_ml_f1_threshold" ->
      ("SELECT score AS threshold, tp, fp, precision_ppm, recall_ppm," +
        " f1_ppm FROM (" + Pipeline17.prCurveSqlBody + ") q" +
        " ORDER BY f1_ppm DESC, threshold ASC LIMIT 1"),
    "q_ml_brier_score" ->
      """WITH sc AS (
        |  SELECT (label >= 5) AS pos,
        |    CAST(list_sum(list_transform(embedding::DOUBLE[],
        |      x -> CAST(floor(x * 127.0) AS BIGINT))) AS BIGINT) AS score
        |  FROM embeddings),
        |p AS (SELECT pos,
        |        ((score + 8128) * 1000) // 16256 AS p_milli FROM sc)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(SUM((p_milli - CASE WHEN pos THEN 1000 ELSE 0 END)
        |      * (p_milli - CASE WHEN pos THEN 1000 ELSE 0 END))
        |    // COUNT(*) AS BIGINT) AS brier_micro
        |FROM p""".stripMargin)
}
