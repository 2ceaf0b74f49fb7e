package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-9 batch-5 — forecast-backtest identities and the GBT
  * wrapper's accuracy/determinism bounds (its only gate — no oracle).
  * All at sf0.001.
  */
class Pipeline15Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("forecast backtest: MAE bounds the signed error, days conserve") {
    val rs = run("q_events_forecast").collect()
    assert(rs.nonEmpty)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    rs.foreach { r =>
      val (tpe, n, mae, se) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && mae >= 0)
      // |Σerr| <= Σ|err|, and MAE is its floor-mean
      assert(math.abs(se) <= (mae + 1) * n)
      // scored days = days with a d-7 partner present
      val days = daily.where(col("event_type") === tpe)
        .select("d").collect().map(_.getDate(0).toLocalDate).toSet
      val scored = days.count(d => days.contains(d.minusDays(7)))
      assert(n == scored, s"$tpe scored $n vs calendar pairs $scored")
    }
  }

  test("gbt: accuracy beats the majority-class floor; deterministic refit") {
    val rs = run("q_ml_gbt_eval").collect()
    assert(rs.map(_.getLong(0)).toSet == Set(0L, 1L))
    val support = rs.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tp = rs.map(_.getLong(2)).sum
    val n = support.values.sum
    val majority = support.values.max
    assert(tp * 100 > majority * 100,
      s"held-out accuracy $tp/$n must beat majority $majority/$n")
    val again = run("q_ml_gbt_eval").collect()
    assert(rs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "seeded refit is deterministic")
  }
}
