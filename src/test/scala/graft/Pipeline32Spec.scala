package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-13 batch 8 — the F1 operating point re-derived from
  * the graded PR curve, and Brier-score bounds + degenerate-predictor
  * dominance. */
class Pipeline32Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("f1 threshold: the argmax row of the graded PR curve") {
    val curve = run("q_ml_pr_curve").collect()
    val best = curve.minBy(r => (-r.getLong(5), r.getLong(0)))
    val got = run("q_ml_f1_threshold").collect()
    assert(got.length == 1)
    val g = got.head
    assert(g.getLong(0) == best.getLong(0)) // threshold = argmax score
    assert(g.getLong(5) == best.getLong(5)) // same F1
    assert((1 to 4).forall(i => g.getLong(i) == best.getLong(i)))
    assert(curve.forall(_.getLong(5) <= g.getLong(5)))
  }

  test("brier: exact re-derivation from the scored frame; bounds") {
    val g = run("q_ml_brier_score").collect().head
    val rows = operators.Pipeline12.scored(spark, dir).collect()
    assert(g.getLong(0) == rows.length)
    assert(g.getLong(1) == rows.count(_.getBoolean(1)))
    val se = rows.map { r =>
      val p = ((r.getLong(2) + 8128L) * 1000L) / 16256L
      val y = if (r.getBoolean(1)) 1000L else 0L
      (p - y) * (p - y)
    }.sum
    assert(g.getLong(2) == se / rows.length)
    assert(g.getLong(2) >= 0 && g.getLong(2) <= 1000000L)
  }
}
