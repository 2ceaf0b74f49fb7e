package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 2 — the QuantileDiscretizer library twin's
  * graded contract (no oracle: the splits come from Spark's
  * approx_percentile sketch) plus cheap invariants the oracle gate
  * can't see for the exact keys (assortativity range, ntile balance). */
class Pipeline34Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("quantile discretizer: determinism, disjoint monotone buckets, mass") {
    val rs = run("q_ml_quantile_discretizer").collect()
    assert(rs.nonEmpty && rs.length <= 10)
    // buckets strictly increasing, ranges disjoint and ordered
    val byBucket = rs.sortBy(_.getLong(0))
    byBucket.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "min <= max inside a bucket")
    }
    byBucket.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(0) < b.getLong(0))
        assert(a.getLong(3) <= b.getLong(2),
          s"bucket ${a.getLong(0)} max ${a.getLong(3)} overlaps " +
            s"bucket ${b.getLong(0)} min ${b.getLong(2)}")
      case _ =>
    }
    // total-count conservation
    val n = Tables.customer(spark, dir).count()
    assert(rs.map(_.getLong(1)).sum == n)
    // per-bucket mass near n/10 (the relativeError band is 0.001, but
    // duplicate cent values can lump; allow a generous 3x band)
    assert(rs.forall(r => r.getLong(1) <= (3 * n) / 10 + 1))
    val again = run("q_ml_quantile_discretizer").collect()
    assert(rs.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ntile closed form: bucket sizes differ by at most 1, ordered") {
    val rs = run("q_win_ntile").collect()
    val sizes = rs.groupBy(_.getLong(2)).view.mapValues(_.length).toMap
    assert(sizes.keySet == (1L to 10L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    // deciles are monotone in cents under the (cents, custkey) order
    val byRank = rs.sortBy(r => (r.getLong(1), r.getLong(0)))
    byRank.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(2))
      case _ =>
    }
  }
}
