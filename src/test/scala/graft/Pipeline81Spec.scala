package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 49 — exact ridge, exact 2x2 PCA. */
class Pipeline81Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("ridge: lambda=0 == linfit OLS; shrinkage monotone in lambda") {
    val g = run("q_ml_ridge_exact").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val linfit = run("q_ml_linfit").collect()
    // q_ml_linfit emits per-type slopes; lambda=0 must agree
    linfit.foreach { r =>
      val ty = r.getString(0)
      val slope = r.getDouble(r.fieldIndex("slope"))
      assert(math.abs(g((ty, 0L))._1 - slope) < 1e-4, s"OLS match $ty")
      assert(math.abs(g((ty, 0L))._3 - 1.0) < 1e-9)
    }
    // |slope| shrinks as lambda grows, same sign
    g.keys.map(_._1).toSeq.distinct.foreach { ty =>
      val s0 = g((ty, 0L))._1; val s4 = g((ty, 4L))._1
      val s16 = g((ty, 16L))._1
      assert(math.abs(s4) <= math.abs(s0) + 1e-12)
      assert(math.abs(s16) <= math.abs(s4) + 1e-12)
      assert(s0 == 0.0 || s0.sign == s16.sign)
    }
  }

  test("pca2: eigen identities + exact moment re-derivation") {
    val pts = Tables.lineitem(spark, dir)
      .selectExpr("cast(l_quantity as bigint)",
        "cast(round(l_extendedprice * 100) as bigint)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = pts.length
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val syy = pts.map(p => BigInt(p._2) * p._2).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val den = n.toDouble * (n - 1)
    val a = (BigInt(n) * sxx - sx * sx).toDouble / den
    val c = (BigInt(n) * syy - sy * sy).toDouble / den
    val b = (BigInt(n) * sxy - sx * sy).toDouble / den
    val disc = math.sqrt((a - c) * (a - c) / 4 + b * b)
    val (l1, l2) = ((a + c) / 2 + disc, (a + c) / 2 - disc)
    val r = run("q_ml_pca2_exact").collect().head
    assert(r.getLong(0) == n.toLong)
    assert(math.abs(r.getDouble(1) - l1) / l1 < 1e-6)
    assert(math.abs(r.getDouble(2) - l2) / math.max(1.0, l2) < 1e-4)
    // trace and PSD identities
    assert(r.getDouble(1) + r.getDouble(2) > 0)
    assert(r.getDouble(2) >= -1e-6 * l1) // covariance is PSD
    assert(r.getDouble(3) >= 0.5 && r.getDouble(3) <= 1.0)
    // the slope satisfies the eigen equation: b*s + c == l1 + (l1-a)...
    // directly: (l1 - a)/b
    assert(math.abs(r.getDouble(4) - (l1 - a) / b) < 1e-4)
  }
}
