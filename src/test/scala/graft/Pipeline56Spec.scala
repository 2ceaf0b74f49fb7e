package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 24 — linear-model diagnostics (exact SHAP,
  * Cook's distance, VIF) re-derived from the collected sf0.001
  * design frame with BigInt moments. */
class Pipeline56Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val design: Array[(Long, Long, Long, Long)] = {
    val li = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("x1"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("x2"))
    Tables.orders(spark, dir)
      .selectExpr("o_orderkey",
        "cast(round(o_totalprice * 100) as bigint) as y")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "x1", "x2", "y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  private def moments = {
    val n = BigInt(design.length)
    val s1 = design.map(r => BigInt(r._2)).sum
    val s2 = design.map(r => BigInt(r._3)).sum
    val sy = design.map(r => BigInt(r._4)).sum
    val s11 = design.map(r => BigInt(r._2) * r._2).sum
    val s12 = design.map(r => BigInt(r._2) * r._3).sum
    val s22 = design.map(r => BigInt(r._3) * r._3).sum
    val s1y = design.map(r => BigInt(r._2) * r._4).sum
    val s2y = design.map(r => BigInt(r._3) * r._4).sum
    val syy = design.map(r => BigInt(r._4) * r._4).sum
    (n, s1, s2, sy, s11, s12, s22, s1y, s2y, syy)
  }

  test("shap linear: closed-form 2-feature weights and exact MAD") {
    val (n, s1, s2, sy, s11, s12, s22, s1y, s2y, _) = moments
    val c11 = (n * s11 - s1 * s1).toDouble
    val c12 = (n * s12 - s1 * s2).toDouble
    val c22 = (n * s22 - s2 * s2).toDouble
    val c1y = (n * s1y - s1 * sy).toDouble
    val c2y = (n * s2y - s2 * sy).toDouble
    val det = c11 * c22 - c12 * c12
    val w1 = (c1y * c22 - c2y * c12) / det
    val w2 = (c2y * c11 - c1y * c12) / det
    val a1 = design.map(r => (n * r._2 - s1).abs).sum
    val a2 = design.map(r => (n * r._3 - s2).abs).sum
    val nd = n.toDouble
    val g = run("q_ml_shap_linear").collect()
    assert(g.length == 2)
    assert(g(0).getString(0) == "lines" && g(1).getString(0) == "quantity")
    assert(math.abs(g(0).getDouble(1) - w1) < 1e-6)
    assert(math.abs(g(1).getDouble(1) - w2) < 1e-6)
    assert(math.abs(g(0).getDouble(2) -
      math.abs(w1) * a1.toDouble / (nd * nd)) < 1e-6)
    assert(math.abs(g(1).getDouble(2) -
      math.abs(w2) * a2.toDouble / (nd * nd)) < 1e-6)
  }

  test("influence: top-10 Cook's distance matches a full scala scan") {
    val (n, _, s2m, sy, _, _, s22, _, s2y, syy) = moments
    val cxx = (n * s22 - s2m * s2m).toDouble
    val cxy = (n * s2y - s2m * sy).toDouble
    val cyy = (n * syy - sy * sy).toDouble
    val b = cxy / cxx
    val nd = n.toDouble
    val sVar = (cyy - cxy * cxy / cxx) / (nd * nd * (nd - 2))
    val all = design.map { r =>
      val e = r._4 - (sy.toDouble - b * s2m.toDouble) / nd - b * r._3
      val dev = (n * r._3 - s2m).abs.toDouble
      val h = 1.0 / nd + dev * dev / (nd * cxx)
      val dd = e * e * h / (2.0 * sVar * (1.0 - h) * (1.0 - h))
      (r._1, math.rint(h * 1e6) / 1e6, math.rint(dd * 1e6) / 1e6)
    }
    val top = all.sortBy(t => (-t._3, t._1)).take(10)
    val g = run("q_ml_influence").collect()
    assert(g.length == 10)
    g.zip(top).foreach { case (row, (k, h, dd)) =>
      assert(row.getLong(0) == k)
      assert(math.abs(row.getDouble(1) - h) < 1e-6)
      assert(math.abs(row.getDouble(2) - dd) < 1e-6)
    }
    // leverages live in (0, 1); Cook's D is non-negative
    assert(g.forall(r => r.getDouble(1) > 0 && r.getDouble(1) < 1))
    assert(g.forall(_.getDouble(2) >= 0))
  }

  test("vif: 3x3 closed-form inverse diagonal; vif >= 1") {
    val (n, s1, s2m, sy, s11, s12, s22, s1y, s2y, syy) = moments
    def corr(cab: BigInt, caa: BigInt, cbb: BigInt): Double =
      cab.toDouble / math.sqrt(caa.toDouble * cbb.toDouble)
    val r12 = corr(n * s12 - s1 * s2m, n * s11 - s1 * s1,
      n * s22 - s2m * s2m)
    val r13 = corr(n * s1y - s1 * sy, n * s11 - s1 * s1,
      n * syy - sy * sy)
    val r23 = corr(n * s2y - s2m * sy, n * s22 - s2m * s2m,
      n * syy - sy * sy)
    val det = 1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13 -
      r23 * r23
    val expected = Map(
      "lines" -> (1.0 - r23 * r23) / det,
      "quantity" -> (1.0 - r13 * r13) / det,
      "price" -> (1.0 - r12 * r12) / det)
    val g = run("q_ml_vif").collect()
    assert(g.length == 3)
    g.foreach { r =>
      assert(math.abs(r.getDouble(1) - expected(r.getString(0))) < 1e-6)
      assert(r.getDouble(1) >= 1.0 - 1e-9)
    }
  }
}
