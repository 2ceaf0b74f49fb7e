package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 6 — Pythagorean means, effect size, Spearman
  * (against a literal rank recompute), and the paired t-test's
  * micro-grid delta contract. */
class Pipeline38Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("geomean/harmonic: AM >= GM >= HM and exact recompute") {
    val qs = Tables.lineitem(spark, dir).collect()
      .map(r => (r.getAs[String]("l_returnflag"),
        math.round(r.getAs[Double]("l_quantity"))))
    val rows = run("q_agg_geomean").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "N", "R"))
    rows.foreach { r =>
      val g = qs.filter(_._1 == r.getString(0)).map(_._2.toDouble)
      assert(r.getLong(1) == g.length)
      val geo = math.exp(g.map(math.log).sum / g.length)
      val harm = g.length / g.map(1.0 / _).sum
      val am = g.sum / g.length
      assert(math.abs(r.getDouble(2) - geo) < 1e-4)
      assert(math.abs(r.getDouble(3) - harm) < 1e-4)
      assert(am + 1e-9 >= r.getDouble(2) &&
        r.getDouble(2) + 1e-9 >= r.getDouble(3)) // AM >= GM >= HM
    }
  }

  test("effect size: cohen's d re-derives from raw moments; hedges |g| < |d|") {
    val vals = Tables.events(spark, dir).collect()
      .filter(r => Set("purchase", "click")(r.getAs[String]("event_type")))
      .map(r => (r.getAs[String]("event_type") == "purchase",
        math.round(r.getAs[Double]("value") * 100).toDouble))
    val (g1, g2) = vals.partition(_._1)
    def mv(g: Array[Double]) = {
      val m = g.sum / g.length
      (m, g.map(x => (x - m) * (x - m)).sum / (g.length - 1))
    }
    val ((m1, v1), (m2, v2)) = (mv(g1.map(_._2)), mv(g2.map(_._2)))
    val sp2 = ((g1.length - 1) * v1 + (g2.length - 1) * v2) /
      (g1.length + g2.length - 2)
    val d = (m1 - m2) / math.sqrt(sp2)
    val r = run("q_ml_effect_size").collect().head
    assert(r.getLong(0) == g1.length && r.getLong(1) == g2.length)
    assert(math.abs(r.getDouble(4) - d) < 1e-4)
    assert(math.abs(r.getDouble(5)) < math.abs(r.getDouble(4)))
  }

  test("spearman: matches a literal average-tie rank correlation") {
    val base = Tables.lineitem(spark, dir).collect()
      .map(r => (math.round(r.getAs[Double]("l_quantity") * 100),
        math.round(r.getAs[Double]("l_extendedprice") * 100)))
    def ranks(xs: Array[Long]): Map[Long, Double] = {
      val sorted = xs.sorted
      xs.distinct.map { v =>
        val below = sorted.count(_ < v)
        val tie = sorted.count(_ == v)
        v -> (below + (tie + 1) / 2.0)
      }.toMap
    }
    val rx = ranks(base.map(_._1))
    val ry = ranks(base.map(_._2))
    val pairs = base.map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val rho = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val r = run("q_ml_spearman").collect().head
    assert(r.getLong(0) == base.length)
    assert(math.abs(r.getDouble(1) - rho) < 1e-6)
    assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
  }

  test("paired t-test: micro-grid deltas re-derive; only both-half users") {
    val byUser = Tables.events(spark, dir).collect()
      .groupBy(_.getAs[Long]("user_id"))
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val deltas = byUser.values.flatMap { rows =>
      val (h2, h1) = rows.partition(
        _.getAs[java.sql.Timestamp]("ts").compareTo(cut) >= 0)
      if (h1.isEmpty || h2.isEmpty) None
      else {
        def m(g: Array[org.apache.spark.sql.Row]) = {
          val s = g.map(r => math.round(r.getAs[Double]("value") * 100)).sum
          Math.floorDiv(s * 1000000L, g.length.toLong)
        }
        Some(m(h2) - m(h1))
      }
    }.toArray
    val r = run("q_ml_paired_ttest").collect().head
    assert(r.getLong(0) == deltas.length)
    val mean = deltas.sum.toDouble / deltas.length
    assert(math.abs(r.getDouble(1) - mean / 1e6) < 1e-4)
    val sd = math.sqrt(deltas.map(d => (d - mean) * (d - mean)).sum /
      (deltas.length - 1))
    assert(math.abs(r.getDouble(2) - mean / (sd / math.sqrt(deltas.length)))
      < 1e-4)
    assert(r.getLong(3) == deltas.length - 1)
  }
}
