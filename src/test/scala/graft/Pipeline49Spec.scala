package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 17 — Granger F re-derivation, KM
  * product-limit identities with censoring. */
class Pipeline49Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("granger: F re-derives from driver-side two-regressor OLS") {
    val daily = Tables.events(spark, dir).collect()
      .filter(r => Set("purchase", "click")(r.getAs[String]("event_type")))
      .groupBy(r =>
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate)
      .view.mapValues { rs =>
        (rs.filter(_.getAs[String]("event_type") == "purchase")
          .map(r => math.round(r.getAs[Double]("value") * 100)).sum,
         rs.filter(_.getAs[String]("event_type") == "click")
          .map(r => math.round(r.getAs[Double]("value") * 100)).sum)
      }.toMap
    val pts = daily.keys.toSeq.sorted
      .flatMap { d =>
        daily.get(d.minusDays(1)).map { case (pl, cl) =>
          (daily(d)._1.toDouble, pl.toDouble, cl.toDouble)
        }
      }
    val n = pts.length
    // driver OLS via normal equations (same Cramer shape)
    val (sy, s1, s2) = (pts.map(_._1).sum, pts.map(_._2).sum,
      pts.map(_._3).sum)
    val s11 = pts.map(p => p._2 * p._2).sum
    val s22 = pts.map(p => p._3 * p._3).sum
    val s12 = pts.map(p => p._2 * p._3).sum
    val s1y = pts.map(p => p._2 * p._1).sum
    val s2y = pts.map(p => p._3 * p._1).sum
    val nd = n.toDouble
    val det = nd * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val ua = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val ub = (nd * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val ug = (nd * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    val rb = (nd * s1y - s1 * sy) / (nd * s11 - s1 * s1)
    val ra = (sy - rb * s1) / nd
    val sseu = pts.map { case (y, x1, x2) =>
      val e = y - ua - ub * x1 - ug * x2; e * e }.sum
    val sser = pts.map { case (y, x1, _) =>
      val e = y - ra - rb * x1; e * e }.sum
    val f = (sser - sseu) / (sseu / (n - 3))
    val r = run("q_time_granger").collect().head
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(1) - ub) < 1e-4, "beta")
    assert(math.abs(r.getDouble(2) - ug) < 1e-4, "gamma")
    assert(math.abs(r.getDouble(3) - f) / math.max(math.abs(f), 1.0)
      < 1e-2, s"F $f vs ${r.getDouble(3)}")
    assert(r.getLong(4) == n - 3)
  }

  test("km: risk-set accounting + product-limit identities") {
    val spans = Tables.events(spark, dir).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues { rs =>
        val ds = rs.map(r => r.getAs[java.sql.Timestamp]("ts")
          .toLocalDateTime.toLocalDate)
        (ds.min, ds.max)
      }.toMap
    val maxD = spans.values.map(_._2).max
    val durs = spans.values.toSeq.map { case (f, l) =>
      (l.toEpochDay - f.toEpochDay, l == maxD)
    }
    val rows = run("q_events_survival_km").collect()
    assert(rows.map(_.getLong(0)).toSet == durs.map(_._1).toSet)
    var prevS = 1.0
    rows.sortBy(_.getLong(0)).foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == durs.count(_._1 >= d), s"at_risk d=$d")
      assert(r.getLong(2) == durs.count(t => t._1 == d && !t._2))
      assert(r.getLong(3) == durs.count(t => t._1 == d && t._2))
      val s = r.getDouble(4)
      assert(s >= 0 && s <= prevS + 1e-9, s"monotone d=$d")
      prevS = s
    }
    // all users accounted for exactly once
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == spans.size)
  }
}
