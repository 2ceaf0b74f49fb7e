package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 8 — the four classical test statistics
  * re-derived on the driver from collected sf0.001 rows. */
class Pipeline40Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def quantsByFlag: Map[String, Array[Long]] =
    Tables.lineitem(spark, dir).collect()
      .groupBy(_.getAs[String]("l_returnflag"))
      .view.mapValues(_.map(r =>
        math.round(r.getAs[Double]("l_quantity")))).toMap

  test("jarque-bera: moments re-derive; reject consistent with jb") {
    val rows = run("q_ml_jarque_bera").collect()
    val groups = quantsByFlag
    assert(rows.map(_.getString(0)).sorted.toSeq == groups.keys.toSeq.sorted)
    rows.foreach { r =>
      val xs = groups(r.getString(0)).map(_.toDouble)
      val n = xs.length.toDouble
      assert(r.getLong(1) == xs.length)
      val mu = xs.sum / n
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      val g1 = m3 / (m2 * math.sqrt(m2))
      val g2 = m4 / (m2 * m2) - 3
      assert(math.abs(r.getDouble(2) - g1) < 1e-4, "g1")
      assert(math.abs(r.getDouble(3) - g2) < 1e-4, "g2")
      val jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4)
      assert(math.abs(r.getDouble(4) - jb) < 1e-2, "jb")
      assert(r.getBoolean(5) == (jb > 5.991464547107979))
    }
  }

  test("brown-forsythe: F re-derives from median-centered deviations") {
    val groups = quantsByFlag
    val k = groups.size
    def median(xs: Array[Long]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo).toDouble
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val z = groups.view.mapValues { xs =>
      val m = median(xs); xs.map(x => math.abs(x - m))
    }.toMap
    val n = z.values.map(_.length).sum.toDouble
    val grand = z.values.flatten.sum / n
    val ssb = z.values.map { zi =>
      val mi = zi.sum / zi.length
      zi.length * (mi - grand) * (mi - grand)
    }.sum
    val ssw = z.values.map { zi =>
      val mi = zi.sum / zi.length
      zi.map(v => (v - mi) * (v - mi)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val r = run("q_ml_levene").collect().head
    assert(r.getLong(0) == k && r.getLong(1) == n.toLong)
    assert(math.abs(r.getDouble(2) - f) < 1e-4, s"F $f vs ${r.getDouble(2)}")
    assert(r.getLong(3) == k - 1 && r.getLong(4) == n.toLong - k)
  }

  test("mcnemar: discordant counts re-derive exactly") {
    val rows = run("q_ml_mcnemar").collect()
    val base = Tables.lineitem(spark, dir).collect().map { r =>
      (r.getAs[String]("l_linestatus"),
        r.getAs[String]("l_returnflag") == "R",
        math.round(r.getAs[Double]("l_quantity")) >= 25,
        math.round(r.getAs[Double]("l_discount") * 100) >= 5)
    }
    assert(rows.map(_.getString(0)).toSeq ==
      base.map(_._1).distinct.sorted.toSeq)
    rows.foreach { r =>
      val g = base.filter(_._1 == r.getString(0))
      assert(r.getLong(1) == g.length)
      assert(r.getLong(2) == g.count(t => t._3 == t._2))
      assert(r.getLong(3) == g.count(t => t._4 == t._2))
      val b = g.count(t => t._3 == t._2 && t._4 != t._2)
      val c = g.count(t => t._3 != t._2 && t._4 == t._2)
      assert(r.getLong(4) == b && r.getLong(5) == c)
      val num = math.max(math.abs(b - c) - 1, 0).toDouble
      val chi2 = if (b + c == 0) 0.0 else num * num / (b + c)
      assert(math.abs(r.getDouble(6) - chi2) < 1e-6)
      assert(r.getBoolean(7) == (chi2 > 3.841458820694124 && b + c > 0))
    }
  }

  test("durbin-watson: OLS residual autocorrelation re-derives; dw in [0,4]") {
    val daily = Tables.events(spark, dir).collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate))
      .view.mapValues(_.map(r =>
        math.round(r.getAs[Double]("value") * 100)).sum)
      .toMap.groupBy(_._1._1)
      .view.mapValues(_.map { case ((_, d), y) =>
        (d.toEpochDay.toDouble, y.toDouble)
      }.toArray.sortBy(_._1)).toMap
    val rows = run("q_ml_durbin_watson").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == daily.keys.toSeq.sorted)
    rows.foreach { r =>
      val pts = daily(r.getString(0))
      assert(r.getLong(1) == pts.length)
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val e = pts.map(p => p._2 - a - b * p._1)
      val dw = e.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum /
        e.map(v => v * v).sum
      assert(math.abs(r.getDouble(2) - dw) < 1e-3,
        s"${r.getString(0)}: $dw vs ${r.getDouble(2)}")
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 4)
      assert(math.abs(r.getDouble(3) - (1 - r.getDouble(2) / 2)) < 1e-4)
    }
  }
}
