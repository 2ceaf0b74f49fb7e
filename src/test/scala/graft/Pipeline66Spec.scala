package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 34 — feature drift matrix, cumulative
  * reach, Wilson intervals. */
class Pipeline66Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("feature drift: exact two-sample KS per feature") {
    val rows = Tables.lineitem(spark, dir)
      .selectExpr("l_shipdate < timestamp '1998-07-01' as early",
        "cast(round(l_quantity) as bigint) as q",
        "cast(round(l_extendedprice * 100) as bigint) div 100000 as pk",
        "cast(round(l_discount * 100) as bigint) as dc")
      .collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    def ks(vals: Array[(Boolean, Long)]): (Long, Long, Long) = {
      val na = vals.count(_._1).toLong
      val nb = vals.length - na
      val dom = vals.map(_._2).distinct.sorted
      var c1 = 0L; var c2 = 0L; var best = 0L
      dom.foreach { v =>
        c1 += vals.count(x => x._1 && x._2 == v)
        c2 += vals.count(x => !x._1 && x._2 == v)
        val ppm = (BigInt(c1) * nb - BigInt(c2) * na).abs * 1000000 /
          (BigInt(na) * nb)
        if (ppm.toLong > best) best = ppm.toLong
      }
      (na, nb, best)
    }
    val expected = Map(
      "quantity" -> ks(rows.map(r => (r._1, r._2))),
      "price_kd" -> ks(rows.map(r => (r._1, r._3))),
      "discount" -> ks(rows.map(r => (r._1, r._4))))
    val g = run("q_profile_feature_drift").collect()
    assert(g.length == 3)
    g.foreach { r =>
      val (na, nb, ksv) = expected(r.getString(0))
      assert(r.getLong(1) == na && r.getLong(2) == nb)
      assert(r.getLong(3) == ksv)
    }
  }

  test("cumulative reach: equals running distinct user sets") {
    val ev = Tables.events(spark, dir)
      .selectExpr("event_type", "cast(ts as date) as d", "user_id")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val g = run("q_events_cumulative_reach").collect()
    val byType = ev.groupBy(_._1)
    g.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val evs = byType(t)
      val days = evs.map(_._2).distinct.sorted
      assert(rows.length == days.length)
      rows.sortBy(_.getDate(1).toString).zip(days).foreach {
        case (row, day) =>
          val reached = evs.filter(_._2 <= day).map(_._3).distinct.size
          assert(row.getDate(1).toString == day)
          assert(row.getLong(3) == reached.toLong)
      }
      // total reach equals the type's distinct users
      assert(rows.map(_.getLong(2)).sum ==
        evs.map(_._3).distinct.size.toLong)
    }
  }

  test("wilson: exact formula; interval brackets p_hat inside [0,1]") {
    val g = run("q_ml_wilson_ci").collect()
    val z = 1.959963984540054
    g.foreach { r =>
      val n = r.getLong(1); val x = r.getLong(2)
      val p = x.toDouble / n
      val zz = z * z / n
      val lo = (p + zz / 2 - z * math.sqrt(p * (1 - p) / n +
        zz / (4 * n))) / (1 + zz)
      val hi = (p + zz / 2 + z * math.sqrt(p * (1 - p) / n +
        zz / (4 * n))) / (1 + zz)
      assert(math.abs(r.getDouble(3) - p) < 1e-6)
      assert(math.abs(r.getDouble(4) - lo) < 1e-6)
      assert(math.abs(r.getDouble(5) - hi) < 1e-6)
      assert(r.getDouble(4) >= 0 && r.getDouble(5) <= 1)
      assert(r.getDouble(4) <= r.getDouble(3) &&
        r.getDouble(3) <= r.getDouble(5))
    }
  }
}
