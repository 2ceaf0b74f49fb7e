package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 13 — percentile_disc membership, z-test
  * re-derivation, Theil-Sen robustness sanity, HL fold identity. */
class Pipeline45Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("percentile_disc: every value is a member; matches the cume_dist def") {
    val cents = Tables.orders(spark, dir).collect()
      .groupBy(_.getAs[String]("o_orderstatus"))
      .view.mapValues(_.map(r =>
        math.round(r.getAs[Double]("o_totalprice") * 100)).sorted).toMap
    def disc(xs: Array[Long], p: Double): Long =
      xs(math.ceil(p * xs.length).toInt - 1)
    val rows = run("q_agg_percentile_disc").collect()
    rows.foreach { r =>
      val xs = cents(r.getString(0))
      assert(r.getLong(1) == xs.length)
      Seq((2, 0.25), (3, 0.5), (4, 0.75), (5, 0.875)).foreach {
        case (i, p) =>
          assert(xs.contains(r.getLong(i)), s"p=$p not a member")
          assert(r.getLong(i) == disc(xs, p), s"p=$p cume_dist def")
      }
    }
  }

  test("prop z-test: re-derives from per-event conversion counts") {
    val trials = Tables.events(spark, dir).collect()
      .map(r => (r.getAs[Long]("event_id"),
        r.getAs[String]("event_type") == "purchase"))
    val (a, b) = trials.partition(_._1 % 2 == 0)
    val (n1, k1) = (a.length, a.count(_._2))
    val (n2, k2) = (b.length, b.count(_._2))
    val r = run("q_ml_prop_ztest").collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == k1)
    assert(r.getLong(2) == n2 && r.getLong(3) == k2)
    val p1 = k1.toDouble / n1; val p2 = k2.toDouble / n2
    val pp = (k1 + k2).toDouble / (n1 + n2)
    val z = (p1 - p2) /
      math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(r.getDouble(6) - z) < 1e-5)
    assert(r.getBoolean(7) == (math.abs(z) > 1.959963984540054))
  }

  test("theil-sen: median slope re-derives; robust to the OLS") {
    val daily = Tables.events(spark, dir).collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate))
      .view.mapValues(_.map(r =>
        math.round(r.getAs[Double]("value") * 100)).sum)
      .toMap.groupBy(_._1._1)
      .view.mapValues(_.toSeq.map { case ((_, d), y) =>
        (d.toEpochDay, y)
      }.sortBy(_._1).toArray).toMap
    val rows = run("q_time_theil_sen").collect()
    rows.foreach { r =>
      val pts = daily(r.getString(0))
      assert(r.getLong(1) == pts.length)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2).toDouble /
        (pts(j)._1 - pts(i)._1)).sorted
      assert(r.getLong(2) == slopes.length)
      val pos = 0.5 * (slopes.length - 1)
      val lo = pos.toInt
      val med = if (lo == slopes.length - 1) slopes(lo)
        else slopes(lo) + (pos - lo) * (slopes(lo + 1) - slopes(lo))
      assert(math.abs(r.getDouble(3) - med) < 1e-4,
        s"${r.getString(0)} slope")
    }
  }

  test("hosmer-lemeshow: chi2 >= 0, df = bins - 2, reject consistent") {
    val r = run("q_ml_hosmer_lemeshow").collect().head
    assert(r.getLong(0) > 0)
    val bins = r.getLong(1)
    assert(bins >= 2 && bins <= 10)
    assert(r.getDouble(2) >= 0)
    assert(r.getLong(3) == bins - 2)
    assert(r.getBoolean(4) == (r.getDouble(2) > 15.50731305586545))
  }
}
