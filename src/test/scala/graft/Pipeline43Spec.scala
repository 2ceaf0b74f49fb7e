package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 11 — DFT re-derivation at k=1, SMA
  * crossover flag consistency, ratio-to-report share identities. */
class Pipeline43Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def dailyByType: Map[String, Array[(Long, Long)]] =
    Tables.events(spark, dir).collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate))
      .view.mapValues(_.map(r =>
        math.round(r.getAs[Double]("value") * 100)).sum)
      .toMap.groupBy(_._1._1)
      .view.mapValues(_.map { case ((_, d), y) => (d.toEpochDay, y) }
        .toArray.sortBy(_._1)).toMap

  test("fourier: k=1 spectrum re-derives from the daily series") {
    val rows = run("q_time_fourier").collect()
    val daily = dailyByType
    assert(rows.length == daily.size * 4)
    rows.filter(_.getLong(1) == 1L).foreach { r =>
      val pts = daily(r.getString(0))
      val n = pts.length
      assert(r.getLong(2) == n)
      val t0 = pts.map(_._1).min
      val a = pts.map { case (d, y) =>
        y * math.round(math.cos(2 * math.Pi * (d - t0) / n) * 1e6) }.sum
      val b = pts.map { case (d, y) =>
        y * math.round(math.sin(2 * math.Pi * (d - t0) / n) * 1e6) }.sum
      assert(math.abs(r.getDouble(3) - a / 1e6) < 0.02, "a_k1")
      assert(math.abs(r.getDouble(4) - b / 1e6) < 0.02, "b_k1")
      val amp = math.sqrt(a.toDouble * a + b.toDouble * b) / n / 1e6
      assert(math.abs(r.getDouble(5) - amp) < 0.01, "amplitude")
    }
    // amplitude is nonnegative everywhere
    assert(rows.forall(_.getDouble(5) >= 0))
  }

  test("sma crossover: flips re-derive; counts bounded by n_obs") {
    val rows = run("q_time_sma_crossover").collect()
    val daily = dailyByType
    rows.foreach { r =>
      val ys = daily(r.getString(0)).map(_._2)
      val n = ys.length
      if (n >= 28) {
        assert(r.getLong(1) == n - 27)
        val sigs = (27 until n).map { i =>
          val s7 = ys.slice(i - 6, i + 1).sum
          val s28 = ys.slice(i - 27, i + 1).sum
          s7 * 4 > s28
        }
        val golden = sigs.sliding(2).count(p => p(1) && !p(0))
        val death = sigs.sliding(2).count(p => !p(1) && p(0))
        assert(r.getLong(2) == golden, "golden")
        assert(r.getLong(3) == death, "death")
        assert(r.getLong(4) == sigs.count(identity))
      }
    }
  }

  test("ratio-to-report: shares sum to ~1e6; cum is monotone to 1e6") {
    val rows = run("q_win_ratio_to_report").collect()
    val bySeg = rows.groupBy(_.getString(0))
    bySeg.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(5))
      // ranks are 1..n
      assert(sorted.map(_.getLong(5)).toSeq == (1L to rs.length).toSeq)
      // cents non-increasing down the rank order
      assert(sorted.sliding(2).forall(p =>
        p.length < 2 || p(0).getLong(2) >= p(1).getLong(2)))
      // floor-div shares each <= true share; total within rounding
      val total = sorted.map(_.getLong(2)).sum
      sorted.foreach { r =>
        assert(r.getLong(3) == 1000000L * r.getLong(2) / total)
      }
      // cumulative share ends at floor(1e6 * total/total) = 1e6
      assert(sorted.last.getLong(4) == 1000000L)
      assert(sorted.sliding(2).forall(p =>
        p.length < 2 || p(0).getLong(4) <= p(1).getLong(4)))
    }
  }
}
