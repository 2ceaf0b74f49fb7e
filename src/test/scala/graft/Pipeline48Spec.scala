package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 16 — control-chart limit identities,
  * MAPE re-derivation, schema-evolution accounting. */
class Pipeline48Spec extends AnyFunSuite {
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
      .view.mapValues(_.toSeq.map { case ((_, d), y) =>
        (d.toEpochDay, y)
      }.sortBy(_._1).toArray).toMap

  test("control chart: limits and ooc count re-derive") {
    val rows = run("q_time_control_chart").collect()
    val daily = dailyByType
    rows.foreach { r =>
      val ys = daily(r.getString(0)).map(_._2)
      assert(r.getLong(1) == ys.length)
      val ybar = ys.sum.toDouble / ys.length
      val mrbar = ys.sliding(2).map(p => math.abs(p(1) - p(0))).sum
        .toDouble / (ys.length - 1)
      assert(math.abs(r.getDouble(2) - ybar) < 1e-2)
      assert(math.abs(r.getDouble(3) - mrbar) < 1e-2)
      assert(math.abs(r.getDouble(4) - (ybar + 2.66 * mrbar)) < 1e-2)
      assert(math.abs(r.getDouble(5) - (ybar - 2.66 * mrbar)) < 1e-2)
      val ooc = ys.count(y =>
        y > ybar + 2.66 * mrbar || y < ybar - 2.66 * mrbar)
      assert(r.getLong(6) == ooc)
    }
  }

  test("mape: re-derives from the OLS trend; smape <= 2e6 ppm") {
    val rows = run("q_ml_mape").collect()
    val daily = dailyByType
    rows.foreach { r =>
      val pts = daily(r.getString(0))
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum.toDouble
      val sy = pts.map(_._2).sum.toDouble
      val sxx = pts.map(p => p._1.toDouble * p._1).sum
      val sxy = pts.map(p => p._1.toDouble * p._2).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val used = pts.filter(_._2 > 0)
      assert(r.getLong(1) == used.length)
      val mape = used.map { case (x, y) =>
        math.round(1e6 * math.abs(y - (a + b * x)) / y) }.sum /
        used.length
      assert(math.abs(r.getLong(2) - mape) <= 1,
        s"${r.getString(0)} mape")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 2000000L)
    }
  }

  test("schema evolution: merged read preserves both batches exactly") {
    val li = Tables.lineitem(spark, dir).collect()
      .map(r => (r.getAs[Long]("l_orderkey"),
        math.round(r.getAs[Double]("l_quantity"))))
    val r = run("q_source_schema_evolution").collect().head
    assert(r.getLong(0) == li.length)
    val (old, neu) = li.partition(_._1 % 2 == 0)
    assert(r.getLong(1) == old.length)
    assert(r.getLong(2) == neu.map(_._2).sum)
    assert(r.getLong(3) == old.map(_._2).sum)
    assert(r.getLong(4) == 3L)
  }
}
