package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 18 — Friedman rank-sum identities, runs
  * test re-derivation. */
class Pipeline50Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def dailyByType: Map[String, Map[Long, Long]] =
    Tables.events(spark, dir).collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate))
      .view.mapValues(_.map(r =>
        math.round(r.getAs[Double]("value") * 100)).sum)
      .toMap.groupBy(_._1._1)
      .view.mapValues(_.map { case ((_, d), y) =>
        d.toEpochDay -> y
      }.toMap).toMap

  test("friedman: chi2 re-derives from complete-block ranks") {
    val daily = dailyByType
    val types = daily.keys.toSeq.sorted
    val k = types.length
    val blocks = daily.values.flatMap(_.keys).toSeq.distinct
      .filter(d => types.forall(t => daily(t).contains(d)))
    val r2 = types.map { t =>
      t -> blocks.map { d =>
        val ys = types.map(tt => daily(tt)(d)).sorted
        val y = daily(t)(d)
        val below = ys.count(_ < y); val ties = ys.count(_ == y)
        2L * (below + 1) + ties - 1
      }.sum
    }.toMap
    val n = blocks.length.toDouble
    val chi2 = 3.0 * r2.values.map(v => v.toDouble * v).sum /
      (n * k * (k + 1)) - 3.0 * n * (k + 1)
    val r = run("q_ml_friedman").collect().head
    assert(r.getLong(0) == blocks.length && r.getLong(1) == k)
    assert(math.abs(r.getDouble(2) - chi2) < 1e-4, s"chi2 $chi2")
    assert(r.getLong(3) == k - 1)
    assert(r.getBoolean(4) == (chi2 > 9.487729036781154))
  }

  test("runs test: runs re-derive from residual signs") {
    val daily = dailyByType
    val rows = run("q_ml_runs_test").collect()
    rows.foreach { r =>
      val pts = daily(r.getString(0)).toSeq.sortBy(_._1)
        .map(p => (p._1.toDouble, p._2.toDouble))
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val sgns = pts.map(p => math.round((p._2 - a - b * p._1) * 1000))
        .filter(_ != 0L).map(e => if (e > 0) 1 else -1)
      val nPos = sgns.count(_ == 1); val nNeg = sgns.count(_ == -1)
      val runs = 1 + sgns.sliding(2).count(p =>
        p.length == 2 && p(0) != p(1))
      assert(r.getLong(1) == nPos && r.getLong(2) == nNeg)
      assert(r.getLong(3) == runs, s"${r.getString(0)} runs")
      val mu = 2.0 * nPos * nNeg / (nPos + nNeg) + 1
      val s2 = 2.0 * nPos * nNeg * (2.0 * nPos * nNeg - nPos - nNeg) /
        ((nPos + nNeg).toDouble * (nPos + nNeg) * (nPos + nNeg - 1))
      assert(math.abs(r.getDouble(4) - (runs - mu) / math.sqrt(s2))
        < 1e-4)
    }
  }
}
