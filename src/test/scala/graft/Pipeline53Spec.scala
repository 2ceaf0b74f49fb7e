package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 21 — Wilcoxon signed-rank re-derivation. */
class Pipeline53Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("wilcoxon signed-rank: W+ and z re-derive from driver ranks") {
    val cut = java.time.LocalDateTime.parse("2024-01-16T00:00")
    val deltas = Tables.events(spark, dir).collect()
      .groupBy(r => (r.getAs[Long]("user_id"),
        !r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.isBefore(cut)))
      .view.mapValues { rs =>
        val sv = rs.map(r => math.round(r.getAs[Double]("value") * 100))
          .sum
        sv * 1000000L / rs.length  // positive operands: div == /
      }.toMap.groupBy(_._1._1)
      .filter(_._2.size == 2)
      .map { case (_, m) =>
        m.collectFirst { case ((_, true), v) => v }.get -
          m.collectFirst { case ((_, false), v) => v }.get
      }.filter(_ != 0L).toSeq
    val n = deltas.length
    // average ranks of |d| (doubled units)
    val sorted = deltas.map(math.abs).sorted
    def r2(ad: Long): Long =
      2L * sorted.count(_ < ad) + sorted.count(_ == ad) + 1
    val w2 = deltas.filter(_ > 0).map(d => r2(math.abs(d))).sum
    val tie3 = sorted.groupBy(identity).values
      .map(g => g.length.toLong).map(t => t * t * t - t).sum
    val z = (w2 / 2.0 - n * (n + 1) / 4.0) /
      math.sqrt(n * (n + 1).toDouble * (2 * n + 1) / 24.0 - tie3 / 48.0)
    val r = SparkEntry.queries("q_ml_wilcoxon_signed")(spark, dir)
      .collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == w2, s"w2 $w2 vs ${r.getLong(1)}")
    assert(math.abs(r.getDouble(2) - z) < 1e-4, s"z $z")
    assert(r.getBoolean(3) == (math.abs(z) > 1.959963984540054))
  }
}
