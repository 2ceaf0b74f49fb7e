package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 37 — Hill tail index, Brier decomposition,
  * Markov entropy rate. */
class Pipeline69Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("hill: ordered-fold re-derivation over the exact top-101") {
    val cents = Tables.orders(spark, dir)
      .selectExpr("cast(round(o_totalprice * 100) as bigint)")
      .collect().map(_.getLong(0)).sorted.reverse.take(101)
    val xmin = cents.min
    val lsum = cents.sorted.foldLeft(0.0)((a, x) =>
      a + math.log(x.toDouble / xmin))
    val alpha = 100.0 / lsum
    val g = run("q_agg_tail_index").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == 100L)
    assert(g.head.getLong(1) == xmin)
    assert(math.abs(g.head.getDouble(2) - alpha) < 1e-6)
    assert(g.head.getDouble(2) > 0)
  }

  test("brier decomposition: REL - RES + UNC identity holds") {
    val g = run("q_ml_brier_decomposition").collect()
    assert(g.length == 1)
    val r = g.head
    val (rel, res, unc, brier) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(rel >= 0 && res >= 0)
    assert(unc > 0 && unc <= 0.25 + 1e-9)
    assert(math.abs(brier - (rel - res + unc)) < 2e-6)
    // resolution can never exceed uncertainty
    assert(res <= unc + 1e-9)
    // brier itself stays in [0, 1]
    assert(brier >= 0 && brier <= 1)
    // cross-check against an exact scala recomputation
    val scored = operators.Pipeline12.scored(spark, dir).collect()
      .map(x => (((x.getLong(2) + 8128L) * 1000L) / 16256L,
        if (x.getBoolean(1)) 1L else 0L))
    val bins = scored.groupBy(s => math.min(s._1 / 100, 9L))
      .toSeq.sortBy(_._1)
    val n = scored.length.toLong
    val so = scored.map(_._2).sum
    var reln = 0.0; var resn = 0.0
    bins.foreach { case (_, xs) =>
      val nk = xs.length.toLong
      val sp = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val d1 = sp.toDouble / nk / 1000.0 - sy.toDouble / nk
      val d2 = sy.toDouble / nk - so.toDouble / n
      reln += nk * d1 * d1; resn += nk * d2 * d2
    }
    assert(math.abs(rel - reln / n) < 1e-6)
    assert(math.abs(res - resn / n) < 1e-6)
  }

  test("entropy rate: exact cell re-derivation; bounded by ln k") {
    val seq = Tables.events(spark, dir)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getString(3)))
    val trans = seq.groupBy(_._1).values.flatMap { evs =>
      val s = evs.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.toSeq
    val cells = trans.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val fromTot = cells.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val n = trans.length.toLong
    val h = cells.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (a, ((f, _), c)) =>
        a - c.toDouble * math.log(c.toDouble / fromTot(f))
    } / n
    val g = run("q_events_entropy_rate").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == n)
    assert(g.head.getLong(1) == fromTot.size.toLong)
    assert(math.abs(g.head.getDouble(2) - h) < 1e-6)
    assert(g.head.getDouble(2) <= g.head.getDouble(3) + 1e-9)
    assert(g.head.getDouble(4) >= -1e-9 && g.head.getDouble(4) <= 1)
  }
}
