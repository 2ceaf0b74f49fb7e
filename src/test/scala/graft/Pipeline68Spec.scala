package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 36 — PK conformance, Markov next-event
  * evaluation, Fleiss' kappa. */
class Pipeline68Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("pk check: exact multiplicity re-derivation for lineitem") {
    val keys = Tables.lineitem(spark, dir)
      .selectExpr("concat(l_orderkey, '#', l_linenumber) as k")
      .collect().map(_.getString(0))
    val mult = keys.groupBy(identity).view.mapValues(_.length.toLong)
    val g = run("q_profile_pk_check").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(g.keySet == Set("documents_pk", "events_pk",
      "lineitem_pk", "orders_pk"))
    val li = g("lineitem_pk")
    assert(li._1 == keys.length.toLong)
    assert(li._2 == mult.size.toLong)
    assert(li._3 == mult.values.count(_ > 1).toLong)
    assert(li._4 == mult.values.max)
    // unique PKs stay clean
    assert(g("orders_pk")._3 == 0L && g("events_pk")._3 == 0L &&
      g("documents_pk")._3 == 0L)
  }

  test("markov eval: argmax model scored on the transition stream") {
    val seq = Tables.events(spark, dir)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getString(3)))
    val trans = seq.groupBy(_._1).values.flatMap { evs =>
      val s = evs.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.toSeq
    val counts = trans.groupBy(identity).view.mapValues(_.length.toLong)
    val byCur = counts.groupBy(_._1._1)
    val g = run("q_events_markov_eval").collect()
    assert(g.length == byCur.size)
    g.foreach { r =>
      val cur = r.getString(0)
      val cell = byCur(cur)
        .map { case ((_, nxt), n) => (nxt, n) }.toMap
      val predicted = cell.toSeq.sortBy(t => (-t._2, t._1)).head._1
      val total = cell.values.sum
      val hits = cell.getOrElse(predicted, 0L)
      assert(r.getString(1) == predicted)
      assert(r.getLong(2) == total)
      assert(r.getLong(3) == 1000000L * hits / total)
    }
  }

  test("fleiss kappa: exact agreement-sum re-derivation") {
    val blocks = Tables.events(spark, dir)
      .selectExpr("user_id", "cast(ts as date) as d", "event_type",
        "value")
      .collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString),
        (r.getString(2), r.getDouble(3))))
      .groupBy(_._1).values.map { evs =>
        val r1 = if (evs.exists(_._2._1 == "click")) 1L else 0L
        val r2 = if (evs.exists(_._2._2 > 250.0)) 1L else 0L
        val r3 = if (evs.size >= 3) 1L else 0L
        r1 + r2 + r3
      }.toSeq
    val n = blocks.length.toLong
    val sPos = blocks.sum
    val sAgree = blocks.map(np =>
      np * (np - 1) + (3 - np) * (2 - np)).sum
    val pBar = sAgree.toDouble / (6.0 * n)
    val pPos = sPos.toDouble / (3.0 * n)
    val pe = pPos * pPos + (1 - pPos) * (1 - pPos)
    val kappa = (pBar - pe) / (1 - pe)
    val g = run("q_ml_fleiss_kappa").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == n)
    assert(math.abs(g.head.getDouble(1) - pBar) < 1e-6)
    assert(math.abs(g.head.getDouble(2) - pe) < 1e-6)
    assert(math.abs(g.head.getDouble(3) - kappa) < 1e-6)
    assert(g.head.getDouble(3) <= 1.0)
  }
}
