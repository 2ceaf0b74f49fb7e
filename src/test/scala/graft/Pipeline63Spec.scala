package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 31 — referential integrity, interval
  * overlap, and sweep-line peak concurrency. */
class Pipeline63Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("referential: exact set-difference re-derivation") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey")
      .collect().map(_.getLong(0))
    val ok = Tables.orders(spark, dir).select("o_orderkey")
      .collect().map(_.getLong(0))
    val oc = Tables.orders(spark, dir).select("o_custkey")
      .collect().map(_.getLong(0))
    val ck = Tables.customer(spark, dir).select("c_custkey")
      .collect().map(_.getLong(0))
    val g = run("q_profile_referential").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(g.keySet ==
      Set("customer_nation", "lineitem_orders", "orders_customer"))
    assert(g("lineitem_orders")._1 == li.length.toLong)
    assert(g("lineitem_orders")._2 ==
      li.count(k => !ok.toSet.contains(k)).toLong)
    assert(g("lineitem_orders")._3 ==
      ok.count(k => !li.toSet.contains(k)).toLong)
    assert(g("orders_customer")._1 == oc.length.toLong)
    assert(g("orders_customer")._3 ==
      ck.count(k => !oc.toSet.contains(k)).toLong)
    // no true orphans in a consistent fixture
    assert(g.values.forall(_._2 == 0L))
  }

  test("interval overlap: exact pair scan per customer") {
    val iv = Tables.orders(spark, dir)
      .selectExpr("o_custkey", "o_orderkey",
        "cast(o_orderdate as date) as a")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toLocalDate.toEpochDay))
    val byCust = iv.groupBy(_._1)
    val counts = byCust.view.mapValues { os =>
      (for {
        i <- os.indices; j <- (i + 1) until os.length
        x = os(i); y = os(j)
        if x._3 <= y._3 + 14 && y._3 <= x._3 + 14
      } yield 1).size.toLong
    }.filter(_._2 > 0)
    val expected = counts.toSeq.sortBy(t => (-t._2, t._1)).take(20)
    val g = run("q_join_interval_overlap").collect()
    assert(g.length == expected.length)
    // the top-20 cut can tie across custkeys; compare the sorted pairs
    g.zip(expected).foreach { case (row, (c, n)) =>
      assert(row.getLong(1) == n)
      assert(row.getLong(0) == c)
    }
  }

  test("peak concurrency: sweep equals a brute-force timeline scan") {
    val spans = Tables.events(spark, dir)
      .selectExpr("cast(ts as date) as d", "user_id",
        "cast(ts as long) as t")
      .groupBy("d", "user_id")
      .agg(min("t").as("t0"), max("t").as("t1"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(2), r.getLong(3)))
    val g = run("q_events_peak_concurrency").collect()
    val byDay = spans.groupBy(_._1)
    assert(g.length == byDay.size)
    g.foreach { row =>
      val day = row.getDate(0).toString
      val ss = byDay(day)
      assert(row.getLong(1) == ss.length.toLong)
      // brute force: max over all span starts of spans covering it
      // (touching endpoints count as concurrent)
      val peak = ss.map { s =>
        ss.count(o => o._2 <= s._2 && o._3 >= s._2).toLong
      }.max
      assert(row.getLong(2) == peak)
    }
  }
}
