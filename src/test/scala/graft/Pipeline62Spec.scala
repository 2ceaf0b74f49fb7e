package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 30 — cost threshold, asof-with-tolerance,
  * and the sequence-gap profiler. */
class Pipeline62Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("cost threshold: argmin of an exact full sweep") {
    val scored = operators.Pipeline12.scored(spark, dir).collect()
      .map(r => (r.getBoolean(1), r.getLong(2)))
    val thresholds = scored.map(_._2).distinct.sorted
    val best = thresholds.map { th =>
      val fn = scored.count(s => s._1 && s._2 < th).toLong
      val fp = scored.count(s => !s._1 && s._2 >= th).toLong
      (th, 10 * fn + fp)
    }.minBy(t => (t._2, t._1))
    val g = run("q_ml_cost_threshold").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == best._1)
    assert(g.head.getLong(5) == best._2)
    val r = g.head
    // confusion identities
    assert(r.getLong(1) + r.getLong(3) == scored.count(_._1).toLong)
    assert(r.getLong(2) + r.getLong(4) == scored.count(!_._1).toLong)
  }

  test("asof tolerance: strict-earlier day, 30-day filter") {
    val days = Tables.lineitem(spark, dir)
      .selectExpr("l_suppkey", "cast(l_shipdate as date) as d",
        "cast(round(l_quantity) as bigint) as q")
      .groupBy("l_suppkey", "d").agg(sum("q").as("qty"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val bySupp = days.groupBy(_._1)
    val g = run("q_join_asof_tolerance").collect()
    assert(g.length == days.length)
    val got = g.map(r => (r.getLong(0), r.getDate(1).toLocalDate) ->
      (if (r.getString(2) == "none") None
       else Some((r.getString(2), r.getLong(3), r.getLong(4))))
    ).toMap
    days.foreach { case (supp, d, _) =>
      val earlier = bySupp(supp).filter(_._2.isBefore(d))
      val expected = if (earlier.isEmpty) None else {
        val latest = earlier.maxBy(_._2.toEpochDay)
        val gap = d.toEpochDay - latest._2.toEpochDay
        if (gap <= 30) Some((latest._2.toString, gap, latest._3))
        else None
      }
      assert(got((supp, d)) == expected, s"supp=$supp day=$d")
    }
  }

  test("sequence gaps: top-10 equals a full sorted scan") {
    val keys = Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F")
      .select("o_orderkey")
      .collect().map(_.getLong(0)).sorted
    val gaps = keys.sliding(2).collect {
      case Array(a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }.toSeq
    val expected = gaps.sortBy(t => (-t._3, t._1)).take(10)
    val g = run("q_profile_sequence_gaps").collect()
    assert(g.length == expected.length)
    g.zip(expected).foreach { case (row, (s, e, l)) =>
      assert(row.getLong(0) == s)
      assert(row.getLong(1) == e)
      assert(row.getLong(2) == l)
    }
  }
}
