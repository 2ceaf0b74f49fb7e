package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 23 — Cochran's Q, Bartlett's test, and the
  * rolling OLS slope, re-derived exactly from the collected sf0.001
  * fixture. */
class Pipeline55Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("cochran q: exact incidence-table re-derivation") {
    val inc = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "view", "purchase"))
      .selectExpr("user_id", "cast(ts as date) as d", "event_type")
      .distinct()
      .collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString), r.getString(2)))
    val rByUser = inc.groupBy(_._1).view.mapValues(_.length.toLong)
    val cByType = inc.groupBy(_._2).view.mapValues(_.length.toLong)
    val sr = rByUser.values.sum; val srr = rByUser.values.map(v => v * v).sum
    val sc = cByType.values.sum; val scc = cByType.values.map(v => v * v).sum
    val q = 2.0 * (3 * scc - sc * sc) / (3 * sr - srr)
    val g = run("q_ml_cochran_q").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == rByUser.size.toLong)
    assert(math.abs(g.head.getDouble(1) - q) < 1e-6)
    assert(g.head.getBoolean(2) == (q > 5.991464547107979))
  }

  test("bartlett: group-ordered fold re-derivation") {
    val xs = Tables.events(spark, dir)
      .selectExpr("event_type", "cast(round(value * 100) as bigint)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = xs.groupBy(_._1).toSeq.sortBy(_._1)
    val k = groups.length.toLong
    val n = xs.length.toLong
    var sb = 0.0; var sa = 0.0; var sc = 0.0
    groups.foreach { case (_, g) =>
      val ni = g.length.toLong
      val si = g.map(v => BigInt(v._2)).sum
      val qi = g.map(v => BigInt(v._2) * BigInt(v._2)).sum
      val vnum = (BigInt(ni) * qi - si * si).toDouble
      sb += vnum / ni
      sa += (ni - 1) * math.log(vnum / (ni * (ni - 1).toDouble))
      sc += 1.0 / (ni - 1)
    }
    val t = ((n - k) * math.log(sb / (n - k)) - sa) /
      (1.0 + (sc - 1.0 / (n - k)) / (3.0 * (k - 1)))
    val g = run("q_ml_bartlett").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == k && g.head.getLong(1) == n)
    assert(math.abs(g.head.getDouble(2) - t) < 1e-6)
    assert(g.head.getLong(3) == k - 1)
    assert(g.head.getBoolean(4) == (t > 9.487729036781154))
  }

  test("rolling slope: windowed moments match a scala sliding fold") {
    val daily = Tables.events(spark, dir)
      .selectExpr("event_type", "cast(ts as date) as d",
        "cast(round(value * 100) as bigint) as v")
      .groupBy("event_type", "d").agg(sum("v").as("y"))
      .selectExpr("event_type", "d",
        "cast(datediff(d, date '2024-01-01') as bigint) as x", "y")
      .orderBy("event_type", "d")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.map { i =>
        val w = sorted.slice(math.max(0, i - 13), i + 1)
        val wn = w.length.toLong
        val sx = w.map(_._3).sum; val sy = w.map(_._4).sum
        val sxy = w.map(r => r._3 * r._4).sum
        val sxx = w.map(r => r._3 * r._3).sum
        val den = wn * sxx - sx * sx
        val slope = if (den == 0) None
          else Some((wn * sxy.toDouble - sx.toDouble * sy) /
            (wn * sxx.toDouble - sx.toDouble * sx))
        ((t, sorted(i)._2), (wn, slope))
      }
    }.toMap
    val got = run("q_time_rolling_slope").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getDate(1).toString)
      val (wn, slope) = expected(key)
      assert(r.getLong(2) == wn)
      slope match {
        case None => assert(r.isNullAt(3))
        case Some(v) => assert(math.abs(r.getDouble(3) - v) < 1e-5)
      }
    }
  }
}
