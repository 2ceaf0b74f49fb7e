package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 48 — Tukey HSD, IGNORE NULLS windows. */
class Pipeline80Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("tukey hsd: exact moment re-derivation") {
    val xs = Tables.orders(spark, dir)
      .selectExpr("o_orderstatus", "cast(round(o_totalprice * 100) as bigint)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = xs.size; val nn = xs.values.map(_.length).sum
    val ssw = xs.toSeq.sortBy(_._1).map { case (_, v) =>
      val n = v.length; val s = v.map(BigInt(_)).sum
      val q = v.map(x => BigInt(x) * BigInt(x)).sum
      q.toDouble - s.toDouble * s.toDouble / n
    }.sum
    val msw = ssw / (nn - k)
    val g = run("q_ml_tukey_hsd").collect()
    assert(g.length == k * (k - 1) / 2)
    g.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val (v1, v2) = (xs(s1), xs(s2))
      val diff = v1.map(BigInt(_)).sum.toDouble / v1.length -
        v2.map(BigInt(_)).sum.toDouble / v2.length
      val se = math.sqrt(msw * (1.0 / v1.length + 1.0 / v2.length) / 2)
      assert(math.abs(r.getDouble(4) - diff) < 1e-2)
      assert(math.abs(r.getDouble(5) - se) < 1e-2)
      assert(math.abs(r.getDouble(6) - math.abs(diff) / se) < 1e-4)
    }
  }

  test("ignore nulls: carry re-derivation per customer") {
    val orders = Tables.orders(spark, dir)
      .selectExpr("o_custkey", "o_orderkey",
        "unix_micros(o_orderdate) d", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val g = run("q_win_ignore_nulls").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(g.size == orders.length)
    var carried = 0
    orders.groupBy(_._1).foreach { case (ck, os) =>
      val seq = os.sortBy(o => (o._3, o._2))
      var lastU: Option[Long] = None
      val fw = seq.map { o =>
        if (o._4 == "1-URGENT") lastU = Some(o._2)
        o._2 -> lastU
      }.toMap
      var nextU: Option[Long] = None
      val bw = seq.reverse.map { o =>
        if (o._4 == "1-URGENT") nextU = Some(o._2)
        o._2 -> nextU
      }.toMap
      seq.foreach { o =>
        val (gl, gn) = g((ck, o._2))
        assert(gl == fw(o._2), s"last_urgent cust $ck order ${o._2}")
        assert(gn == bw(o._2), s"next_urgent cust $ck order ${o._2}")
        if (gl.isDefined && o._4 != "1-URGENT") carried += 1
      }
    }
    // the null-skipping path is actually exercised
    assert(carried > 0)
  }
}
