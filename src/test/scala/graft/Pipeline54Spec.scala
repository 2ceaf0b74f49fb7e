package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 22 — Kendall tau-b, Mann-Kendall trend, and
  * Lin's CCC, each re-derived exactly (O(n^2) pair loops / BigInt
  * moments) from the collected sf0.001 fixture. */
class Pipeline54Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("kendall tau-b: exact pair-loop re-derivation") {
    val rows = Tables.lineitem(spark, dir)
      .selectExpr("cast(round(l_quantity * 100) as bigint)",
        "cast(round(l_discount * 100) as bigint)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var c = 0L; var d = 0L
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length) {
        val sx = java.lang.Long.signum(rows(j)._1 - rows(i)._1)
        val sy = java.lang.Long.signum(rows(j)._2 - rows(i)._2)
        if (sx * sy > 0) c += 1 else if (sx * sy < 0) d += 1
        j += 1
      }
      i += 1
    }
    val n = rows.length.toLong
    val n0 = n * (n - 1) / 2
    val n1 = rows.groupBy(_._1).values
      .map(g => g.length.toLong * (g.length - 1) / 2).sum
    val n2 = rows.groupBy(_._2).values
      .map(g => g.length.toLong * (g.length - 1) / 2).sum
    val tau = (c - d) / math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)
    val g = run("q_ml_kendall_tau").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == n)
    assert(g.head.getLong(1) == c)
    assert(g.head.getLong(2) == d)
    assert(math.abs(g.head.getDouble(3) - tau) < 1e-6)
    assert(math.abs(g.head.getDouble(3)) <= 1.0)
  }

  test("mann-kendall: exact S and z from the daily series") {
    val daily = Tables.events(spark, dir)
      .selectExpr("cast(ts as date) as d",
        "cast(round(value * 100) as bigint) as x")
      .groupBy("d")
      .agg(org.apache.spark.sql.functions.expr(
        "(sum(x) * 1000000) div count(1)").as("v"))
      .orderBy("d")
      .collect().map(_.getLong(1))
    var s = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length)
      s += java.lang.Long.signum(daily(j) - daily(i))
    val n = daily.length.toLong
    val tt = daily.groupBy(identity).values
      .map { g => val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }.sum
    val varS = (n * (n - 1).toDouble * (2 * n + 5) - tt) / 18.0
    val z = (s - java.lang.Long.signum(s)) / math.sqrt(varS)
    val g = run("q_time_mann_kendall").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == n)
    assert(g.head.getLong(1) == s)
    assert(math.abs(g.head.getDouble(2) - z) < 1e-6)
    val trend = if (z > 1.959963984540054) "increasing"
      else if (z < -1.959963984540054) "decreasing" else "no_trend"
    assert(g.head.getString(3) == trend)
  }

  test("ccc: BigInt-moment re-derivation; ccc <= |pearson r|") {
    val rev = Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey",
        "cast(round(l_extendedprice * 100) as bigint)" +
          " * (100 - cast(round(l_discount * 100) as bigint)) as r")
      .groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.sum("r").as("y"))
    val pairs = Tables.orders(spark, dir)
      .selectExpr("o_orderkey",
        "cast(round(o_totalprice * 100) as bigint) * 100 as x")
      .join(rev, org.apache.spark.sql.functions.col("o_orderkey") ===
        org.apache.spark.sql.functions.col("l_orderkey"))
      .select("x", "y")
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1))))
    val n = BigInt(pairs.length)
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val cov = (n * sxy - sx * sy).toDouble
    val vx = (n * sxx - sx * sx).toDouble
    val vy = (n * syy - sy * sy).toDouble
    val sh = (sx - sy).toDouble
    val r = cov / math.sqrt(vx * vy)
    val ccc = 2.0 * cov / (vx + vy + sh * sh)
    val g = run("q_ml_ccc").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == pairs.length.toLong)
    assert(math.abs(g.head.getDouble(1) - r) < 1e-6)
    assert(math.abs(g.head.getDouble(2) - ccc) < 1e-6)
    // Lin's CCC is bounded by Pearson in magnitude
    assert(math.abs(g.head.getDouble(2)) <= math.abs(g.head.getDouble(1)) + 1e-9)
  }
}
