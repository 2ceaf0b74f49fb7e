package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 39 — null-aware anti join, PSI, FD profile,
  * Kruskal-Wallis, ECE. */
class Pipeline71Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("null-aware anti: NAAJ plan + three-valued-logic counts") {
    val df = run("q_join_null_aware_anti")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // one NULL in the subquery → NOT IN is never true
    assert(rows("with_null") == 0L)
    // no-null variant = the real anti count, re-derived
    val rich = Tables.customer(spark, dir)
      .where(col("c_acctbal") >= 5000)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val expected = Tables.orders(spark, dir)
      .select("o_custkey").collect().map(_.getLong(0))
      .count(k => !rich.contains(k))
    assert(rows("no_null") == expected.toLong)
    assert(rows("no_null") > 0L)
    // the nullable NOT IN compiles to the single-column null-aware
    // broadcast hash join fast path (isNullAwareAntiJoin renders as
    // the trailing `true` flag), never a nested-loop scan
    val plan = df.queryExecution.executedPlan.toString
    val naaj = raw"BroadcastHashJoin .*LeftAnti, BuildRight, true".r
      .findAllIn(plan).size
    // the AQE string renders Final + Initial plan sections, so the
    // two logical NAAJs can print up to 4 times; >= 2 pins presence
    assert(naaj >= 2,
      s"expected >= 2 null-aware anti joins, got $naaj in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "NOT IN fell back to a nested-loop join")
  }

  test("psi: ordered-fold re-derivation, zero on identical slices") {
    val g = run("q_ml_psi").collect()
    assert(g.length == 10)
    val (tr, tc) = (g.map(_.getLong(1)).sum, g.map(_.getLong(2)).sum)
    assert(tr + tc == Tables.orders(spark, dir).count())
    var total = 0.0
    g.sortBy(_.getLong(0)).foreach { r =>
      val p = (r.getLong(1) + 1.0) / (tr + 10)
      val q = (r.getLong(2) + 1.0) / (tc + 10)
      val term = (p - q) * math.log(p / q)
      assert(math.abs(r.getDouble(3) - term) < 1e-6)
      total += term
    }
    assert(math.abs(g.head.getDouble(4) - total) < 1e-6)
    assert(total >= 0) // PSI is a symmetrized KL — nonnegative
  }

  test("fd profile: held and violated candidates both graded") {
    val rows = run("q_profile_fd_check").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (fd, nLhs, nPairs, nViol, holds) = (r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(nPairs >= nLhs)
      assert(holds == (nViol == 0L))
      assert(holds == (nPairs == nLhs), s"$fd: pairs==lhs iff holds")
      if (fd.startsWith("orders: o_orderkey") ||
          fd.startsWith("nation:")) assert(holds, s"$fd must hold")
      if (fd.startsWith("orders: o_custkey") ||
          fd.startsWith("customer:")) assert(!holds, s"$fd must violate")
    }
  }

  test("kruskal-wallis: exact scipy-style re-derivation") {
    val xs = Tables.orders(spark, dir)
      .selectExpr("cast(round(o_totalprice * 100) as bigint)",
        "o_orderstatus")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = xs.length
    // average ranks over ties
    val byV = xs.map(_._1).groupBy(identity).view.mapValues(_.length)
      .toSeq.sortBy(_._1)
    var below = 0L
    val avgRank = byV.map { case (v, c) =>
      val r = below + (c + 1) / 2.0; below += c; v -> r }.toMap
    val groups = xs.groupBy(_._2)
    val hRaw = 12.0 / (n.toDouble * (n + 1)) * groups.values.map { g =>
      val rs = g.map(e => avgRank(e._1)).sum
      rs * rs / g.length
    }.sum - 3.0 * (n + 1)
    val t3 = byV.map { case (_, c) => c.toDouble * c * c - c }.sum
    val c = 1.0 - t3 / (n.toDouble * n * n - n)
    val row = run("q_ml_kruskal_wallis").collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) + row.getLong(2) + row.getLong(3) == n.toLong)
    assert(math.abs(row.getDouble(5) - hRaw) < 1e-4)
    assert(math.abs(row.getDouble(6) - hRaw / c) < 1e-4)
    assert(row.getDouble(6) >= row.getDouble(5) - 1e-9) // ties only inflate
  }

  test("ece: bin re-derivation + bounds") {
    val scored = operators.Pipeline12.scored(spark, dir).collect()
      .map(x => (((x.getLong(2) + 8128L) * 1000L) / 16256L,
        if (x.getBoolean(1)) 1.0 else 0.0))
    val bins = scored.groupBy(s => math.min(s._1 / 100, 9L))
    val n = scored.length
    val gaps = bins.values.map { xs =>
      val acc = xs.map(_._2).sum / xs.length
      val conf = xs.map(_._1).sum.toDouble / xs.length / 1000.0
      (xs.length, math.abs(acc - conf))
    }
    val ece = gaps.map { case (nk, g) => nk * g }.sum / n
    val mce = gaps.map(_._2).max
    val row = run("q_ml_ece").collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(2) - ece) < 1e-6)
    assert(math.abs(row.getDouble(3) - mce) < 1e-6)
    assert(row.getDouble(2) <= row.getDouble(3) + 1e-9) // ECE <= MCE
  }
}
