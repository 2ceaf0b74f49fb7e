package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 4 — feature-screening / eval-statistics
  * closers: direct recomputation of MI, WoE/IV, log-loss, the
  * Mann-Whitney rank sum (against a literal sort-and-rank), Cramér's
  * V bounds, and the reservoir sampler's exact-k / hash-order
  * contract. */
class Pipeline36Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("mutual info: nonnegative, bounded by label entropy, exact recompute") {
    val rows = run("q_ml_mutual_info").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("linestatus", "returnflag", "shipyear"))
    // recompute MI for returnflag directly from the fixture
    val li = Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag as v",
        "cast(round(l_discount * 100) as bigint) >= 5 as y")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val n = li.length.toDouble
    val nxy = li.groupBy(identity).view.mapValues(_.length).toMap
    val nx = li.groupBy(_._1).view.mapValues(_.length).toMap
    val ny = li.groupBy(_._2).view.mapValues(_.length).toMap
    val mi = nxy.map { case ((v, y), c) =>
      c / n * math.log(n * c / (nx(v).toDouble * ny(y))) }.sum
    val got = rows.find(_.getString(0) == "returnflag").get
    assert(got.getLong(1) == li.length)
    assert(math.abs(got.getDouble(3) - mi) < 1e-4)
    // MI bounds: 0 <= MI <= H(y)
    val hy = -ny.values.map(c => c / n * math.log(c / n)).sum
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) <= hy + 1e-9)
    }
  }

  test("woe/iv: distributions re-derive; iv contributions nonnegative") {
    val rows = run("q_ml_woe_iv").collect()
    assert(rows.length == 5) // 5 priorities
    val g = rows.map(_.getLong(1)).sum.toDouble
    val b = rows.map(_.getLong(2)).sum.toDouble
    rows.foreach { r =>
      val woe = math.log(((r.getLong(1) + 0.5) / g) /
        ((r.getLong(2) + 0.5) / b))
      assert(math.abs(r.getDouble(3) - woe) < 1e-5)
      // (dg - db) and woe share sign modulo smoothing -> contrib >= -eps
      assert(r.getDouble(4) >= -1e-3)
    }
  }

  test("log-loss: exact recompute; worse than the base-rate bound of a perfect predictor") {
    val got = run("q_ml_log_loss").collect().head
    val rows = operators.Pipeline12.scored(spark, dir).collect()
    val ll = -rows.map { r =>
      val pm = math.max(1L, math.min(999L,
        (r.getLong(2) + 8128L) * 1000L / 16256L))
      val p = pm / 1000.0
      if (r.getBoolean(1)) math.log(p) else math.log(1 - p)
    }.sum / rows.length
    assert(got.getLong(0) == rows.length)
    assert(math.abs(got.getDouble(2) - ll) < 1e-5)
    assert(got.getDouble(2) > 0)
  }

  test("mann-whitney: rank-sum against a literal sort-and-average-rank") {
    val base = Tables.events(spark, dir)
      .where(org.apache.spark.sql.functions.col("event_type")
        .isin("purchase", "click"))
      .selectExpr("cast(round(value * 100) as bigint) as x",
        "event_type = 'purchase' as g1")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val sorted = base.sortBy(_._1)
    // average rank per tie group
    val ranks = scala.collection.mutable.Map[Long, Double]()
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      ranks(sorted(i)._1) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
      i = j
    }
    val n1 = base.count(_._2).toLong
    val n2 = base.length - n1
    val r1 = base.filter(_._2).map(t => ranks(t._1)).sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val got = run("q_ml_mannwhitney").collect().head
    assert(got.getLong(0) == n1 && got.getLong(1) == n2)
    assert(math.abs(got.getDouble(2) - u1) < 1e-6)
    assert(math.abs(got.getDouble(3) - n1 * n2 / 2.0) < 1e-6)
    // z re-derivation with tie correction
    val nn = base.length.toLong
    val t3 = sorted.groupBy(_._1).values
      .map(g => g.length.toDouble)
      .map(t => t * t * t - t).sum
    val sg = math.sqrt(n1.toDouble * n2 / 12.0 *
      ((nn + 1) - t3 / (nn.toDouble * (nn - 1))))
    assert(math.abs(got.getDouble(5) - (u1 - n1 * n2 / 2.0) / sg) < 1e-4)
  }

  test("cramers v: bounds and chi2 consistency") {
    val rows = run("q_ml_cramers_v").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (n, rr, cc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val chi2 = r.getDouble(4)
      val v = r.getDouble(5)
      assert(chi2 >= 0)
      assert(v >= 0 && v <= 1 + 1e-9)
      val expected = math.sqrt(chi2 / (n * math.min(rr - 1, cc - 1)))
      assert(math.abs(v - expected) < 1e-5)
    }
  }

  test("reservoir: exactly min(k, group) rows per type, in hash order, hash-uniform") {
    val rows = run("q_sample_reservoir").collect()
    val byType = rows.groupBy(_.getString(0))
    val totals = Tables.events(spark, dir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.keySet == totals.keySet)
    byType.foreach { case (t, rs) =>
      assert(rs.length == math.min(50L, totals(t)))
      // rn contiguous from 1 and h nondecreasing in rn order
      val sortedRs = rs.sortBy(_.getLong(1))
      assert(sortedRs.map(_.getLong(1)).toSeq == (1L to rs.length).toSeq)
      val hs = sortedRs.map(_.getLong(3))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
      // h is the declared arithmetic hash of event_id
      sortedRs.foreach { r =>
        assert(r.getLong(3) ==
          (1103515245L * r.getLong(2) + 12345L) % 2147483647L)
      }
    }
    // rerun determinism
    val again = run("q_sample_reservoir").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
