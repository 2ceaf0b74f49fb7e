package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-13 batch 6 — the Holt-Winters weight table verified
  * against an independently-written impulse-response simulation of
  * the raw recurrences, elbow-curve monotonicity/determinism, and
  * winsorized-vs-trimmed bound agreement. */
class Pipeline30Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("holt-winters weights = impulse response of the raw recurrences") {
    // simulate l/b/s on a unit impulse with exact rationals scaled to
    // 4^16 — written from the textbook update equations, NOT the
    // companion matrix the implementation derives its weights from
    val den = BigInt(4).pow(16)
    var l = BigInt(0); var b = BigInt(0)
    val s = Array.fill(7)(BigInt(0)) // seasonal ring, s(t mod 7)
    val sim = (0 to 15).map { t =>
      val x = if (t == 0) den else BigInt(0) // impulse at day 0
      val s7 = s(t % 7) // s_{t-7} under zero init
      val l1 = (x - s7) / 2 + (l + b) / 2
      val b1 = (l1 - l) / 2 + b / 2
      val s1 = (x - l1) / 2 + s7 / 2
      l = l1; b = b1; s(t % 7) = s1
      (t, l1, b1, s1)
    }
    operators.Pipeline30.hwWeights.foreach { case (k, wl, wb, ws) =>
      val (_, el, eb, es) = sim(k)
      assert(BigInt(wl) == el && BigInt(wb) == eb && BigInt(ws) == es,
        s"k=$k: ($wl,$wb,$ws) vs ($el,$eb,$es)")
    }
    assert(operators.Pipeline30.hwWeights
      .forall { case (_, a, c, d) =>
        math.abs(a).max(math.abs(c)).max(math.abs(d)) <= (1L << 31) })
  }

  test("holt-winters: first observed day smooths the impulse exactly") {
    val rows = run("q_time_holt_winters").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val first = rs.minBy(_.getDate(1).toLocalDate.toEpochDay)
      val v = first.getLong(2)
      assert(first.getLong(3) == v / 2) // level = v·(2·4^15)/4^16
      assert(first.getLong(4) == v / 4) // trend = v·4^15/4^16
      assert(first.getLong(5) == v / 4) // seasonal likewise
    }
  }

  test("kmeans elbow: deterministic, monotone cost, cluster bounds") {
    val a = run("q_ml_kmeans_elbow").collect()
    val b = run("q_ml_kmeans_elbow").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L, 16L))
    a.foreach { r =>
      assert(r.getDouble(1) > 0)
      assert(r.getLong(2) >= 2 && r.getLong(2) <= r.getLong(0))
    }
    val costs = a.map(_.getDouble(1))
    assert(costs.zip(costs.tail).forall { case (x, y) => y <= x },
      s"costs not non-increasing: ${costs.toSeq}")
  }

  test("winsorized: bounds equal q_agg_trimmed's; mean inside bounds") {
    val wins = run("q_agg_winsorized").collect()
      .map(r => r.getString(0) -> r).toMap
    val trim = run("q_agg_trimmed").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(wins.keySet == trim.keySet)
    wins.foreach { case (ty, w) =>
      val t = trim(ty)
      // identical ceil-rank p5/p95 derivation on both keys
      assert(w.getLong(1) == t.getLong(1)) // n
      assert(w.getLong(2) == t.getLong(2)) // lo_cents
      assert(w.getLong(3) == t.getLong(3)) // hi_cents
      val m = w.getDouble(4)
      assert(m >= w.getLong(2) / 100.0 - 1e-9 &&
        m <= w.getLong(3) / 100.0 + 1e-9)
    }
  }
}
