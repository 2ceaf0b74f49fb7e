package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-16 batch 55 — Grubbs, weighted kappa, uplift,
  * Croston. */
class Pipeline87Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("grubbs: JVM argmax/statistic re-derivation per type") {
    val g = run("q_ml_grubbs").collect()
    val ev = Tables.events(spark, dir)
      .selectExpr("event_type", "cast(event_id as long)",
        "cast(round(value * 100) as bigint)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = ev.groupBy(_._1)
    assert(g.map(_.getString(0)).toSet == byType.keySet)
    g.foreach { row =>
      val xs = byType(row.getString(0))
      val n = xs.length.toLong
      val sc = xs.map(_._3).sum
      val best = xs.map(x => (math.abs(n * x._3 - sc), x._2))
        .sortBy(t => (-t._1, t._2)).head
      assert(row.getLong(1) == n)
      assert(row.getLong(2) == best._2)
      val mean = sc.toDouble / n
      val varr = xs.map(x => (x._3 - mean) * (x._3 - mean)).sum / (n - 1)
      val gExp = (best._1.toDouble / n) / math.sqrt(varr)
      assert(math.abs(row.getDouble(3) - gExp) < 1e-4,
        s"${row.getString(0)}: ${row.getDouble(3)} vs $gExp")
      // Grubbs statistic is bounded by (n-1)/sqrt(n)
      assert(row.getDouble(3) <= (n - 1) / math.sqrt(n.toDouble) + 1e-9)
    }
  }

  test("weighted kappa: contingency re-derivation; quadratic vs linear order") {
    val row = run("q_ml_weighted_kappa").head
    val rated = Tables.orders(spark, dir)
      .selectExpr("cast(substring(o_orderpriority, 1, 1) as bigint)",
        "least(4L, cast(round(o_totalprice * 100) as bigint) div 5000000) + 1")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rated.length.toLong
    def kappa(w: (Long, Long) => Long): Double = {
      val obs = rated.map { case (a, b) => w(a, b) }.sum
      val as = rated.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
      val bs = rated.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
      val exp = (for ((ka, a) <- as; (kb, b) <- bs)
        yield w(ka, kb) * a * b).sum
      1.0 - n.toDouble * obs / exp
    }
    val kq = kappa((a, b) => (a - b) * (a - b))
    val kl = kappa((a, b) => math.abs(a - b))
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - kq) < 1e-6)
    assert(math.abs(row.getDouble(2) - kl) < 1e-6)
  }

  test("uplift: arm counts conserve and ppm arithmetic is exact") {
    val g = run("q_events_uplift").collect()
    val users = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.map(r => r.getLong(1) + r.getLong(2)).sum == users.length)
    g.foreach { r =>
      if (!r.isNullAt(5)) {
        assert(r.getLong(5) ==
          1000000L * r.getLong(3) / r.getLong(1) -
            1000000L * r.getLong(4) / r.getLong(2))
      } else assert(r.getLong(1) == 0 || r.getLong(2) == 0)
    }
    assert(g.length >= 2, "banding spreads the fixture")
  }

  test("croston: fixed-point EWMA re-derivation per type") {
    val g = run("q_time_croston").collect()
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("d"))
      .where(col("d") > 0)
      .selectExpr("event_type", "cast(day as string)", "d")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    g.foreach { row =>
      val xs = byType(row.getString(0)).sortBy(_._2)
      val k = xs.length
      assert(row.getLong(1) == k.toLong)
      // EWMA recursion z_1 = d_1; z_i = (z_{i-1} + d_i) / 2
      var z = xs.head._3.toDouble
      xs.tail.foreach(x => z = (z + x._3) / 2)
      assert(math.abs(row.getDouble(2) - z / 100.0) < 1e-4)
      val days = xs.map(x => java.time.LocalDate.parse(x._2).toEpochDay)
      val gaps = days.sliding(2).map(p => (p(1) - p(0)).toDouble).toSeq
      var p = gaps.head
      gaps.tail.foreach(x => p = (p + x) / 2)
      assert(math.abs(row.getDouble(3) - p) < 1e-4)
      assert(math.abs(row.getDouble(4) - z / 100.0 / p) < 1e-4)
    }
    assert(g.nonEmpty)
  }
}
