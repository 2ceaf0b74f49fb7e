package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 29 — time-to-convert, audience overlap, and
  * week-over-week growth. */
class Pipeline61Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("time to convert: counts and conversion share re-derived") {
    val firsts = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "click",
          col("ts").cast("long"))).as("c"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("long"))).as("p"))
      .collect()
      .map(r => (if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .filter(_._1.isDefined)
    val deltas = firsts.flatMap { case (c, p) =>
      p.filter(_ >= c.get).map(_ - c.get)
    }
    val g = run("q_events_time_to_convert").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == firsts.length.toLong)
    assert(g.head.getLong(1) == deltas.length.toLong)
    assert(g.head.getLong(2) ==
      1000000L * deltas.length / firsts.length)
    // p50 <= p90, both within the observed delta range
    assert(g.head.getDouble(3) <= g.head.getDouble(4))
    assert(g.head.getDouble(3) >= deltas.min.toDouble)
    assert(g.head.getDouble(4) <= deltas.max.toDouble)
  }

  test("audience overlap: exact set re-derivation for every pair") {
    val inc = Tables.events(spark, dir)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = inc.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val g = run("q_events_audience_overlap").collect()
    val types = byType.keys.toSeq.sorted
    val expectedPairs = for {
      i <- types.indices; j <- (i + 1) until types.length
      if (byType(types(i)) & byType(types(j))).nonEmpty
    } yield (types(i), types(j))
    assert(g.length == expectedPairs.length)
    g.foreach { r =>
      val a = byType(r.getString(0)); val b = byType(r.getString(1))
      val inter = (a & b).size.toLong
      val union = (a | b).size.toLong
      assert(r.getLong(2) == inter)
      assert(r.getLong(3) == union)
      assert(math.abs(r.getDouble(4) - inter.toDouble / union) < 1e-6)
    }
  }

  test("wow growth: lag identity and first-week nulls") {
    val g = run("q_time_wow_growth").collect()
    val byType = g.groupBy(_.getString(0))
    byType.values.foreach { rows =>
      val sorted = rows.sortBy(_.getDate(1).toString)
      assert(sorted.head.isNullAt(3) && sorted.head.isNullAt(4))
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur.getLong(3) == prev.getLong(2))
          val expected = (cur.getLong(2) - prev.getLong(2)) * 1e6 /
            prev.getLong(2)
          assert(math.abs(cur.getDouble(4) - expected) < 1e-3)
        case _ =>
      }
    }
    // 30 days of Jan 2024 span 5 ISO weeks
    assert(byType.values.head.length == 5)
  }
}
