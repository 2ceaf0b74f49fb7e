package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 32 — rolling exact median, stratified
  * effect, and the CSV dialect roundtrip. */
class Pipeline64Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def interpMedian(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2).toDouble
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  test("rolling median: sliding multiset re-derivation") {
    val daily = Tables.events(spark, dir)
      .selectExpr("event_type", "cast(ts as date) as d",
        "cast(round(value * 100) as bigint) as v")
      .groupBy("event_type", "d").agg(sum("v").as("rev"))
      .orderBy("event_type", "d").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val g = run("q_win_rolling_median").collect()
    assert(g.length == daily.length)
    val expected = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.map { i =>
        val w = sorted.slice(math.max(0, i - 13), i + 1).map(_._3)
        ((t, sorted(i)._2), (w.length.toLong,
          math.rint(interpMedian(w) * 1e4) / 1e4))
      }
    }
    expected.foreach { case ((t, d), (wn, med)) =>
      val row = g.find(r =>
        r.getString(0) == t && r.getDate(1).toString == d).get
      assert(row.getLong(2) == wn)
      assert(math.abs(row.getDouble(3) - med) < 1e-4)
    }
  }

  test("stratified effect: ordered-fold re-derivation") {
    val raw = Tables.events(spark, dir)
      .selectExpr("user_id", "cast(ts as date) as d", "event_type")
      .collect()
      .map(r => ((r.getLong(0), r.getDate(1).toLocalDate), r.getString(2)))
    val byBlock = raw.groupBy(_._1).view.mapValues(_.map(_._2))
    val strata = byBlock.toSeq.map { case ((_, d), types) =>
      val s = ((d.getDayOfWeek.getValue + 6) % 7).toLong // Mon=0
      val t = if (types.contains("click")) 1L else 0L
      val y = if (types.contains("purchase")) 1L else 0L
      (s, t, y)
    }
    val grouped = strata.groupBy(_._1).toSeq.sortBy(_._1)
    val n = strata.length.toLong
    var adj = 0.0
    grouped.foreach { case (_, g0) =>
      val nt = g0.count(_._2 == 1L).toLong
      val ot = g0.count(b => b._2 == 1L && b._3 == 1L).toLong
      val nc = g0.count(_._2 == 0L).toLong
      val oc = g0.count(b => b._2 == 0L && b._3 == 1L).toLong
      adj += (nt + nc).toDouble * (ot.toDouble / nt - oc.toDouble / nc)
    }
    val nT = strata.count(_._2 == 1L).toLong
    val oT = strata.count(b => b._2 == 1L && b._3 == 1L).toLong
    val nC = strata.count(_._2 == 0L).toLong
    val oC = strata.count(b => b._2 == 0L && b._3 == 1L).toLong
    val g = run("q_ml_stratified_effect").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == grouped.length.toLong)
    assert(g.head.getLong(1) == nT && g.head.getLong(2) == nC)
    assert(math.abs(g.head.getDouble(3) -
      (oT.toDouble / nT - oC.toDouble / nC)) < 1e-6)
    assert(math.abs(g.head.getDouble(4) - adj / n) < 1e-6)
  }

  test("csv dialect: quoted pipe values survive the roundtrip") {
    val expected = Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sc"),
        countDistinct(expr("concat(lang, '|', source)")).as("nt"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val g = run("q_source_csv_dialect").collect()
    assert(g.length == expected.size)
    g.foreach { r =>
      val (nd, sc, nt) = expected(r.getString(0))
      assert(r.getLong(1) == nd)
      assert(r.getLong(2) == sc)
      assert(r.getLong(3) == nt)
    }
  }
}
