package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 5 — corpus statistics (Zipf fit, hapax/TTR),
  * count-min sketch one-sided error, calendar lag features against a
  * brute-force recompute, and parse_url against plain string ops. */
class Pipeline37Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def tokenCounts(): Map[String, Long] =
    Tables.documents(spark, dir).collect()
      .flatMap(_.getAs[String]("text").toLowerCase.split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("zipf: OLS slope/intercept re-derive from ranked counts") {
    val cnt = tokenCounts()
    val ranked = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((_, c), i) => (i + 1L, c) }
    val n = ranked.length.toDouble
    val xs = ranked.map { case (r, _) => math.log(r.toDouble) }
    val ys = ranked.map { case (_, c) => math.log(c.toDouble) }
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    val got = run("q_text_zipf").collect().head
    assert(got.getLong(0) == ranked.length)
    assert(got.getLong(1) == cnt.values.sum)
    assert(math.abs(got.getDouble(2) - slope) < 1e-4)
    assert(math.abs(got.getDouble(3) - intercept) < 1e-4)
    assert(got.getDouble(2) < 0) // frequencies decrease in rank
  }

  test("hapax: per-source tokens/types/hapax re-derive; ppm bounds") {
    val bySource = Tables.documents(spark, dir).collect()
      .groupBy(_.getAs[String]("source"))
    val got = run("q_text_hapax").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, docs) =>
      val toks = docs.flatMap(
        _.getAs[String]("text").toLowerCase.split(" ")).filter(_.nonEmpty)
      val counts = toks.groupBy(identity).view.mapValues(_.length).toMap
      val r = got(src)
      assert(r.getLong(1) == toks.length)
      assert(r.getLong(2) == counts.size)
      assert(r.getLong(3) == counts.values.count(_ == 1))
      assert(r.getLong(4) == 1000000L * counts.size / toks.length)
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L)
    }
  }

  test("count-min: estimates one-sided, exact on the fixture's tiny vocab collisions") {
    val cnt = tokenCounts()
    val top5 = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(5)
    val rows = run("q_agg_countmin").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      top5.map(_._1).sorted)
    rows.foreach { r =>
      assert(r.getLong(1) == cnt(r.getString(0))) // exact column exact
      assert(r.getLong(2) >= r.getLong(1)) // CMS never underestimates
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }

  test("lag features: brute-force recompute for every user") {
    val daily = Tables.events(spark, dir).collect()
      .groupBy(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate))
      .view.mapValues(_.map(r =>
        math.round(r.getAs[Double]("value") * 100)).sum).toMap
    val got = run("q_time_lag_features").collect()
    assert(got.length == daily.size)
    got.foreach { r =>
      val u = r.getLong(0)
      val d = r.getDate(1).toLocalDate
      assert(r.getLong(2) == daily((u, d)))
      assert(r.getLong(3) == daily.getOrElse((u, d.minusDays(1)), 0L))
      val prior7 = (1 to 7).flatMap(k => daily.get((u, d.minusDays(k))))
      assert(r.getLong(4) == prior7.sum)
      assert(r.getLong(5) == prior7.length)
      assert(r.getLong(6) == d.getDayOfWeek.getValue - 1) // Monday=0
    }
  }

  test("parse_url: host/path/params re-derive from the synthesized url") {
    val rows = run("q_fn_url").collect()
    assert(rows.length ==
      Tables.documents(spark, dir).count())
    rows.foreach { r =>
      val url = r.getString(1)
      val afterScheme = url.stripPrefix("https://")
      assert(r.getString(2) == afterScheme.takeWhile(_ != '/'))
      assert(r.getString(3) ==
        afterScheme.dropWhile(_ != '/').takeWhile(_ != '?'))
      val q = url.dropWhile(_ != '?').drop(1)
      val params = q.split("&").map(_.split("=")).map(a => a(0) -> a(1)).toMap
      assert(r.getString(4) == params("lang"))
      assert(r.getString(5) == params("v"))
    }
  }
}
