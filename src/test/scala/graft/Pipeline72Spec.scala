package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 40 — Hurst R/S, lexicon sentiment,
  * chi-square goodness of fit. */
class Pipeline72Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("hurst: exact R/S re-derivation per type and size") {
    val series = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .orderBy("event_type", "h")
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = series.flatMap { case (t, xs) =>
      val perSize = Seq(8, 16, 32, 64).flatMap { m =>
        val nBlocks = xs.length / m
        val lnrs = (0 until nBlocks).flatMap { b =>
          val blk = xs.slice(b * m, (b + 1) * m)
          val s = blk.sum; val q = blk.map(x => x * x).sum
          if (m * q - s * s <= 0) None
          else {
            var pre = 0L
            val nds = blk.zipWithIndex.map { case (x, i) =>
              pre += x; m * pre - (i + 1) * s }
            val r = math.max(0L, nds.max) - math.min(0L, nds.min)
            Some(math.log(r.toDouble /
              math.sqrt((m * q - s * s).toDouble)))
          }
        }
        if (lnrs.isEmpty) None
        else Some((m, lnrs.size, lnrs.foldLeft(0.0)(_ + _) / lnrs.size))
      }
      val k = perSize.size
      val mx = perSize.map(p => math.log(p._1.toDouble)).foldLeft(0.0)(_ + _) / k
      val my = perSize.map(_._3).foldLeft(0.0)(_ + _) / k
      val h = perSize.map(p => (math.log(p._1.toDouble) - mx) * (p._3 - my))
        .foldLeft(0.0)(_ + _) /
        perSize.map(p => math.pow(math.log(p._1.toDouble) - mx, 2))
          .foldLeft(0.0)(_ + _)
      perSize.map { case (m, nb, ml) => (t, m.toLong, nb.toLong, ml, h) }
    }.toSeq.sortBy(x => (x._1, x._2))
    val g = run("q_time_hurst").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(g.length == expected.length)
    g.zip(expected).foreach { case (a, e) =>
      assert(a._1 == e._1 && a._2 == e._2 && a._3 == e._3)
      assert(math.abs(a._4 - e._4) < 1e-6, s"mean_log_rs ${a._1}/${a._2}")
      assert(math.abs(a._5 - e._5) < 1e-6, s"hurst ${a._1}")
    }
    // a counting series is positively persistent or near-random here;
    // H must at least be a sane exponent
    g.foreach(a => assert(a._5 > 0.0 && a._5 < 1.2))
  }

  test("sentiment: totality, bounds, hand-check") {
    val g = run("q_text_sentiment").collect()
    assert(g.length == Tables.documents(spark, dir).count())
    g.foreach { r =>
      val (p, n, s) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(s <= 1000000L && s >= -1000000L)
      assert(s == 1000000L * (p - n) / (p + n + 1))
    }
    // the lexicon words exist in the corpus — scores are not all zero
    assert(g.exists(_.getLong(3) > 0) && g.exists(_.getLong(3) < 0))
  }

  test("chi2 gof: exact re-derivation") {
    val cells = Tables.orders(spark, dir)
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val g = run("q_agg_chi2_gof").collect()
    assert(g.length == cells.size)
    g.foreach { r =>
      val os = cells(r.getString(0))
      val n = os.sum; val k = os.size
      assert(r.getLong(1) == n && r.getLong(2) == k.toLong)
      assert(r.getLong(3) == (k - 1).toLong)
      val chi2 = os.map(o => { val d = k * o - n; d.toDouble * d })
        .sum / (k.toDouble * n)
      assert(math.abs(r.getDouble(4) - chi2) < 1e-4)
      assert(r.getDouble(4) >= 0)
    }
  }
}
