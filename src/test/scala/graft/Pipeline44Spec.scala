package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 12 — stylometry keys re-derived on the
  * driver from collected sf0.001 token counts. */
class Pipeline44Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def srcTokens: Array[(String, String)] =
    Tables.documents(spark, dir).collect().flatMap { r =>
      r.getAs[String]("text").toLowerCase.split(" ").filter(_.nonEmpty)
        .map(t => (r.getAs[String]("source"), t))
    }

  test("js divergence: nonnegative, <= ln2 normalized, re-derives") {
    val cells = srcTokens.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val bySrc = cells.groupBy(_._1._1)
    val corp = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = corp.values.sum.toDouble
    val rows = run("q_text_js_divergence").collect()
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val src = r.getString(0)
      val sc = bySrc(src)
      val ns = sc.values.sum.toDouble
      assert(r.getLong(1) == ns.toLong)
      assert(r.getLong(2) == sc.size)
      // re-derive with the same per-cell nano quantization
      val present = sc.map { case ((_, t), c) =>
        val p = c / ns; val q = corp(t) / nn; val m = (p + q) / 2
        math.round((0.5 * p * math.log(p / m) +
          0.5 * q * math.log(q / m)) * 1e9)
      }.sum
      val sct = sc.keys.toSeq.map(k => corp(k._2)).sum
      val jsd = present +
        math.round(0.5 * math.log(2) * (1 - sct / nn) * 1e9)
      assert(r.getLong(3) == jsd, s"$src jsd_nano")
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0 + 1e-9)
    }
  }

  test("burrows delta: symmetric support, self-delta ~ 0 via identity") {
    val rows = run("q_text_burrows_delta").collect()
    val srcs = srcTokens.map(_._1).distinct.sorted
    // all ordered pairs present (every source shares the top-20 words
    // in this fixture's tiny shared vocabulary)
    assert(rows.length == srcs.combinations(2).size)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) > 0 && r.getLong(2) <= 20)
      assert(r.getDouble(3) >= 0)
    }
  }

  test("heaps law: beta in (0, 1] for natural-ish sublinear growth") {
    val r = run("q_text_heaps_law").collect().head
    val srcs = srcTokens.map(_._1).distinct
    assert(r.getLong(0) == srcs.length)
    // tiny shared vocabulary => strongly sublinear vocabulary growth
    assert(r.getDouble(1) > -1 && r.getDouble(1) < 1.0)
    assert(r.getDouble(2) > 0)
    // re-derive the micro-quantized log-log OLS
    val cells = srcTokens.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val pts = cells.groupBy(_._1._1).toSeq.map { case (_, m) =>
      (math.round(math.log(m.values.sum.toDouble) * 1e6),
        math.round(math.log(m.size.toDouble) * 1e6))
    }.toArray
    val s = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => p._1.toDouble * p._1).sum
    val sxy = pts.map(p => p._1.toDouble * p._2).sum
    val beta = (s * sxy - sx * sy) / (s * sxx - sx * sx)
    assert(math.abs(r.getDouble(1) - beta) < 1e-4)
  }
}
