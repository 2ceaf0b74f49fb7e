package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-16 batch 54 — BM25, Good–Turing, gamma, Theil's U. */
class Pipeline86Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val toks = operators.TextOps.tokens(spark, dir)
    .select(col("doc_id").cast("long"), col("token"))
    .collect().map(r => (r.getLong(0), r.getString(1)))

  test("bm25: JVM re-derivation of scores and per-term ranking") {
    val g = run("q_text_bm25").collect()
    val dl = toks.groupBy(_._1).map { case (d, t) => d -> t.length }
    val n = dl.size.toDouble
    val avgdl = dl.values.sum / n
    val terms = Seq("scan", "vector", "stream", "hash", "slow")
    val expected = terms.flatMap { t =>
      val tf = toks.filter(_._2 == t).groupBy(_._1)
        .map { case (d, xs) => d -> xs.length }
      val df = tf.size
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      tf.toSeq.map { case (d, f) =>
        val score = idf * (f * 2.2) /
          (f + 1.2 * (1 - 0.75 + 0.75 * dl(d) / avgdl))
        (t, d,
          BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }.sortBy { case (_, d, sc) => (-sc, d) }.take(10)
        .zipWithIndex.map { case ((tm, d, sc), i) => (tm, d, sc, i + 1L) }
    }.toSet
    val got = g.map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4))).toSet
    assert(got == expected)
    assert(g.length == terms.size * 10)
  }

  test("good-turing: spectrum identities hold exactly") {
    val g = run("q_text_good_turing").collect()
    val counts = toks.groupBy(_._2).map(_._2.length.toLong)
    val spec = counts.groupBy(identity).map { case (r, v) =>
      r -> v.size.toLong }
    val tot = counts.sum
    assert(g.length == spec.size)
    g.foreach { row =>
      val r = row.getLong(0)
      assert(row.getLong(1) == spec(r))
      val nNext = spec.getOrElse(r + 1, 0L)
      assert(math.abs(row.getDouble(2) -
        (r + 1) * nNext.toDouble / spec(r)) < 1e-6)
      assert(row.getLong(3) == 1000000L * r * spec(r) / tot)
    }
    // the spectrum's mass sums back to the corpus (ppm truncation)
    assert(math.abs(g.map(_.getLong(3)).sum - 1000000L) <= g.length)
  }

  test("gamma: prefix-grid C/D equal the brute-force pair counts") {
    val pts = Tables.lineitem(spark, dir)
      .selectExpr("cast(l_quantity as bigint)",
        "cast(round(l_discount * 100) as bigint)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cells = pts.groupBy(identity).map { case ((x, y), v) =>
      (x, y, v.length.toLong) }.toSeq
    var c = 0L; var d = 0L
    for ((x1, y1, c1) <- cells; (x2, y2, c2) <- cells
         if x1 < x2) {
      if (y1 < y2) c += c1 * c2
      else if (y1 > y2) d += c1 * c2
    }
    val row = run("q_ml_gk_gamma").head
    assert(row.getLong(0) == c)
    assert(row.getLong(1) == d)
    assert(math.abs(row.getDouble(2) - (c - d).toDouble / (c + d)) < 1e-6)
  }

  test("theil's u: direction asymmetry and entropy identities") {
    val row = run("q_ml_theils_u").head
    val pairs = Tables.orders(spark, dir)
      .select("o_orderstatus", "o_orderpriority")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = pairs.length.toDouble
    def h(m: Iterable[Int]) =
      -m.map(c => c / n * math.log(c / n)).sum
    val hx = h(pairs.groupBy(_._1).values.map(_.length))
    val hy = h(pairs.groupBy(_._2).values.map(_.length))
    val hxy = h(pairs.groupBy(identity).values.map(_.length))
    val i = hx + hy - hxy
    assert(math.abs(row.getDouble(0) - hx) < 1e-5)
    assert(math.abs(row.getDouble(1) - hy) < 1e-5)
    assert(math.abs(row.getDouble(2) - i / hy) < 1e-5)
    assert(math.abs(row.getDouble(3) - i / hx) < 1e-5)
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= 1)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
  }
}
