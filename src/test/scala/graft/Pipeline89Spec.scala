package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-16 batch 57 — AD k-sample, Matryoshka, Hamming
  * calibration. */
class Pipeline89Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val emb = Tables.embeddings(spark, dir)
    .selectExpr("cast(label as long)", "cast(vec_id as long)",
      "transform(embedding, x -> cast(x as double))")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))

  test("ad k-sample: JVM midrank re-derivation per component") {
    val g = run("q_ml_ad_ksamp").collect()
    val pts = Tables.events(spark, dir)
      .selectExpr("event_type", "cast(round(value * 100) as bigint)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val types = pts.map(_._1).distinct.sorted
    val values = pts.map(_._2).distinct.sorted
    val nTot = pts.length.toLong
    val counts = pts.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    assert(g.map(_.getString(0)).toSeq == types.toSeq)
    g.foreach { row =>
      val t = row.getString(0)
      val ni = pts.count(_._1 == t).toLong
      assert(row.getLong(1) == ni)
      var sum = 0.0
      var mi = 0L
      var b = 0L
      values.foreach { v =>
        val lij = counts.getOrElse((t, v), 0L)
        val lj = types.map(tt => counts.getOrElse((tt, v), 0L)).sum
        mi += lij
        b += lj
        if (lj > 0) {
          val d = BigInt(nTot) * (2 * mi - lij) - BigInt(ni) * (2 * b - lj)
          val e = (2 * b - lj) * (2 * nTot - 2 * b + lj) - nTot * lj
          sum += lj.toDouble * (d * d).toDouble / (nTot.toDouble * e)
        }
      }
      val comp = (nTot - 1).toDouble / (nTot.toDouble * ni) * sum
      assert(math.abs(row.getDouble(2) - comp) < 1e-5,
        s"$t: ${row.getDouble(2)} vs $comp")
      assert(row.getDouble(2) > 0)
    }
    // under the fixture's shared value distribution the statistic sits
    // near its null mean k-1 — far from a separation regime
    val a2 = g.map(_.getDouble(2)).sum
    assert(a2 > 0 && a2 < 50)
  }

  test("matryoshka: JVM drift re-derivation; drift shrinks as prefix grows") {
    val g = run("q_vec_matryoshka").collect()
    def cos(x: Array[Double], y: Array[Double], l: Int): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < l) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      d / math.sqrt(nx * ny)
    }
    val byLabel = emb.groupBy(_._1)
    val drifts = Seq(8, 16, 32).map { l =>
      l -> byLabel.values.flatMap { blk =>
        val sorted = blk.sortBy(_._2)
        for (i <- sorted.indices; j <- (i + 1) until sorted.length) yield
          math.round(math.abs(
            cos(sorted(i)._3, sorted(j)._3, l) -
              cos(sorted(i)._3, sorted(j)._3, 64)) * 1e6)
      }.toSeq
    }.toMap
    assert(g.length == 3)
    g.foreach { r =>
      val l = r.getLong(0).toInt
      val d = drifts(l)
      assert(r.getLong(1) == d.length.toLong)
      assert(r.getLong(2) == d.sum / d.length)
      assert(r.getLong(3) == d.max)
    }
    // longer prefixes preserve cosine better (mean drift decreasing)
    val means = g.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(means(0) >= means(1) && means(1) >= means(2))
  }

  test("hamming agreement: counts conserve; mean cosine decreasing in distance") {
    val g = run("q_vec_hamming_agreement").collect()
    val nPairs = emb.groupBy(_._1).values
      .map(b => b.size.toLong * (b.size - 1) / 2).sum
    assert(g.map(_.getLong(1)).sum == nPairs)
    assert(g.map(_.getLong(0)).forall(h => h >= 0 && h <= 16))
    // the LSH contract: cosine falls as fingerprint distance grows —
    // allow local noise, pin the aggregate trend (first vs last third)
    val rows = g.sortBy(_.getLong(0))
    if (rows.length >= 4) {
      val k = rows.length / 3
      def wMean(xs: Array[org.apache.spark.sql.Row]): Double = {
        val n = xs.map(_.getLong(1)).sum
        xs.map(r => r.getLong(2).toDouble * r.getLong(1)).sum / n
      }
      assert(wMean(rows.take(k)) > wMean(rows.takeRight(k)),
        "near fingerprints should be cosine-closer than far ones")
    }
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(4))
    }
  }
}
