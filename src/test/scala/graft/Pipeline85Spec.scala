package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-16 batch 53 — Binarizer, Davies–Bouldin, NMI/ARI. */
class Pipeline85Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val emb = Tables.embeddings(spark, dir)
    .selectExpr("cast(vec_id as long) as vec_id",
      "cast(label as long) as label",
      "transform(embedding, x -> cast(x as double)) as e")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))

  test("binarizer: genuine stage counts match a direct threshold filter") {
    val g = run("q_ml_binarizer").collect()
    val direct = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g.length == direct.size)
    g.foreach { r =>
      val (n, p) = direct(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == p)
      assert(r.getLong(3) == 1000000L * p / n)
      assert(p > 0 && p < n, "threshold actually separates the fixture")
    }
  }

  test("davies-bouldin: JVM re-derivation on the same micro-quantized geometry") {
    val g = run("q_ml_davies_bouldin").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val micro = emb.map { case (id, l, e) =>
      (id, l, e.map(x => math.round(x * 1e6)))
    }
    val byLabel = micro.groupBy(_._2)
    val sums = byLabel.map { case (l, ms) =>
      l -> (0 until 64).map(d => ms.map(_._3(d)).sum).toArray
    }
    val ns = byLabel.map { case (l, ms) => l -> ms.length.toLong }
    val s = byLabel.map { case (l, ms) =>
      val n = ns(l); val sd = sums(l)
      val sdm = ms.map { m =>
        var dsq = BigInt(0)
        (0 until 64).foreach { d =>
          val t = BigInt(n * m._3(d) - sd(d)); dsq += t * t
        }
        math.round(math.sqrt(dsq.toDouble) / n)
      }.sum
      l -> sdm.toDouble / (n * 1e6)
    }
    val labels = ns.keys.toSeq.sorted
    labels.foreach { li =>
      val r = labels.filter(_ != li).map { lj =>
        var msq = BigInt(0)
        (0 until 64).foreach { d =>
          val t = BigInt(sums(li)(d)) * ns(lj) - BigInt(sums(lj)(d)) * ns(li)
          msq += t * t
        }
        val m = math.sqrt(msq.toDouble) / (ns(li).toDouble * ns(lj) * 1e6)
        (s(li) + s(lj)) / m
      }.max
      val (n, scat, rmax) = g(li)
      assert(n == ns(li))
      assert(math.abs(scat - s(li)) < 1e-6, s"label $li scatter")
      assert(math.abs(rmax - r) < 1e-6, s"label $li r_max")
    }
    // the DB index (mean of r_max) is finite and positive
    val db = g.values.map(_._3).sum / g.size
    assert(db > 0 && db < 100)
  }

  test("nmi/ari: JVM contingency re-derivation; degenerate-agreement guards") {
    val row = run("q_ml_nmi_ari").head
    val pairs = emb.map { case (_, l, e) =>
      (l, (if (e(0) > 0) 2L else 0L) + (if (e(1) > 0) 1L else 0L))
    }
    val n = pairs.length.toDouble
    val cells = pairs.groupBy(identity).map { case (_, v) => v.length.toDouble }
    val as = pairs.groupBy(_._1).map(_._2.length.toDouble)
    val bs = pairs.groupBy(_._2).map(_._2.length.toDouble)
    def c2(x: Double) = x * (x - 1) / 2
    val index = cells.map(c2).sum
    val exp = as.map(c2).sum * bs.map(c2).sum / c2(n)
    val mx = (as.map(c2).sum + bs.map(c2).sum) / 2
    val ari = (index - exp) / (mx - exp)
    val i = cells.map(c => c * math.log(c)).sum / n -
      as.map(a => a * math.log(a)).sum / n -
      bs.map(b => b * math.log(b)).sum / n + math.log(n)
    val ht = math.log(n) - as.map(a => a * math.log(a)).sum / n
    val hp = math.log(n) - bs.map(b => b * math.log(b)).sum / n
    val nmi = i / math.sqrt(ht * hp)
    assert(row.getLong(0) == pairs.length.toLong)
    assert(row.getLong(1) == cells.size.toLong)
    assert(math.abs(row.getDouble(2) - ari) < 1e-5)
    assert(math.abs(row.getDouble(3) - nmi) < 1e-5)
    // a random-ish sign split agrees weakly with 10 true labels
    assert(row.getDouble(3) >= 0 - 1e-6 && row.getDouble(3) <= 1 + 1e-6)
  }
}
