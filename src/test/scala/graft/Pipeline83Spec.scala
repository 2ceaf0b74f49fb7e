package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 51 — boosted stumps, SRP fingerprint. */
class Pipeline83Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("boost stumps: JVM re-derivation; SSE strictly improves") {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      .selectExpr("cast(datediff(d, date '1970-01-01') as bigint)", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val lo = daily.map(_._1).min; val hi = daily.map(_._1).max
    val cands = (1L to 15L).map(i => lo + i * (hi - lo) / 16).distinct
    def stump(pts: Seq[(Long, Double)]): (Long, Double, Double, Double) = {
      val n = pts.length
      val best = cands.flatMap { c =>
        val (l, r) = pts.partition(_._1 <= c)
        if (l.isEmpty || r.isEmpty) None
        else {
          def sse(xs: Seq[Double]) = {
            val m = xs.sum / xs.length
            xs.map(v => (v - m) * (v - m)).sum
          }
          Some((c, l.map(_._2).sum / l.length, r.map(_._2).sum / r.length,
            sse(l.map(_._2)) + sse(r.map(_._2))))
        }
      }.minBy(x => (x._4, x._1))
      best
    }
    val pts1 = daily.map { case (x, y) => (x, y.toDouble) }.toSeq
    val s1 = stump(pts1)
    val resid = pts1.map { case (x, y) =>
      (x, y - (if (x <= s1._1) s1._2 else s1._3)) }
    val s2 = stump(resid)
    val g = run("q_ml_boost_stumps").collect()
    assert(g.length == 2)
    val r1 = g.find(_.getLong(0) == 1L).get
    val r2 = g.find(_.getLong(0) == 2L).get
    assert(r1.getLong(1) == s1._1)
    assert(math.abs(r1.getDouble(2) - s1._2) < 1e-2)
    assert(math.abs(r1.getDouble(3) - s1._3) < 1e-2)
    assert(math.abs(r1.getDouble(5) - s1._4) / s1._4 < 1e-9)
    assert(r2.getLong(1) == s2._1)
    assert(math.abs(r2.getDouble(5) - s2._4) / math.max(1.0, s2._4) < 1e-6)
    // boosting must not increase SSE, round over round
    assert(r1.getDouble(5) <= r1.getDouble(4) + 1e-6)
    assert(r2.getDouble(5) <= r2.getDouble(4) + 1e-6)
    assert(math.abs(r2.getDouble(4) - r1.getDouble(5)) < 1e-6)
    assert(g.forall(_.getDouble(6) >= -1e-6)) // gain nonnegative
  }

  test("srp fingerprint: sign re-derivation; buckets are cosine-coherent") {
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("cast(vec_id as long)",
        "transform(embedding, x -> cast(x as double))")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    def sign(d: Int, j: Int): Double =
      if (((d * 64 + j).toLong * 1103515245L + 12345L) % 1000000007L % 2 == 0)
        1.0 else -1.0
    val fps = emb.map { case (id, e) =>
      var fp = 0L
      (0 until 16).foreach { j =>
        var a = 0.0
        (0 until 64).foreach(d => a += e(d) * sign(d, j))
        if (a > 0) fp |= (1L << j)
      }
      (id, fp)
    }
    val expected = fps.groupBy(_._2).filter(_._2.length > 1)
      .map { case (fp, xs) => (fp, xs.length.toLong, xs.map(_._1).min) }
      .toSeq.sortBy(_._1)
    val g = run("q_vec_srp_fingerprint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(g == expected)
    assert(g.nonEmpty, "fixture produces shared fingerprints")
  }
}
