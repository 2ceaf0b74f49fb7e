package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 41 — sequence packing, random projection,
  * Ljung-Box. */
class Pipeline73Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("pack: conservation + sequential re-derivation") {
    val toks = operators.TextOps.tokens(spark, dir)
      .groupBy("doc_id").count().orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val g = run("q_pipeline_pack").collect()
    // every token lands in exactly one example (by starting doc)
    assert(g.map(_.getLong(4)).sum == toks.map(_._2).sum)
    assert(g.map(_.getLong(1)).sum == toks.length.toLong)
    // sequential re-derivation
    var c = 0L
    val byEx = toks.map { case (id, n) =>
      val ex = c / 512; val off = c % 512; c += n
      (ex, id, n, math.max(0L, off + n - 512))
    }.groupBy(_._1)
    g.foreach { r =>
      val ex = byEx(r.getLong(0))
      assert(r.getLong(1) == ex.length.toLong)
      assert(r.getLong(2) == ex.map(_._2).min)
      assert(r.getLong(3) == ex.map(_._2).max)
      assert(r.getLong(4) == ex.map(_._3).sum)
      assert(r.getLong(5) == ex.map(_._4).max)
    }
    assert(g.length == byEx.size)
    // doc-id ranges of consecutive examples never interleave
    val sorted = g.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2))
      case _ =>
    }
  }

  test("random projection: exact per-row re-derivation, sign balance") {
    val emb = Tables.embeddings(spark, dir)
      .selectExpr("cast(vec_id as long)",
        "transform(embedding, x -> cast(x as double))")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    def sign(d: Int, j: Int): Double =
      if (((d * 64 + j).toLong * 1103515245L + 12345L) % 1000000007L % 2 == 0)
        1.0 else -1.0
    val exp = emb.map { case (id, e) =>
      val q = (0 until 16).map { j =>
        var a = 0.0
        (0 until 64).foreach(d => a += e(d) * sign(d, j))
        math.floor(a * 250000).toLong
      }
      (id, q.head, q.sum)
    }.sortBy(_._1)
    val g = run("q_vec_random_projection").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(6)))
    assert(g.toSeq == exp.toSeq)
    // the LCG sign matrix is roughly balanced (not degenerate)
    val pos = (for (d <- 0 until 64; j <- 0 until 16) yield sign(d, j))
      .count(_ > 0)
    assert(pos > 400 && pos < 624, s"sign balance $pos/1024")
  }

  test("ljung-box: exact moment re-derivation") {
    val daily = Tables.events(spark, dir)
      .selectExpr("event_type", "cast(ts as date) as d",
        "cast(round(value * 100) as bigint) as x")
      .groupBy("event_type", "d")
      .agg(expr("(sum(x) * 1000000) div count(1)").as("v"))
      .orderBy("event_type", "d")
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val g = run("q_time_ljung_box").collect()
    assert(g.length == daily.size)
    g.foreach { r =>
      val vs = daily(r.getString(0))
      val n = vs.length
      val cv = vs.map(v => (BigInt(n) * v - vs.map(BigInt(_)).sum))
      val c0 = cv.map(c => c * c).sum
      val q = n.toDouble * (n + 2) * (1 to 6).map { k =>
        val ck = cv.drop(k).zip(cv.dropRight(k)).map { case (a, b) => a * b }.sum
        val rk = ck.toDouble / c0.toDouble
        rk * rk / (n - k)
      }.sum
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(3) - q) < 1e-3, s"${r.getString(0)}")
      assert(r.getDouble(3) >= 0)
    }
  }
}
