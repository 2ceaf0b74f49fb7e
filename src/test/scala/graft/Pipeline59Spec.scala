package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 27 — PACF, the grid-bucketed spatial join,
  * and the embedding HOF surface. */
class Pipeline59Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("pacf: Durbin-Levinson re-derivation per type") {
    val daily = Tables.events(spark, dir)
      .selectExpr("event_type as t", "cast(ts as date) as d",
        "cast(round(value * 100) as bigint) as x")
      .groupBy("t", "d")
      .agg(expr("(sum(x) * 1000000) div count(1)").as("v"))
      .orderBy("t", "d").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val byType = daily.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val g = run("q_time_pacf").collect()
    assert(g.length == byType.size)
    g.foreach { row =>
      val vs = byType(row.getString(0)).map(BigInt(_))
      val n = BigInt(vs.length); val sv = vs.sum
      val cv = vs.map(v => n * v - sv)
      val c0 = cv.map(c => c * c).sum
      def r(k: Int): Double =
        (k until cv.length).map(i => cv(i) * cv(i - k)).sum.toDouble /
          c0.toDouble
      val (r1, r2, r3) = (r(1), r(2), r(3))
      val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
      val p21 = r1 * (1.0 - p22)
      val p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
      assert(math.abs(row.getDouble(1) - r1) < 1e-6)
      assert(math.abs(row.getDouble(2) - r2) < 1e-6)
      assert(math.abs(row.getDouble(3) - r3) < 1e-6)
      assert(math.abs(row.getDouble(4) - r1) < 1e-6)
      assert(math.abs(row.getDouble(5) - p22) < 1e-6)
      assert(math.abs(row.getDouble(6) - p33) < 1e-6)
    }
  }

  test("spatial grid: equi-rewrite equals the naive containment scan") {
    val points = Tables.events(spark, dir)
      .selectExpr("cast(round(value * 100) as bigint) as px",
        "(event_id * 2654435761) % 50000 as py")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val boxes = (0 until 25).map { i =>
      val xmin = (i.toLong * 7919) % 45000
      val ymin = (i.toLong * 104729) % 45000
      (i.toLong, xmin, xmin + 3000, ymin, ymin + 4000)
    }
    val expected = boxes.flatMap { case (id, x0, x1, y0, y1) =>
      val in = points.filter(p =>
        p._1 >= x0 && p._1 <= x1 && p._2 >= y0 && p._2 <= y1)
      if (in.isEmpty) None
      else Some(id -> (in.length.toLong, in.map(_._1).sum))
    }.toMap
    val g = run("q_join_spatial_grid").collect()
    assert(g.length == expected.size && g.nonEmpty)
    g.foreach { r =>
      val (n, sx) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == sx)
    }
  }

  test("lambda surface: fold order matches a scala left fold") {
    val rows = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val g = run("q_fn_lambda").collect()
    assert(g.length == rows.length)
    val got = g.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    rows.foreach { case (id, emb) =>
      val (nPos, l2, mean) = got(id)
      assert(nPos == emb.count(_ > 0f).toLong)
      val sq = emb.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      assert(math.abs(l2 - math.sqrt(sq)) < 1e-6)
      val sm = emb.foldLeft(0.0)((a, x) => a + x.toDouble)
      assert(math.abs(mean - sm / emb.length) < 1e-6)
    }
  }
}
