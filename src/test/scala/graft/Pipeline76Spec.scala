package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 44 — skyline, bitmap distinct, centroid
  * cosines. */
class Pipeline76Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("skyline: non-dominance verified pairwise on the frontier + " +
      "no dominated survivor against the full set") {
    val pts = Tables.orders(spark, dir)
      .selectExpr("o_orderkey", "unix_micros(o_orderdate) d",
        "cast(round(o_totalprice * 100) as bigint) cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val g = SparkEntry.queries("q_agg_skyline")(spark, dir)
      .selectExpr("o_orderkey", "unix_micros(o_orderdate)", "cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.nonEmpty)
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._3 >= b._3 && a._2 <= b._2 && (a._3 > b._3 || a._2 < b._2)
    // nothing in the full set dominates a frontier point
    g.foreach { f =>
      assert(!pts.exists(p => dominates(p, f)), s"dominated: $f")
    }
    // and every non-frontier point IS dominated by someone
    val gs = g.map(_._1).toSet
    pts.filterNot(p => gs.contains(p._1)).take(500).foreach { p =>
      assert(pts.exists(q => dominates(q, p)), s"missing: $p")
    }
  }

  test("bitmap distinct == countDistinct, mergeable by construction") {
    val g = run("q_agg_bitmap_distinct").collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(g == exact)
  }

  test("centroid cosine: exact re-derivation on one pair, bounds") {
    val g = run("q_vec_centroid_distance").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(g.size == 45)
    g.values.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    val sums = Tables.embeddings(spark, dir)
      .selectExpr("cast(label as long) label",
        "transform(embedding, x -> cast(floor(cast(x as double)" +
          " * 1000) as bigint)) q")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector))
      .groupBy(_._1).view
      .mapValues(rows => rows.map(_._2).reduce(
        (a, b) => a.zip(b).map(p => p._1 + p._2))).toMap
    val (s0, s1) = (sums(0L), sums(1L))
    val dot = s0.zip(s1).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    val n0 = s0.map(x => BigInt(x) * BigInt(x)).sum
    val n1 = s1.map(x => BigInt(x) * BigInt(x)).sum
    val cos = dot.toDouble / math.sqrt(n0.toDouble * n1.toDouble)
    assert(math.abs(g((0L, 1L)) - cos) < 1e-5)
  }
}
