package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-13 batch 4 — strength scores re-derived (BigInt) from
  * the graded decomposition output, edge-Jaccard conservation against
  * the triangle census, inter-arrival percentiles re-derived from raw
  * gaps, kNN predictions recomputed from the graded cosine top-k, and
  * growth-accounting conservation laws. */
class Pipeline28Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("seasonal strength: exact BigInt re-derivation from q_time_decompose") {
    val dec = run("q_time_decompose").collect()
    val st = run("q_time_seasonal_strength").collect()
      .map(r => r.getString(0) -> r).toMap
    dec.groupBy(_.getString(0)).foreach { case (ty, rows) =>
      val full = rows.filterNot(_.isNullAt(3))
      def varOf(xs: Seq[BigInt]) = {
        val n = BigInt(xs.length)
        n * xs.map(x => x * x).sum - xs.sum * xs.sum
      }
      val r = full.toSeq.map(x => BigInt(x.getLong(2) - x.getLong(3) - x.getLong(4)))
      val sr = full.toSeq.map(x => BigInt(x.getLong(2) - x.getLong(3)))
      val tr = full.toSeq.map(x => BigInt(x.getLong(2) - x.getLong(4)))
      def strength(vx: BigInt) =
        if (vx > 0) Some((BigInt(1000000) - BigInt(1000000) * varOf(r) / vx)
          .max(BigInt(0)).toLong)
        else None
      val got = st(ty)
      def opt(i: Int) = if (got.isNullAt(i)) None else Some(got.getLong(i))
      assert(got.getLong(1) == full.length)
      assert(opt(2) == strength(varOf(sr)))
      assert(opt(3) == strength(varOf(tr)))
    }
  }

  test("edge jaccard: census conservation, bounds, pair domain") {
    val ej = run("q_graph_edge_jaccard").collect()
    val census = run("q_graph_triangles").collect().head
    assert(ej.length == census.getLong(0)) // one row per stored pair
    assert(ej.map(_.getLong(2)).sum == 3 * census.getLong(3))
    ej.foreach { r =>
      val (cn, d1, d2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cn <= math.min(d1, d2) - 1) // shared neighbors exclude the pair
      val denom = d1 + d2 - 2 - cn
      if (denom <= 0) assert(r.isNullAt(5))
      else {
        assert(r.getLong(5) == 1000000L * cn / denom)
        assert(r.getLong(5) <= 1000000L)
      }
    }
  }

  test("interarrival: ceil-rank percentiles re-derived from raw gaps") {
    val got = run("q_events_interarrival").collect()
      .map(r => r.getString(0) -> r).toMap
    val gaps = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .toSeq.flatMap { case ((ty, _), rs) =>
        val ts = rs.sortBy(r => (r.getLong(2), r.getLong(3))).map(_.getLong(2))
        ts.zip(ts.tail).map { case (a, b) => ty -> (b - a) }
      }.groupBy(_._1)
    assert(got.keySet == gaps.keySet)
    gaps.foreach { case (ty, tg) =>
      val sorted = tg.map(_._2).sorted
      val n = sorted.length
      val r = got(ty)
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == sorted.map(BigInt(_)).sum / n)
      assert(r.getLong(3) == sorted(((50 * n + 99) / 100) - 1))
      assert(r.getLong(4) == sorted(((90 * n + 99) / 100) - 1))
      assert(r.getLong(5) == sorted.last)
    }
  }

  test("knn eval: majority vote recomputed from the graded cosine top-k") {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nn = run("q_sim_cosine_topk").collect()
    val expected = nn.groupBy(_.getLong(0)).map { case (p, rs) =>
      val votes = rs.map(r => labels(r.getLong(1)))
        .groupBy(identity).map { case (l, v) => (l, v.length.toLong) }
      val (pl, pv) = votes.toSeq.minBy { case (l, v) => (-v, l) }
      p -> (labels(p), pl, pv)
    }
    val got = run("q_ml_knn_eval").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (own, pred, votes) = expected(r.getLong(0))
      assert(r.getLong(1) == own && r.getLong(2) == pred &&
        r.getLong(3) == votes)
      assert(r.getBoolean(4) == (own == pred))
    }
  }

  test("new/returning: conservation laws and day-1 semantics") {
    val nr = run("q_events_new_returning").collect()
    val users = Tables.events(spark, dir)
      .select(countDistinct("user_id")).collect().head.getLong(0)
    assert(nr.map(_.getLong(2)).sum == users) // every user is new once
    nr.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
    }
    val first = nr.minBy(_.getDate(0).toLocalDate.toEpochDay)
    assert(first.getLong(3) == 0) // nobody returns on the first day
    // dau agrees with the dau_mau readout on the shared day domain
    val dm = run("q_events_dau_mau").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    nr.foreach(r =>
      assert(dm(r.getDate(0).toLocalDate) == r.getLong(1)))
  }
}
