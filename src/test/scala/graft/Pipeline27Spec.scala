package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-13 batch 3 — decomposition arithmetic re-derived
  * in-test from the raw daily series, corner-count conservation
  * against the global triangle census, integer-F agreement with
  * double-math ANOVA, a naive range-join twin of the rolling-active
  * explode, and learning-curve determinism + chance floors. */
class Pipeline27Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("decompose: gapless spine, edge NULLs, exact re-derivation") {
    val rows = run("q_time_decompose").collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val days = rs.map(_.getDate(1).toLocalDate).sortBy(_.toEpochDay)
      // gapless: consecutive calendar days min..max
      assert(days.zip(days.tail).forall { case (a, b) =>
        b.toEpochDay == a.toEpochDay + 1 })
      // trend/resid defined exactly off the 3-day edges
      val sorted = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val full = i >= 3 && i < sorted.length - 3
        assert(r.isNullAt(3) != full, s"trend null-ness at offset $i")
        assert(r.isNullAt(5) != full)
      }
      // re-derive trend, seasonal, residual from v_cents alone
      val v = sorted.map(_.getLong(2))
      val s7 = v.indices.map { i =>
        if (i >= 3 && i < v.length - 3) Some((i - 3 to i + 3).map(v).sum)
        else None
      }
      val detr = v.indices.map(i => s7(i).map(7 * v(i) - _))
      val seas = v.indices.groupBy { i =>
        sorted(i).getDate(1).toLocalDate.getDayOfWeek.getValue - 1
      }.map { case (wd, is) =>
        val ds = is.flatMap(detr)
        val sw = ds.sum; val den = 7L * ds.length
        wd -> (if (sw >= 0) sw / den else -((-sw) / den))
      }
      sorted.zipWithIndex.foreach { case (r, i) =>
        val wd = r.getDate(1).toLocalDate.getDayOfWeek.getValue - 1
        assert(r.getLong(4) == seas(wd), s"seas at offset $i")
        s7(i).foreach { s =>
          assert(r.getLong(3) == s / 7)
          assert(r.getLong(5) == v(i) - s / 7 - seas(wd))
        }
      }
    }
  }

  test("clustering coeff: corner sum = 3x census; bounds; node domain") {
    val cc = run("q_graph_clustering_coeff").collect()
    val census = run("q_graph_triangles").collect().head
    assert(cc.map(_.getLong(2)).sum == 3 * census.getLong(3))
    assert(cc.length == census.getLong(1)) // one row per graph node
    cc.foreach { r =>
      val (dg, t) = (r.getLong(1), r.getLong(2))
      assert(dg >= 1 && t >= 0)
      if (dg < 2) { assert(t == 0 && r.isNullAt(3)) }
      else {
        assert(r.getLong(3) == 2000000L * t / (dg * (dg - 1)))
        assert(r.getLong(3) <= 1000000L)
      }
      // a node in t triangles has degree at least enough neighbors
      // to host them: t <= C(dg, 2)
      assert(2 * t <= dg * (dg - 1))
    }
  }

  test("anova select: rank permutation, top-8, double-math agreement") {
    val st = run("q_ml_anova_select").collect()
    assert(st.length == 64)
    assert(st.map(_.getLong(0)).toSet == (0L until 64L).toSet)
    assert(st.map(_.getLong(1)).distinct.length == 1) // balanced n
    assert(st.map(_.getLong(3)).sorted.toSeq == (1L to 64L))
    assert(st.count(_.getBoolean(4)) == 8)
    assert(st.filter(_.getBoolean(4)).forall(_.getLong(3) <= 8))
    // double-math F from the same micro-grid moments must order every
    // selected dim at or above every unselected one (up to fp slack)
    val g = Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("pos").as("dim"), col("label"),
        expr("cast(floor(cast(col as double) * 1000000) as bigint)")
          .as("q"))
      .groupBy("dim", "label")
      .agg(count(lit(1)).as("ng"), sum("q").as("sg"),
        sum(expr("q * q")).as("sqq"))
      .collect()
    val fDouble = g.groupBy(_.getInt(0).toLong).map { case (d, rs) =>
      val n = rs.map(_.getLong(2)).sum.toDouble
      val k = rs.length.toDouble
      val t = rs.map(_.getLong(3)).sum.toDouble
      val sqq = rs.map(_.getLong(4)).sum.toDouble
      val ssb = rs.map(r => r.getLong(3).toDouble * r.getLong(3) /
        r.getLong(2)).sum - t * t / n
      val ssw = sqq - rs.map(r => r.getLong(3).toDouble * r.getLong(3) /
        r.getLong(2)).sum
      d -> (ssb / (k - 1)) / (ssw / (n - k))
    }
    val sel = st.filter(_.getBoolean(4)).map(_.getLong(0))
    val unsel = st.filterNot(_.getBoolean(4)).map(_.getLong(0))
    val slack = 1e-9 * fDouble.values.map(math.abs).max
    assert(sel.forall(s_ => unsel.forall(u =>
      fDouble(s_) >= fDouble(u) - slack)))
  }

  test("active rolling: equals the naive range join; ratio bounds") {
    val act = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("d"))
      .distinct().localCheckpoint()
    val naive = act.select(col("event_type"), col("d").as("day"))
      .distinct().as("w")
      .join(act.as("a"),
        col("a.event_type") === col("w.event_type") &&
          col("a.d").between(date_sub(col("day"), 6), col("day")))
      .groupBy(col("w.event_type").as("event_type"), col("day"))
      .agg(countDistinct("a.user_id").as("active_7d"))
    val got = run("q_events_active_rolling")
    assert(got.select("event_type", "day", "active_7d")
      .exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got.select("event_type", "day", "active_7d"))
      .count() == 0)
    assert(got.where(col("active_7d") < col("dau") ||
      col("ratio_ppm") > 1000000L || col("ratio_ppm") < 1L)
      .count() == 0)
  }

  test("learning curve: deterministic, nested exact splits, above chance") {
    val a = run("q_ml_learning_curve").collect()
    val b = run("q_ml_learning_curve").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.map(_.getLong(0)).toSeq == Seq(20L, 40L, 60L))
    val emb = Tables.embeddings(spark, dir)
    def foldN(f: Int) = emb.where(pmod(col("vec_id"), lit(5)) === f).count()
    assert(a.map(_.getLong(1)).toSeq ==
      Seq(foldN(1), foldN(1) + foldN(2), foldN(1) + foldN(2) + foldN(3)))
    assert(a.map(_.getLong(2)).distinct.length == 1)
    assert(a.head.getLong(2) == foldN(0))
    // 10-class chance floor is 100000 ppm; the KMeans target is a
    // function of the features, so LR clears 2x chance at every size
    assert(a.forall(_.getLong(3) > 200000L))
  }
}
