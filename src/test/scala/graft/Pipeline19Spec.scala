package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-10 batch 3 — the exact clustering evaluator
  * (hand-computed cases + the seeded-KMeans application the graded
  * key's label partition cannot cover), the vector Summarizer
  * identities, and determinism/quality bounds for the MLP wrapper. */
class Pipeline19Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def rows(name: String): Seq[String] =
    run(name).collect().map(_.toString).toSeq.sorted

  test("silhouette: perfectly separated clusters score exactly 1.0") {
    val sp = spark
    import sp.implicits._
    // two tight clusters far apart: a(x)=0 within, b(x)>0 -> s=1e6
    val vecs = Seq(
      (1L, 0L, Seq(0L, 0L)), (2L, 0L, Seq(0L, 0L)),
      (3L, 1L, Seq(100L, 0L)), (4L, 1L, Seq(100L, 0L)))
      .toDF("id", "c", "q")
    val r = graft.api.Ml.silhouettePpm(vecs, "id", "q", "c")
      .orderBy("cluster").collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getLong(1) == 2)
      assert(row.getLong(3) == 1000000L, "perfect separation scores 1.0")
    }
  }

  test("silhouette: a point on the wrong side scores negative") {
    val sp = spark
    import sp.implicits._
    // point 3 sits AT cluster 1's location but is labeled cluster 0
    val vecs = Seq(
      (1L, 0L, Seq(0L)), (2L, 0L, Seq(0L)), (3L, 0L, Seq(100L)),
      (4L, 1L, Seq(100L)), (5L, 1L, Seq(100L)))
      .toDF("id", "c", "q")
    val bad = graft.api.Ml.silhouettePpm(vecs, "id", "q", "c").collect()
      .find(_.getLong(0) == 0L).get
    // cluster 0 holds the misplaced point, dragging its sum negative
    // relative to the perfect 2e6 (two clean points + one misfit)
    assert(bad.getLong(2) < 2000000L)
  }

  test("silhouette: graded label partition covers the corpus, bounded") {
    val rs = run("q_ml_silhouette").collect()
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(rs.map(_.getLong(1)).sum == n)
    rs.foreach { r =>
      assert(math.abs(r.getLong(3)) <= 1000000L, "s in [-1, 1]")
      // floor-mean consistency with the exact sum
      val mean = r.getLong(2) match {
        case s if s >= 0 => s / r.getLong(1)
        case s => -((-s) / r.getLong(1))
      }
      assert(r.getLong(3) == mean)
    }
  }

  test("silhouette: evaluates the seeded KMeans clustering (the api path)") {
    val assigned = graft.operators.Pipeline19.kmeansAssignedQ(spark, dir)
    val r = graft.api.Ml.silhouettePpm(assigned, "vec_id", "q", "target")
      .collect()
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(r.map(_.getLong(1)).sum == n)
    // KMeans clusters are Voronoi cells of the quantization-adjacent
    // geometry: the mean silhouette over the corpus must be positive
    val total = r.map(_.getLong(2)).sum
    assert(total > 0, s"KMeans silhouette sum should be positive, got $total")
  }

  test("vec summary: 64 dims, moment identities and bounds") {
    val rs = run("q_vec_summary").collect()
    assert(rs.length == 64)
    val n = graft.Tables.embeddings(spark, dir).count()
    rs.foreach { r =>
      assert(r.getLong(1) == n)
      val (mean, varM) = (r.getLong(2), r.getLong(3))
      val (mn, mx, l1) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(varM >= 0, "variance cannot be negative")
      assert(mn <= mx)
      assert(mean >= mn * 1000 - 1000 && mean <= mx * 1000 + 1000)
      assert(l1 >= math.abs(mean) * n / 1000 - n, "L1 dominates |sum|")
      assert(mn >= -64 && mx <= 127, "int8 quantization domain")
    }
  }

  test("model persist: reloaded model agrees with the original everywhere") {
    val rs = run("q_ml_model_persist").collect()
    assert(rs.length == 10, "k clusters out of the reloaded model")
    assert(rs.forall(_.getBoolean(2)),
      "every cluster must agree exactly after the save/load round-trip")
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(rs.map(_.getLong(1)).sum == n)
    // idempotent: the write-once guard keeps a second call identical
    assert(rows("q_ml_model_persist") == rows("q_ml_model_persist"))
  }

  test("bootstrap ci: brackets the point estimate, ordered bounds") {
    val r = run("q_ml_bootstrap_ci").collect().head
    val (n, point, lo, hi, reps) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n == graft.Tables.orders(spark, dir).count())
    assert(reps == 32)
    assert(lo <= hi)
    assert(lo <= point && point <= hi,
      s"point $point outside [$lo, $hi]")
    // unit-mean multiplier weights: interval stays near the point
    assert(hi - lo < point / 2, "CI width sanity bound")
  }

  test("rf importance: deterministic, ranked, normalized") {
    val a = rows("q_ml_rf_importance")
    val b = rows("q_ml_rf_importance")
    assert(a == b, "memoized seeded fit must be deterministic")
    val rs = run("q_ml_rf_importance").collect()
    assert(rs.length == 8)
    assert(rs.map(_.getLong(0)).toSeq == (1L to 8L))
    val imps = rs.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(imps.zip(imps.tail).forall { case (x, y) => x >= y })
    assert(imps.forall(v => v >= 0 && v <= 1.0) && imps.sum <= 1.0 + 1e-6)
  }

  test("robust scaler: quartile ordering and domain bounds per dim") {
    val rs = run("q_vec_robust_scaler").collect()
    assert(rs.length == 64)
    val summary = run("q_vec_summary").collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    rs.foreach { r =>
      val (q1, med, q3, iqr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(q1 <= med && med <= q3 && iqr == q3 - q1)
      val (mn, mx) = summary(r.getLong(0))
      assert(q1 >= mn && q3 <= mx, "quartiles inside observed range")
    }
  }

  test("mlp eval: deterministic refit, fold conservation, above chance") {
    val a = rows("q_ml_mlp_eval")
    val b = rows("q_ml_mlp_eval")
    assert(a == b, "seeded MLP fit must be deterministic")
    val rs = run("q_ml_mlp_eval").collect()
    val support = rs.map(_.getLong(1)).sum
    val tp = rs.map(_.getLong(2)).sum
    val nEval = graft.Tables.embeddings(spark, dir)
      .where(expr("vec_id % 3 = 0")).count()
    assert(support == nEval, "per-class supports partition the holdout")
    val acc = tp.toDouble / support
    assert(acc >= 0.2, s"held-out accuracy $acc below 2x chance")
    rs.foreach(r => assert(r.getLong(3) == 1000000L * r.getLong(2)
      / r.getLong(1)))
  }
}
