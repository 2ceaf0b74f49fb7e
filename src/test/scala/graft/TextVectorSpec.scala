package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: text/LLM-pipeline invariants, incl. the no-oracle approx ops
  * (LSH recall, KMeans shape) per SURVEY.md §5. */
class TextVectorSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("minhash agreement upper-bounds nothing below exact jaccard 0.5 pairs") {
    // every exact-Jaccard>=0.5 pair should be found by minhash (16 perms,
    // >=8 agreement) with high probability; assert full recall on the
    // tiny fixture where true pairs have jaccard ~0.9+
    val exact = run("q_dedup_jaccard").select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = run("q_dedup_minhash").select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(exact.subsetOf(mh), s"missed pairs: ${exact -- mh}")
  }

  test("band quality: consistent with the verify key, bounded precision") {
    val rs = run("q_dedup_band_quality").collect()
    assert(rs.nonEmpty, "the candidate band must propose pairs")
    rs.foreach { r =>
      val (m, np, nv, p) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      assert(m >= 8 && m <= 16, "matches within the band threshold..16")
      assert(nv <= np && p == 1000000L * nv / np)
    }
    // total verified pairs across the curve == the verify key's pairs
    // (the fixture's near-dup count sits under its LIMIT 100)
    val verified = run("q_dedup_jaccard").count()
    assert(rs.map(_.getLong(2)).sum == verified,
      "curve totals must reconcile with q_dedup_jaccard")
  }

  test("tfidf: idf is 0 for a token present in every doc, positive otherwise") {
    val n = Tables.documents(spark, dir).count()
    val bad = run("q_text_tfidf")
      .join(run("q_text_tf").groupBy("token")
        .agg(countDistinct("doc_id").as("df2")), "token")
      .where((col("df2") === n && abs(col("idf")) > 1e-9) ||
        (col("df2") < n && col("idf") <= 0))
      .count()
    assert(bad == 0)
  }

  test("stopword removal never increases token counts") {
    val tot = run("q_text_tokenize").select(col("doc_id"), col("n_tokens"))
    val kept = run("q_text_stopwords").select(col("doc_id"), col("kept_total"))
    assert(tot.join(kept, "doc_id")
      .where(col("kept_total") > col("n_tokens")).count() == 0)
  }

  test("cosine top-k: self excluded, cos in [-1,1], exactly 5 per probe") {
    val tk = run("q_sim_cosine_topk").cache()
    assert(tk.where(col("probe_id") === col("vec_id")).count() == 0)
    assert(tk.where(col("cos") > 1.0001 || col("cos") < -1.0001).count() == 0)
    val counts = tk.groupBy("probe_id").count().collect()
    assert(counts.forall(_.getLong(1) == 5))
    tk.unpersist()
  }

  test("LSH bucketed recall >= 0.5 vs exact top-5 (6 tables x 3 bits)") {
    val exact = run("q_sim_cosine_topk").select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("q_sim_lsh_bucketed").select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("kmeans: 10 clusters, sizes sum to corpus size, seeded-stable") {
    val a = run("q_ml_kmeans_helper").collect()
    assert(a.length == 10)
    assert(a.map(_.getLong(1)).sum == Tables.embeddings(spark, dir).count())
    val b = run("q_ml_kmeans_helper").collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("ml pipeline (scaler+LR): above-chance accuracy, seeded-stable") {
    val a = run("q_ml_pipeline_scaler_lr").collect()
    val total = a.map(_.getLong(2)).sum
    val correct = a.filter(r => r.getLong(0) == r.getLong(1))
      .map(_.getLong(2)).sum
    val acc = correct.toDouble / total
    assert(acc > 0.3, s"accuracy $acc not above 10-class chance")
    val b = run("q_ml_pipeline_scaler_lr").collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("bucketize cuts: deciles 1..10, roughly balanced, monotone in value") {
    val b = run("q_vec_bucketize_cuts")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
        "o_orderkey")
    val n = b.count()
    val sizes = b.groupBy("decile").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet.subsetOf((1L to 10L).toSet), s"bad deciles: $sizes")
    // sketch-approx deciles: each within [4%, 20%] of the corpus
    sizes.foreach { case (d, c) =>
      assert(c >= n / 25 && c <= n / 5, s"decile $d unbalanced: $c of $n")
    }
    // monotone: a decile's max value never exceeds the next decile's min
    val ranges = b.groupBy("decile")
      .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      .orderBy("decile").collect()
    ranges.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getDouble(1 + 1) <= hi.getDouble(1),
          s"decile ${lo.getLong(0)} max > decile ${hi.getLong(0)} min")
      case _ =>
    }
    // exact-width buckets must agree with the oracle-checked baseline
    val base = run("q_vec_bucketize").select("o_orderkey", "width_bucket")
    val mism = run("q_vec_bucketize_cuts")
      .select(col("o_orderkey"), col("width_bucket").as("wb2"))
      .join(base, "o_orderkey")
      .where(col("wb2") =!= col("width_bucket")).count()
    assert(mism == 0)
  }

  test("ml eval: per-class counts consistent, above-chance, deterministic") {
    val e1 = run("q_ml_eval_accuracy").collect().toSeq
    val e2 = run("q_ml_eval_accuracy").collect().toSeq
    assert(e1 == e2, "evaluator must be run-to-run deterministic")
    val support = e1.map(_.getLong(1)).sum
    val tp = e1.map(_.getLong(2)).sum
    val testN = Tables.embeddings(spark, dir)
      .where(pmod(col("vec_id"), lit(5)) === 0).count()
    assert(support == testN, s"support $support != test rows $testN")
    // 10 labels -> chance is ~10%; require 2x chance overall
    assert(tp.toDouble / support > 0.2, s"accuracy ${tp.toDouble / support}")
    e1.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // tp <= support
      assert(r.getLong(4) <= 1000000L && r.getLong(5) <= 1000000L)
    }
  }

  test("cv select: deterministic, counts consistent, picks the better grid point") {
    val a = run("q_ml_cv_select").collect().toSeq
    val b = run("q_ml_cv_select").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq), "cv must be deterministic")
    assert(a.length == 2)
    a.foreach { r =>
      assert(r.getLong(1) == 1000000L * r.getLong(2) / r.getLong(3))
    }
    val sel = a.filter(_.getLong(4) == 1L)
    assert(sel.length == 1)
    assert(sel.head.getLong(1) == a.map(_.getLong(1)).max,
      "selected row must carry the max accuracy")
  }

  test("centroid outliers: 5 per label, distances non-negative") {
    val c = run("q_vec_centroids").cache()
    assert(c.groupBy("label").count().where(col("count") =!= 5).count() == 0)
    assert(c.where(col("dist") < 0).count() == 0)
    c.unpersist()
  }

  test("scaling: minmax in [0,1]; zscore mean ~ 0 per type") {
    val sc = run("q_vec_scale").cache()
    assert(sc.where(col("minmax") < 0 || col("minmax") > 1).count() == 0)
    val means = sc.groupBy("event_type").agg(avg("zscore").as("m")).collect()
    assert(means.forall(r => math.abs(r.getDouble(1)) < 0.01))
    sc.unpersist()
  }

  test("pca: deterministic, variance monotone non-increasing, cum <= 1") {
    val a = run("q_ml_pca").collect().map(_.toSeq)
    val b = run("q_ml_pca").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "PCA profile must be run-to-run stable")
    assert(a.length == 8)
    val vars = a.map(_(1).asInstanceOf[Long])
    assert(vars.zip(vars.tail).forall { case (x, y) => x >= y }, vars.toSeq)
    val cums = a.map(_(2).asInstanceOf[Long])
    assert(cums.last <= 1000000L && cums.head == vars.head)
    assert(vars.head > 0, "top component must explain some variance")
  }
}
