package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-9 ML-wrapper closers — FPGrowth parity against an
  * independent self-join computation, determinism + quality bounds for
  * the seeded RF / Word2Vec / ALS fits (the no-oracle keys), and
  * cross-key consistency for the graph component stats. */
class Pipeline10Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def rows(name: String): Seq[String] =
    run(name).collect().map(_.toString).toSeq.sorted

  test("freq itemsets: MLlib FPGrowth matches independent self-join counts") {
    // independent computation of the same contract (the DuckDB oracle's
    // algebra, in Spark): distinct baskets -> grouped singles + basket
    // self-join pairs at minCount = ceil(1e-4 * n_baskets)
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .cache()
    val minCount = math.ceil(1e-4 * b.select("o").distinct().count()).toLong
    val s1 = b.groupBy("p").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minCount)
      .select(col("p").cast("string").as("items"), lit(1L).as("set_size"),
        col("freq"))
    val b2 = b.select(col("o"), col("p").as("p2"))
    val s2 = b.join(b2, "o").where(col("p") < col("p2"))
      .groupBy("p", "p2").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minCount)
      .select(concat_ws(",", col("p"), col("p2")).as("items"),
        lit(2L).as("set_size"), col("freq"))
    val expected = s1.unionAll(s2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = run("q_ml_freq_itemsets").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    b.unpersist()
    assert(expected.nonEmpty)
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("rf eval: deterministic refit, sane confusion, above-chance accuracy") {
    val a = rows("q_ml_rf_eval")
    val b = rows("q_ml_rf_eval")
    assert(a == b, "seeded RF fit must be deterministic run-to-run")
    val df = run("q_ml_rf_eval").cache()
    val agg = df.agg(sum("tp"), sum("support"), sum("predicted")).head()
    val (tp, support, predicted) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    df.unpersist()
    // predicted counts partition the test fold just as supports do
    assert(predicted == support)
    // 10-class chance floor is ~10%; the forest targets KMeans Voronoi
    // cells (linear boundaries), where axis-aligned trees trail the LR
    // evaluator (~72%) but must clear 2.5x chance
    val acc = tp.toDouble / support
    assert(acc >= 0.25, s"held-out accuracy $acc below 2.5x chance")
  }

  test("word2vec: deterministic refit, self excluded, 5 probes x 5 ranks") {
    val a = rows("q_text_word2vec")
    val b = rows("q_text_word2vec")
    assert(a == b, "seeded 1-partition Word2Vec fit must be deterministic")
    val df = run("q_text_word2vec").cache()
    assert(df.where(col("probe") === col("word")).count() == 0)
    assert(df.select("probe").distinct().count() == 5)
    val perProbe = df.groupBy("probe").agg(
      count(lit(1)).as("n"), max("rank").as("mx")).collect()
    df.unpersist()
    assert(perProbe.forall(r => r.getLong(1) == 5 && r.getLong(2) == 5))
  }

  test("als topk: deterministic refit, known items excluded, full coverage") {
    val a = rows("q_ml_als_topk")
    val b = rows("q_ml_als_topk")
    assert(a == b, "readout must be deterministic over the memoized fit")
    // the r12 memo hides refits from the graded path — pin FIT
    // determinism against an INDEPENDENT rebuild (same seed/params)
    val (m1, _, _, _) = operators.Pipeline10.alsArtifacts(spark, dir)
    val (m2, _, _, _) = operators.Pipeline10.buildAlsArtifacts(spark, dir)
    val f1 = m1.userFactors.orderBy("id").collect().map(_.toString).toSeq
    val f2 = m2.userFactors.orderBy("id").collect().map(_.toString).toSeq
    assert(f1 == f2, "independent seeded ALS fits must agree factor-exact")
    val df = run("q_ml_als_topk").cache()
    val seen = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("cust"),
        col("l_partkey").cast("long").as("part")).distinct()
    assert(df.join(seen, Seq("cust", "part"), "left_semi").count() == 0,
      "a recommended part was already purchased by that customer")
    assert(df.select("cust").distinct().count() == 20)
    assert(df.groupBy("cust").count().where(col("count") =!= 5).count() == 0)
    df.unpersist()
  }

  test("graph component stats agree with the cluster map") {
    val stats = run("q_graph_components_stats").cache()
    val clusters = run("q_dedup_cluster")
      .groupBy("cluster_id").agg(count(lit(1)).as("n"),
        max("cluster_size").as("sz")).cache()
    // node counts match q_dedup_cluster's per-cluster sizes exactly
    val mismatch = stats.join(clusters, "cluster_id")
      .where(col("n_docs") =!= col("n") || col("n_docs") =!= col("sz"))
      .count()
    assert(mismatch == 0)
    assert(stats.count() == clusters.count())
    // a component of n nodes has between n-1 (tree) and n(n-1)/2
    // (clique) edges; density_ppm in (0, 1e6]
    val bad = stats.where(
      col("n_edges") < col("n_docs") - 1 ||
        col("n_edges") * 2 > col("n_docs") * (col("n_docs") - 1) ||
        col("density_ppm") <= 0 || col("density_ppm") > 1000000).count()
    assert(bad == 0)
    stats.unpersist(); clusters.unpersist()
  }
}
