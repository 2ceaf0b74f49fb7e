package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-10 ML-helper completions — evaluator-identity bounds
  * for the oracle-checked ranking-metrics and feature-select keys, the
  * ALS eval half via the shared api.Ml.rankingMetricsAt5 evaluator,
  * and determinism + quality bounds for the seeded BisectingKMeans and
  * AFT fits (the no-oracle keys). */
class Pipeline17Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def rows(name: String): Seq[String] =
    run(name).collect().map(_.toString).toSeq.sorted

  test("ranking metrics: probe shape, ppm ranges, metric identities") {
    val df = run("q_ml_ranking_metrics").cache()
    val rs = df.collect()
    assert(rs.nonEmpty && rs.length <= 20)
    rs.foreach { r =>
      val (nRel, hits) = (r.getLong(1), r.getLong(2))
      val (p, ap, nd) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nRel >= 1, "probes must have held-out relevant items")
      assert(hits >= 0 && hits <= 5 && hits <= nRel)
      // precision@5 is definitionally hits/5
      assert(p == 1000000L * hits / 5)
      Seq(p, ap, nd).foreach(v => assert(v >= 0 && v <= 1000000L))
      // AP and NDCG are 0 iff no hits, and NDCG >= precision-normalized
      // floor is not guaranteed — but a perfect prefix is the max
      if (hits == 0) assert(ap == 0 && nd == 0)
      else assert(nd > 0)
    }
    df.unpersist()
  }

  test("ranking metrics evaluator: hand-computed tiny case") {
    val sp = spark
    import sp.implicits._
    // user 1: recs [a(hit),b,c(hit),d,e], rel {a,c,x} -> n_rel=3
    //   hits=2, prec=400000
    //   AP num = 1*1*60 + 1*2*20 = 100 -> 100*1e6/(60*3) = 555555
    //   DCG = 1000000 + 500000 = 1500000; IDCG(3) = 2130929
    //   NDCG = 1500000*1e6/2130929 = 703918 (integer div)
    val recs = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (1L, 4L, "d"), (1L, 5L, "e")).toDF("user", "rank", "item")
    val rel = Seq((1L, "a"), (1L, "c"), (1L, "x")).toDF("user", "item")
    val r = graft.api.Ml.rankingMetricsAt5(recs, rel).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 2)
    assert(r(0).getLong(3) == 400000L)
    assert(r(0).getLong(4) == 100L * 1000000L / (60L * 3L))
    assert(r(0).getLong(5) == 1500000L * 1000000L / 2130929L)
  }

  test("als eval half: shared evaluator over q_ml_als_topk vs held-out fold") {
    // the seeded ALS top-5 cannot have a SQL oracle, so its eval half
    // runs HERE through the same api.Ml.rankingMetricsAt5 the graded
    // key uses: well-formed per-user metrics against the time-split
    // held-out interactions (shape/range bounds, not a quality bar —
    // the fixture's implicit-feedback matrix is near-noise at sf0.001)
    val recs = run("q_ml_als_topk")
      .select(col("cust").as("user"), col("rank"), col("part").as("item"))
    val trainSide = Tables.orders(spark, dir)
      .where(expr("o_orderdate < date'1997-01-01'"))
      .select(col("o_orderkey"), col("o_custkey").as("user"))
      .join(Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_partkey").as("item")),
        col("o_orderkey") === col("l_orderkey"))
      .select("user", "item").distinct()
    val testSide = Tables.orders(spark, dir)
      .where(expr("o_orderdate >= date'1997-01-01'"))
      .select(col("o_orderkey"), col("o_custkey").as("user"))
      .join(Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_partkey").as("item")),
        col("o_orderkey") === col("l_orderkey"))
      .select("user", "item").distinct()
    val rel = testSide.join(trainSide, Seq("user", "item"), "left_anti")
    val m = graft.api.Ml.rankingMetricsAt5(recs, rel).collect()
    // users without held-out relevants drop; the rest must be in range
    assert(m.length <= 20)
    m.foreach { r =>
      Seq(3, 4, 5).foreach(i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) <= 1000000L))
      assert(r.getLong(2) <= 5)
    }
  }

  test("feature select: 8 ranked dims, stat descending, dims in domain") {
    val rs = run("q_ml_feature_select").collect()
    assert(rs.length == 8)
    assert(rs.map(_.getLong(0)).toSeq == (1L to 8L))
    val stats = rs.map(_.getLong(2))
    assert(stats.zip(stats.tail).forall { case (a, b) => a >= b })
    assert(rs.map(_.getLong(1)).forall(d => d >= 0 && d < 64))
    assert(stats.forall(_ >= 0))
  }

  test("bisecting kmeans: deterministic, covers corpus, agrees with kmeans") {
    val a = rows("q_ml_bisecting_kmeans")
    val b = rows("q_ml_bisecting_kmeans")
    assert(a == b, "seeded BisectingKMeans fit must be deterministic")
    val df = run("q_ml_bisecting_kmeans").cache()
    val n = df.agg(sum("cluster_size")).head().getLong(0)
    val k = df.count()
    df.unpersist()
    assert(n == Tables.embeddings(spark, dir).count())
    assert(k >= 2 && k <= 10)
    // structural agreement with the shared seeded KMeans target: the
    // majority-target mass over bisecting clusters must clear the
    // 10-class chance floor (~10%) by 2.5x (the RF spec's bar; the
    // divisive tree and Lloyd's carve the same geometry differently
    // at the margins — measured 0.296 on this fixture)
    val asg = graft.operators.Pipeline17.bkAssignments(spark, dir)
    val agree = asg.groupBy("bcluster", "target").count()
      .groupBy("bcluster").agg(max("count").as("mx"))
      .agg(sum("mx")).head().getLong(0)
    assert(agree.toDouble / n >= 0.25,
      s"bisecting/kmeans majority agreement ${agree.toDouble / n} < 0.25")
  }

  test("pr curve: recall monotone, min-threshold saturates, ppm bounds") {
    val rs = run("q_ml_pr_curve").collect()
    assert(rs.nonEmpty)
    // threshold = min observed score admits every row: recall 100%
    assert(rs.head.getLong(4) == 1000000L)
    val recalls = rs.map(_.getLong(4))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      "recall must be non-increasing as the threshold rises")
    rs.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) > 0, "tp+fp > 0 at observed scores")
      Seq(3, 4, 5).foreach(i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) <= 1000000L))
    }
  }

  test("aft survival: monotone quantiles, positive, deterministic refit") {
    val a = rows("q_ml_aft_survival")
    val b = rows("q_ml_aft_survival")
    assert(a == b, "AFT fit must be deterministic run-to-run")
    val rs = run("q_ml_aft_survival").collect()
    assert(rs.nonEmpty && rs.length <= 10)
    rs.foreach { r =>
      val (q25, q50, q75) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(q25 > 0 && q25 <= q50 && q50 <= q75,
        s"survival quantiles must be positive and monotone: $q25 $q50 $q75")
      assert(r.getLong(1) >= 1, "observed lifetime is at least one day")
      assert(Seq(0L, 1L).contains(r.getLong(2)))
    }
  }
}
