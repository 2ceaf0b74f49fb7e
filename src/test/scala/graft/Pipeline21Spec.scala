package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-11 batch — the helper-operability closers. The two
  * oracle keys (assembler, PrefixSpan) get shape/invariant pins on
  * top of the DuckDB gate; the two no-oracle keys (full-Pipeline
  * persistence, model-registry metadata) get the graded contract:
  * reload-exactness and refit determinism. */
class Pipeline21Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("feature assemble: one row per customer, 3 exact features") {
    val rs = run("q_ml_feature_assemble").collect()
    assert(rs.length == Tables.customer(spark, dir).count())
    assert(rs.forall(_.getLong(2) == 3L))
    // features render as 3 comma-joined centi-scaled integers
    assert(rs.forall(_.getString(1).split(",").length == 3))
    // spot-pin the arithmetic on the first customer
    val c1 = Tables.customer(spark, dir)
      .where(col("c_custkey") === 1)
      .select(col("c_acctbal"), col("c_nationkey"), length(col("c_name")))
      .head()
    val expected = Seq(math.rint(c1.getDouble(0) * 100).toLong,
      c1.getInt(1) * 100L, c1.getInt(2) * 100L).mkString(",")
    assert(rs.find(_.getLong(0) == 1L).get.getString(1) == expected)
  }

  test("prefixspan: support threshold + containment vs singletons") {
    val rs = run("q_ml_prefixspan").collect()
    assert(rs.nonEmpty)
    val nUsers = Tables.events(spark, dir)
      .select(countDistinct("user_id")).head().getLong(0)
    val minCount = math.ceil(0.5 * nUsers).toLong
    assert(rs.forall(_.getLong(2) >= minCount),
      "every pattern meets the ceil(0.5*n) support bar")
    assert(rs.forall(_.getLong(2) <= nUsers))
    val s1 = rs.filter(_.getLong(1) == 1L)
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // anti-monotonicity: <a,b> support <= min(support(a), support(b))
    rs.filter(_.getLong(1) == 2L).foreach { r =>
      val Array(a, b) = r.getString(0).split(">")
      assert(s1.contains(a) && s1.contains(b),
        s"pair ${r.getString(0)} with an infrequent element")
      assert(r.getLong(2) <= math.min(s1(a), s1(b)))
    }
  }

  test("pipeline persist: reloaded PipelineModel agrees on every vector") {
    val rs = run("q_ml_pipeline_persist").collect()
    assert(rs.nonEmpty)
    assert(rs.forall(_.getBoolean(2)),
      "reloaded pipeline must reproduce every prediction exactly")
    assert(rs.map(_.getLong(1)).sum ==
      Tables.embeddings(spark, dir).count())
    // idempotent: a second save/load round-trip is byte-stable
    val again = run("q_ml_pipeline_persist").collect()
    assert(rs.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("vec normalize: unit norm, positive-count matches raw signs") {
    val rs = run("q_vec_normalize").collect()
    assert(rs.length == Tables.embeddings(spark, dir).count())
    // micro-int components of a unit vector stay inside [-1e6, 1e6]
    rs.foreach { r =>
      (1 to 4).foreach(i =>
        assert(math.abs(r.getLong(i)) <= 1000000L, r.toString))
      assert(r.getDouble(5) > 0, "positive L2 norm")
      assert(r.getLong(6) >= 0 && r.getLong(6) <= 64)
    }
  }

  test("poly expand: 5 exact terms obeying the (x, x2, y, xy, y2) basis") {
    val rs = run("q_ml_poly_expand").collect()
    assert(rs.forall(_.getLong(2) == 5L))
    rs.take(50).foreach { r =>
      val Array(x, x2, y, xy, y2) = r.getString(1).split(",").map(_.toLong)
      assert(x2 == x * x && xy == x * y && y2 == y * y, r.toString)
    }
  }

  test("pic: deterministic spectral partition covering the LSH graph") {
    val a = run("q_ml_pic").collect().map(_.toString).toSeq
    val b = run("q_ml_pic").collect().map(_.toString).toSeq
    assert(a == b, "PIC with degree init must be deterministic")
    val rs = run("q_ml_pic").collect()
    assert(rs.length <= 4 && rs.nonEmpty)
    // size-rank labeling is monotone and sizes positive
    assert(rs.map(_.getLong(0)).toSeq == (1L to rs.length).toSeq)
    assert(rs.forall(_.getLong(1) > 0))
    val covered = rs.map(_.getLong(1)).sum
    // every node with at least one positive-cosine LSH edge is assigned
    assert(covered > 0 &&
      covered <= Tables.embeddings(spark, dir).count())
  }

  test("graph triangles: wedge-closure invariants on the stored graph") {
    val r = run("q_graph_triangles").head()
    val (edges, nodes, wedges, tris, closure) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(edges > 0 && nodes > 1)
    assert(nodes <= 2 * edges, "every node carries at least one edge")
    assert(tris <= wedges, "a triangle is a closed wedge")
    assert(closure == (if (wedges == 0) 0L else 1000000L * tris / wedges))
    // the near-dup fixture graph is cliquish: duplicate clusters close
    // most of their wedges
    if (wedges > 0) assert(closure > 0, "no closed wedge in a dup graph")
  }

  test("model metadata: deterministic registry over the memoized fits") {
    val a = run("q_ml_model_metadata").collect().map(_.toString).toSeq
    val b = run("q_ml_model_metadata").collect().map(_.toString).toSeq
    assert(a == b, "registry readout must be deterministic")
    val kv = run("q_ml_model_metadata").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(kv(("kmeans_target", "k")) == "10")
    assert(kv(("kmeans_target", "seed")) == "42")
    assert(kv(("rf_eval", "num_features")) == "64")
    assert(kv(("scaler_lr", "stages"))
      == "StandardScalerModel,LogisticRegressionModel")
    // the seeded KMeans training cost is recorded and positive
    assert(kv(("kmeans_target", "training_cost_milli")).toLong > 0L)
    assert(kv(("rf_eval", "total_num_nodes")).toLong > 0L)
  }
}
