package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.37 round-12 batch — recommender/prep/sketch closers from
  * VERDICT r11 "what's missing": ALS batch scoring
  * (recommendForAllUsers — the production half of the recommender,
  * sharing Pipeline10's memoized fit), the MinHashLSH library twin of
  * the hand-rolled Jaccard dedup path, the RFormula quick-prep entry
  * point (oracle-exact), and the KLL sketch twin of q_agg_mad (the
  * house exact/approx pairing). */
object Pipeline24 extends graft.QueryModule {

  /** ALS BATCH SCORING — top-3 parts for EVERY user via
    * recommendForAllUsers (MLlib's blocked top-k: user/item factor
    * blocks cross in bounded tiles, each tile keeps a per-user heap —
    * the production batch-scoring plan PLAN_AUDIT names as what
    * q_ml_als_topk's 20-probe readout would become at scale). Scores
    * include SEEN items (standard batch scoring semantics — the
    * serving layer filters; the probe key q_ml_als_topk demonstrates
    * the anti-join variant), re-ranked deterministically by
    * (score 6dp desc, part asc) and mapped back through the id
    * dictionaries. NO oracle (iterative alternating solve);
    * Pipeline24Spec pins coverage (3 rows per rated user),
    * determinism, and rank totality.
    *
    * 100 TB: the factorization is the memoized shared fit (built
    * untimed in the declared warm hook, like KMeans/RF/scaler-LR);
    * the scoring is factor-block tiles — never a row-scale
    * cross-join — and the dictionary joins are hash equi-joins. */
  def mlAlsRecommendAll(s: SparkSession, dir: String): DataFrame = {
    val (model, cids, pids, _) = Pipeline10.alsArtifacts(s, dir)
    // top-5 HEADROOM, final 3 chosen by the deterministic (score 6dp
    // desc, part asc) order (ADVICE r12): which items enter MLlib's
    // internal top-k heap at a raw-float score tie depends on block
    // processing order, so asking for exactly 3 would make the graded
    // rows heap-order-dependent at ties; with headroom the re-rank
    // below owns the cut.
    val recs = model.recommendForAllUsers(5)
      .select(col("cid"), explode(col("recommendations")).as("r"))
      .select(col("cid"), col("r.pid").as("pid"),
        round(col("r.rating").cast("double"), 6).as("score"))
    val w = Window.partitionBy(col("cust"))
      .orderBy(col("score").desc, col("part").asc)
    recs.join(cids, "cid").join(pids, "pid")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("cust").cast("long").as("cust"), col("rank"),
        col("part").cast("long").as("part"), col("score"))
      .orderBy("cust", "rank")
  }

  /** MINHASH-LSH library twin (spark.ml MinHashLSH — the Jaccard-side
    * sibling of q_sim_ann_brp's euclidean wrapper, and the library
    * twin of the hand-rolled q_dedup_minhash band join): per-doc
    * 3-shingle sets as binary hashed vectors (HashingTF 2^18,
    * binary), seeded 8-table MinHash, approxSimilarityJoin at Jaccard
    * distance ≤ 0.5, emitted as (d1 < d2, exact-set Jaccard distance
    * in micro). Deterministic: seeded hash family, threshold-defined
    * candidate set, total output order. Docs under 3 tokens have no
    * shingles and are out of universe (same eligibility as the stored
    * signature pairs). NO oracle (the candidate set depends on the
    * seeded hash family); Pipeline24Spec pins threshold truth,
    * determinism, and candidate recall vs brute-force Jaccard ≥ 0.5
    * truth on the fixture corpus.
    *
    * 100 TB: approxSimilarityJoin explodes 8 bucket keys per doc and
    * hash-equi-joins on (table, bucket) — the identical topology as
    * the stored-signature band join, NEVER all-pairs; the exact
    * re-verify runs only on bucket candidates. */
  def simMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val sets = TextOps.shingles(s, dir)
      .groupBy("doc_id").agg(collect_list(col("shingle")).as("sh"))
    val feats = new HashingTF().setInputCol("sh").setOutputCol("f")
      .setNumFeatures(1 << 18).setBinary(true)
      .transform(sets)
      .localCheckpoint() // feeds the fit and both join sides
    val model = new MinHashLSH().setInputCol("f").setOutputCol("h")
      .setNumHashTables(8).setSeed(42L).fit(feats)
    model.approxSimilarityJoin(feats, feats, 0.5, "jdist")
      .select(col("datasetA.doc_id").as("d1"),
        col("datasetB.doc_id").as("d2"), col("jdist"))
      .where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        expr("cast(floor(jdist * 1000000) as bigint)").as("jdist_micro"))
      .orderBy("d1", "d2")
  }

  /** RFORMULA quick prep (spark.ml RFormula — the single most-used
    * one-call prep entry of an ML helper): label ~ numeric + 5-value
    * categorical + numeric over customers through the REAL
    * transformer. RFormula expands terms in formula order; the
    * categorical goes through StringIndexer (frequencyDesc, ties
    * alphabetical — the q_ml_feature_onehot semantics) then one-hot
    * with the LAST (least frequent) level dropped, so the layout is
    * [acctbal_cents, seg_0..seg_3, name_len] — all exact integers,
    * rendered per §2.0.8 as a comma-joined bigint string. The numeric
    * label (acctbal > 0) passes through unindexed. Fully
    * oracle-exact.
    *
    * 100 TB: one bounded 5-row domain agg (the StringIndexer fit)
    * broadcast back; the transform is a narrow projection. */
  def mlRformula(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.RFormula
    import org.apache.spark.ml.functions.vector_to_array
    val base = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        expr("cast(round(c_acctbal * 100) as bigint)")
          .cast("double").as("acctbal_cents"),
        length(col("c_name")).cast("double").as("name_len"),
        (col("c_acctbal") > 0).cast("double").as("is_pos"))
    val model = new RFormula()
      .setFormula("is_pos ~ acctbal_cents + c_mktsegment + name_len")
      .setFeaturesCol("f").setLabelCol("lab")
      .fit(base)
    model.transform(base)
      .select(col("c_custkey"),
        array_join(transform(vector_to_array(col("f"), "float64"),
          x => x.cast("long").cast("string")), ",").as("features"),
        col("lab").cast("long").as("label"))
      .orderBy("c_custkey")
  }

  /** KLL SKETCH twin of q_agg_mad (the house exact/approx pairing —
    * trimmed/outliers/bucketize each have one): per order status, the
    * sketch median of totals and the sketch median of absolute
    * deviations FROM the sketch median, k = 200. Two sketch passes
    * replace q_agg_mad's two grouped exact medians: partial sketches
    * merge associatively map-side, so no whole-group percentile
    * buffer ever materializes on a reducer. NO oracle (sketch
    * internals); Pipeline24Spec pins the rank-band contract: each
    * reported quantile's rank among the true group values lies within
    * n·ε of the target rank, and the deviation pass is anchored at
    * the sketch median by exact recomputation.
    *
    * 100 TB: two map-side-partial sketch aggs on the 3-status domain
    * + one broadcast join of the 3-row median frame — the sketch path
    * q_agg_mad's doc comment names for when the exact per-group sort
    * is too hot. */
  def aggMadKll(s: SparkSession, dir: String): DataFrame = {
    graft.functions.KllExprs.ensureRegistered(s)
    val base = Tables.orders(s, dir)
      .select(col("o_orderstatus").as("st"),
        col("o_totalprice").cast("double").as("x"))
    val med = base.groupBy("st")
      .agg(count(lit(1)).as("cnt"),
        expr("graft_kll_quantile(graft_kll_agg(x, 200), 0.5D)")
          .as("med_kll"))
    base.join(broadcast(med), "st")
      .withColumn("ad", abs(col("x") - col("med_kll")))
      .groupBy("st")
      .agg(max("cnt").as("cnt"),
        round(max("med_kll"), 4).as("median_kll"),
        round(expr("graft_kll_quantile(graft_kll_agg(ad, 200), 0.5D)"), 4)
          .as("mad_kll"))
      .select(col("st").as("o_orderstatus"), col("cnt"),
        col("median_kll"), col("mad_kll"))
      .orderBy("o_orderstatus")
  }

  /** STRING-INDEXER ROUND-TRIP (spark.ml StringIndexer +
    * IndexToString — the inverse-mapping half of the prep entry
    * points, beside q_ml_rformula's formula half and
    * q_ml_feature_onehot's hand-rolled index semantics): index the
    * 5-value segment domain through the REAL estimator
    * (frequencyDesc, ties alphabetical), map the codes straight back
    * through IndexToString with the fitted labels — the
    * predictions-to-labels rendering step every classification
    * pipeline ends with — and emit the round-trip agreement flag.
    * Fully oracle-exact.
    *
    * 100 TB: the fit is one bounded 5-row domain agg; transform and
    * inverse map are narrow projections over a broadcast label
    * table. */
  def mlIndexToString(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.{IndexToString, StringIndexer}
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val model = new StringIndexer()
      .setInputCol("c_mktsegment").setOutputCol("sidx")
      .setStringOrderType("frequencyDesc")
      .fit(cust)
    val back = new IndexToString()
      .setInputCol("sidx").setOutputCol("seg_back")
      .setLabels(model.labelsArray(0))
    back.transform(model.transform(cust))
      .select(col("c_custkey"), col("c_mktsegment"),
        col("sidx").cast("long").as("sidx"), col("seg_back"),
        (col("seg_back") === col("c_mktsegment")).as("roundtrip_ok"))
      .orderBy("c_custkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_als_recommend_all" -> mlAlsRecommendAll,
    "q_sim_minhash_lsh" -> simMinhashLsh,
    "q_ml_rformula" -> mlRformula,
    "q_ml_index_to_string" -> mlIndexToString,
    "q_agg_mad_kll" -> aggMadKll)

  def oracleSql: Map[String, String] = Map(
    "q_ml_index_to_string" ->
      """WITH idx AS (
        |  SELECT c_mktsegment,
        |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
        |      c_mktsegment ASC) - 1 AS BIGINT) AS sidx
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT c_custkey, c_mktsegment, sidx,
        |  c_mktsegment AS seg_back, TRUE AS roundtrip_ok
        |FROM customer JOIN idx USING (c_mktsegment)
        |ORDER BY c_custkey""".stripMargin,
    "q_ml_rformula" ->
      """WITH idx AS (
        |  SELECT c_mktsegment,
        |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
        |      c_mktsegment ASC) - 1 AS BIGINT) AS sidx
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT c_custkey,
        |  CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR)
        |    || ',' || CAST(CAST(sidx = 0 AS BIGINT) AS VARCHAR)
        |    || ',' || CAST(CAST(sidx = 1 AS BIGINT) AS VARCHAR)
        |    || ',' || CAST(CAST(sidx = 2 AS BIGINT) AS VARCHAR)
        |    || ',' || CAST(CAST(sidx = 3 AS BIGINT) AS VARCHAR)
        |    || ',' || CAST(LENGTH(c_name) AS VARCHAR) AS features,
        |  CAST(c_acctbal > 0 AS BIGINT) AS label
        |FROM customer JOIN idx USING (c_mktsegment)
        |ORDER BY c_custkey""".stripMargin)
}
