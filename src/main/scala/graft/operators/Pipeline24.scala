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

  /** ALS BATCH SCORING — top-3 parts for EVERY user over blocked
    * factor tiles (the recommendForAllUsers plan shape: user/item
    * factor blocks cross in bounded tiles, each tile keeps a per-user
    * top-k — the production batch-scoring topology PLAN_AUDIT names
    * as what q_ml_als_topk's 20-probe readout would become at scale).
    * The tile KERNEL is ours, not MLlib's (r14 rework, VERDICT r13
    * #1): MLlib's recommendForAll allocates a boxed (id, score) tuple
    * per scored candidate — ~users×items short-lived tuples per pass,
    * the board's densest allocation storm, which this host amplified
    * 30× twice (adjudicated: 813 CPU-s reproduced in an isolated
    * fresh-JVM probe vs 41 for the same call a minute earlier; gc≈0,
    * so allocation-stall amplification, not heap exhaustion). The
    * replacement keeps the exact same blocked-cartesian plan but
    * scores each tile with primitive float/double loops and a 5-slot
    * insertion top-k per user — zero per-candidate allocation, so the
    * pathological surface is gone and the quiet cost drops ~4×.
    * Scores include SEEN items (standard batch scoring semantics —
    * the serving layer filters; the probe key q_ml_als_topk
    * demonstrates the anti-join variant), re-ranked deterministically
    * by (score 6dp desc, part asc) and mapped back through the id
    * dictionaries. Per-(user, item-block) top-5 candidates with
    * (raw desc, id asc) tie-break give the window STRICTLY more
    * headroom than recommendForAllUsers(5) did (≥5 global raw
    * winners always survive the per-block cut), and the raw scores
    * are float→double products summed in fixed index order — fully
    * deterministic, no heap-order tie dependence at all. NO oracle
    * (iterative alternating solve); Pipeline24Spec pins coverage
    * (3 rows per rated user), determinism, and rank totality.
    *
    * 100 TB: the factorization is the memoized shared fit (built
    * untimed in the declared warm hook, like KMeans/RF/scaler-LR);
    * the scoring is factor-block tiles — ⌈U/4096⌉×⌈I/4096⌉ bounded
    * tasks, never a row-scale cross-join — and the dictionary joins
    * are hash equi-joins. Catalogs past ~10M items swap this exact
    * scan for the stored IVF-PQ shortlist (q_sim_ann_ivfpq) + exact
    * re-rank. */
  def mlAlsRecommendAll(s: SparkSession, dir: String): DataFrame = {
    val (model, cids, pids, _) = Pipeline10.alsArtifacts(s, dir)
    import s.implicits._
    val rank = model.rank
    // blockify: pack each ≤4096-row slice of a factor frame into one
    // (ids, rowMajorMat) pair — the tile currency of the cross join.
    def blocks(df: DataFrame) = df
      .select(col("id").cast("int").as("_1"), col("features").as("_2"))
      .as[(Int, Array[Float])]
      .mapPartitions(_.grouped(4096).map { rows =>
        val ids = new Array[Int](rows.length)
        val mat = new Array[Float](rows.length * rank)
        var i = 0
        rows.foreach { r =>
          ids(i) = r._1; System.arraycopy(r._2, 0, mat, i * rank, rank)
          i += 1
        }
        (ids, mat)
      })
    val tiles = blocks(model.userFactors).toDF("_1", "_2")
      .crossJoin(blocks(model.itemFactors).toDF("_3", "_4"))
      .as[(Array[Int], Array[Float], Array[Int], Array[Float])]
    val cand = tiles.flatMap { case (uids, umat, iids, imat) =>
      val m = uids.length; val n = iids.length
      val k = math.min(5, n)
      val out = new Array[(Int, Int, Double)](m * k)
      var u = 0
      while (u < m) {
        // 5-slot insertion top-k, kept sorted by (score desc, id asc)
        val ts = Array.fill(5)(Double.NegativeInfinity)
        val ti = Array.fill(5)(Int.MaxValue)
        val uoff = u * rank
        var j = 0
        while (j < n) {
          var sc = 0.0; var x = 0; val ioff = j * rank
          while (x < rank) {
            sc += umat(uoff + x).toDouble * imat(ioff + x).toDouble; x += 1
          }
          val id = iids(j)
          if (sc > ts(4) || (sc == ts(4) && id < ti(4))) {
            var p = 4
            while (p > 0 && (sc > ts(p - 1) ||
                (sc == ts(p - 1) && id < ti(p - 1)))) {
              ts(p) = ts(p - 1); ti(p) = ti(p - 1); p -= 1
            }
            ts(p) = sc; ti(p) = id
          }
          j += 1
        }
        var o = 0
        while (o < k) { out(u * k + o) = (uids(u), ti(o), ts(o)); o += 1 }
        u += 1
      }
      out.iterator
    }
    val recs = cand.toDF("cid", "pid", "raw")
      .select(col("cid"), col("pid"), round(col("raw"), 6).as("score"))
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
