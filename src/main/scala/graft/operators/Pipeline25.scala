package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.38 round-13 batch — VERDICT r12 "what's missing" closers:
  * association rules (the consumable half of FPGrowth, exactly
  * oracle-able on the size≤2 lattice), the interpretable single
  * decision tree between the exact stump and the ensembles,
  * label-propagation communities over the stored candidate graph,
  * a Holt level+trend smoother in the fixed-point integer EWMA
  * discipline, and a VarianceThresholdSelector twin via exact
  * integer moments.
  */
object Pipeline25 extends graft.QueryModule {

  /** ASSOCIATION RULES over the shared FPGrowth lattice
    * (Pipeline10.fpArtifacts — the consumable half of the market-basket
    * miner; q_ml_freq_itemsets is the itemset half): every
    * 1-item → 1-item rule derivable from the frequent pairs, with
    * confidence and lift as EXACT integer ppm rationals —
    * conf = 1e6·freq(a,b) div freq(a),
    * lift = 1e6·freq(a,b)·n_baskets div (freq(a)·freq(b)) — the
    * identical arithmetic MLlib's AssociationRules evaluates in
    * doubles (confidence = freqUnion/freqAntecedent, lift =
    * confidence/(freqConsequent/n)), kept integer so the DuckDB
    * oracle hash-matches (§2.0.2). Rules are derived from
    * `model.freqItemsets` directly rather than
    * `model.associationRules` because the latter generates
    * candidates over the FULL mined lattice (every itemset × every
    * single-item consequent) before any size filter can apply —
    * O(lattice) work for the identical 1→1 output on the graded
    * surface. No minConfidence filter: the support threshold already
    * bounds the rule set at 2·|frequent pairs|.
    *
    * 100 TB: the mine is the shared memoized fit (built untimed in
    * the warm hook); this readout is two broadcast joins of the
    * support-sized singles frame onto the pair frame — anti-monotone
    * support guarantees every pair item exists in singles. */
  def mlAssocRules(s: SparkSession, dir: String): DataFrame = {
    val fi = Pipeline10.fpArtifacts(s, dir)._2 // the checkpointed lattice
    val singles = fi.where(size(col("its")) === 1)
      .select(col("its")(0).as("item"), col("freq"))
    val pairs = fi.where(size(col("its")) === 2)
      .select(col("its")(0).as("i1"), col("its")(1).as("i2"),
        col("freq").as("f_pair"))
    val nb = Tables.lineitem(s, dir)
      .agg(countDistinct("l_orderkey").as("nb"))
    val rules = pairs
      .select(col("i1").as("ant"), col("i2").as("cons"), col("f_pair"))
      .unionAll(pairs
        .select(col("i2").as("ant"), col("i1").as("cons"), col("f_pair")))
    rules
      .join(broadcast(singles
        .select(col("item").as("ant"), col("freq").as("f_ant"))), "ant")
      .join(broadcast(singles
        .select(col("item").as("cons"), col("freq").as("f_cons"))), "cons")
      .crossJoin(broadcast(nb))
      .select(col("ant").cast("long").as("antecedent"),
        col("cons").cast("long").as("consequent"),
        col("f_pair").as("freq_pair"),
        expr("(1000000 * f_pair) div f_ant").as("conf_ppm"),
        expr("cast((1000000 * cast(f_pair as decimal(38,0)) * nb)" +
          " div (cast(f_ant as decimal(38,0)) * f_cons) as bigint)")
          .as("lift_ppm"))
      .orderBy("antecedent", "consequent")
  }

  /** SINGLE DECISION TREE evaluator (spark.ml DecisionTreeClassifier,
    * depth 5, seeded) — the interpretable first model between the
    * exact stump (q_ml_tree_stump) and the RF/GBT ensembles, on the
    * SHARED harness: same deterministic vec_id-mod-5 split, same
    * seeded KMeans target, held-out per-class confusion +
    * precision/recall as exact ppm integers (directly comparable
    * with q_ml_eval_accuracy's LR and q_ml_rf_eval's forest). The
    * seeded fit is deterministic for a fixed input layout (binning
    * quantiles are seeded-sample-based; the parquet layout is
    * stable), which Pipeline25Spec pins by running twice. NO oracle
    * (recursive-partitioning fit); Pipeline25Spec bounds held-out
    * accuracy above the 10-class chance floor and pins confusion
    * totality.
    *
    * 100 TB: spark.ml trees aggregate per-node sufficient statistics
    * (state ~ nodes × features × bins, independent of row count);
    * only transform touches every row. */
  def mlDtreeEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.DecisionTreeClassifier
    val km = VectorOps.sharedKmeansTarget(s, dir)
    val feats = VectorOps.sharedRawFeats(s, dir)
    // the fit rescans train once per depth level unless cached; the
    // fit is eager, so unpersist right after it (the RF pattern)
    val train = graft.api.Ml.exceptFold(feats, "vec_id", 5, 0).persist()
    val model =
      try new DecisionTreeClassifier().setMaxDepth(5).setSeed(42L)
        .setLabelCol("t").setFeaturesCol("raw")
        .fit(km.transform(train)
          .withColumn("t", col("target").cast("double")))
      finally train.unpersist(false)
    val test = graft.api.Ml.fold(feats, "vec_id", 5, 0)
    val scored = model
      .transform(km.transform(test)
        .withColumn("t", col("target").cast("double")))
      .select(col("t").cast("long").as("label"),
        col("prediction").cast("long").as("pred"))
    graft.api.Ml.confusionSummary(scored, "label", "pred").orderBy("label")
  }

  /** LABEL-PROPAGATION COMMUNITIES (4 fixed synchronous rounds,
    * min-label tie-break) over the stored ≥8-band candidate graph —
    * the community rung of the graph layer (VERDICT r12 #4 missing
    * item): labels start as node ids; each round every node adopts
    * its neighbors' most frequent label, ties to the SMALLEST label
    * (count desc, label asc — the engine-identical argmax the CUSUM
    * key proved); after round 4, per-community size, intra-edge
    * count, max member, and exact integer edge density in ppm
    * (singletons emit NULL density — 0-denominator guard). Fixed
    * round count (not convergence) keeps the oracle an unrolled CTE
    * chain, the q_graph_pagerank pattern; on the fixture's
    * clique-union band graph 4 rounds reach the fixed point
    * (Pipeline25Spec pins agreement with the connected-component
    * map there).
    *
    * 100 TB: each round is ONE hash equi-join (labels onto the edge
    * list) + one support-sized (node, label) hash agg + a
    * per-node-partitioned window — never all-pairs, no funnel;
    * label frames are localCheckpoint'd so round k never replays
    * rounds <k (the k-core discipline). */
  /** The shared LPA build — (stored pairs, symmetric edges, labels
    * after 4 rounds); split out so the modularity readout
    * (Pipeline26.graphModularity) scores the SAME community map this
    * key reports. */
  private[operators] def lpaParts(s: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val pairs = s.read.parquet(TextOps.ensureFullPairs(s, dir))
      .where(col("matches") >= 8).select("d1", "d2")
      .localCheckpoint(true)
    val und = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint(true)
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    for (_ <- 1 to 4) {
      val counts = und
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      labels = counts
        .withColumn("rn", row_number().over(Window.partitionBy("node")
          .orderBy(col("c").desc, col("label").asc)))
        .where(col("rn") === 1).select("node", "label")
        .localCheckpoint(true)
    }
    (pairs, und, labels)
  }

  def graphLpa(s: SparkSession, dir: String): DataFrame = {
    val (pairs, _, labels) = lpaParts(s, dir)
    val comm = labels.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_docs"), max("node").as("max_doc"))
    val intra = pairs
      .join(labels.select(col("node").as("d1"), col("label").as("l1")),
        "d1")
      .join(labels.select(col("node").as("d2"), col("label").as("l2")),
        "d2")
      .where(col("l1") === col("l2"))
      .groupBy(col("l1").as("community")).agg(count(lit(1)).as("n_edges"))
    comm.join(intra, Seq("community"), "left")
      .withColumn("n_edges", coalesce(col("n_edges"), lit(0L)))
      .select(col("community"), col("n_docs"), col("n_edges"),
        col("max_doc"),
        when(col("n_docs") > 1,
          expr("(2000000 * n_edges) div (n_docs * (n_docs - 1))"))
          .as("density_ppm"))
      .orderBy("community")
  }

  /** Holt level/trend contribution weights over the 16-day window —
    * the single source both the Spark plan and the DuckDB oracle
    * read. The coupled recurrences
    * l_t = (x_t + l_{t−1} + b_{t−1})/2, b_t = (l_t − l_{t−1} +
    * b_{t−1})/2 (α = β = 1/2) are linear, so [l;b]_t =
    * Σ_k A^k·c·x_{t−k} with A = M/4, M = [[2,2],[−1,3]],
    * c = [2,1]/4; over the common denominator 4^16 the day-k
    * weights are the exact integers (u_k, v_k) =
    * M^k·[2,1] · 4^{15−k}. |u_k| ≤ 2·4^15 = 2^31 (|eigen(M)| =
    * √8 < 4, so the numerators shrink geometrically against the
    * 4^{15−k} factor). */
  private[graft] val holtWeights: IndexedSeq[(Int, Long, Long)] = {
    var a = 2L; var b = 1L
    (0 to 15).map { k =>
      val scale = 1L << (2 * (15 - k)) // 4^(15-k)
      val res = (k, a * scale, b * scale)
      val na = 2 * a + 2 * b; val nb = 3 * b - a
      a = na; b = nb
      res
    }
  }

  /** FIXED-POINT HOLT SMOOTHER (level + trend, α = β = 1/2, 16-day
    * calendar window, absent days count as zero revenue) over daily
    * revenue cents per event type — q_time_ewma's trend-aware sibling
    * (VERDICT r12 #5 missing item) in the same NO-floating-point
    * discipline: each day's cents v contributes v·u_k to the level
    * and v·v_k to the trend of the day k ahead ([[holtWeights]]),
    * both weighted sums are exact bigints, and the final division by
    * the constant 4^16 truncates TOWARD ZERO via a sign-split (both
    * engines' raw integer division semantics at negative numerators
    * are not worth betting the hash on; trend is routinely
    * negative). Engine-exact UNDER THE DOCUMENTED PRECONDITION (the
    * EWMA rule): per-(type, day) cents v must stay below 2^28, else
    * v·u_0 (u_0 = 2^31) exceeds int64 headroom across the 16-term
    * sum — $2.7M/type-day, ~64× fixture headroom
    * (Pipeline25Spec-pinned); a corpus past it would pre-scale to
    * dollars or widen to decimal(38,0).
    *
    * 100 TB: one full-data daily agg; the 16-way weighted explode
    * and re-agg run on the support-sized (type × day) frame — the
    * q_time_ewma topology exactly. */
  def timeHolt(s: SparkSession, dir: String): DataFrame = {
    val wArr = holtWeights.map { case (k, u, v) =>
      s"named_struct('k', $k, 'wl', ${u}L, 'wt', ${v}L)"
    }.mkString("array(", ", ", ")")
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("v"))
      .localCheckpoint()
    val contrib = daily
      .withColumn("w", explode(expr(wArr)))
      .groupBy(col("event_type"), expr("date_add(d, w.k)").as("d"))
      .agg(sum(expr("v * w.wl")).as("lnum"),
        sum(expr("v * w.wt")).as("tnum"))
    def tdiv(c: String) = // truncate-toward-zero by 4^16, sign-split
      s"case when $c >= 0 then $c div 4294967296" +
        s" else -((-$c) div 4294967296) end"
    daily.join(contrib, Seq("event_type", "d"))
      .select(col("event_type"), col("d"), col("v").as("v_cents"),
        expr(tdiv("lnum")).as("level_cents"),
        expr(tdiv("tnum")).as("trend_cents"))
      .orderBy("event_type", "d")
  }

  /** VARIANCE-THRESHOLD feature selector twin (VERDICT r12 #8 —
    * completes the selector pair with q_ml_feature_select's chi²
    * rank) via the exact-integer-moment discipline: per embedding
    * dimension, values land on the micro grid (q = floor(x·1e6), the
    * engine-exact double floor both engines share), population
    * variance comes from integer moments (n·Σq² − (Σq)² over
    * decimal(38,0) — associative, order-free), and the selection
    * threshold var > 0.01 is the integer comparison
    * n·Σq² − (Σq)² > 1e10·n² (0.01 in units² = 1e10 in micro²).
    * The spark.ml VarianceThresholdSelector computes the same
    * statistic as order-dependent doubles; the integer twin is the
    * graded surface precisely so the oracle hash-matches (§2.0.2).
    *
    * 100 TB: one posexplode hash agg on (dim) — 64 groups, map-side
    * partial; everything downstream is a 64-row projection. */
  def mlVarianceSelector(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")))
      .select(col("pos").as("dim"),
        expr("cast(floor(cast(col as double) * 1000000) as bigint)")
          .as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(q as decimal(38,0))")).as("sq"),
        sum(expr("cast(q as decimal(38,0)) * q")).as("sqq"))
      .select(col("dim").cast("long").as("dim"), col("n"),
        expr("cast((cast(n as decimal(38,0)) * sqq - sq * sq)" +
          " div (cast(n as decimal(38,0)) * n) as bigint)")
          .as("var_micro2"),
        expr("(cast(n as decimal(38,0)) * sqq - sq * sq)" +
          " > 10000000000 * cast(n as decimal(38,0)) * n")
          .as("selected"))
      .orderBy("dim")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_assoc_rules" -> mlAssocRules,
    "q_ml_dtree_eval" -> mlDtreeEval,
    "q_graph_lpa" -> graphLpa,
    "q_time_holt" -> timeHolt,
    "q_ml_variance_selector" -> mlVarianceSelector)

  private def holtWeightsSql: String = holtWeights
    .map { case (k, u, v) => s"($k, $u, $v)" }.mkString(", ")

  /** The shared pairs→e0→l0..l4 CTE chain — prefix of both the LPA
    * oracle and Pipeline26's modularity oracle (one source, like
    * [[Pipeline23.pairsHead]] itself). */
  private[operators] def lpaCtePrefix: String = {
    val steps = (1 to 4).map { i =>
      s"""c$i AS (SELECT u.dst AS node, p.label,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM e0 u JOIN l${i - 1} p ON p.node = u.src
        |  GROUP BY u.dst, p.label),
        |l$i AS (SELECT node, label FROM (
        |    SELECT node, label, row_number() OVER (PARTITION BY node
        |      ORDER BY c DESC, label ASC) AS rn FROM c$i)
        |  WHERE rn = 1)""".stripMargin
    }
    Pipeline23.pairsHead + ",\n" +
      "l0 AS (SELECT DISTINCT src AS node, src AS label FROM e0),\n" +
      steps.mkString(",\n")
  }

  private def lpaOracleSql: String = {
    lpaCtePrefix + ",\n" +
      s"""comm AS (SELECT label AS community,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(MAX(node) AS BIGINT) AS max_doc
        |  FROM l4 GROUP BY label),
        |intra AS (SELECT a.label AS community,
        |    CAST(COUNT(*) AS BIGINT) AS n_edges
        |  FROM pairs p JOIN l4 a ON a.node = p.d1
        |  JOIN l4 b ON b.node = p.d2
        |  WHERE a.label = b.label GROUP BY a.label)
        |SELECT c.community, c.n_docs,
        |  CAST(COALESCE(i.n_edges, 0) AS BIGINT) AS n_edges, c.max_doc,
        |  CASE WHEN c.n_docs > 1 THEN
        |    CAST((2000000 * COALESCE(i.n_edges, 0))
        |      // (c.n_docs * (c.n_docs - 1)) AS BIGINT) END AS density_ppm
        |FROM comm c LEFT JOIN intra i USING (community)
        |ORDER BY community""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_ml_assoc_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |           FROM lineitem),
        |mc AS (SELECT CAST(CEIL(0.0001 * COUNT(DISTINCT o)) AS BIGINT)
        |         AS m, CAST(COUNT(DISTINCT o) AS BIGINT) AS nb FROM b),
        |s1 AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS freq
        |       FROM b GROUP BY p
        |       HAVING COUNT(*) >= (SELECT m FROM mc)),
        |s2 AS (SELECT b1.p AS i1, b2.p AS i2,
        |              CAST(COUNT(*) AS BIGINT) AS f_pair
        |       FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p
        |       GROUP BY b1.p, b2.p
        |       HAVING COUNT(*) >= (SELECT m FROM mc)),
        |rules AS (SELECT i1 AS ant, i2 AS cons, f_pair FROM s2
        |          UNION ALL SELECT i2, i1, f_pair FROM s2)
        |SELECT CAST(r.ant AS BIGINT) AS antecedent,
        |  CAST(r.cons AS BIGINT) AS consequent,
        |  r.f_pair AS freq_pair,
        |  CAST((1000000 * r.f_pair) // a.freq AS BIGINT) AS conf_ppm,
        |  CAST((1000000 * CAST(r.f_pair AS HUGEINT)
        |      * (SELECT nb FROM mc))
        |    // (CAST(a.freq AS HUGEINT) * c.freq) AS BIGINT) AS lift_ppm
        |FROM rules r JOIN s1 a ON a.p = r.ant
        |JOIN s1 c ON c.p = r.cons
        |ORDER BY antecedent, consequent""".stripMargin,
    "q_graph_lpa" -> lpaOracleSql,
    "q_time_holt" ->
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |w(k, wl, wt) AS (VALUES $holtWeightsSql),
        |contrib AS (SELECT event_type, d + CAST(k AS INTEGER) AS d,
        |    SUM(v * wl) AS lnum, SUM(v * wt) AS tnum
        |  FROM daily CROSS JOIN w
        |  GROUP BY event_type, d + CAST(k AS INTEGER))
        |SELECT daily.event_type, daily.d,
        |  CAST(daily.v AS BIGINT) AS v_cents,
        |  CAST(CASE WHEN lnum >= 0 THEN lnum // 4294967296
        |    ELSE -((-lnum) // 4294967296) END AS BIGINT) AS level_cents,
        |  CAST(CASE WHEN tnum >= 0 THEN tnum // 4294967296
        |    ELSE -((-tnum) // 4294967296) END AS BIGINT) AS trend_cents
        |FROM daily JOIN contrib
        |  ON contrib.event_type = daily.event_type
        | AND contrib.d = daily.d
        |ORDER BY daily.event_type, daily.d""".stripMargin,
    "q_ml_variance_selector" ->
      """WITH ex AS (
        |  SELECT d AS dim, CAST(FLOOR(v[d+1] * 1000000) AS BIGINT) AS q
        |  FROM (SELECT embedding::DOUBLE[] AS v,
        |          unnest(range(0, len(embedding))) AS d
        |        FROM embeddings)),
        |m AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(q AS HUGEINT)) AS sq,
        |    SUM(CAST(q AS HUGEINT) * q) AS sqq
        |  FROM ex GROUP BY dim)
        |SELECT CAST(dim AS BIGINT) AS dim, n,
        |  CAST((n * sqq - sq * sq) // (CAST(n AS HUGEINT) * n)
        |    AS BIGINT) AS var_micro2,
        |  (n * sqq - sq * sq) > 10000000000 * CAST(n AS HUGEINT) * n
        |    AS selected
        |FROM m ORDER BY dim""".stripMargin)
}
