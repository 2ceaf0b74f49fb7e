package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.80 round-16 batch 53 — clustering-quality and labeling-
  * agreement closers: the genuine ml.feature.Binarizer stage, the
  * Davies–Bouldin index on EXACT integer moments (the third internal
  * cluster-validity rung beside silhouette and Calinski–Harabasz),
  * and ARI + NMI between two labelings (the external-validity pair
  * the board lacked).
  */
object Pipeline85 extends graft.QueryModule {

  /** BINARIZER — the genuine MLlib stage (threshold 50 on the raw
    * event value; Binarizer emits 1.0 strictly ABOVE the threshold),
    * rolled up per event type: count, positives, ppm share.
    *
    * 100 TB: the stage is a projection; one map-side partial agg on
    * the type domain. */
  def mlBinarizer(s: SparkSession, dir: String): DataFrame = {
    val bin = new org.apache.spark.ml.feature.Binarizer()
      .setInputCol("value").setOutputCol("bin").setThreshold(50.0)
    bin.transform(Tables.events(s, dir))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("bin").cast("long")).as("n_pos"))
      .select(col("event_type"), col("n"), col("n_pos"),
        expr("(1000000 * n_pos) div n").as("pos_ppm"))
      .orderBy("event_type")
  }

  /** Embeddings QUANTIZED to exact micro-units — the determinism
    * device for cluster geometry: em = round(e_d·1e6) as bigint, so
    * every downstream moment is integer/decimal and the float-sum
    * row-order hazard is gone entirely (identical integers on both
    * engines; the 1e-6 quantization error is far below the 6-dp
    * output rounding). */
  private def microExploded(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("label").cast("long").as("label"),
        posexplode(expr(
          "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))")))
      .select(col("vec_id"), col("label"), col("pos").as("d"),
        col("col").as("em"))

  /** DAVIES–BOULDIN INDEX per cluster (label): scatter S_i = mean
    * member distance to the centroid and R_i = max_{j≠i}
    * (S_i+S_j)/M_ij, all from EXACT integer moments — member
    * distance² = Σ_d(n·em−s_d)²/(n·1e6)² and centroid distance² =
    * Σ_d(s_id·n_j − s_jd·n_i)²/(n_i·n_j·1e6)² are decimal sums of
    * integer squares, each per-member distance re-quantized to micro
    * before the scatter sum (integer, order-free), so no row-ordered
    * double fold exists anywhere. The mean of the r column is the DB
    * index itself (spec-pinned vs a JVM re-derivation).
    *
    * 100 TB: one (label,dim) moment agg (‖labels‖×64 rows), one
    * member equi-join against the broadcast moment frame, and a
    * ‖labels‖² centroid-pair frame — nothing scales with pairs of
    * ROWS. */
  def mlDaviesBouldin(s: SparkSession, dir: String): DataFrame = {
    // one eager materialization: the exploded frame feeds the moment
    // agg AND the member-distance join (re-exploding per consumer
    // measured ~3x the CPU); cluster sizes come off the base table
    val ex = microExploded(s, dir).localCheckpoint(true)
    val sums = ex.groupBy("label", "d").agg(sum("em").as("sd"))
    val ns = Tables.embeddings(s, dir)
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    val withN = sums.join(ns, "label").localCheckpoint(true)
    // member scatter: dist_micro = round(sqrt(Σ(n·em − s)²)/n), then
    // an integer sum per label
    val scatter = ex
      .join(withN.select(col("label"), col("d"), col("sd"), col("n")),
        Seq("label", "d"))
      .groupBy("label", "vec_id", "n")
      .agg(sum(expr(
        "cast(n * em - sd as decimal(38,0)) * (n * em - sd)")).as("dsq"))
      .select(col("label"), col("n"),
        expr("cast(round(sqrt(cast(dsq as double)) / n) as bigint)")
          .as("dmicro"))
      .groupBy("label", "n")
      .agg(sum("dmicro").as("sdm"))
      .select(col("label"), col("n"),
        expr("cast(sdm as double) / (n * 1000000D)").as("s_i"))
      .localCheckpoint(true)
    // centroid pair distances from the same integer moments
    val a = withN.select(col("label").as("li"), col("d"),
      col("sd").as("si"), col("n").as("ni"))
    val b = withN.select(col("label").as("lj"), col("d"),
      col("sd").as("sj"), col("n").as("nj"))
    val m = a.join(b, Seq("d")).where(col("li") =!= col("lj"))
      .groupBy("li", "lj", "ni", "nj")
      .agg(sum(expr(
        "cast(si * nj - sj * ni as decimal(38,0)) * (si * nj - sj * ni)"))
        .as("msq"))
      .select(col("li"), col("lj"),
        expr("sqrt(cast(msq as double)) / (cast(ni as double) * nj * 1000000D)")
          .as("m_ij"))
    val si = scatter.select(col("label").as("li"), col("s_i"))
    val sj = scatter.select(col("label").as("lj"), col("s_i").as("s_j"))
    m.join(si, "li").join(sj, "lj")
      .groupBy("li")
      .agg(max(expr("(s_i + s_j) / m_ij")).as("r"))
      .join(scatter.select(col("label").as("li"), col("n"), col("s_i")), "li")
      .select(col("li").as("label"), col("n"),
        round(col("s_i"), 6).as("scatter"),
        round(col("r"), 6).as("r_max"))
      .orderBy("label")
  }

  /** ARI + NMI — external cluster-validity between the true label
    * and a deterministic 4-way sign quantization of the first two
    * coordinates (the SRP-fingerprint family's 2-bit cousin):
    * Adjusted Rand from exact pair-count integers, NMI =
    * I/√(H_t·H_p) with every log-sum folded in (label, pred) order
    * (the q_agg_entropy ordered-fold discipline — no unordered
    * double accumulation).
    *
    * 100 TB: one hash agg to the ≤|labels|·4 contingency, then
    * one-row arithmetic. */
  def mlNmiAri(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        expr("(case when cast(element_at(embedding, 1) as double) > 0D" +
          " then 2L else 0L end) + " +
          "(case when cast(element_at(embedding, 2) as double) > 0D" +
          " then 1L else 0L end)").as("pred"))
      .groupBy("label", "pred").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val rows = cells.groupBy("label").agg(sum("c").as("a"))
    val cols_ = cells.groupBy("pred").agg(sum("c").as("b"))
    val parts = cells
      .agg(sum("c").as("n"), count(lit(1)).as("n_cells"),
        sum(expr("c * (c - 1)")).as("sij2"),
        expr("aggregate(array_sort(collect_list(struct(label, pred, c)))," +
          " cast(0 as double), (acc, x) -> acc + x.c * ln(x.c))").as("slc"))
    val ra = rows.agg(sum(expr("a * (a - 1)")).as("sa2"),
      expr("aggregate(array_sort(collect_list(struct(label, a)))," +
        " cast(0 as double), (acc, x) -> acc + x.a * ln(x.a))").as("sla"))
    val cb = cols_.agg(sum(expr("b * (b - 1)")).as("sb2"),
      expr("aggregate(array_sort(collect_list(struct(pred, b)))," +
        " cast(0 as double), (acc, x) -> acc + x.b * ln(x.b))").as("slb"))
    parts.crossJoin(ra).crossJoin(cb)
      .select(col("n"), col("n_cells"),
        // ARI on half-pair counts: index=Σnij(nij−1)/2 etc.; the /2
        // cancels nowhere, so keep integer doubles of everything
        expr("round((cast(sij2 as double) / 2 " +
          " - (cast(sa2 as double) / 2) * (cast(sb2 as double) / 2)" +
          "   / (cast(n as double) * (n - 1) / 2)) / " +
          "((cast(sa2 as double) / 2 + cast(sb2 as double) / 2) / 2" +
          " - (cast(sa2 as double) / 2) * (cast(sb2 as double) / 2)" +
          "   / (cast(n as double) * (n - 1) / 2)), 6)").as("ari"),
        // I = (slc − sla − slb)/n + ln n ; H_t = ln n − sla/n
        expr("round(((slc - sla - slb) / n + ln(n)) / " +
          "sqrt((ln(n) - sla / n) * (ln(n) - slb / n)), 6)").as("nmi"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_binarizer" -> mlBinarizer,
    "q_ml_davies_bouldin" -> mlDaviesBouldin,
    "q_ml_nmi_ari" -> mlNmiAri)

  def oracleSql: Map[String, String] = Map(
    "q_ml_binarizer" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_pos,
        |  (1000000 * CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
        |    AS BIGINT)) // COUNT(*) AS pos_ppm
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_ml_davies_bouldin" ->
      """WITH ex AS MATERIALIZED (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |    CAST(label AS BIGINT) AS label, d,
        |    CAST(ROUND(e[d + 1] * 1000000) AS BIGINT) AS em
        |  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS e
        |        FROM embeddings)
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS d)),
        |sums AS MATERIALIZED (SELECT label, d,
        |    CAST(SUM(em) AS BIGINT) AS sd
        |  FROM ex GROUP BY label, d),
        |ns AS (SELECT label,
        |    CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
        |  FROM ex GROUP BY label),
        |wn AS (SELECT s.label, s.d, s.sd, ns.n FROM sums s
        |  JOIN ns ON ns.label = s.label),
        |dsq AS (SELECT ex.label, ex.vec_id, wn.n,
        |    SUM(CAST(wn.n * ex.em - wn.sd AS HUGEINT)
        |      * (wn.n * ex.em - wn.sd)) AS dsq
        |  FROM ex JOIN wn ON wn.label = ex.label AND wn.d = ex.d
        |  GROUP BY ex.label, ex.vec_id, wn.n),
        |scat AS (SELECT label, n,
        |    CAST(SUM(CAST(ROUND(sqrt(CAST(dsq AS DOUBLE)) / n)
        |      AS BIGINT)) AS DOUBLE) / (n * 1000000.0) AS s_i
        |  FROM dsq GROUP BY label, n),
        |m AS (SELECT a.label AS li, b.label AS lj,
        |    sqrt(CAST(SUM(CAST(a.sd * bn.n - b.sd * an.n AS HUGEINT)
        |      * (a.sd * bn.n - b.sd * an.n)) AS DOUBLE))
        |      / (CAST(an.n AS DOUBLE) * bn.n * 1000000.0) AS m_ij
        |  FROM sums a JOIN sums b ON a.d = b.d AND a.label <> b.label
        |  JOIN ns an ON an.label = a.label
        |  JOIN ns bn ON bn.label = b.label
        |  GROUP BY a.label, b.label, an.n, bn.n),
        |r AS (SELECT m.li, MAX((si.s_i + sj.s_i) / m.m_ij) AS r
        |  FROM m JOIN scat si ON si.label = m.li
        |  JOIN scat sj ON sj.label = m.lj
        |  GROUP BY m.li)
        |SELECT r.li AS label, scat.n, ROUND(scat.s_i, 6) AS scatter,
        |  ROUND(r.r, 6) AS r_max
        |FROM r JOIN scat ON scat.label = r.li
        |ORDER BY label""".stripMargin,
    "q_ml_nmi_ari" ->
      """WITH cells AS MATERIALIZED (SELECT
        |    CAST(label AS BIGINT) AS label,
        |    (CASE WHEN e[1] > 0 THEN 2 ELSE 0 END)
        |      + (CASE WHEN e[2] > 0 THEN 1 ELSE 0 END) AS pred,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings)
        |  GROUP BY 1, 2),
        |p AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    CAST(SUM(c * (c - 1)) AS BIGINT) AS sij2,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(c * ln(c) ORDER BY label, pred)),
        |      (a, x) -> a + x) AS slc
        |  FROM cells),
        |ra AS (SELECT CAST(SUM(a * (a - 1)) AS BIGINT) AS sa2,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(a * ln(a) ORDER BY label)), (x, y) -> x + y) AS sla
        |  FROM (SELECT label, CAST(SUM(c) AS BIGINT) AS a
        |        FROM cells GROUP BY label)),
        |cb AS (SELECT CAST(SUM(b * (b - 1)) AS BIGINT) AS sb2,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(b * ln(b) ORDER BY pred)), (x, y) -> x + y) AS slb
        |  FROM (SELECT pred, CAST(SUM(c) AS BIGINT) AS b
        |        FROM cells GROUP BY pred))
        |SELECT n, n_cells,
        |  ROUND((CAST(sij2 AS DOUBLE) / 2
        |    - (CAST(sa2 AS DOUBLE) / 2) * (CAST(sb2 AS DOUBLE) / 2)
        |      / (CAST(n AS DOUBLE) * (n - 1) / 2)) /
        |    ((CAST(sa2 AS DOUBLE) / 2 + CAST(sb2 AS DOUBLE) / 2) / 2
        |    - (CAST(sa2 AS DOUBLE) / 2) * (CAST(sb2 AS DOUBLE) / 2)
        |      / (CAST(n AS DOUBLE) * (n - 1) / 2)), 6) AS ari,
        |  ROUND(((slc - sla - slb) / n + ln(n)) /
        |    sqrt((ln(n) - sla / n) * (ln(n) - slb / n)), 6) AS nmi
        |FROM p, ra, cb""".stripMargin)
}
