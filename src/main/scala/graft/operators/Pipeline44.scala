package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.57 round-14 batch 12 — corpus stylometry: Jensen-Shannon
  * source-vs-corpus divergence (the distribution-level drift readout
  * beside q_profile_drift's numeric PSI), Burrows' Delta stylometric
  * distance between sources (the authorship/contamination signal a
  * provenance audit runs), and the Heaps'-law vocabulary-growth fit
  * (the sibling of q_text_zipf's rank-frequency line). All three
  * quantize their one transcendental per support cell to exact
  * integer units so every sum is order-free.
  */
object Pipeline44 extends graft.QueryModule {

  /** JENSEN-SHANNON DIVERGENCE of each source's unigram distribution
    * vs the corpus — JSD(P‖Q) = Σ_t ½p·ln(p/m) + ½q·ln(q/m),
    * m=(p+q)/2, with the absent-token tail folded analytically
    * (tokens the source lacks contribute ½q·ln2 — their mass is
    * 1 − Σ_present q, no source×vocab grid needed). Per-cell terms
    * quantize to EXACT nano units, so the per-source sum is an
    * order-free integer. The "which shard drifted" readout for text.
    *
    * 100 TB: one tokenize+count pass; terms on the (source, token)
    * support frame; corpus counts broadcast by the token equi-join. */
  def textJsDivergence(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.api.Text.tokens(Tables.documents(s, dir),
        "doc_id", "text")
      .join(Tables.documents(s, dir).select("doc_id", "source"),
        "doc_id")
    val cells = toks.groupBy("source", "token")
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val srcN = cells.groupBy("source").agg(sum("c").as("n_s"),
      count(lit(1)).as("n_types"))
    val corp = cells.groupBy("token").agg(sum("c").as("ct"))
    val nn = cells.agg(sum("c")).head.getLong(0)
    cells.join(corp, "token")
      .join(srcN, "source")
      .select(col("source"), col("n_s"), col("n_types"), col("ct"),
        expr("c / cast(n_s as double)").as("p"),
        expr(s"ct / cast(${nn}L as double)").as("q"))
      .select(col("source"), col("n_s"), col("n_types"), col("ct"),
        expr("cast(round((0.5 * p * ln(p / ((p + q) / 2))" +
          " + 0.5 * q * ln(q / ((p + q) / 2))) * 1000000000)" +
          " as bigint)").as("t_nano"),
        col("ct"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"), max("n_types").as("n_types"),
        sum("t_nano").as("present_nano"),
        // absent-tail mass as an exact INTEGER count sum (a double
        // Σq would be summation-order sensitive at the nano render)
        sum("ct").as("sct"))
      .selectExpr("source", "n_tokens", "n_types",
        "present_nano + cast(round(0.5 * ln(2)" +
          s" * (1 - sct / cast(${nn}L as double))" +
          " * 1000000000) as bigint) as jsd_nano")
      .selectExpr("source", "n_tokens", "n_types", "jsd_nano",
        "round(jsd_nano / 1000000000.0D / ln(2), 6) as jsd_norm")
      .orderBy("source")
  }

  /** BURROWS' DELTA stylometric distance between sources — over the
    * top-20 corpus words: per-source relative frequencies in exact
    * ppm, per-word z-scores in EXACT micro units off the all-integer
    * population-variance radical (z = (S·f − Σf)/√(S·Σf² − (Σf)²) —
    * missing (source, word) cells enter as f = 0 via the bounded
    * S×20 grid), Delta = mean |z₁ − z₂| per source pair. The
    * authorship / template-contamination distance; zero-variance
    * words drop (standard practice — and a 0/0 guard).
    *
    * 100 TB: one tokenize+count pass; the grid is |sources|×20
    * (bounded broadcast BNLJ, count-pinned in PlanAudit.boundedBnlj)
    * and the pair join runs on it. */
  def textBurrowsDelta(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.api.Text.tokens(Tables.documents(s, dir),
        "doc_id", "text")
      .join(Tables.documents(s, dir).select("doc_id", "source"),
        "doc_id")
    val cells = toks.groupBy("source", "token")
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val srcN = cells.groupBy("source").agg(sum("c").as("n_s"))
    val nSources = srcN.count()
    val topk = cells.groupBy("token").agg(sum("c").as("ct"))
      .orderBy(col("ct").desc, col("token")).limit(20)
      .select("token")
    val grid = srcN.crossJoin(broadcast(topk))
      .join(cells, Seq("source", "token"), "left")
      .select(col("source"), col("token"),
        expr("1000000 * coalesce(c, 0L) div n_s").as("f"))
      .localCheckpoint(true)
    val zz = grid
      .groupBy("token")
      .agg(sum("f").as("sf"), sum(expr("f * f")).as("sf2"))
      .where(expr(s"${nSources}L * sf2 - sf * sf > 0"))
      .join(grid, "token")
      .select(col("source"), col("token"),
        expr(s"cast(round(1000000.0D * (${nSources}L * f - sf)" +
          s" / sqrt(cast(${nSources}L * sf2 - sf * sf as double)))" +
          " as bigint)").as("z"))
    zz.as("a").join(zz.as("b"), Seq("token"))
      .where(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_words"), sum(expr("abs(a.z - b.z)"))
        .as("absz_micro"))
      .selectExpr("src_a", "src_b", "n_words",
        "round(cast(absz_micro as double) / n_words / 1000000, 6)" +
          " as delta")
      .orderBy("src_a", "src_b")
  }

  /** HEAPS'-LAW FIT V = K·nᵝ across sources — log-log OLS over the
    * per-source (tokens, types) points with both logarithms
    * quantized to EXACT micro units (one ln per source; integer
    * moment sums after — the q_text_zipf discipline applied to
    * vocabulary growth). β well under 1 = healthy sublinear
    * vocabulary; β ≈ 1 = unmerged noise / id-like tokens.
    *
    * 100 TB: per-source type counts are one (source, token) agg;
    * the fit runs on the |sources|-row support frame. */
  def textHeapsLaw(s: SparkSession, dir: String): DataFrame =
    graft.api.Text.tokens(Tables.documents(s, dir), "doc_id", "text")
      .join(Tables.documents(s, dir).select("doc_id", "source"),
        "doc_id")
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"))
      .select(
        expr("cast(round(ln(cast(n_tokens as double)) * 1000000)" +
          " as bigint)").as("lx"),
        expr("cast(round(ln(cast(n_types as double)) * 1000000)" +
          " as bigint)").as("ly"))
      .agg(count(lit(1)).as("s"), sum("lx").as("sx"), sum("ly").as("sy"),
        sum(expr("cast(lx as decimal(38,0)) * lx")).as("sxx"),
        sum(expr("cast(lx as decimal(38,0)) * ly")).as("sxy"))
      .selectExpr("s", "sx", "sy",
        "cast(cast(s as decimal(38,0)) * sxy" +
          " - cast(sx as decimal(38,0)) * sy as double)" +
          " / cast(cast(s as decimal(38,0)) * sxx" +
          " - cast(sx as decimal(38,0)) * sx as double) as beta")
      .selectExpr("s as n_sources", "round(beta, 6) as beta",
        "round(exp((cast(sy as double) - beta * sx) / s / 1000000), 6)" +
          " as k_est")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_js_divergence" -> textJsDivergence,
    "q_text_burrows_delta" -> textBurrowsDelta,
    "q_text_heaps_law" -> textHeapsLaw)

  private val srcTokensSql =
    """SELECT d.source, t.token FROM (SELECT doc_id,
      |    tokens[s] AS token
      |  FROM (SELECT doc_id, tokens,
      |        unnest(range(1, len(tokens)+1)) AS s
      |      FROM (SELECT doc_id, str_split(lower(text), ' ') AS tokens
      |            FROM documents))
      |  WHERE tokens[s] <> '') t
      |JOIN documents d USING (doc_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_text_js_divergence" ->
      s"""WITH cells AS (SELECT source, token,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM ($srcTokensSql) GROUP BY source, token),
        |srcn AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s,
        |    CAST(COUNT(*) AS BIGINT) AS n_types
        |  FROM cells GROUP BY source),
        |corp AS (SELECT token, CAST(SUM(c) AS BIGINT) AS ct
        |  FROM cells GROUP BY token),
        |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM cells),
        |pq AS (SELECT cells.source, srcn.n_s, srcn.n_types, ct,
        |    c / CAST(n_s AS DOUBLE) AS p,
        |    ct / CAST(nn AS DOUBLE) AS q
        |  FROM cells JOIN corp USING (token)
        |  JOIN srcn USING (source) CROSS JOIN nn),
        |t AS (SELECT source, n_s, n_types,
        |    CAST(ROUND((0.5 * p * ln(p / ((p + q) / 2))
        |      + 0.5 * q * ln(q / ((p + q) / 2))) * 1000000000)
        |      AS BIGINT) AS t_nano, ct
        |  FROM pq),
        |g AS (SELECT source, MAX(n_s) AS n_tokens,
        |    MAX(n_types) AS n_types,
        |    CAST(SUM(t_nano) AS BIGINT) AS present_nano,
        |    CAST(SUM(ct) AS BIGINT) AS sct
        |  FROM t GROUP BY source),
        |j AS (SELECT g.source, n_tokens, n_types,
        |    present_nano + CAST(ROUND(0.5 * ln(2)
        |      * (1 - sct / CAST(nn AS DOUBLE))
        |      * 1000000000) AS BIGINT) AS jsd_nano
        |  FROM g CROSS JOIN nn)
        |SELECT source, n_tokens, n_types, jsd_nano,
        |  ROUND(jsd_nano / 1000000000.0 / ln(2), 6) AS jsd_norm
        |FROM j ORDER BY source""".stripMargin,
    "q_text_burrows_delta" ->
      s"""WITH cells AS (SELECT source, token,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM ($srcTokensSql) GROUP BY source, token),
        |srcn AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
        |  FROM cells GROUP BY source),
        |sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM srcn),
        |topk AS (SELECT token FROM (SELECT token,
        |      CAST(SUM(c) AS BIGINT) AS ct,
        |      row_number() OVER (ORDER BY SUM(c) DESC, token) AS rk
        |    FROM cells GROUP BY token) WHERE rk <= 20),
        |grid AS (SELECT srcn.source, topk.token,
        |    CAST((1000000 * coalesce(c, 0)) // n_s AS BIGINT) AS f
        |  FROM srcn CROSS JOIN topk
        |  LEFT JOIN cells ON cells.source = srcn.source
        |    AND cells.token = topk.token),
        |mom AS (SELECT token, CAST(SUM(f) AS BIGINT) AS sf,
        |    CAST(SUM(f * f) AS BIGINT) AS sf2
        |  FROM grid GROUP BY token),
        |zz AS (SELECT grid.source, grid.token,
        |    CAST(ROUND(1000000.0 * (s * f - sf)
        |      / sqrt(CAST(s * sf2 - sf * sf AS DOUBLE))) AS BIGINT) AS z
        |  FROM grid JOIN mom USING (token) CROSS JOIN sc
        |  WHERE s * sf2 - sf * sf > 0)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_words,
        |  ROUND(CAST(SUM(abs(a.z - b.z)) AS DOUBLE) / COUNT(*)
        |    / 1000000, 6) AS delta
        |FROM zz a JOIN zz b ON a.token = b.token
        |  AND a.source < b.source
        |GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,
    "q_text_heaps_law" ->
      s"""WITH cells AS (SELECT source, token,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM ($srcTokensSql) GROUP BY source, token),
        |st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types
        |  FROM cells GROUP BY source),
        |lg AS (SELECT
        |    CAST(ROUND(ln(CAST(n_tokens AS DOUBLE)) * 1000000)
        |      AS BIGINT) AS lx,
        |    CAST(ROUND(ln(CAST(n_types AS DOUBLE)) * 1000000)
        |      AS BIGINT) AS ly
        |  FROM st),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS s,
        |    CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
        |    SUM(CAST(lx AS HUGEINT) * lx) AS sxx,
        |    SUM(CAST(lx AS HUGEINT) * ly) AS sxy
        |  FROM lg),
        |b AS (SELECT s, sx, sy,
        |    CAST(CAST(s AS HUGEINT) * sxy
        |        - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / CAST(CAST(s AS HUGEINT) * sxx
        |        - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS beta
        |  FROM m)
        |SELECT s AS n_sources, ROUND(beta, 6) AS beta,
        |  ROUND(exp((CAST(sy AS DOUBLE) - beta * sx) / s / 1000000), 6)
        |    AS k_est
        |FROM b""".stripMargin)
}
