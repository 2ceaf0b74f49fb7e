package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** §2.67 round-15 batch 40 — long-memory, lexicon and
  * goodness-of-fit closers: the Hurst exponent by rescaled-range
  * analysis (is the event stream trending, mean-reverting or a
  * random walk — the long-memory readout ACF/PACF's fixed lags
  * can't give), lexicon sentiment scoring (the broadcast-wordlist
  * text-scoring shape every content pipeline runs), and the
  * chi-square goodness-of-fit test (observed vs uniform — the
  * one-sample sibling of q_ml_chisq's contingency test).
  */
object Pipeline72 extends graft.QueryModule {

  /** HURST EXPONENT via rescaled-range (R/S) analysis of the hourly
    * event-count series per type: for block sizes m ∈ {8,16,32,64}
    * split the 720-observation series into full blocks, compute each
    * block's R/S with EXACT integer interiors — scaled cumulative
    * deviations m·prefix_t − (t+1)·S are integers, so R·m =
    * max(0,·) − min(0,·) is exact, and R/S = R·m / √(m·Q − S²) is
    * one double per block — then H = the OLS slope of mean ln(R/S)
    * against ln(m) (block-ordered and size-ordered folds, the levene
    * idiom). H ≈ 0.5 random walk, > 0.5 trending, < 0.5
    * mean-reverting. Zero-variance blocks are skipped and counted.
    *
    * 100 TB: the hourly agg is the only full pass; block windows
    * partition by (type, size, block) over the calendar-bounded
    * support frame, and every fold runs on ≤blocks-per-size rows. */
  def timeHurst(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type").as("t"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val idx = hourly
      .withColumn("rn", row_number().over(
        Window.partitionBy("t").orderBy("h")) - 1)
      .withColumn("nt", count(lit(1)).over(Window.partitionBy("t")))
    val blocks = idx
      .withColumn("m", explode(expr("array(8L, 16L, 32L, 64L)")))
      .where(expr("(rn div m + 1) * m <= nt")) // full blocks only
      .select(col("t"), col("m"), expr("rn div m").as("b"),
        expr("rn % m").as("pos"), col("x"))
    val wBlk = Window.partitionBy("t", "m", "b").orderBy("pos")
    val stats = blocks
      .withColumn("prefix",
        sum("x").over(wBlk.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy("t", "m", "b")
      // nd_t needs the FULL block sum S, so the per-position prefix
      // list folds AFTER the agg where sx is known
      .agg(sum("x").as("sx"), sum(expr("x * x")).as("qx"),
        collect_list(struct(col("pos"), col("prefix"))).as("pl"))
      .select(col("t"), col("m"), col("b"), col("sx"), col("qx"),
        expr("aggregate(pl, cast(0 as bigint), (a, e) -> " +
          "greatest(a, m * e.prefix - (e.pos + 1) * sx))").as("ndmax"),
        expr("aggregate(pl, cast(0 as bigint), (a, e) -> " +
          "least(a, m * e.prefix - (e.pos + 1) * sx))").as("ndmin"))
      .where(expr("m * qx - sx * sx > 0"))
      .select(col("t"), col("m"),  col("b"),
        expr("ln(cast(ndmax - ndmin as double)" +
          " / sqrt(cast(m * qx - sx * sx as double)))").as("lnrs"))
    val perSize = stats.groupBy("t", "m")
      .agg(count(lit(1)).as("n_blocks"),
        expr("aggregate(array_sort(collect_list(struct(b, lnrs)))," +
          " 0D, (a, e) -> a + e.lnrs)").as("sls"))
      .select(col("t"), col("m"), col("n_blocks"),
        (col("sls") / col("n_blocks")).as("mlrs"))
    val h = perSize
      .groupBy("t")
      .agg(expr("array_sort(collect_list(struct(m, mlrs)))").as("l"),
        count(lit(1)).as("k"))
      .select(col("t"), col("l"),
        expr("aggregate(l, 0D, (a, e) -> a + ln(cast(e.m as double)))" +
          " / k").as("mx"),
        expr("aggregate(l, 0D, (a, e) -> a + e.mlrs) / k").as("my"))
      .select(col("t"),
        expr("aggregate(l, 0D, (a, e) ->" +
          " a + (ln(cast(e.m as double)) - mx) * (e.mlrs - my))" +
          " / aggregate(l, 0D, (a, e) ->" +
          " a + (ln(cast(e.m as double)) - mx)" +
          " * (ln(cast(e.m as double)) - mx))").as("hurst"))
    perSize.join(h, "t")
      .select(col("t").as("event_type"), col("m").as("block_size"),
        col("n_blocks"), round(col("mlrs"), 6).as("mean_log_rs"),
        round(col("hurst"), 6).as("hurst"))
      .orderBy("event_type", "block_size")
  }

  /** LEXICON SENTIMENT — the broadcast-wordlist scoring shape: a
    * fixed positive/negative lexicon (terms that exist in the corpus
    * domain — fast/small/new vs slow/error/dup) joined against the
    * token stream, per doc the hit counts and the net score in ppm
    * of (pos+neg+1) (integer-exact smoothing, no division by zero).
    * The q_pipeline_corpus blocklist gate generalized to a weighted
    * score.
    *
    * 100 TB: tokens join a 6-row broadcast lexicon; one doc-keyed
    * hash agg with map-side partials, then a left join back to
    * documents so zero-hit docs still report. */
  def textSentiment(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val lex = Seq(("fast", 1L), ("small", 1L), ("new", 1L),
      ("slow", -1L), ("error", -1L), ("dup", -1L))
      .toDF("token", "polarity")
    val hits = TextOps.tokens(s, dir)
      .join(broadcast(lex), "token")
      .groupBy("doc_id")
      .agg(sum(when(col("polarity") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("polarity") < 0, 1L).otherwise(0L)).as("n_neg"))
    Tables.documents(s, dir).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"))
      .withColumn("score_ppm",
        expr("(1000000 * (n_pos - n_neg))" +
          " div (n_pos + n_neg + 1)"))
      .orderBy("doc_id")
  }

  /** CHI-SQUARE GOODNESS-OF-FIT — observed order-priority counts vs
    * the uniform expectation, per order status: χ² = Σ(O − n/k)²/(n/k)
    * = Σ(k·O − n)² / (k·n) with the numerator EXACT in decimal(38,0)
    * (k·O − n is an integer), one double division at the end — the
    * one-sample sibling of q_ml_chisq's two-way contingency test,
    * answering "is the priority mix flat within each status".
    *
    * 100 TB: one map-side-partial (status, priority) hash agg; the
    * χ² folds on the ≤15-cell frame in priority order. */
  def aggChi2Gof(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("st"),
        col("o_orderpriority").as("pr"))
      .agg(count(lit(1)).as("o"))
    val tot = cells.groupBy("st")
      .agg(sum("o").as("n"), count(lit(1)).as("k"))
    cells.join(broadcast(tot), "st")
      .groupBy("st")
      .agg(max("n").as("n"), max("k").as("k"),
        expr("array_sort(collect_list(struct(pr," +
          " cast(k as decimal(38,0)) * o - n as d)))").as("l"))
      .select(col("st").as("o_orderstatus"), col("n"), col("k"),
        (col("k") - 1).as("df"),
        round(expr("aggregate(l, 0D, (a, e) ->" +
          " a + cast(e.d as double) * cast(e.d as double))" +
          " / (cast(k as double) * n)"), 6).as("chi2"))
      .orderBy("o_orderstatus")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_hurst" -> timeHurst,
    "q_text_sentiment" -> textSentiment,
    "q_agg_chi2_gof" -> aggChi2Gof)

  def oracleSql: Map[String, String] = Map(
    "q_time_hurst" ->
      """WITH hourly AS (SELECT event_type AS t,
        |    date_trunc('hour', ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT t, x,
        |    CAST(row_number() OVER (PARTITION BY t ORDER BY h) - 1
        |      AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY t) AS BIGINT) AS nt
        |  FROM hourly),
        |blocks AS (SELECT t, m, rn // m AS b, rn % m AS pos, x
        |  FROM (SELECT t, x, rn, nt,
        |          unnest([8, 16, 32, 64]) AS m FROM idx)
        |  WHERE (rn // m + 1) * m <= nt),
        |pre AS (SELECT t, m, b, pos, x,
        |    CAST(SUM(x) OVER (PARTITION BY t, m, b ORDER BY pos)
        |      AS BIGINT) AS prefix
        |  FROM blocks),
        |bs AS (SELECT t, m, b, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS qx
        |  FROM pre GROUP BY t, m, b),
        |nd AS (SELECT p.t, p.m, p.b, MAX(s.sx) AS sx, MAX(s.qx) AS qx,
        |    greatest(CAST(0 AS BIGINT),
        |      MAX(p.m * p.prefix - (p.pos + 1) * s.sx)) AS ndmax,
        |    least(CAST(0 AS BIGINT),
        |      MIN(p.m * p.prefix - (p.pos + 1) * s.sx)) AS ndmin
        |  FROM pre p JOIN bs s
        |    ON s.t = p.t AND s.m = p.m AND s.b = p.b
        |  GROUP BY p.t, p.m, p.b),
        |rs AS (SELECT t, m, b,
        |    ln(CAST(ndmax - ndmin AS DOUBLE)
        |      / sqrt(CAST(m * qx - sx * sx AS DOUBLE))) AS lnrs
        |  FROM nd WHERE m * qx - sx * sx > 0),
        |persize AS (SELECT t, m, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(lnrs ORDER BY b)), (a, e) -> a + e) / COUNT(*)
        |      AS mlrs
        |  FROM rs GROUP BY t, m),
        |hm AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS k,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(ln(CAST(m AS DOUBLE)) ORDER BY m)),
        |      (a, e) -> a + e) / COUNT(*) AS mx,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(mlrs ORDER BY m)), (a, e) -> a + e) / COUNT(*) AS my
        |  FROM persize GROUP BY t),
        |hh AS (SELECT p.t,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list((ln(CAST(p.m AS DOUBLE)) - hm.mx)
        |        * (p.mlrs - hm.my) ORDER BY p.m)), (a, e) -> a + e)
        |    / list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list((ln(CAST(p.m AS DOUBLE)) - hm.mx)
        |        * (ln(CAST(p.m AS DOUBLE)) - hm.mx) ORDER BY p.m)),
        |      (a, e) -> a + e) AS hurst
        |  FROM persize p JOIN hm ON hm.t = p.t
        |  GROUP BY p.t, hm.mx, hm.my)
        |SELECT p.t AS event_type, p.m AS block_size, p.n_blocks,
        |  ROUND(p.mlrs, 6) AS mean_log_rs,
        |  ROUND(hh.hurst, 6) AS hurst
        |FROM persize p JOIN hh ON hh.t = p.t
        |ORDER BY event_type, block_size""".stripMargin,
    "q_text_sentiment" ->
      """WITH lex(token, polarity) AS (VALUES
        |  ('fast', 1), ('small', 1), ('new', 1),
        |  ('slow', -1), ('error', -1), ('dup', -1)),
        |tok AS (SELECT doc_id, t AS token FROM
        |  (SELECT doc_id, unnest(str_split(lower(text), ' ')) AS t
        |   FROM documents) WHERE t <> ''),
        |hits AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN polarity > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pos,
        |    CAST(SUM(CASE WHEN polarity < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_neg
        |  FROM tok JOIN lex USING (token) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(h.n_pos, 0) AS BIGINT) AS n_pos,
        |  CAST(COALESCE(h.n_neg, 0) AS BIGINT) AS n_neg,
        |  CAST((1000000 * (COALESCE(h.n_pos, 0) - COALESCE(h.n_neg, 0)))
        |    // (COALESCE(h.n_pos, 0) + COALESCE(h.n_neg, 0) + 1)
        |    AS BIGINT) AS score_ppm
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_agg_chi2_gof" ->
      """WITH cells AS (SELECT o_orderstatus AS st,
        |    o_orderpriority AS pr, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT st, CAST(SUM(o) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS k FROM cells GROUP BY st)
        |SELECT cells.st AS o_orderstatus, MAX(tot.n) AS n,
        |  MAX(tot.k) AS k, CAST(MAX(tot.k) - 1 AS BIGINT) AS df,
        |  ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(CAST(CAST(tot.k AS HUGEINT) * cells.o - tot.n
        |        AS DOUBLE)
        |      * CAST(CAST(tot.k AS HUGEINT) * cells.o - tot.n
        |        AS DOUBLE) ORDER BY cells.pr)), (a, e) -> a + e)
        |    / (CAST(MAX(tot.k) AS DOUBLE) * MAX(tot.n)), 6) AS chi2
        |FROM cells JOIN tot ON tot.st = cells.st
        |GROUP BY cells.st ORDER BY o_orderstatus""".stripMargin)
}
