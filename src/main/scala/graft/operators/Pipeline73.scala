package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.68 round-15 batch 41 — pretraining-pipeline and diagnostics
  * closers: concat-and-chunk SEQUENCE PACKING (the GPT-style
  * fixed-window example builder), a sign-matrix RANDOM PROJECTION
  * (the Johnson-Lindenstrauss dimensionality reduction ANN
  * pipelines run before indexing, with a deterministic LCG sign
  * matrix so it is exactly oracle-able), and the LJUNG-BOX
  * portmanteau test ("is the series white noise") from the
  * exact-moment ACF machinery.
  */
object Pipeline73 extends graft.QueryModule {

  /** SEQUENCE PACKING (concat-and-chunk, window 512): documents
    * concatenate in doc_id order into one token stream, which chunks
    * into fixed 512-token training examples; each doc reports to the
    * example where it STARTS. Per example: docs started, doc-id
    * range, tokens contributed, and the spill past the example end
    * (= tokens a loader would carry into the next window) — the
    * example-builder accounting every pretraining pipeline needs.
    * All integers; the global running token count is
    * Dist.bandedCumSum over doc_id bands (no single-partition
    * window).
    *
    * 100 TB: one tokenize-count pass (map-side partial); the scan is
    * banded (per-band window + broadcast band offsets); the example
    * agg shuffles on example_id. */
  def pipelinePack(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(s, dir)
      .groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val cum = graft.api.Dist.bandedCumSum(toks, Seq(), "doc_id",
      bandWidth = 1000L, sumCols = Seq("n_tok"), inclusive = false)
    cum
      .select(col("doc_id"), col("n_tok"),
        expr("cum_n_tok div 512").as("example_id"),
        expr("cum_n_tok % 512").as("offset"))
      .groupBy("example_id")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
        sum("n_tok").as("n_tokens"),
        // spill: how far the LAST doc (max offset) runs past the
        // 512-token boundary; earlier docs cannot spill further
        max(expr("greatest(0L, offset + n_tok - 512)")).as("spill"))
      .orderBy("example_id")
  }

  /** RANDOM PROJECTION (Johnson-Lindenstrauss, 64 → 16 dims) with a
    * DETERMINISTIC ±1 sign matrix from the shared LCG
    * (sign(d,j) = ±1 by the parity of ((d·64+j)·1103515245+12345)
    * mod 1e9+7): y_j = (1/√16)·Σ_d x_d·sign(d,j), every per-row fold
    * running in d order on both engines so the 64-term float sum is
    * bit-identical, then floor(y·1e6) micro-ints (§2.0.8). The
    * dimensionality-reduction step ANN pipelines run before
    * indexing — here exactly gradeable because the matrix is a
    * formula, not an RNG state.
    *
    * 100 TB: a pure per-row projection (16 index-ordered folds over
    * the 64-dim array inside codegen) — no shuffle before the final
    * sort; the "matrix" is arithmetic, nothing broadcasts. */
  def vecRandomProjection(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("label").cast("long").as("label"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
      .select(col("vec_id"), col("label"),
        expr("transform(sequence(0, 15), j -> cast(floor(" +
          "aggregate(sequence(0, 63), 0D, (a, d) -> a + e[d] * " +
          "(case when ((d * 64 + j) * 1103515245L + 12345)" +
          " % 1000000007 % 2 = 0 then 1D else -1D end))" +
          " * 250000) as bigint))").as("q"))
      .select(col("vec_id"), col("label"),
        expr("q[0]").as("y0"), expr("q[1]").as("y1"),
        expr("q[2]").as("y2"), expr("q[3]").as("y3"),
        expr("aggregate(q, 0L, (a, x) -> a + x)").as("ysum"))
      .orderBy("vec_id")
  }

  /** LJUNG-BOX portmanteau test (lags 1..6) on the per-type daily
    * mean value series: Q = n(n+2)·Σ r_k²/(n−k) over the
    * exact-moment autocorrelations (centered values n·v−S are exact
    * integers, moment products in decimal(38,0), the q_time_pacf
    * discipline) — "is anything left in the residuals", the
    * portmanteau readout single-lag ACF values can't give.
    *
    * 100 TB: the daily agg is the only full pass; lags are windows
    * partitioned by type over the calendar-bounded frame; Q folds
    * lag-ordered on the per-type row. */
  def timeLjungBox(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .select(col("event_type").as("t"), to_date(col("ts")).as("d"),
        expr("cast(round(value * 100) as bigint)").as("x"))
      .groupBy("t", "d")
      .agg(count(lit(1)).as("c"), sum("x").as("sv"))
      .select(col("t"), col("d"), expr("(sv * 1000000) div c").as("v"))
    val stats = daily.groupBy("t")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val cent = daily.join(broadcast(stats), "t")
      .select(col("t"), col("d"), col("n"),
        expr("cast(n * v - sv as decimal(38,0))").as("cv"))
    val w = Window.partitionBy("t").orderBy("d")
    val lagged = (1 to 6).foldLeft(cent) { (df, k) =>
      df.withColumn(s"l$k", lag("cv", k).over(w))
    }
    val moments = lagged.groupBy("t")
      .agg(max("n").as("n"),
        (sum(expr("cv * cv")).as("c0") +:
          (1 to 6).map(k => sum(expr(s"cv * l$k")).as(s"c$k"))): _*)
    moments
      .select(col("t"), col("n"),
        expr((1 to 6).map(k =>
          s"(cast(c$k as double) / cast(c0 as double))" +
            s" * (cast(c$k as double) / cast(c0 as double))" +
            s" / (n - $k)").mkString(
          "cast(n as double) * (n + 2) * (", " + ", ")")).as("q"))
      .select(col("t").as("event_type"), col("n").as("n_days"),
        lit(6L).as("df"), round(col("q"), 6).as("q_stat"))
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_pack" -> pipelinePack,
    "q_vec_random_projection" -> vecRandomProjection,
    "q_time_ljung_box" -> timeLjungBox)

  def oracleSql: Map[String, String] = Map(
    "q_pipeline_pack" ->
      """WITH toks AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
        |  FROM (SELECT doc_id, unnest(str_split(lower(text), ' ')) AS t
        |        FROM documents) WHERE t <> '' GROUP BY doc_id),
        |cum AS (SELECT doc_id, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS c
        |  FROM toks)
        |SELECT c // 512 AS example_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS last_doc,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(MAX(greatest(0, c % 512 + n_tok - 512)) AS BIGINT)
        |    AS spill
        |FROM cum GROUP BY 1 ORDER BY example_id""".stripMargin,
    "q_vec_random_projection" ->
      """SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |  CAST(label AS BIGINT) AS label,
        |  q[1] AS y0, q[2] AS y1, q[3] AS y2, q[4] AS y3,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), q),
        |    (a, x) -> a + x) AS BIGINT) AS ysum
        |FROM (SELECT vec_id, label,
        |    list_transform(range(0, 16), j -> CAST(FLOOR(
        |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(range(0, 64), d -> e[d + 1] *
        |          (CASE WHEN ((d * 64 + j) * 1103515245 + 12345)
        |             % 1000000007 % 2 = 0
        |           THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE)
        |           END))), (a, x) -> a + x)
        |      * 250000) AS BIGINT)) AS q
        |  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS e
        |        FROM embeddings))
        |ORDER BY vec_id""".stripMargin,
    "q_time_ljung_box" ->
      ("""WITH daily AS (SELECT event_type AS t, CAST(ts AS DATE) AS d,
        |    CAST((SUM(CAST(ROUND(value * 100) AS BIGINT)) * 1000000)
        |      // COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS sv FROM daily GROUP BY t),
        |cent AS (SELECT daily.t, d, st.n,
        |    CAST(st.n * v - st.sv AS HUGEINT) AS cv
        |  FROM daily JOIN st ON st.t = daily.t),
        |lagged AS (SELECT t, n, cv,
        |""".stripMargin +
        (1 to 6).map(k =>
          s"    lag(cv, $k) OVER (PARTITION BY t ORDER BY d) AS l$k")
          .mkString(",\n") +
        """
        |  FROM cent),
        |m AS (SELECT t, MAX(n) AS n, SUM(cv * cv) AS c0,
        |""".stripMargin +
        (1 to 6).map(k => s"    SUM(cv * l$k) AS c$k").mkString(",\n") +
        """
        |  FROM lagged GROUP BY t)
        |SELECT t AS event_type, n AS n_days, CAST(6 AS BIGINT) AS df,
        |  ROUND(CAST(n AS DOUBLE) * (n + 2) * (
        |""".stripMargin +
        (1 to 6).map(k =>
          s"    (CAST(c$k AS DOUBLE) / CAST(c0 AS DOUBLE))" +
            s" * (CAST(c$k AS DOUBLE) / CAST(c0 AS DOUBLE)) / (n - $k)")
          .mkString(" +\n") +
        """
        |  ), 6) AS q_stat
        |FROM m ORDER BY event_type""".stripMargin))
}
