package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.47 round-14 batch 2 — family-completion rungs: NTILE +
  * exact percent-rank (the §2.5 window rungs still missing), the
  * QuantileDiscretizer library twin of the hand-rolled decile
  * bucketizer, and the RegexTokenizer + StopWordsRemover library twin
  * of the hand-rolled stopword pass (oracle-exact against MLlib's own
  * shipped english list). */
object Pipeline34 extends graft.QueryModule {

  /** NTILE + EXACT PERCENT-RANK over customer balances — the two §2.5
    * window rungs the board lacked, graded WITHOUT the global-window
    * funnel the naive `ntile(10) OVER (ORDER BY …)` plans as: the
    * global rank comes from the banded-rank machinery (per-band local
    * windows over the $200-wide balance-domain bands + a broadcast
    * band-offset frame — the q_vec_bucketize scale shape), the decile
    * from the SQL-standard ntile closed form (first n mod k buckets
    * take ⌈n/k⌉, the rest ⌊n/k⌋), and percent_rank in exact ppm
    * integers — ((rn−1)·10⁶) div (n−1) — instead of the built-in's
    * float division (the §2.0 float-ratio hazard). The oracle runs
    * DuckDB's NATIVE ntile/row_number window, so the closed form is
    * pinned against the real window function's semantics. */
  def winNtile(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("cents"))
    val ranked = graft.api.Dist.bandedRank(c, Seq(), "cents",
      "c_custkey", bandWidth = 20000L)
    val n = c.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .select(col("c_custkey"), col("cents"),
        expr("case when rank <= n % 10 * (n div 10 + 1)" +
          " then (rank - 1) div (n div 10 + 1) + 1" +
          " else n % 10 + (rank - 1 - n % 10 * (n div 10 + 1))" +
          " div (n div 10) + 1 end").cast("long").as("decile"),
        expr("((rank - 1) * 1000000) div (n - 1)").as("pctrank_ppm"))
      .orderBy("c_custkey")
  }

  /** QUANTILE DISCRETIZER library twin (spark.ml QuantileDiscretizer
    * — the approx-quantile binning every feature pipeline calls) of
    * the hand-rolled exact-decile q_vec_bucketize: 10 buckets over
    * customer balance cents at relativeError 0.001, reported as the
    * per-bucket (count, min, max) profile. NO oracle (the splits come
    * from Spark's Greenwald-Khanna approx_percentile — engine-
    * specific); Pipeline34Spec pins rerun determinism, disjoint
    * monotone bucket ranges, total-count conservation, and per-bucket
    * mass within the relative-error band of n/10.
    *
    * 100 TB: the fit is one approx_percentile pass (mergeable sketch
    * state); the transform is a codegen'd Bucketizer projection; the
    * profile agg shuffles 10 groups. */
  def mlQuantileDiscretizer(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.QuantileDiscretizer
    val base = Tables.customer(s, dir)
      .select(col("c_custkey"),
        expr("cast(round(c_acctbal * 100) as bigint)")
          .cast("double").as("cents"))
    val m = new QuantileDiscretizer().setInputCol("cents")
      .setOutputCol("bucket").setNumBuckets(10).setRelativeError(0.001)
      .fit(base)
    m.transform(base)
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("cents").cast("long").as("min_cents"),
        max("cents").cast("long").as("max_cents"))
      .orderBy("bucket")
  }

  /** REGEX-TOKENIZER + STOPWORDS-REMOVER library twin (spark.ml) of
    * the hand-rolled q_text_tokenize / q_text_stopwords pair — the
    * two-transformer text prep every spark.ml text pipeline starts
    * with, run through the REAL transformers and graded oracle-exact:
    * whitespace RegexTokenizer (lowercased, minTokenLength 1) then
    * the remover with MLlib's SHIPPED english stop list (the list is
    * interpolated verbatim into the DuckDB twin via
    * StopWordsRemover.loadDefaultStopWords — no hand-copied
    * constants). Per doc: token counts and the first-5 kept tokens
    * comma-joined (§2.0.8 list rendering).
    *
    * 100 TB: both transformers are narrow codegen'd projections; the
    * stop list is a 181-word broadcast constant. */
  def textStopwordsLib(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.{RegexTokenizer, StopWordsRemover}
    val tok = new RegexTokenizer().setInputCol("text")
      .setOutputCol("toks").setPattern("\\s+").setToLowercase(true)
      .setMinTokenLength(1)
    val rem = new StopWordsRemover().setInputCol("toks")
      .setOutputCol("kept")
    rem.transform(tok.transform(Tables.documents(s, dir)))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("toks")) - size(col("kept"))).cast("long")
          .as("n_removed"),
        concat_ws(",", slice(col("kept"), 1, 5)).as("kept_head"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_ntile" -> winNtile,
    "q_ml_quantile_discretizer" -> mlQuantileDiscretizer,
    "q_text_stopwords_lib" -> textStopwordsLib)

  /** MLlib's shipped english stop list, rendered as a DuckDB list
    * literal for the oracle twin (single-quoted, '' escaping). */
  private def stopListSql: String =
    org.apache.spark.ml.feature.StopWordsRemover
      .loadDefaultStopWords("english")
      .map(wd => "'" + wd.replace("'", "''") + "'")
      .mkString("[", ", ", "]")

  def oracleSql: Map[String, String] = Map(
    "q_win_ntile" ->
      """WITH c AS (SELECT c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |r AS (SELECT c_custkey, cents,
        |    CAST(ntile(10) OVER w AS BIGINT) AS decile,
        |    ROW_NUMBER() OVER w AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM c WINDOW w AS (ORDER BY cents, c_custkey))
        |SELECT c_custkey, cents, decile,
        |  ((rn - 1) * 1000000) // (n - 1) AS pctrank_ppm
        |FROM r ORDER BY c_custkey""".stripMargin,
    "q_text_stopwords_lib" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(str_split_regex(lower(text), '\\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, toks,
        |    list_filter(toks,
        |      x -> NOT list_contains($stopListSql, x)) AS kept
        |  FROM t)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
        |  array_to_string(kept[1:5], ',') AS kept_head
        |FROM k ORDER BY doc_id""".stripMargin)
}
