package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.81 round-16 batch 54 — IR-scoring and ordinal-association
  * closers: BM25 ranking (the retrieval scorer TF-IDF approximates),
  * the Good–Turing frequency spectrum (the smoothing table under
  * every count-based language model), Goodman–Kruskal gamma over a
  * dense contingency prefix grid (NO pair join), and Theil's
  * uncertainty coefficient (the directional cousin of mutual info).
  */
object Pipeline86 extends graft.QueryModule {

  private val bmTerms = Seq("scan", "vector", "stream", "hash", "slow")
  private val (k1, b) = (1.2, 0.75)

  /** BM25 — per query term, the top-10 documents by the Okapi BM25
    * score: idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
    * idf = ln(1+(N−df+0.5)/(df+0.5)), k1=1.2, b=0.75. Every input to
    * the score is an exact integer (tf, df, dl, N; avgdl an exact
    * integer ratio), so the score is a fixed double dag; ranking is
    * on the ROUNDED score with doc_id tie-break (§2.0 rule).
    *
    * 100 TB: doc length and the 5 term frequencies fold in ONE
    * doc-keyed map-side-partial agg over the token stream (r16 —
    * was two tokenize passes); the window ranks ≤N rows per term,
    * never a global sort. */
  def textBm25(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r16: ONE tokenize+agg pass — the per-doc length and the 5 term
    // frequencies fold in the same doc-keyed hash agg (tf_t = count of
    // matching tokens, identical integers to the old join-then-count),
    // so the corpus is tokenized once instead of twice and the
    // tf→dl doc-level join disappears (stack un-pivots the 5 counts).
    val perDoc = TextOps.tokens(s, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dl"),
        bmTerms.map(t => sum(when(col("token") === t, 1L).otherwise(0L))
          .as(s"tf_$t")): _*)
      .localCheckpoint(true)
    val corpus = perDoc.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot"))
    val tf = perDoc.selectExpr("doc_id", "dl",
        s"stack(${bmTerms.size}, " +
          bmTerms.map(t => s"'$t', tf_$t").mkString(", ") +
          ") as (term, tf)")
      .where(col("tf") > 0)
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(corpus))
      .select(col("term"), col("doc_id"), col("tf"),
        round(expr(
          s"ln(1D + (n_docs - df + 0.5D) / (df + 0.5D)) * " +
            s"(tf * (1D + $k1)) / " +
            s"(tf + $k1 * (1D - $b + $b * dl / " +
            "(cast(tot as double) / n_docs)))"), 6).as("score"))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10)
      .select(col("term"), col("doc_id"), col("tf"), col("score"),
        col("rank").cast("long").as("rank"))
      .orderBy("term", "rank")
  }

  /** GOOD–TURING SPECTRUM — the count-of-counts table over corpus
    * token frequencies: for each observed frequency r, the number of
    * distinct types n_r, the smoothed estimate r* = (r+1)·n_{r+1}/n_r
    * (0 where the next rung is empty), and the ppm probability mass
    * at that rung. The table every GT/Katz-smoothed LM is built from.
    *
    * 100 TB: token counts are one hash agg; the spectrum is an agg
    * over the vocabulary; the n_{r+1} lookup is a self equi-join on
    * the ≤‖spectrum‖ frame. */
  def textGoodTuring(s: SparkSession, dir: String): DataFrame = {
    val counts = TextOps.tokens(s, dir)
      .groupBy("token").agg(count(lit(1)).as("r"))
    val spec = counts.groupBy("r").agg(count(lit(1)).as("n_r"))
      .localCheckpoint(true)
    val tot = spec.agg(sum(expr("r * n_r")).as("tot"))
    val nxt = spec.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
    spec.join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        round(expr("(r + 1) * cast(coalesce(n_next, 0L) as double) / n_r"),
          6).as("gt_rstar"),
        expr("(1000000 * r * n_r) div tot").as("mass_ppm"))
      .orderBy("r")
  }

  /** GOODMAN–KRUSKAL GAMMA — ordinal association between quantity
    * and discount cents over lineitem, computed on a DENSE
    * contingency prefix grid: concordant mass A_xy (strictly
    * smaller in both) and discordant mass B_xy (smaller x, larger y)
    * come from two stacked bounded windows over the ≤‖x‖·‖y‖ grid —
    * never a cell-pair join (the 550² BNLJ the bounded domain would
    * otherwise invite). γ = (C−D)/(C+D); C, D exact integers.
    *
    * 100 TB: one hash agg to the grid, then windows whose partitions
    * are single grid rows/columns — all post-agg frames are
    * domain-bounded. */
  def mlGkGamma(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.lineitem(s, dir)
      .select(expr("cast(l_quantity as bigint)").as("x"),
        expr("cast(round(l_discount * 100) as bigint)").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    val xs = cells.select("x").distinct()
    val ys = cells.select("y").distinct()
    val dense = xs.crossJoin(ys)
      .join(cells, Seq("x", "y"), "left")
      .select(col("x"), col("y"), coalesce(col("c"), lit(0L)).as("c"))
    val wyAsc = Window.partitionBy("x").orderBy(col("y").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wyDesc = Window.partitionBy("x").orderBy(col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val rowCums = dense
      .withColumn("cum_lt", coalesce(sum("c").over(wyAsc), lit(0L)))
      .withColumn("cum_gt", coalesce(sum("c").over(wyDesc), lit(0L)))
    val wx = Window.partitionBy("y").orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = rowCums
      .withColumn("a", coalesce(sum("cum_lt").over(wx), lit(0L)))
      .withColumn("b", coalesce(sum("cum_gt").over(wx), lit(0L)))
    grid.agg(sum(expr("c * a")).as("c_pairs"),
        sum(expr("c * b")).as("d_pairs"))
      .select(col("c_pairs"), col("d_pairs"),
        round(expr("(c_pairs - d_pairs) / cast(c_pairs + d_pairs as double)"),
          6).as("gamma"))
  }

  /** THEIL'S U — the uncertainty coefficient over the order
    * status×priority contingency, BOTH directions (U is asymmetric —
    * that is its point vs mutual info): U(Y|X) = I(X;Y)/H(Y) from
    * exact integer counts with every log-sum folded in key order
    * (the q_agg_entropy discipline).
    *
    * 100 TB: one hash agg to the ≤15-cell contingency; one-row
    * arithmetic. */
  def mlTheilsU(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("xv"),
        col("o_orderpriority").as("yv"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val parts = cells.agg(sum("c").as("n"),
      expr("aggregate(array_sort(collect_list(struct(xv, yv, c)))," +
        " cast(0 as double), (acc, t) -> acc + t.c * ln(t.c))").as("slc"))
    val hx = cells.groupBy("xv").agg(sum("c").as("a"))
      .agg(expr("aggregate(array_sort(collect_list(struct(xv, a)))," +
        " cast(0 as double), (acc, t) -> acc + t.a * ln(t.a))").as("sla"))
    val hy = cells.groupBy("yv").agg(sum("c").as("b"))
      .agg(expr("aggregate(array_sort(collect_list(struct(yv, b)))," +
        " cast(0 as double), (acc, t) -> acc + t.b * ln(t.b))").as("slb"))
    parts.crossJoin(hx).crossJoin(hy)
      .select(
        round(expr("ln(n) - sla / n"), 6).as("h_x"),
        round(expr("ln(n) - slb / n"), 6).as("h_y"),
        round(expr("((slc - sla - slb) / n + ln(n)) / (ln(n) - slb / n)"),
          6).as("u_y_given_x"),
        round(expr("((slc - sla - slb) / n + ln(n)) / (ln(n) - sla / n)"),
          6).as("u_x_given_y"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bm25" -> textBm25,
    "q_text_good_turing" -> textGoodTuring,
    "q_ml_gk_gamma" -> mlGkGamma,
    "q_ml_theils_u" -> mlTheilsU)

  private val tokensSql =
    """SELECT doc_id, tokens[s] AS token
      |FROM (SELECT doc_id, tokens, unnest(range(1, len(tokens)+1)) AS s
      |      FROM (SELECT doc_id, str_split(lower(text), ' ') AS tokens
      |            FROM documents))
      |WHERE tokens[s] <> ''""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_text_bm25" ->
      s"""WITH tok AS MATERIALIZED ($tokensSql),
        |dl AS MATERIALIZED (SELECT doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
        |terms(term) AS (VALUES ${bmTerms.map(t => s"('$t')").mkString(", ")}),
        |tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tok JOIN terms ON tok.token = terms.term
        |  GROUP BY term, doc_id),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM tf GROUP BY term),
        |scored AS (SELECT tf.term, tf.doc_id, tf.tf,
        |    ROUND(ln(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
        |      * (tf.tf * (1.0 + $k1))
        |      / (tf.tf + $k1 * (1.0 - $b + $b * dl.dl
        |        / (CAST(c.tot AS DOUBLE) / c.n_docs))), 6) AS score
        |  FROM tf JOIN df ON df.term = tf.term
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN corpus c),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY term
        |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
        |SELECT term, doc_id, tf, score, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 10 ORDER BY term, rank""".stripMargin,
    "q_text_good_turing" ->
      s"""WITH tok AS MATERIALIZED ($tokensSql),
        |counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS r
        |  FROM tok GROUP BY token),
        |spec AS MATERIALIZED (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
        |  FROM counts GROUP BY r),
        |tot AS (SELECT CAST(SUM(r * n_r) AS BIGINT) AS tot FROM spec)
        |SELECT s.r, s.n_r,
        |  ROUND((s.r + 1) * CAST(COALESCE(nx.n_r, 0) AS DOUBLE) / s.n_r,
        |    6) AS gt_rstar,
        |  (1000000 * s.r * s.n_r) // t.tot AS mass_ppm
        |FROM spec s LEFT JOIN spec nx ON nx.r = s.r + 1
        |CROSS JOIN tot t ORDER BY s.r""".stripMargin,
    "q_ml_gk_gamma" ->
      """WITH cells AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |dense AS (SELECT xs.x, ys.y, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT x FROM cells) xs
        |  CROSS JOIN (SELECT DISTINCT y FROM cells) ys
        |  LEFT JOIN cells c ON c.x = xs.x AND c.y = ys.y),
        |rowcums AS (SELECT *,
        |    COALESCE(SUM(c) OVER (PARTITION BY x ORDER BY y ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_lt,
        |    COALESCE(SUM(c) OVER (PARTITION BY x ORDER BY y DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_gt
        |  FROM dense),
        |grid AS (SELECT *,
        |    COALESCE(SUM(cum_lt) OVER (PARTITION BY y ORDER BY x ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a,
        |    COALESCE(SUM(cum_gt) OVER (PARTITION BY y ORDER BY x ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
        |  FROM rowcums)
        |SELECT CAST(SUM(c * a) AS BIGINT) AS c_pairs,
        |  CAST(SUM(c * b) AS BIGINT) AS d_pairs,
        |  ROUND((SUM(c * a) - SUM(c * b))
        |    / CAST(SUM(c * a) + SUM(c * b) AS DOUBLE), 6) AS gamma
        |FROM grid""".stripMargin,
    "q_ml_theils_u" ->
      """WITH cells AS MATERIALIZED (SELECT o_orderstatus AS xv,
        |    o_orderpriority AS yv, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2),
        |p AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(c * ln(c) ORDER BY xv, yv)), (a, x) -> a + x) AS slc
        |  FROM cells),
        |hx AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(a * ln(a) ORDER BY xv)), (x, y) -> x + y) AS sla
        |  FROM (SELECT xv, CAST(SUM(c) AS BIGINT) AS a
        |        FROM cells GROUP BY xv)),
        |hy AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(b * ln(b) ORDER BY yv)), (x, y) -> x + y) AS slb
        |  FROM (SELECT yv, CAST(SUM(c) AS BIGINT) AS b
        |        FROM cells GROUP BY yv))
        |SELECT ROUND(ln(n) - sla / n, 6) AS h_x,
        |  ROUND(ln(n) - slb / n, 6) AS h_y,
        |  ROUND(((slc - sla - slb) / n + ln(n)) / (ln(n) - slb / n), 6)
        |    AS u_y_given_x,
        |  ROUND(((slc - sla - slb) / n + ln(n)) / (ln(n) - sla / n), 6)
        |    AS u_x_given_y
        |FROM p, hx, hy""".stripMargin)
}
