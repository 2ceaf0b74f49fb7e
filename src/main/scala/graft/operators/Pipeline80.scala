package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** §2.75 round-15 batch 48 — post-hoc testing and window-semantics
  * closers: Tukey's HSD pairwise comparison (the which-groups-differ
  * step after q_ml_anova_select's omnibus F), and the IGNORE NULLS
  * window surface (last/next non-null carry — the event-sourcing
  * "latest known value" idiom, and a distinct window evaluation
  * path both engines must agree on).
  */
object Pipeline80 extends graft.QueryModule {

  /** TUKEY HSD pairwise post-hoc — after an ANOVA says "some status
    * differs", WHICH pairs do: for each of the 3 status pairs the
    * mean difference of order cents, the pooled-MSE standard error
    * SE = √(MSW·(1/n_i+1/n_j)/2) and the studentized q statistic
    * |Δ|/SE. Group sums/squares are exact integer moments; MSW =
    * Σ(Q_g − S_g²/n_g)/(N−k) and every readout is a fixed double
    * dag folded group-ordered (levene idiom).
    *
    * 100 TB: one (status) moment agg is the full pass; the 3-pair
    * comparison runs on the 3-row group frame (broadcast self
    * join). */
  def mlTukeyHsd(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .select(col("o_orderstatus").as("st"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("x"))
      .groupBy("st")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("qx"))
    val msw = g.agg(sum("n").as("nn"), count(lit(1)).as("k"),
      expr("aggregate(array_sort(collect_list(struct(st," +
        " cast(qx as double) - cast(sx as double) * sx / n as w)))," +
        " 0D, (a, e) -> a + e.w)").as("ssw"))
      .select(col("nn"), col("k"),
        (col("ssw") / (col("nn") - col("k"))).as("msw"))
    val a = g.select(col("st").as("s1"), col("n").as("n1"),
      col("sx").as("x1"))
    val b = g.select(col("st").as("s2"), col("n").as("n2"),
      col("sx").as("x2"))
    a.join(broadcast(b), col("s1") < col("s2"))
      .crossJoin(broadcast(msw))
      .select(col("s1"), col("s2"), col("n1"), col("n2"),
        expr("cast(x1 as double) / n1 - cast(x2 as double) / n2")
          .as("diff_cents"),
        expr("sqrt(msw * (1D / n1 + 1D / n2) / 2D)").as("se"))
      .select(col("s1"), col("s2"), col("n1"), col("n2"),
        round(col("diff_cents"), 4).as("diff_cents"),
        round(col("se"), 4).as("se"),
        round(abs(col("diff_cents")) / col("se"), 6).as("q_stat"))
      .orderBy("s1", "s2")
  }

  /** IGNORE NULLS windows — the "latest known value" carry: per
    * customer's order sequence, the most recent URGENT order key so
    * far (last_value IGNORE NULLS over a derived nullable column)
    * and the NEXT urgent order key (lead-side carry via the reversed
    * frame) — the event-sourcing gap-fill idiom, and a window
    * evaluation path (null-skipping frames) that both engines must
    * implement identically. Emits one row per order with total
    * (custkey, date, key) order.
    *
    * 100 TB: two per-customer ROWS windows sharing one (custkey)
    * shuffle — the sessionize discipline; the nullable column is a
    * projection. */
  def winIgnoreNulls(s: SparkSession, dir: String): DataFrame = {
    val wAsc = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        when(col("o_orderpriority") === "1-URGENT", col("o_orderkey"))
          .as("urgent_key"))
      .withColumn("last_urgent",
        last(col("urgent_key"), ignoreNulls = true).over(wAsc))
      .withColumn("next_urgent",
        last(col("urgent_key"), ignoreNulls = true).over(wDesc))
      .select(col("o_custkey"), col("o_orderkey"),
        col("last_urgent"), col("next_urgent"))
      .orderBy("o_custkey", "o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_tukey_hsd" -> mlTukeyHsd,
    "q_win_ignore_nulls" -> winIgnoreNulls)

  def oracleSql: Map[String, String] = Map(
    "q_ml_tukey_hsd" ->
      """WITH g AS (SELECT o_orderstatus AS st,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS sx,
        |    SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
        |      AS HUGEINT) * CAST(ROUND(o_totalprice * 100) AS BIGINT))
        |      AS qx
        |  FROM orders GROUP BY 1),
        |m AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n
        |        ORDER BY st)), (a, e) -> a + e) AS ssw
        |  FROM g),
        |mw AS (SELECT nn, k, ssw / (nn - k) AS msw FROM m),
        |pairs AS (SELECT a.st AS s1, b.st AS s2, a.n AS n1,
        |    b.n AS n2,
        |    CAST(a.sx AS DOUBLE) / a.n - CAST(b.sx AS DOUBLE) / b.n
        |      AS diff,
        |    sqrt(mw.msw * (1.0 / a.n + 1.0 / b.n) / 2.0) AS se
        |  FROM g a JOIN g b ON a.st < b.st CROSS JOIN mw)
        |SELECT s1, s2, n1, n2, ROUND(diff, 4) AS diff_cents,
        |  ROUND(se, 4) AS se, ROUND(abs(diff) / se, 6) AS q_stat
        |FROM pairs ORDER BY s1, s2""".stripMargin,
    "q_win_ignore_nulls" ->
      """WITH b AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderkey
        |         END AS urgent_key
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  last_value(urgent_key IGNORE NULLS) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_urgent,
        |  last_value(urgent_key IGNORE NULLS) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS next_urgent
        |FROM b ORDER BY o_custkey, o_orderkey""".stripMargin)
}
