package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64r round-14 batch 36 — primary-key conformance profiling (the
  * check that CAUGHT this fixture's own lineitem-key duplicates),
  * evaluation of the Markov next-event model (q_events_markov fits
  * it; nothing graded how well it predicts), and Fleiss' kappa
  * (inter-rater agreement past q_ml_kappa_mcc's two raters).
  */
object Pipeline68 extends graft.QueryModule {

  /** PRIMARY-KEY CONFORMANCE across four "should-be-unique" keys
    * (orders.o_orderkey, lineitem.(l_orderkey, l_linenumber),
    * events.event_id, documents.doc_id): rows, distinct keys,
    * duplicated keys, worst multiplicity. The check every warehouse
    * runs nightly — and the one that exposes this fixture's OWN
    * lineitem composite-key duplicates (~25% of keys at sf0.01+),
    * which broke a naive row-identity as-of join in this repo
    * (q_join_asof_tolerance's probe redesign).
    *
    * 100 TB: one groupBy-key pass per relation (map-side partial),
    * then a 4-row union of 1-row aggregates. */
  def profilePkCheck(s: SparkSession, dir: String): DataFrame = {
    def rel(name: String, keyed: DataFrame): DataFrame =
      keyed.groupBy("k").agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
          sum(expr("if(c > 1, 1L, 0L)")).as("n_dup_keys"),
          max("c").as("max_multiplicity"))
        .select(lit(name).as("relation"), col("n_rows"),
          col("n_keys"), col("n_dup_keys"), col("max_multiplicity"))
    rel("orders_pk", Tables.orders(s, dir)
        .selectExpr("cast(o_orderkey as string) as k"))
      .unionByName(rel("lineitem_pk", Tables.lineitem(s, dir)
        .selectExpr("concat(l_orderkey, '#', l_linenumber) as k")))
      .unionByName(rel("events_pk", Tables.events(s, dir)
        .selectExpr("cast(event_id as string) as k")))
      .unionByName(rel("documents_pk", Tables.documents(s, dir)
        .selectExpr("cast(doc_id as string) as k")))
      .orderBy("relation")
  }

  /** MARKOV NEXT-EVENT EVALUATION: fit the first-order transition
    * model (argmax next type per current type, count ties to the
    * lexicographically smallest) and score its top-1 accuracy on the
    * SAME transition stream — per current type: transitions, the
    * predicted next type, and the hit rate in exact ppm. The
    * evaluation leg q_events_markov's transition matrix never grades.
    *
    * 100 TB: one user-partitioned lead window builds transitions; the
    * model and the join run on the <=|types|^2 frame. */
  def eventsMarkovEval(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"))
      .withColumn("nxt", lead("cur", 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val wRank = Window.partitionBy("cur")
      .orderBy(col("n").desc, col("nxt").asc)
    val pred = trans.withColumn("rk", row_number().over(wRank))
      .where(col("rk") === 1)
      .select(col("cur"), col("nxt").as("predicted_next"))
    trans.join(broadcast(pred), "cur")
      .groupBy("cur", "predicted_next")
      .agg(sum("n").as("n_transitions"),
        sum(when(col("nxt") === col("predicted_next"), col("n"))
          .otherwise(0L)).as("hits"))
      .selectExpr("cur as from_type", "predicted_next",
        "n_transitions", "(1000000 * hits) div n_transitions" +
          " as hit_ppm")
      .orderBy("from_type")
  }

  /** FLEISS' KAPPA for m = 3 deterministic binary raters on the
    * (user, day) panel — rater 1: clicked that day; rater 2: any
    * high-value event (> 250.00); rater 3: at least 3 events. The
    * inter-rater-agreement cell q_ml_kappa_mcc's two-classifier
    * Cohen's kappa can't reach (m > 2). Per-item agreement
    * numerators sum m·np(np−1)+... stay EXACT integers; P̄, Pe and
    * kappa are one fixed IEEE dag at the end.
    *
    * 100 TB: one (user, day) hash agg computing the three flags; one
    * global integer reduction. */
  def mlFleissKappa(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type"), col("value"))
      .groupBy("user_id", "d")
      .agg(
        max(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("r1"),
        max(when(col("value") > 250.0, 1L).otherwise(0L)).as("r2"),
        when(count(lit(1)) >= 3, 1L).otherwise(0L).as("r3"))
      .select((col("r1") + col("r2") + col("r3")).as("np"))
      .agg(count(lit(1)).as("n_items"),
        sum("np").as("s_pos"),
        sum(expr("np * (np - 1) + (3 - np) * (2 - np)")).as("s_agree"))
      .selectExpr("n_items",
        "cast(s_agree as double) / (6D * n_items) as p_bar",
        "cast(s_pos as double) / (3D * n_items) as p_pos")
      .selectExpr("n_items", "round(p_bar, 6) as p_bar",
        "round(p_pos * p_pos + (1D - p_pos) * (1D - p_pos), 6)" +
          " as p_e",
        "round((p_bar - (p_pos * p_pos" +
          " + (1D - p_pos) * (1D - p_pos)))" +
          " / (1D - (p_pos * p_pos" +
          " + (1D - p_pos) * (1D - p_pos))), 6) as fleiss_kappa")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_pk_check" -> profilePkCheck,
    "q_events_markov_eval" -> eventsMarkovEval,
    "q_ml_fleiss_kappa" -> mlFleissKappa)

  def oracleSql: Map[String, String] = Map(
    "q_profile_pk_check" ->
      """WITH o AS (SELECT 'orders_pk' AS relation,
        |    CAST(SUM(c) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_keys,
        |    CAST(MAX(c) AS BIGINT) AS max_multiplicity
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders
        |        GROUP BY CAST(o_orderkey AS VARCHAR))),
        |l AS (SELECT 'lineitem_pk', CAST(SUM(c) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MAX(c) AS BIGINT)
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM lineitem
        |        GROUP BY l_orderkey || '#' || l_linenumber)),
        |e AS (SELECT 'events_pk', CAST(SUM(c) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MAX(c) AS BIGINT)
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events
        |        GROUP BY CAST(event_id AS VARCHAR))),
        |d AS (SELECT 'documents_pk', CAST(SUM(c) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MAX(c) AS BIGINT)
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents
        |        GROUP BY CAST(doc_id AS VARCHAR)))
        |SELECT * FROM o UNION ALL SELECT * FROM l
        |UNION ALL SELECT * FROM e UNION ALL SELECT * FROM d
        |ORDER BY relation""".stripMargin,
    "q_events_markov_eval" ->
      """WITH seq AS (SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS nxt
        |  FROM events),
        |trans AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt),
        |pred AS (SELECT cur, nxt AS predicted_next FROM (
        |    SELECT cur, nxt, ROW_NUMBER() OVER (PARTITION BY cur
        |      ORDER BY n DESC, nxt ASC) AS rk FROM trans)
        |  WHERE rk = 1)
        |SELECT trans.cur AS from_type, predicted_next,
        |  CAST(SUM(n) AS BIGINT) AS n_transitions,
        |  (1000000 * CAST(SUM(CASE WHEN nxt = predicted_next THEN n
        |    ELSE 0 END) AS BIGINT)) // CAST(SUM(n) AS BIGINT)
        |    AS hit_ppm
        |FROM trans JOIN pred ON trans.cur = pred.cur
        |GROUP BY trans.cur, predicted_next
        |ORDER BY from_type""".stripMargin,
    "q_ml_fleiss_kappa" ->
      """WITH blocks AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT)
        |    + CAST(MAX(CASE WHEN value > 250.0 THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |    + CAST(CASE WHEN COUNT(*) >= 3 THEN 1 ELSE 0 END
        |      AS BIGINT) AS np
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(SUM(np) AS BIGINT) AS s_pos,
        |    CAST(SUM(np * (np - 1) + (3 - np) * (2 - np)) AS BIGINT)
        |      AS s_agree
        |  FROM blocks),
        |f AS (SELECT n_items,
        |    CAST(s_agree AS DOUBLE) / (6.0 * n_items) AS p_bar,
        |    CAST(s_pos AS DOUBLE) / (3.0 * n_items) AS p_pos
        |  FROM g)
        |SELECT n_items, ROUND(p_bar, 6) AS p_bar,
        |  ROUND(p_pos * p_pos + (1.0 - p_pos) * (1.0 - p_pos), 6)
        |    AS p_e,
        |  ROUND((p_bar - (p_pos * p_pos
        |    + (1.0 - p_pos) * (1.0 - p_pos)))
        |    / (1.0 - (p_pos * p_pos
        |    + (1.0 - p_pos) * (1.0 - p_pos))), 6) AS fleiss_kappa
        |FROM f""".stripMargin)
}
