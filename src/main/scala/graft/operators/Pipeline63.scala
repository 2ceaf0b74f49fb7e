package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.64m round-14 batch 31 — referential-integrity profiling (FK
  * orphans / childless parents across the star schema), the interval
  * OVERLAP self-join (q_join_interval grades containment; overlap is
  * the other interval-algebra cell), and peak concurrency via the
  * sweep-line (+1/−1 endpoint) pattern.
  */
object Pipeline63 extends graft.QueryModule {

  /** REFERENTIAL INTEGRITY REPORT across the three fact FKs
    * (lineitem→orders, orders→customer, customer→nation): child rows,
    * orphan children (FK points nowhere), and childless parents (no
    * referencing row — the TPC-H ~1/3 of customers with no orders) —
    * the constraint checks a lakehouse without enforced FKs runs
    * nightly. One map-side-partial per-key child count FULL OUTER
    * joined once against the (unique, by schema PK) parent keys:
    * orphan child mass is the unmatched child side, childless parents
    * the unmatched parent side, total child rows the count-mass sum —
    * the r16 rewrite of the 2-checkpoint + 2-distinct + 2-anti-join
    * shape (6 exchanges per relation → 2, identical integers).
    *
    * 100 TB: one child-key partial agg + one co-partitioned full
    * outer join per relation; counts fold per relation. */
  def profileReferential(s: SparkSession, dir: String): DataFrame = {
    def rel(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame = {
      val ckeys = child.groupBy(col(ck).cast("long").as("k"))
        .agg(count(lit(1)).as("nc"))
      val pkeys = parent.select(col(pk).cast("long").as("pk2"))
      ckeys.join(pkeys, col("k") === col("pk2"), "full_outer")
        .agg(sum(coalesce(col("nc"), lit(0L))).as("n_child"),
          sum(when(col("pk2").isNull, col("nc")).otherwise(0L))
            .as("n_orphans"),
          sum(when(col("k").isNull, 1L).otherwise(0L))
            .as("n_childless_parents"))
        .select(lit(name).as("relation"), col("n_child"),
          col("n_orphans"), col("n_childless_parents"))
    }
    rel("lineitem_orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey")
      .unionByName(rel("orders_customer", Tables.orders(s, dir),
        "o_custkey", Tables.customer(s, dir), "c_custkey"))
      .unionByName(rel("customer_nation", Tables.customer(s, dir),
        "c_nationkey", Tables.nation(s, dir), "n_nationkey"))
      .orderBy("relation")
  }

  /** INTERVAL OVERLAP SELF-JOIN: pairs of orders of the SAME customer
    * whose 14-day activity windows [orderdate, orderdate+14d]
    * overlap — "how often does a customer run concurrent orders".
    * q_join_interval grades point-in-interval containment; this is
    * the interval-vs-interval OVERLAP cell ([a1,b1] ∩ [a2,b2] ≠ ∅ ⇔
    * a1 <= b2 AND a2 <= b1). The customer key makes the join EQUI
    * with the overlap test as a post-join filter.
    *
    * 100 TB: one shuffle on o_custkey; per-key fan-out is the
    * customer's own order count (the natural bound), never a cross
    * product. */
  def joinIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables.orders(s, dir)
      .select(col("o_custkey").as("c"), col("o_orderkey").as("k"),
        expr("cast(o_orderdate as date)").as("a"),
        expr("date_add(cast(o_orderdate as date), 14)").as("b"))
      .localCheckpoint(true)
    iv.select(col("c"), col("k").as("k1"), col("a").as("a1"),
        col("b").as("b1"))
      .join(iv.select(col("c"), col("k").as("k2"), col("a").as("a2"),
        col("b").as("b2")), "c")
      .where(col("k2") > col("k1") &&
        col("a1") <= col("b2") && col("a2") <= col("b1"))
      .groupBy("c")
      .agg(count(lit(1)).as("n_overlapping_pairs"))
      .selectExpr("c as custkey", "n_overlapping_pairs")
      .orderBy(col("n_overlapping_pairs").desc, col("custkey").asc)
      .limit(20)
  }

  /** PEAK CONCURRENCY by the SWEEP-LINE pattern: user activity spans
    * per day ([min ts, max ts] of the user's events that day) decompose
    * into +1/-1 endpoint events; the running endpoint sum ordered by
    * (time, starts-before-ends, user) is the live concurrency, and its
    * per-day max is the peak — the "how many users were active AT
    * ONCE" number q_events_dau_mau's daily uniques can't give. All
    * windows partition by day; touching spans (end == next start)
    * count as concurrent (starts sort first).
    *
    * 100 TB: one (user, day) span agg; endpoints double that frame;
    * the sweep windows are day-partitioned. */
  def eventsPeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id"), col("ts"))
      .groupBy("d", "user_id")
      .agg(min("ts").as("t0"), max("ts").as("t1"))
      .localCheckpoint(true)
    val endpoints = spans
      .select(col("d"), col("user_id"), col("t0").as("t"),
        lit(1L).as("delta"))
      .unionByName(spans.select(col("d"), col("user_id"),
        col("t1").as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy("d")
      .orderBy(col("t").asc, col("delta").desc, col("user_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    endpoints
      .select(col("d"), sum("delta").over(w).as("live"))
      .groupBy("d")
      .agg(max("live").as("peak_concurrency"),
        (count(lit(1)) / 2).cast("long").as("n_sessions"))
      .selectExpr("d as day", "n_sessions", "peak_concurrency")
      .orderBy("day")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_referential" -> profileReferential,
    "q_join_interval_overlap" -> joinIntervalOverlap,
    "q_events_peak_concurrency" -> eventsPeakConcurrency)

  def oracleSql: Map[String, String] = Map(
    "q_profile_referential" ->
      """WITH r1 AS (SELECT 'lineitem_orders' AS relation,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
        |      AS n_child,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |      AS n_orphans,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        |     WHERE o_orderkey NOT IN
        |       (SELECT l_orderkey FROM lineitem))
        |      AS n_childless_parents),
        |r2 AS (SELECT 'orders_customer',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
        |     WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))),
        |r3 AS (SELECT 'customer_nation',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
        |     WHERE c_nationkey NOT IN
        |       (SELECT n_nationkey FROM nation)),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
        |     WHERE n_nationkey NOT IN
        |       (SELECT c_nationkey FROM customer)))
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |UNION ALL SELECT * FROM r3 ORDER BY relation""".stripMargin,
    "q_join_interval_overlap" ->
      """WITH iv AS (SELECT o_custkey AS c, o_orderkey AS k,
        |    CAST(o_orderdate AS DATE) AS a,
        |    CAST(o_orderdate AS DATE) + 14 AS b FROM orders)
        |SELECT x.c AS custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs
        |FROM iv x JOIN iv y ON x.c = y.c AND y.k > x.k
        |  AND x.a <= y.b AND y.a <= x.b
        |GROUP BY x.c
        |ORDER BY n_overlapping_pairs DESC, custkey ASC
        |LIMIT 20""".stripMargin,
    "q_events_peak_concurrency" ->
      """WITH spans AS (SELECT CAST(ts AS DATE) AS d, user_id,
        |    MIN(ts) AS t0, MAX(ts) AS t1
        |  FROM events GROUP BY 1, 2),
        |endpoints AS (
        |  SELECT d, user_id, t0 AS t, CAST(1 AS BIGINT) AS delta
        |  FROM spans
        |  UNION ALL
        |  SELECT d, user_id, t1, CAST(-1 AS BIGINT) FROM spans),
        |sweep AS (SELECT d,
        |    CAST(SUM(delta) OVER (PARTITION BY d
        |      ORDER BY t ASC, delta DESC, user_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS live
        |  FROM endpoints)
        |SELECT d AS day,
        |  CAST(COUNT(*) / 2 AS BIGINT) AS n_sessions,
        |  CAST(MAX(live) AS BIGINT) AS peak_concurrency
        |FROM sweep GROUP BY d ORDER BY day""".stripMargin)
}
