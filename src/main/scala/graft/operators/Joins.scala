package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables}

/** §2.3 joins (SURVEY.md).
  *
  * 100 TB design rules encoded here (§4.2):
  *  - `broadcast()` ONLY on dimension tables (region/nation/customer/
  *    supplier/part) — they scale sublinearly; facts are never broadcast.
  *  - fact⋈fact goes through sort-merge (or shuffle-hash when one side's
  *    per-partition build fits memory); both co-partition on the join key
  *    so a cluster shuffles each side once.
  *  - as-of / theta joins bound the probe side BEFORE the join (range
  *    predicate inside the join condition, not a post-filter on a cross
  *    product).
  */
object Joins extends graft.QueryModule {
  import Det._

  /** Fact ⋈ broadcast small dim (lineitem ⋈ part). */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).where(col("p_size") < 10)),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("line_cnt"),
        sum(dec2("l_quantity")).cast("double").as("sum_qty"))
      .orderBy("p_brand")

  /** Fact ⋈ fact via sort-merge (hinted; the strategy Spark picks for
    * two large co-shuffled inputs on a cluster). */
  def joinSortMerge(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).hint("merge")
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("line_cnt"),
        sum(dec2("l_extendedprice")).cast("double").as("sum_price"))
      .orderBy("o_orderpriority")

  /** Same pair via shuffle-hash (no sort; build side hashed per
    * partition — right when one side is much smaller but too big to
    * broadcast). */
  def joinShuffleHash(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).hint("shuffle_hash")
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("line_cnt"),
        sum(dec2("l_quantity")).cast("double").as("sum_qty"))
      .orderBy("o_orderstatus")

  /** 5-way snowflake: one fact⋈fact shuffle, dims broadcast. */
  def joinMultiway(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(revenue).cast("double").as("sum_revenue"),
        count(lit(1)).as("line_cnt"))
      .orderBy("r_name", "n_name")

  /** Customers with (or without) orders — left outer + aggregate. */
  def joinLeftOuter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("order_cnt"),
        coalesce(sum(dec2("o_totalprice")), lit(0))
          .cast("double").as("sum_total"))
      .orderBy("c_custkey")

  /** Full outer over per-nation customer vs supplier aggregates (at
    * sf0.001 some nations lack suppliers -> genuine null sides). */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy("c_nationkey")
      .agg(count(lit(1)).as("customer_cnt"))
    val su = Tables.supplier(s, dir).groupBy("s_nationkey")
      .agg(count(lit(1)).as("supplier_cnt"))
    c.join(su, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("customer_cnt"), lit(0)).as("customer_cnt"),
        coalesce(col("supplier_cnt"), lit(0)).as("supplier_cnt"))
      .orderBy("nationkey")
  }

  /** Left-semi: customers having at least one urgent order. */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti: customers with no urgent order (non-empty at every SF —
    * anti vs the full orders table is empty because every customer has
    * at least one order in the fixtures). */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Small dim cross join + deterministic top-k. */
  def joinCrossTopk(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select("r_regionkey", "r_name", "n_nationkey", "n_name")
      .orderBy("r_regionkey", "n_nationkey")
      .limit(30)

  /** Theta (range) self-join: event pairs of the same user within 60 s.
    * The range predicate lives IN the join condition; per-user count
    * keeps output bounded. At cluster scale this shuffles both sides on
    * user_id once. */
  def joinThetaRange(s: SparkSession, dir: String): DataFrame = {
    val e1 = Tables.events(s, dir).select(
      col("event_id").as("id1"), col("user_id").as("u1"), col("ts").as("ts1"))
    val e2 = Tables.events(s, dir).select(
      col("event_id").as("id2"), col("user_id").as("u2"), col("ts").as("ts2"))
    e1.join(e2,
        col("u1") === col("u2") && col("id1") =!= col("id2") &&
        col("ts2") >= col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 60 SECONDS"))
      .groupBy(col("u1").as("user_id"))
      .agg(count(lit(1)).as("pair_cnt"))
      .orderBy("user_id")
  }

  /** As-of join: each event ↔ the most recent order of that customer
    * with o_orderdate <= ts.
    *
    * Implemented as the UNION-MERGE as-of: tag both sides, sort each
    * key's timeline once, and carry the latest order forward with
    * last_value(ignoreNulls). This is O(n log n) with ONE shuffle per
    * side and no join blowup — the naive range-join + row_number
    * materializes |events| x |orders-per-key| rows (40 s at sf0.1 vs
    * ~1 s for this plan) and gets quadratically worse with key skew at
    * 100 TB. Orders sort before events at equal timestamps (<= match),
    * later o_orderkey wins ties on o_orderdate. */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir).select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("side"), col("o_orderkey"),
      col("o_orderdate"), lit(null).cast("long").as("event_id"))
    val events = Tables.events(s, dir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("side"), lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("timestamp").as("o_orderdate"), col("event_id"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("side").asc, col("o_orderkey").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .select(col("k").as("user_id"), col("side"), col("event_id"),
        last(col("o_orderkey"), ignoreNulls = true).over(w).as("o_orderkey"),
        last(col("o_orderdate"), ignoreNulls = true).over(w).as("o_orderdate"))
      .where(col("side") === 1 && col("o_orderkey").isNotNull)
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }

  /** Interval-containment join: lineitems shipped within 90 days of
    * their order date (equi key + range predicate). */
  def joinInterval(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("line_cnt"),
        sum(dec2("l_quantity")).cast("double").as("sum_qty"))
      .orderBy("o_orderstatus")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_broadcast" -> joinBroadcast,
    "q_join_sortmerge" -> joinSortMerge,
    "q_join_shuffle_hash" -> joinShuffleHash,
    "q_join_multiway" -> joinMultiway,
    "q_join_left_outer" -> joinLeftOuter,
    "q_join_full_outer" -> joinFullOuter,
    "q_join_semi" -> joinSemi,
    "q_join_anti" -> joinAnti,
    "q_join_cross_topk" -> joinCrossTopk,
    "q_join_theta_range" -> joinThetaRange,
    "q_join_asof" -> joinAsof,
    "q_join_interval" -> joinInterval)

  def oracleSql: Map[String, String] = Map(
    "q_join_broadcast" ->
      """SELECT p_brand, COUNT(*) AS line_cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size < 10
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_sortmerge" ->
      """SELECT o_orderpriority, COUNT(*) AS line_cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_shuffle_hash" ->
      """SELECT o_orderstatus, COUNT(*) AS line_cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_multiway" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_revenue,
        |  COUNT(*) AS line_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS order_cnt,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS sum_total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_full_outer" ->
      """WITH c AS (SELECT c_nationkey, COUNT(*) AS customer_cnt FROM customer GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey, COUNT(*) AS supplier_cnt FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |  COALESCE(customer_cnt, 0) AS customer_cnt,
        |  COALESCE(supplier_cnt, 0) AS supplier_cnt
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross_topk" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey LIMIT 30""".stripMargin,
    "q_join_theta_range" ->
      """SELECT e1.user_id AS user_id, COUNT(*) AS pair_cnt
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id AND e1.event_id <> e2.event_id
        |  AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 60 SECOND
        |GROUP BY e1.user_id ORDER BY user_id""".stripMargin,
    "q_join_asof" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_join_interval" ->
      """SELECT o_orderstatus, COUNT(*) AS line_cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
