package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
import graft.api.Dedup

/** §2.14 round-3 continuation: dedup clustering (connected components),
  * bloom-prefiltered join, mergeable-sketch re-aggregation, and
  * stream-stream attribution join (batch twin; the stream-stream form
  * with watermarks is exercised in StreamingSpec).
  */
object Pipeline3 extends graft.QueryModule {

  /** Near-dup CLUSTERS, not just pairs: MinHash candidate pairs
    * (>= 8/16 signature slots agree) collapsed into connected
    * components; each member doc labeled with its cluster id (= min
    * doc_id in the component, the deterministic survivor) and the
    * cluster size. This is the step a real dedup pipeline needs after
    * pair generation — pairs (a,b), (b,c) must yield ONE kept doc, not
    * two independent decisions.
    *
    * 100 TB: pair generation is the LSH band equi-join (no all-pairs);
    * the component collapse is Pregel-style min-label propagation
    * (graft.api.Dedup.connectedComponents — per-round hash join + hash
    * agg partitioned by node, rounds = component diameter, tiny for
    * near-dup cliques). No global sort, no driver-side graph. */
  def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.minhashSignatures(
      TextOps.shingles(s, dir), "doc_id", TextOps.permTable)
    val pairs = Dedup.minhashCandidates(sig, "doc_id", minMatches = 8)
      .select("d1", "d2")
    Dedup.connectedComponents(pairs, "d1", "d2")
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy("cluster_id", "doc_id")
  }

  /** Bloom-prefiltered join: build a bloom filter over the dim-side
    * keys (one aggregation action, like a broadcast build), drop
    * non-matching fact rows BEFORE the join shuffle, then run the exact
    * join — false positives are eliminated by the join itself, so the
    * result is exact. This is runtime row-level filtering made
    * explicit: at 100 TB the win is shuffling only the ~1/5 of orders
    * whose customer survives the segment filter instead of all of
    * them. (The UDF wrapper is justified: BloomFilter.mightContain has
    * no Column-function form; it sits before the shuffle, not in an
    * aggregation hot path.) */
  def joinBloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    // expectedNumItems is an upper bound from table stats, not a count
    // action; fpp holds as long as actual <= expected. ~1.2 MB at 1M.
    val bf = cust.stat.bloomFilter("c_custkey", 1L << 20, 0.01)
    val bfB = s.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bfB.value.mightContain(k))
    Tables.orders(s, dir)
      .where(might(col("o_custkey")))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(Det.dec2("o_totalprice")).cast("double").as("sum_price"))
      .orderBy("c_custkey")
  }

  /** Mergeable-sketch re-aggregation: per-(region, nation) HLL sketches
    * of customer keys, then a region rollup by sketch UNION — the
    * 100 TB pattern where fine-grained sketches are stored once and
    * every coarser rollup is computed by merging sketches instead of
    * re-scanning the fact table. NO oracle (approximate);
    * Pipeline3Spec bounds the estimate against the exact distinct
    * count (HLL lgK=12 is ±~2% at these cardinalities). */
  def aggSketchHllMerge(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
    joined.groupBy("r_name", "n_name")
      .agg(expr("hll_sketch_agg(c_custkey, 12)").as("sk"))
      .groupBy("r_name")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
          .as("est_customers"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  /** Click->purchase attribution: per user, purchases landing within
    * [click_ts, click_ts + 1h) of a click by the same user. Batch twin
    * of a stream-stream time-interval join (watermarked MemoryStream
    * form asserted equal in StreamingSpec). The join is an equi-join on
    * user_id with a range residual — a partitioned hash/sort-merge
    * join, never a cross product. */
  def streamJoinAttribution(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        Det.dec2("value").as("p_value"))
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_attributed"),
        sum(col("p_value")).cast("double").as("attributed_value"))
      .orderBy("user_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_cluster" -> dedupCluster,
    "q_join_bloom_prefilter" -> joinBloomPrefilter,
    "q_agg_sketch_hll_merge" -> aggSketchHllMerge,
    "q_stream_join" -> ((s, d) => streamJoinAttribution(Tables.events(s, d))))

  def oracleSql: Map[String, String] = Map(
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE sh AS (SELECT doc_id, ${TextOps.polyHashSql("shingle")} AS sid
        |            FROM (${TextOps.shinglesSql})),
        |perms(perm, a, b) AS (VALUES ${TextOps.permValuesSql}),
        |sig AS (SELECT doc_id, perm, MIN((a * sid + b) % 2147483647) AS minh
        |        FROM sh CROSS JOIN perms GROUP BY doc_id, perm),
        |pairs AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2
        |          FROM sig s1 JOIN sig s2
        |            ON s1.perm = s2.perm AND s1.minh = s2.minh
        |           AND s1.doc_id < s2.doc_id
        |          GROUP BY d1, d2 HAVING COUNT(*) >= 8),
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
        |          UNION ALL SELECT d2, d1 FROM pairs),
        |walk(node, label) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node
        |  WHERE w.label < e.b),
        |cc AS (SELECT node AS doc_id, MIN(label) AS cluster_id
        |       FROM walk GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM cc ORDER BY cluster_id, doc_id""".stripMargin,
    "q_join_bloom_prefilter" ->
      """SELECT c_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_stream_join" ->
      """SELECT c.user_id, COUNT(*) AS n_attributed,
        |  CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_value
        |FROM (SELECT user_id, ts AS click_ts FROM events
        |      WHERE event_type = 'click') c
        |JOIN (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        | AND p.ts < c.click_ts + INTERVAL 1 HOUR
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin)
}
