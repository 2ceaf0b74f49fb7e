package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Coverage closers: pivot, approximate percentile, the typed
  * Dataset[T] surface, and training-data document chunking. */
object Misc extends graft.QueryModule {

  /** Pivot (long->wide): order counts per priority x status. Explicit
    * value list — at 100 TB an unbounded pivot would need a distinct
    * pass; fixing the columns keeps it one aggregation. */
  def aggPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy("o_orderpriority")

  /** percentile_approx — the constant-memory quantile for 100 TB
    * (exact median shuffles the whole group). NO oracle (approx);
    * MiscSpec bounds it against the exact median. */
  def aggPercentileApprox(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(expr("percentile_approx(o_totalprice, 0.5, 1000)").as("p50_approx"),
        count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")

  /** The typed Dataset[T] surface (SURVEY §1.3): case-class Encoder,
    * typed filter + groupByKey, back to DataFrame at the boundary. */
  def typedDataset(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .as[(Long, Double, String)]
      .filter(_._2 > 30)
      .groupByKey(_._3)
      .count()
      .toDF("l_returnflag", "heavy_lines")
      .orderBy("l_returnflag")
  }

  /** LLM-pipeline chunking: fixed 100-char windows with stride 80
    * (overlapping chunks) — one generate per doc, no shuffle until the
    * downstream consumer aggregates. */
  def textChunk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, length(text), 80)")).as("start"))
      .select(col("doc_id"), col("start").cast("long").as("start"),
        length(expr("substring(text, start, 100)")).cast("long").as("chunk_len"))
      .orderBy("doc_id", "start")

  /** Deterministic mode (most frequent category): built-in mode() has
    * engine-specific tie behavior, so the modal value is selected via
    * rank over (count DESC, value ASC) — exact on both engines. */
  def aggMode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.orders(s, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("cnt").desc, col("o_orderpriority").asc)
    counts.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("cnt").as("mode_cnt"))
      .orderBy("o_orderstatus")
  }

  /** HashingTF semantics with an ENGINE-NEUTRAL hash: MLlib buckets
    * tokens by murmur3 mod numFeatures (engine-specific); here the
    * bucket is an affine map of the token's polynomial string hash
    * mod 64 — identical bucketed-count shape, §2.0.7 arithmetic-hash
    * rule, and exactly HashingTF's scale story: hash-where-the-row-
    * lives, no vocabulary table (round 2's dense_rank variant sorted
    * the whole vocab in one task). */
  def textHashingTf(s: SparkSession, dir: String): DataFrame =
    TextOps.tokens(s, dir)
      .withColumn("tid", TextOps.polyHash("token"))
      .withColumn("bucket", (lit(1103515245L) * col("tid") + lit(12345L)) % 64)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("doc_id", "bucket")

  /** Correlated scalar subqueries (Catalyst decorrelates them into
    * joins — §4.1): customers above their nation's average balance.
    * The comparison is EXACT decimal (balance*count > sum) — comparing
    * against a computed double average would flip membership for rows
    * within float noise of the boundary. */
  def subCorrelated(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_sub_customer")
    s.sql(
      """SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS acctbal
        |FROM graft_sub_customer c
        |WHERE CAST(c_acctbal AS DECIMAL(12,2)) *
        |      (SELECT COUNT(*) FROM graft_sub_customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
        |       FROM graft_sub_customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pivot" -> aggPivot,
    "q_agg_percentile_approx" -> aggPercentileApprox,
    "q_typed_dataset" -> typedDataset,
    "q_text_chunk" -> textChunk,
    "q_agg_mode" -> aggMode,
    "q_text_hashing_tf" -> textHashingTf,
    "q_sub_correlated" -> subCorrelated)

  def oracleSql: Map[String, String] = Map(
    "q_agg_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_typed_dataset" ->
      """SELECT l_returnflag, COUNT(*) AS heavy_lines
        |FROM lineitem WHERE l_quantity > 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_text_chunk" ->
      """SELECT doc_id, CAST(s AS BIGINT) AS start,
        |  CAST(length(substring(text, s, 100)) AS BIGINT) AS chunk_len
        |FROM (SELECT doc_id, text, unnest(range(1, length(text)+1, 80)) AS s
        |      FROM documents)
        |ORDER BY doc_id, start""".stripMargin,
    "q_agg_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_cnt
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "q_text_hashing_tf" ->
      s"""WITH tok AS (
        |  SELECT doc_id, tokens[s] AS token
        |  FROM (SELECT doc_id, tokens, unnest(range(1, len(tokens)+1)) AS s
        |        FROM (SELECT doc_id, str_split(lower(text), ' ') AS tokens FROM documents))
        |  WHERE tokens[s] <> '')
        |SELECT doc_id,
        |  (1103515245 * ${graft.operators.TextOps.polyHashSql("token")} + 12345) % 64 AS bucket,
        |  COUNT(*) AS cnt
        |FROM tok
        |GROUP BY doc_id, bucket ORDER BY doc_id, bucket""".stripMargin,
    "q_sub_correlated" ->
      """SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS acctbal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(12,2)) *
        |      (SELECT COUNT(*) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
        |       FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
}
