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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pivot" -> aggPivot,
    "q_agg_percentile_approx" -> aggPercentileApprox,
    "q_typed_dataset" -> typedDataset,
    "q_text_chunk" -> textChunk)

  def oracleSql: Map[String, String] = Map(
    "q_agg_pivot" ->
      """SELECT o_orderpriority,
        |  SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS F,
        |  SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS O,
        |  SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS P
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
        |ORDER BY doc_id, start""".stripMargin)
}
