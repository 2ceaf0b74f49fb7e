package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** §2.74 round-15 batch 47 — the visualization-pipeline closer:
  * LTTB downsampling (the largest-triangle-three-buckets selector
  * every charting backend runs before plotting a long series). A
  * planned log-loss key was caught by the duplicate guard — it
  * already ships as q_ml_log_loss.
  */
object Pipeline79 extends graft.QueryModule {

  /** LTTB DOWNSAMPLING (parallel bucket-mean variant) of the hourly
    * per-type count series into 24-observation buckets: within each
    * interior bucket keep the point maximizing the triangle area
    * against the NEIGHBOR-BUCKET MEAN anchors (strict LTTB anchors
    * the previously-selected point — a sequential dependency; the
    * bucket-mean variant is the standard parallel form and keeps
    * the selection embarrassingly parallel), ties to the earliest
    * point; first and last buckets keep their first/last points.
    * The area comparison is EXACT: scores are the |cross product|
    * scaled by nA²·nC so every term is integer (decimal(38,0)) —
    * no float area ever compared.
    *
    * 100 TB: the hourly agg is the only full pass; scoring joins
    * each bucket to two broadcast-able neighbor-mean rows and ranks
    * inside (type, bucket) partitions. */
  def timeLttb(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type").as("ty"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("y"))
    val idx = hourly
      .withColumn("t", row_number().over(
        Window.partitionBy("ty").orderBy("h")).cast("long") - 1)
      .withColumn("nt", count(lit(1)).over(Window.partitionBy("ty")))
      .withColumn("b", expr("t div 24"))
      .withColumn("nb", expr("(nt + 23) div 24"))
    val buckets = idx.groupBy("ty", "b")
      .agg(sum("t").as("st"), sum("y").as("sy"),
        count(lit(1)).as("n"))
    val scored = idx
      .join(buckets.select(col("ty"), (col("b") + 1).as("b"),
        col("st").as("sat"), col("sy").as("say"), col("n").as("na")),
        Seq("ty", "b"))
      .join(buckets.select(col("ty"), (col("b") - 1).as("b"),
        col("st").as("sct"), col("sy").as("scy"), col("n").as("nc")),
        Seq("ty", "b"))
      .withColumn("score",
        expr("abs((cast(sat as decimal(38,0)) * nc - cast(sct as" +
          " decimal(38,0)) * na) * (cast(y as decimal(38,0)) * na" +
          " - say) - (cast(sat as decimal(38,0)) - cast(t as" +
          " decimal(38,0)) * na) * (cast(scy as decimal(38,0)) * na" +
          " - cast(say as decimal(38,0)) * nc))"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("ty", "b")
          .orderBy(col("score").desc, col("t").asc)))
      .where(col("rn") === 1)
      .select(col("ty"), col("b"), col("t"), col("h"), col("y"))
    val ends = idx
      .withColumn("rn_a", row_number().over(
        Window.partitionBy("ty").orderBy(col("t").asc)))
      .withColumn("rn_d", row_number().over(
        Window.partitionBy("ty").orderBy(col("t").desc)))
      .where(col("rn_a") === 1 || col("rn_d") === 1)
      .select(col("ty"), col("b"), col("t"), col("h"), col("y"))
    scored.unionAll(ends).distinct()
      .select(col("ty").as("event_type"), col("b").as("bucket"),
        col("t").as("t_idx"), col("h").as("hour"), col("y"))
      .orderBy("event_type", "t_idx")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_lttb" -> timeLttb)

  def oracleSql: Map[String, String] = Map(
    "q_time_lttb" ->
      """WITH hourly AS (SELECT event_type AS ty,
        |    date_trunc('hour', ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT ty, h, y,
        |    CAST(row_number() OVER (PARTITION BY ty ORDER BY h) - 1
        |      AS BIGINT) AS t,
        |    CAST(COUNT(*) OVER (PARTITION BY ty) AS BIGINT) AS nt
        |  FROM hourly),
        |wb AS (SELECT *, t // 24 AS b FROM idx),
        |buckets AS (SELECT ty, b, CAST(SUM(t) AS BIGINT) AS st,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM wb GROUP BY ty, b),
        |scored AS (SELECT wb.ty, wb.b, wb.t, wb.h, wb.y,
        |    abs((CAST(a.st AS HUGEINT) * c.n - CAST(c.st AS HUGEINT)
        |        * a.n) * (CAST(wb.y AS HUGEINT) * a.n - a.sy)
        |      - (CAST(a.st AS HUGEINT) - CAST(wb.t AS HUGEINT) * a.n)
        |        * (CAST(c.sy AS HUGEINT) * a.n
        |          - CAST(a.sy AS HUGEINT) * c.n)) AS score
        |  FROM wb
        |  JOIN buckets a ON a.ty = wb.ty AND a.b = wb.b - 1
        |  JOIN buckets c ON c.ty = wb.ty AND c.b = wb.b + 1),
        |pick AS (SELECT ty, b, t, h, y FROM (
        |    SELECT *, row_number() OVER (PARTITION BY ty, b
        |      ORDER BY score DESC, t ASC) AS rn FROM scored)
        |  WHERE rn = 1),
        |ends AS (SELECT ty, b, t, h, y FROM (
        |    SELECT ty, b, t, h, y,
        |      row_number() OVER (PARTITION BY ty ORDER BY t ASC)
        |        AS ra,
        |      row_number() OVER (PARTITION BY ty ORDER BY t DESC)
        |        AS rd
        |    FROM wb) WHERE ra = 1 OR rd = 1)
        |SELECT DISTINCT ty AS event_type, b AS bucket, t AS t_idx,
        |  h AS hour, y
        |FROM (SELECT * FROM pick UNION ALL SELECT * FROM ends)
        |ORDER BY event_type, t_idx""".stripMargin)
}
