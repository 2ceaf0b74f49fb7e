package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.10 UDF / UDAF / UDTF surface (SURVEY.md).
  *
  * These exist to DEMONSTRATE the extension points, not as load-bearing
  * operators: a Scala UDF is opaque to Catalyst (no pushdown through it,
  * no codegen fusion), so every §2.7/§2.8 operator uses built-ins
  * instead. The generator case deliberately uses the built-in
  * explode-over-sequence — a custom Catalyst Generator is unnecessary
  * (documented decision, §2.10).
  */
object Udx extends graft.QueryModule {

  /** Typed Aggregator: geometric mean via sum-of-logs (numerically safe
    * for 100 TB row counts — never multiplies N values together). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double = math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Scalar UDF: distinct character trigram count of a document. */
  private val trigramCount = udf { s: String =>
    if (s == null || s.length < 3) 0L else s.sliding(3).toSet.size.toLong
  }

  def udfScalar(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), trigramCount(col("text")).as("tri_cnt"))
      .orderBy("doc_id")

  def udafTyped(s: SparkSession, dir: String): DataFrame = {
    val gm = udaf(GeoMean)
    // geometric mean is defined on positive values; sf0.1 events contain
    // value = 0 (ln(0) = -inf; DuckDB's ln errors outright)
    Tables.events(s, dir).where(col("value") > 0)
      .groupBy("event_type")
      .agg(round(gm(col("value")), 4).as("geo_mean"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** One-to-many generation: char trigrams with position, via the
    * built-in posexplode-over-sequence (no custom Generator needed). */
  def udtfGenerator(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .where(col("c_custkey") <= 100)
      .select(col("c_custkey"), col("c_name"),
        explode(expr("sequence(1, length(c_name) - 2)")).as("pos"))
      .select(col("c_custkey"), col("pos").cast("long").as("pos"),
        expr("substring(c_name, pos, 3)").as("tri"))
      .orderBy("c_custkey", "pos")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udf_scalar" -> udfScalar,
    "q_udaf_typed" -> udafTyped,
    "q_udtf_generator" -> udtfGenerator)

  def oracleSql: Map[String, String] = Map(
    "q_udf_scalar" ->
      // left-join back to documents: a doc shorter than 3 chars produces
      // zero trigram rows here but tri_cnt=0 (not absence) in the UDF
      """SELECT d.doc_id, CAST(COALESCE(t.cnt, 0) AS BIGINT) AS tri_cnt
        |FROM documents d LEFT JOIN (
        |  SELECT doc_id, COUNT(DISTINCT substring(text, s, 3)) AS cnt
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 1)) AS s
        |        FROM documents)
        |  GROUP BY doc_id) t USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_udaf_typed" ->
      """SELECT event_type, ROUND(exp(avg(ln(value))), 4) AS geo_mean,
        |  COUNT(*) AS cnt
        |FROM events WHERE value > 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_udtf_generator" ->
      """SELECT c_custkey, CAST(s AS BIGINT) AS pos, substring(c_name, s, 3) AS tri
        |FROM (SELECT c_custkey, c_name, unnest(range(1, length(c_name) - 1)) AS s
        |      FROM customer WHERE c_custkey <= 100)
        |ORDER BY c_custkey, pos""".stripMargin)
}
