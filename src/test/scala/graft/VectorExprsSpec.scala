package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the native graft_dot Catalyst expression (§4.3). */
class VectorExprsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("graft_dot is bit-identical to the interpreted HOF fold") {
    functions.VectorExprs.ensureRegistered(spark)
    val e = Tables.embeddings(spark, TestSpark.sf001)
      .withColumn("e", expr("transform(embedding, x -> cast(x AS double))"))
    val both = e.select(
      expr("graft_dot(e, e)").as("native"),
      expr("aggregate(zip_with(e, e, (x, y) -> x * y), cast(0 AS double), (a, x) -> a + x)")
        .as("hof"))
    // bit-equality, not approximate: both fold ascending
    assert(both.where(col("native") =!= col("hof")).count() == 0)
  }

  test("graft_dot null/edge semantics") {
    functions.VectorExprs.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS n,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d)) AS shorter,
        |  graft_dot(CAST(array() AS ARRAY<DOUBLE>),
        |            CAST(array() AS ARRAY<DOUBLE>)) AS empty""".stripMargin).head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 3.0) // shorter length wins
    assert(r.getDouble(2) == 0.0)
  }

  test("graft_dot rejects non-double-array inputs at analysis") {
    functions.VectorExprs.ensureRegistered(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dot"))
  }
}
