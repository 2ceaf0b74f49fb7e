package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MiscSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("percentile_approx within 5% of exact median per group") {
    val exact = run("q_agg_median").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    run("q_agg_percentile_approx").collect().foreach { r =>
      val (st, approx) = (r.getString(0), r.getDouble(1))
      assert(math.abs(approx - exact(st)) / exact(st) <= 0.05,
        s"$st: approx=$approx exact=${exact(st)}")
    }
  }

  test("pivot row sums equal group totals") {
    val p = run("q_agg_pivot")
    val withTotal = p.withColumn("total", col("F") + col("O") + col("P"))
    val direct = Tables.orders(spark, dir).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
    assert(withTotal.join(direct, "o_orderpriority")
      .where(col("total") =!= col("cnt")).count() == 0)
  }

  test("chunking covers every char exactly: last chunk ends at text length") {
    val maxEnd = run("q_text_chunk")
      .groupBy("doc_id").agg(max(col("start") + col("chunk_len") - 1).as("covered"))
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    assert(maxEnd.join(lens, "doc_id")
      .where(col("covered") =!= col("len")).count() == 0)
  }
}
