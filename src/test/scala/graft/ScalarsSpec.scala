package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: scalar-family + UDx invariants, incl. the no-oracle map query. */
class ScalarsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_fn_map n_keys equals distinct token count from the explode table") {
    val fromMap = run("q_fn_map").select("doc_id", "n_keys")
    val fromExplode = run("q_fn_explode")
      .groupBy("doc_id").agg(countDistinct(col("token")).as("tok_cnt"))
    val diff = fromMap.join(fromExplode, "doc_id")
      .where(col("n_keys") =!= col("tok_cnt")).count()
    assert(diff == 0)
  }

  test("json path and schema extraction agree") {
    assert(run("q_fn_json").where(col("k_path") =!= col("k_schema")).count() == 0)
  }

  test("udf trigram count is positive and bounded by text length") {
    val joined = run("q_udf_scalar")
      .join(Tables.documents(spark, dir).select(col("doc_id"), length(col("text")).as("n")),
        "doc_id")
    assert(joined.where(col("tri_cnt") <= 0).count() == 0)
    assert(joined.where(col("tri_cnt") > col("n")).count() == 0)
  }

  test("geometric mean lies between group min and max") {
    val gm = run("q_udaf_typed")
    val bounds = Tables.events(spark, dir).groupBy("event_type")
      .agg(min("value").as("mn"), max("value").as("mx"))
    val bad = gm.join(bounds, "event_type")
      .where(col("geo_mean") < col("mn") || col("geo_mean") > col("mx")).count()
    assert(bad == 0)
  }

  test("array l2norm is positive and head3 has 3 elements") {
    val fa = run("q_fn_array")
    assert(fa.where(col("l2norm") <= 0).count() == 0)
    // head3 is projected as a comma-joined micro-int string (gate-safe)
    assert(fa.where(size(split(col("head3"), ",")) =!= 3).count() == 0)
  }
}
