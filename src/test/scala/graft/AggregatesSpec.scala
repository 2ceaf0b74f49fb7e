package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: invariants for aggregation + window operators, incl. the
  * approx ops that have no DuckDB oracle (SURVEY.md §5). */
class AggregatesSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("HLL approx distinct is within 5% of exact per group") {
    val exact = run("q_agg_distinct_exact")
      .select("l_returnflag", "distinct_parts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q_agg_hll").collect().foreach { r =>
      val (flag, approx) = (r.getString(0), r.getLong(1))
      val e = exact(flag).toDouble
      assert(math.abs(approx - e) / e <= 0.05, s"$flag: approx=$approx exact=$e")
    }
  }

  test("rollup row count = detail + per-name subtotals + grand total") {
    val df = run("q_agg_rollup").cache()
    val detail = df.where(col("gid") === 0).count()
    val sub = df.where(col("gid") === 1).count()
    val total = df.where(col("gid") === 3).count()
    assert(total == 1)
    assert(df.count() == detail + sub + total)
    df.unpersist()
  }

  test("cube contains all four grouping combinations") {
    val gids = run("q_agg_cube").select("gid").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
  }

  test("filtered counts never exceed group totals") {
    run("q_agg_filtered").collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(3))
    }
  }

  test("median lies within group min/max; stats are finite") {
    val med = run("q_agg_median").collect()
    assert(med.nonEmpty)
    med.foreach(r => assert(r.getDouble(1) > 0))
    run("q_agg_stats").collect().foreach { r =>
      assert(!r.getDouble(1).isNaN && r.getDouble(2) >= 0)
    }
  }

  test("window running total equals group sum on the last row") {
    val fr = run("q_win_frame_rows")
    val lastRun = fr.groupBy("o_custkey")
      .agg(max(col("run_total")).as("max_run"))
    val direct = Tables.orders(spark, dir).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)").as("direct_sum"))
    val diff = lastRun.join(direct, "o_custkey")
      .where(col("max_run") =!= col("direct_sum")).count()
    assert(diff == 0)
  }

  test("topk per group emits at most 3 rows per supplier, rank-ordered") {
    val tk = run("q_win_topk_group")
    assert(tk.groupBy("l_suppkey").count()
      .where(col("count") > 3).count() == 0)
  }
}
