package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2 (SURVEY.md §5): algebraic invariants on the relational core. */
class RelationalSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("semi + anti partition customers exactly") {
    val semi = run("q_join_semi").count()
    val anti = run("q_join_anti").count()
    val total = Tables.customer(spark, dir).count()
    assert(semi + anti == total)
  }

  test("bag algebra: |A intersectAll B| + |A exceptAll B| == |A|") {
    val ia = run("q_set_intersect_all").count()
    val ea = run("q_set_except_all").count()
    val a = Tables.orders(spark, dir)
      .where("o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-03-01'")
      .count()
    assert(ia + ea == a)
  }

  test("union distinct <= union all; distinct is idempotent") {
    val ua = run("q_set_union_all").count()
    val ud = run("q_set_union_distinct").count()
    assert(ud <= ua)
    assert(run("q_set_union_distinct").distinct().count() == ud)
  }

  test("as-of join emits at most one match per event and never a future order") {
    val asof = run("q_join_asof")
    import org.apache.spark.sql.functions._
    assert(asof.groupBy("event_id").count().where(col("count") > 1).count() == 0)
    val events = Tables.events(spark, dir).select(col("event_id"), col("ts"))
    val bad = asof.join(events, "event_id")
      .where(col("o_orderdate") > col("ts")).count()
    assert(bad == 0)
  }

  test("top-k limit returns exactly k rows, sorted") {
    val rows = run("q_limit_topk").collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
