package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.14 specs: connected-components clustering, bloom-prefiltered
  * join exactness, HLL sketch-merge bounds. */
class Pipeline3Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("connectedComponents: path + clique + singleton-edge components") {
    val sp = spark
    import sp.implicits._
    // component {1,2,3,4} is a PATH (diameter 3 — needs multiple
    // propagation rounds), {10,11} an edge, {20,21,22} a triangle
    val edges = Seq((4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("d1", "d2")
    val got = api.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want, s"labels=$got")
  }

  test("dedupCluster: cluster ids are member minima; sizes consistent") {
    val rows = operators.Pipeline3.dedupCluster(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid,
        s"cluster $cid: id is not the member minimum")
      assert(members.forall(_.getLong(2) == members.size),
        s"cluster $cid: cluster_size != member count")
      assert(members.size >= 2, s"cluster $cid: singleton from pair input")
    }
  }

  test("bloom prefilter join == plain join (no false negatives)") {
    val plain = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
          .where(col("c_mktsegment") === "BUILDING").select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(Det.dec2("o_totalprice")).cast("double").as("sum_price"))
    val got = operators.Pipeline3.joinBloomPrefilter(spark, dir)
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
  }

  test("theta intersection == exact click∩purchase users per day (exact mode)") {
    val rows = operators.Pipeline3.aggThetaIntersect(spark, dir).collect()
    val got = rows.map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // A-not-B in exact mode: clicked-only = distinct clickers - both
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3) - r.getLong(1),
        s"day ${r.getDate(0)}: click_only=${r.getLong(2)} " +
          s"n_click=${r.getLong(3)} both=${r.getLong(1)}")
    }
    val ev = Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
    val c = ev.where(col("event_type") === "click")
      .select("day", "user_id").distinct()
    val p = ev.where(col("event_type") === "purchase")
      .select("day", "user_id").distinct()
    val exact = c.join(p, Seq("day", "user_id"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // days with zero intersection appear in `got` with est 0 but not in
    // `exact` — compare on the union of keys with default 0
    val days = got.keySet ++ exact.keySet
    days.foreach { d =>
      assert(got.getOrElse(d, 0L) == exact.getOrElse(d, 0L),
        s"day $d: est=${got.get(d)} exact=${exact.get(d)}")
    }
  }

  test("hll sketch-merge estimate within 5% of exact per region") {
    val est = operators.Pipeline3.aggSketchHllMerge(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(countDistinct("c_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (r, n) =>
      val e = est(r)
      assert(math.abs(e - n) <= math.max(1L, (0.05 * n).toLong),
        s"region $r: est=$e exact=$n")
    }
  }
}
