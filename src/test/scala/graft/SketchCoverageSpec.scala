package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2 (VERDICT r15 #6): direct end-to-end coverage for the three
  * no-oracle sketch keys whose machinery was spec-verified but whose
  * graded entry was never invoked by name — each test calls
  * SparkEntry.queries(key) itself at sf0.001 and pins the estimate
  * against an exact JVM/DataFrame re-derivation plus the row/schema
  * shape the driver smoke would see. */
class SketchCoverageSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_agg_sketch_hll_merge: rollup estimate vs exact per-region counts") {
    val g = run("q_agg_sketch_hll_merge")
    assert(g.columns.toSeq == Seq("r_name", "est_customers", "n_nations"))
    val rows = g.collect()
    val exact = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(countDistinct("c_custkey").as("cust"),
        countDistinct("n_name").as("nat"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val (cust, nat) = exact(r.getString(0))
      // lgK=12 -> RSE ~1.6%; allow 5% or ±2 absolute at fixture scale
      assert(math.abs(r.getLong(1) - cust) <= math.max(2.0, 0.05 * cust),
        s"region ${r.getString(0)}: est ${r.getLong(1)} vs exact $cust")
      assert(r.getLong(2) == nat)
    }
  }

  test("q_agg_theta_intersect: exact below 2^lgK — estimates equal truth") {
    val g = run("q_agg_theta_intersect")
    assert(g.columns.toSeq ==
      Seq("day", "est_both", "est_click_only", "n_click", "n_purchase"))
    val rows = g.collect()
    val byDay = Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .where(col("event_type").isin("click", "purchase"))
      .select("day", "event_type", "user_id")
      .collect()
      .groupBy(_.getDate(0).toString)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val day = r.getDate(0).toString
      val evs = byDay(day)
      val clicks = evs.filter(_.getString(1) == "click").map(_.getLong(2)).toSet
      val purch = evs.filter(_.getString(1) == "purchase").map(_.getLong(2)).toSet
      // fixture distincts are far below 2^12: the theta sketches retain
      // every hash, so intersection/difference estimates are EXACT
      assert(r.getLong(1) == (clicks & purch).size.toLong, s"day $day both")
      assert(r.getLong(2) == (clicks -- purch).size.toLong, s"day $day only")
      assert(r.getLong(3) == clicks.size.toLong)
      assert(r.getLong(4) == purch.size.toLong)
    }
  }

  test("q_profile_outliers_kll: classify is exact given the KLL fences") {
    val g = run("q_profile_outliers_kll")
    assert(g.columns.toSeq ==
      Seq("event_type", "n", "n_outliers", "outlier_ppm", "lo", "hi"))
    val rows = g.collect()
    val vals = Tables.events(spark, dir)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getDouble(1)).sorted }
    assert(rows.map(_.getString(0)).toSet == vals.keySet)
    rows.foreach { r =>
      val t = r.getString(0)
      val v = vals(t)
      assert(r.getLong(1) == v.length.toLong)
      // the emitted fences must classify EXACTLY: n_outliers and ppm
      // re-derive from the raw values against the emitted lo/hi
      val out = v.count(x => x < r.getDouble(4) || x > r.getDouble(5)).toLong
      assert(r.getLong(2) == out, s"type $t outlier count")
      assert(r.getLong(3) == 1000000L * out / v.length)
      // the KLL p25/p75 are retained stream values within ±2% of rank
      // (k=200 covers the whole fixture group, but pin the band, not
      // the implementation detail): reconstruct fence bounds from the
      // rank band and require lo/hi inside them
      def atRank(q: Double, slack: Int) = {
        val i = math.min(v.length - 1, math.max(0,
          (q * v.length).toInt + slack))
        v(i)
      }
      val band = math.max(1, (0.02 * v.length).toInt)
      val loMin = atRank(0.25, -band) - 1.5 * (atRank(0.75, band) - atRank(0.25, -band))
      val loMax = atRank(0.25, band) - 1.5 * (atRank(0.75, -band) - atRank(0.25, band))
      assert(r.getDouble(4) >= loMin - 1e-6 && r.getDouble(4) <= loMax + 1e-6,
        s"type $t lo fence ${r.getDouble(4)} outside [$loMin, $loMax]")
      val hiMin = atRank(0.75, -band) + 1.5 * (atRank(0.75, -band) - atRank(0.25, band))
      val hiMax = atRank(0.75, band) + 1.5 * (atRank(0.75, band) - atRank(0.25, -band))
      assert(r.getDouble(5) >= hiMin - 1e-6 && r.getDouble(5) <= hiMax + 1e-6,
        s"type $t hi fence ${r.getDouble(5)} outside [$hiMin, $hiMax]")
    }
  }
}
