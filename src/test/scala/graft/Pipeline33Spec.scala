package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch — the LATERAL join's decorrelated-plan pin
  * (VERDICT r13 #2: plans as a join, never a per-outer-row re-scan),
  * the elastic-net LinearRegression wrapper's graded contract (no
  * oracle: rerun determinism + coefficient agreement with the
  * exact-moment q_ml_linfit at the unregularized point), and
  * byte-payload dedup sanity on top of its oracle gate. */
class Pipeline33Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("lateral join decorrelates: one join, two scans, group-limit") {
    val df = run("q_join_lateral")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Join") || plan.contains("join"),
      "lateral must plan as a JOIN")
    val scans = "FileScan".r.findAllIn(plan).size
    assert(scans == 2, s"expected 2 scans (orders, lineitem), got $scans")
    assert(plan.contains("WindowGroupLimit"),
      "correlated LIMIT must compile to a group-limit, not a re-scan")
    // semantics: ≤3 rows per order, ordered (price desc, line asc)
    val rows = df.collect()
    rows.groupBy(_.getLong(0)).foreach { case (k, rs) =>
      assert(rs.length <= 3, s"order $k has ${rs.length} lateral rows")
      val prices = rs.map(_.getLong(2))
      assert(prices.zip(prices.tail).forall { case (x, y) => x >= y })
    }
  }

  test("linreg: determinism, totality, agreement with exact-moment linfit") {
    val a = run("q_ml_linreg").collect()
    val b = run("q_ml_linreg").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.forall(_.getLong(1) > 0), "n_days positive for every type")
    // the UNREGULARIZED point of the same estimator must agree with
    // q_ml_linfit's closed-form moments (normal solver = exact OLS)
    import org.apache.spark.ml.regression.LinearRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
      .select(col("event_type"),
        expr("cast(datediff(d, date '1970-01-01') as double)").as("x"),
        col("cents").cast("double").as("y"))
    val linfit = SparkEntry.queries("q_ml_linfit")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val feats = new VectorAssembler().setInputCols(Array("x")).setOutputCol("f")
    linfit.foreach { case (t, (slope, intercept)) =>
      val m = new LinearRegression().setFeaturesCol("f").setLabelCol("y")
        .setRegParam(0.0).setSolver("normal")
        .fit(feats.transform(daily.where(col("event_type") === t)))
      assert(math.abs(m.coefficients(0) - slope) <=
        1e-4 * math.max(1.0, math.abs(slope)),
        s"$t slope ${m.coefficients(0)} vs linfit $slope")
      assert(math.abs(m.intercept - intercept) <=
        1e-4 * math.max(1.0, math.abs(intercept)),
        s"$t intercept ${m.intercept} vs linfit $intercept")
    }
  }

  test("payload dedup: threshold truth, pair order, determinism") {
    val rs = run("q_dedup_payload").collect()
    assert(rs.nonEmpty, "fixture corpus has byte-level near-dups")
    assert(rs.forall(r => r.getLong(2) >= 8 && r.getLong(2) <= 16))
    assert(rs.forall(r => r.getLong(0) < r.getLong(1)))
    val again = run("q_dedup_payload").collect()
    assert(rs.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("hits: mass conservation, totality, determinism") {
    val rs = run("q_graph_hits").collect()
    assert(rs.nonEmpty)
    // L1 rescale: each vector's total is 10^12 minus per-node div
    // truncation (< 1 per node)
    val hubTot = rs.map(_.getLong(1)).sum
    val authTot = rs.map(_.getLong(2)).sum
    val n = rs.length
    assert(hubTot <= 1000000000000L && hubTot > 1000000000000L - n)
    assert(authTot <= 1000000000000L && authTot > 1000000000000L - n)
    val again = run("q_graph_hits").collect()
    assert(rs.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
