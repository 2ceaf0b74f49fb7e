package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-9 batch-4 — structural contracts beyond the DuckDB
  * oracle: HHI bounds vs the top share, drawdown non-negativity and
  * peak consistency, hazard-table survival identities, and the PAVA
  * invariants of the isotonic wrapper (its only gate — no oracle).
  * All at sf0.001.
  */
class Pipeline14Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("hhi: bounded by top share squared and 1e6; supplier conservation") {
    val df = run("q_agg_hhi").cache()
    try {
      assert(df.agg(sum("n_suppliers")).head().getLong(0) ==
        Tables.lineitem(spark, dir).select("l_suppkey").distinct().count())
      df.collect().foreach { r =>
        val (hhi, top) = (r.getLong(2), r.getLong(3))
        assert(hhi > 0 && hhi <= 1000000L)
        assert(top > 0 && top <= 1000000L)
        // HHI >= top_share^2 (one term of the sum), with ppm floor slack
        assert(hhi + 2 >= top * top / 1000000L,
          s"hhi $hhi vs top-share^2 ${top * top / 1000000L}")
        // HHI >= 1/n (minimum at equal shares)
        assert(hhi + 2 >= 1000000L / r.getLong(1))
      }
    } finally { df.unpersist(); () }
  }

  test("drawdown: non-negative, trough day carries the max dd") {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("v")).cache()
    try {
      val rs = run("q_win_drawdown").collect()
      assert(rs.map(_.getString(0)).toSet ==
        daily.select("event_type").distinct().collect()
          .map(_.getString(0)).toSet)
      rs.foreach { r =>
        val (tpe, dd) = (r.getString(0), r.getLong(1))
        assert(dd >= 0)
        val trough = r.getDate(2)
        // peak before trough minus trough value equals the reported dd
        val vTrough = daily.where(col("event_type") === tpe &&
          col("d") === trough).head().getLong(2)
        val peak = daily.where(col("event_type") === tpe &&
          col("d") <= trough).agg(max("v")).head().getLong(0)
        assert(peak - vTrough == dd, s"$tpe: $peak - $vTrough != $dd")
      }
    } finally { daily.unpersist(); () }
  }

  test("hazard: at-risk telescopes, hazard of the last row is 1e6") {
    val rs = run("q_events_hazard").collect()
    val users = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    // at_risk at the smallest duration covers every user
    assert(rs.head.getLong(2) == users)
    // telescoping: at_risk(d_i) - n_ending(d_i) = at_risk(d_{i+1})
    rs.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) - a.getLong(1) == b.getLong(2))
      case _ => ()
    }
    assert(rs.last.getLong(3) == 1000000L,
      "everyone still at risk at the max duration ends there")
    rs.foreach(r => assert(r.getLong(3) > 0 && r.getLong(3) <= 1000000L))
  }

  test("isotonic: monotone, [0,1]-bounded, mass-conserving, deterministic") {
    val df = run("q_ml_isotonic")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // monotone non-decreasing in score, range [0,1]
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(1) <= b.getDouble(1) + 1e-9)
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getDouble(1) >= -1e-9 && r.getDouble(1) <= 1 + 1e-9)
    }
    // PAVA conserves total mass: sum over VECTORS of fitted p == n_pos
    val sc = operators.Pipeline12.scored(spark, dir).cache()
    try {
      val joined = sc.join(df, "score")
      val fitted = joined.agg(sum("iso_pred")).head().getDouble(0)
      val npos = sc.where(col("pos")).count()
      assert(math.abs(fitted - npos) < 0.01 * npos + 1,
        s"fitted mass $fitted vs positives $npos")
    } finally { sc.unpersist(); () }
    // determinism across two fits
    val again = run("q_ml_isotonic").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
