package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 9 — Adamic-Adar vs the unweighted CN key,
  * reciprocity re-derived from a driver-side edge map, burstiness
  * moment identities. */
class Pipeline41Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("adamic-adar: same pair set as common-neighbors; weights bounded") {
    val aa = run("q_graph_adamic_adar").collect()
    val cn = run("q_graph_common_neighbors").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // same (d1, d2, cn) support: both keys gate on cn >= 2 non-edges
    assert(aa.map(r => (r.getLong(0), r.getLong(1))).toSet == cn.keySet)
    aa.foreach { r =>
      val pair = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == cn(pair), s"cn mismatch at $pair")
      // each middle has 2 <= deg <= 64: per-wedge weight in
      // [1e6/ln(64), 1e6/ln(2)] -- bound the sum by cn times that
      val lo = math.round(1e6 / math.log(64)) * r.getLong(2)
      val hi = math.round(1e6 / math.log(2)) * r.getLong(2)
      assert(r.getLong(3) >= lo && r.getLong(3) <= hi, s"aa range $pair")
    }
  }

  test("adamic-adar core: hand-derived weights on a synthetic wedge graph") {
    val sp = spark
    import sp.implicits._
    // Same topology as the Pipeline23Spec CN pin: hub 1000 (deg 70 >
    // cap, excluded as middle), pair (1,2) via middles {201, 202}
    // (deg 3 each: two spokes + hub edge... here 201/202 connect only
    // to 1, 2 -> deg 2), (3,4) via {203} only (cn 1, gated out),
    // (5,6) adjacent (anti-joined away).
    val low = Seq((1L, 201L), (2L, 201L), (1L, 202L), (2L, 202L),
      (3L, 203L), (4L, 203L),
      (5L, 6L), (5L, 204L), (6L, 204L), (5L, 205L), (6L, 205L))
    val hub = (1L to 70L).map(i => (1000L, i))
    val und = (hub ++ low).flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val rs = operators.Pipeline41.adamicAdarFrom(und).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // weights: middle 201/202 have deg 3 (nodes 1, 2 + hub spoke?
    // no -- 201's edges are only {1, 2} plus its own hub spoke iff
    // 201 <= 70: nodes 1..70 are hub spokes, so 201/202 are NOT.
    // deg(201) = 2 -> wt = round(1e6/ln 2) = 1442695.
    val w2 = math.round(1e6 / math.log(2))
    // (1,2): middles 201, 202 (hub excluded by cap) -> cn 2, 2*w2.
    // middles 1..6 (hub spokes with low edges): deg(1) = deg(2) = 3
    // (hub + 201 + 202) -> wt3; deg(5) = deg(6) = 4 -> wt4; these
    // middle (201,202)/(204,205)/(20x,1000) pairs mirror the CN key.
    val w3 = math.round(1e6 / math.log(3))
    val w4 = math.round(1e6 / math.log(4))
    assert(rs.contains((1L, 2L, 2L, 2 * w2)), rs.mkString("; "))
    assert(rs.contains((201L, 202L, 2L, 2 * w3)))
    assert(rs.contains((204L, 205L, 2L, 2 * w4)))
    // (3,4) has cn 1 (middle 203 only; hub capped) -> gated out
    assert(!rs.exists(r => r._1 == 3L && r._2 == 4L))
    // adjacent (5,6) anti-joined away
    assert(!rs.exists(r => r._1 == 5L && r._2 == 6L))
  }

  test("reciprocity: re-derives from a driver-side nation edge map") {
    val li = Tables.lineitem(spark, dir).collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_suppkey")))
    val custNation = Tables.orders(spark, dir).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("o_custkey"))
      .toMap
    val cn = Tables.customer(spark, dir).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        r.getAs[Number]("c_nationkey").longValue)
      .toMap
    val sn = Tables.supplier(spark, dir).collect()
      .map(r => r.getAs[Long]("s_suppkey") ->
        r.getAs[Number]("s_nationkey").longValue)
      .toMap
    val names = Tables.nation(spark, dir).collect()
      .map(r => r.getAs[Number]("n_nationkey").longValue ->
        r.getAs[String]("n_name"))
      .toMap
    val w = li.map { case (ok, sk) => (cn(custNation(ok)), sn(sk)) }
      .filter(e => e._1 != e._2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = run("q_graph_reciprocity").collect()
    val bySrc = w.keys.groupBy(_._1)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val src = names.find(_._2 == r.getString(0)).get._1
      val out = bySrc(src).toSeq
      assert(r.getLong(1) == out.length)
      assert(r.getLong(2) == out.count(e => w.contains((e._2, e._1))))
      val wOut = out.map(w).sum
      val wRecip = out.map(e =>
        math.min(w(e), w.getOrElse((e._2, e._1), 0L))).sum
      assert(r.getLong(3) == wOut)
      assert(math.abs(r.getDouble(4) - wRecip.toDouble / wOut) < 1e-6)
    }
  }

  test("burstiness: moment identities (fano = cv^2 * mean; B sign = cv vs 1)") {
    val rows = run("q_events_burstiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mean, cv, b, fano) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mean > 0 && cv > 0)
      // fano_s = var/mean/1e6 = cv^2 * mean_s
      assert(math.abs(fano - cv * cv * mean) / fano < 1e-3)
      // B = (cv-1)/(cv+1) in units of mean
      assert(math.abs(b - (cv - 1) / (cv + 1)) < 1e-4)
      assert(b > -1 && b < 1)
    }
  }
}
