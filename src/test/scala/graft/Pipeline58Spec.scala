package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 26 — snapshot diff, file-metadata scan, and
  * the TOST equivalence test. */
class Pipeline58Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("snapshot diff: classes partition the key union; deltas add up") {
    def snap(cutoff: String): Map[Long, Long] = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") < lit(cutoff).cast("timestamp"))
      .selectExpr("l_orderkey",
        "cast(round(l_extendedprice * 100) as bigint)" +
          " * (100 - cast(round(l_discount * 100) as bigint)) as r")
      .groupBy("l_orderkey").agg(sum("r").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = snap("1998-01-01"); val b = snap("2000-01-01")
    val keys = a.keySet ++ b.keySet
    val classes = keys.groupBy { k =>
      (a.get(k), b.get(k)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(x), Some(y)) if x == y => "unchanged"
        case _ => "modified"
      }
    }
    val g = run("q_merge_snapshot_diff").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g.keySet == classes.keySet)
    classes.foreach { case (cls, ks) =>
      assert(g(cls)._1 == ks.size.toLong)
      val delta = ks.toSeq
        .map(k => b.getOrElse(k, 0L) - a.getOrElse(k, 0L)).sum
      assert(g(cls)._2 == delta)
    }
    // shipping more days can only add revenue
    assert(!g.contains("removed"))
    assert(g.get("modified").forall(_._2 > 0))
    assert(g.get("added").forall(_._2 > 0))
  }

  test("file metadata: path-derived partitions match the logical table") {
    val expected = Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("sc"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val g = run("q_scan_file_metadata").collect()
    assert(g.length == expected.size)
    g.foreach { r =>
      val (cnt, sc) = expected(r.getString(0))
      assert(r.getLong(1) == cnt)
      assert(r.getLong(2) == 1L) // pinned one file per partition dir
      assert(r.getLong(3) == sc)
    }
  }

  test("tost: Welch moments re-derivation; verdict consistent") {
    val xs = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "view"))
      .selectExpr("event_type", "cast(round(value * 100) as bigint)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def stats(t: String) = {
      val v = xs.filter(_._1 == t).map(_._2)
      val n = v.length.toLong
      val s = v.map(BigInt(_)).sum
      val q = v.map(x => BigInt(x) * x).sum
      (n, s, q)
    }
    val (n1, s1, q1) = stats("click"); val (n2, s2, q2) = stats("view")
    val diff = s1.toDouble / n1 - s2.toDouble / n2
    val sem1 = (BigInt(n1) * q1 - s1 * s1).toDouble /
      (n1.toDouble * n1 * (n1 - 1))
    val sem2 = (BigInt(n2) * q2 - s2 * s2).toDouble /
      (n2.toDouble * n2 * (n2 - 1))
    val se = math.sqrt(sem1 + sem2)
    val tl = (diff + 500) / se; val tu = (diff - 500) / se
    val g = run("q_ml_tost").collect()
    assert(g.length == 1)
    assert(g.head.getLong(0) == n1 && g.head.getLong(1) == n2)
    assert(math.abs(g.head.getDouble(3) - tl) < 1e-6)
    assert(math.abs(g.head.getDouble(4) - tu) < 1e-6)
    assert(g.head.getBoolean(5) ==
      (tl > 1.6448536269514722 && tu < -1.6448536269514722))
  }
}
