package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 45 — edit-distance verify, grouping_id,
  * monotonicity profile. */
class Pipeline77Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("edit distance: JVM re-derivation on a sample + bounds") {
    val g = run("q_text_edit_distance").collect()
    assert(g.nonEmpty)
    val texts = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = d(0); d(0) = i
        for (j <- 1 to b.length) {
          val t = d(j)
          d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(b.length)
    }
    g.take(10).foreach { r =>
      val (a, b) = (texts(r.getLong(0)), texts(r.getLong(1)))
      assert(r.getLong(2) == lev(a, b).toLong, "levenshtein")
      assert(r.getLong(3) == math.max(a.length, b.length).toLong)
    }
    g.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
      // near-dup candidates are character-similar too
      assert(r.getLong(4) > 300000L, s"low sim for candidate pair $r")
    }
  }

  test("grouping_id: levels complete, totals consistent") {
    val g = run("q_agg_grouping_id").collect()
    val total = Tables.orders(spark, dir).count()
    // gid 3 = grand total, one row
    val grand = g.filter(_.getLong(4) == 3L)
    assert(grand.length == 1 && grand.head.getLong(5) == total)
    // each roll-up level sums to the total
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(g.filter(_.getLong(4) == gid).map(_.getLong(5)).sum == total)
    }
    // flags consistent with gid bits
    g.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) * 2 + r.getLong(3))
      assert((r.getString(0) == "<all>") == (r.getLong(2) == 1L))
      assert((r.getString(1) == "<all>") == (r.getLong(3) == 1L))
    }
  }

  test("monotonic: exact re-derivation") {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "unix_micros(ts) t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    var (users, usersInv, tot, mx, steps) = (0L, 0L, 0L, 0L, 0L)
    ev.foreach { case (_, es) =>
      val sorted = es.sortBy(_._2).map(_._3)
      if (sorted.length > 1) {
        users += 1
        val inv = sorted.sliding(2).count(w => w.length == 2 && w(1) < w(0))
        steps += sorted.length - 1
        tot += inv; mx = math.max(mx, inv)
        if (inv > 0) usersInv += 1
      }
    }
    val r = run("q_profile_monotonic").collect().head
    assert(r.getLong(0) == users)
    assert(r.getLong(1) == usersInv)
    assert(r.getLong(2) == tot)
    assert(r.getLong(3) == mx)
    assert(r.getLong(4) == 1000000L * tot / steps)
  }
}
