package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-16 batch 58 — keyness, SAX, matrix profile. */
class Pipeline90Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("keyness: G2 re-derivation for every emitted row") {
    val g = run("q_text_keyness").collect()
    val toks = operators.TextOps.tokens(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .select("lang", "token")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cellCnt = toks.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val tokTot = toks.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val langTot = toks.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val nn = toks.length.toDouble
    assert(g.length == langTot.size * 5)
    g.foreach { r =>
      val (lang, token) = (r.getString(0), r.getString(1))
      val k1 = cellCnt((lang, token))
      val kt = tokTot(token)
      val k2 = kt - k1
      val n1 = langTot(lang)
      val n2 = nn - n1
      var g2 = k1 * math.log(k1 * nn / (n1 * kt.toDouble))
      if (k2 > 0) g2 += k2 * math.log(k2 * nn / (n2 * kt.toDouble))
      g2 *= 2
      assert(r.getLong(2) == k1 && r.getLong(3) == k2)
      assert(math.abs(r.getDouble(4) - g2) < 1e-4)
    }
    // per-lang ranks are 1..5 and scores descend
    g.groupBy(_.getString(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(5))
      assert(sorted.map(_.getLong(5)).toSeq == (1L to 5L))
      val sc = sorted.map(_.getDouble(4))
      assert(sc.zip(sc.tail).forall { case (x, y) => x >= y })
    }
  }

  test("sax: word re-derivation; alphabet and length are right") {
    val g = run("q_time_sax").collect()
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("c"))
      .selectExpr("event_type",
        "cast(datediff(day, date '1970-01-01') as bigint)", "c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    g.foreach { row =>
      val xs = byType(row.getString(0))
      val n = xs.length
      val mean = xs.map(_._3).sum.toDouble / n
      val varr = xs.map(x => (x._3 - mean) * (x._3 - mean)).sum / (n - 1)
      val sd = math.sqrt(varr)
      val d0 = xs.map(_._2).min
      val word = xs.groupBy(x => (x._2 - d0) / 5).toSeq.sortBy(_._1)
        .map { case (_, seg) =>
          val z = (seg.map(_._3).sum.toDouble / seg.length - mean) / sd
          if (z < -0.6745) 'a' else if (z < 0) 'b'
          else if (z < 0.6745) 'c' else 'd'
        }.mkString
      assert(row.getLong(1) == word.length.toLong)
      assert(row.getString(2) == word)
      assert(row.getString(2).forall("abcd".contains(_)))
    }
    assert(g.nonEmpty)
  }

  test("matrix profile: brute-force re-derivation on the gap-filled series") {
    val g = run("q_time_matrix_profile").collect()
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("c"))
      .selectExpr("event_type",
        "cast(datediff(day, date '1970-01-01') as bigint)", "c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, xs) =>
      val d0 = xs.map(_._2).min
      val dmax = xs.map(_._2).max
      val len = (dmax - d0 + 1).toInt
      val v = new Array[Long](len)
      xs.foreach(x => v((x._2 - d0).toInt) = x._3)
      val starts = 0 to (len - 7)
      val rows = g.filter(_.getString(0) == t)
        .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
      starts.foreach { s1 =>
        val cands = starts.filter(s2 => math.abs(s2 - s1) >= 4)
        if (cands.nonEmpty) {
          val ds = cands.map { s2 =>
            var dsq = BigInt(0)
            (0 until 7).foreach { k =>
              val d = BigInt(v(s1 + k) - v(s2 + k)); dsq += d * d
            }
            (math.round(math.sqrt(dsq.toDouble)), s2.toLong)
          }
          val best = ds.minBy(identity)
          assert(rows(s1.toLong) == ((best._1, best._2)),
            s"$t window $s1")
        } else assert(!rows.contains(s1.toLong))
      }
    }
    assert(g.nonEmpty)
  }
}
