package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 7 — interpolated percentile re-derivation,
  * regexp family against plain string ops, bitwise-aggregate mask
  * identities. */
class Pipeline39Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("percentile_cont: linear interpolation re-derives; monotone across p") {
    val cents = Tables.orders(spark, dir).collect()
      .groupBy(_.getAs[String]("o_orderstatus"))
      .view.mapValues(_.map(r =>
        math.round(r.getAs[Double]("o_totalprice") * 100)).sorted).toMap
    def interp(xs: Array[Long], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = pos.toInt
      if (lo == xs.length - 1) xs(lo).toDouble
      else xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
    }
    val rows = run("q_agg_percentile_cont").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("F", "O", "P"))
    rows.foreach { r =>
      val xs = cents(r.getString(0))
      assert(r.getLong(1) == xs.length)
      Seq((2, 0.25), (3, 0.5), (4, 0.75), (5, 0.9)).foreach {
        case (i, p) =>
          assert(math.abs(r.getDouble(i) - interp(xs, p)) < 1e-2,
            s"status ${r.getString(0)} p=$p")
      }
      assert(r.getDouble(2) <= r.getDouble(3) &&
        r.getDouble(3) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(5))
    }
  }

  test("regexp family: re-derive with plain string ops") {
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = run("q_fn_regexp").collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val text = docs(r.getLong(0))
      val ing = "([a-z]+ing)".r.findFirstIn(text).getOrElse("")
      assert(r.getString(1) == ing)
      assert(r.getLong(2) == text.count("aeiou".contains(_)))
      assert(r.getBoolean(3) == text.contains("data"))
    }
  }

  test("bit ops: mask identities (and <= or, uniform => xor parity)") {
    val rows = run("q_agg_bit_ops").collect()
    assert(rows.map(_.getLong(0)).forall(m => m >= 0 && m <= 7))
    val nOrders = rows.map(_.getLong(1)).sum
    assert(nOrders ==
      Tables.lineitem(spark, dir).select("l_orderkey").distinct().count())
    // recompute the m_or histogram directly
    val masks = Tables.lineitem(spark, dir).collect()
      .map { r =>
        val m = (if (r.getAs[String]("l_returnflag") == "R") 1L else 0L) +
          (if (math.round(r.getAs[Double]("l_quantity")) >= 40) 2L else 0L) +
          (if (math.round(r.getAs[Double]("l_discount") * 100) >= 5) 4L
           else 0L)
        r.getAs[Long]("l_orderkey") -> m
      }
    val byOrder = masks.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val hist = byOrder.values.groupBy(_.reduce(_ | _))
      .view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(hist(r.getLong(0)) == r.getLong(1))
      val groups = byOrder.values.filter(_.reduce(_ | _) == r.getLong(0))
      assert(r.getLong(2) ==
        groups.count(g => g.reduce(_ & _) == g.reduce(_ | _)))
      assert(r.getLong(3) == groups.count(g => g.reduce(_ ^ _) == 0L))
    }
  }
}
