package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 15 — corrupt-record accounting, pinball
  * loss re-derivation, byte-entropy identities. */
class Pipeline47Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("csv malformed: corrupt accounting matches the mod-13 rule") {
    val li = Tables.lineitem(spark, dir).collect()
    val r = run("q_source_csv_malformed").collect().head
    assert(r.getLong(0) == li.length)
    val corrupt = li.count(_.getAs[Long]("l_orderkey") % 13 == 0)
    assert(r.getLong(1) == corrupt)
    assert(r.getLong(2) == li.length - corrupt)
    val good = li.filter(_.getAs[Long]("l_orderkey") % 13 != 0)
    assert(r.getLong(3) ==
      good.map(x => math.round(x.getAs[Double]("l_quantity"))).sum)
    assert(r.getLong(4) == good.map(_.getAs[Long]("l_orderkey")).max)
  }

  test("pinball loss: re-derives; tau=0.5 is half the MAE") {
    val evs = Tables.events(spark, dir).collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        math.round(r.getAs[Double]("value") * 100)))
    def interp(xs: Array[Long], p: Double): Double = {
      val s = xs.sorted; val pos = p * (s.length - 1); val lo = pos.toInt
      if (lo == s.length - 1) s(lo).toDouble
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val rows = run("q_ml_pinball_loss").collect()
    val types = evs.map(_._1).distinct
    assert(rows.length == types.length * 3)
    rows.foreach { r =>
      val t = r.getString(0); val tau10 = r.getLong(1)
      val train = evs.filter(e => e._1 == t && e._2 % 2 == 0).map(_._3)
      val test = evs.filter(e => e._1 == t && e._2 % 2 == 1).map(_._3)
      assert(r.getLong(2) == test.length)
      val yhat2 = math.round(2 * interp(train, tau10 / 10.0))
      assert(math.abs(r.getDouble(3) - yhat2 / 2.0) < 0.051)
      val l2 = test.map { y =>
        if (2 * y >= yhat2) tau10 * (2 * y - yhat2)
        else (10 - tau10) * (yhat2 - 2 * y)
      }.sum
      val expected = l2.toDouble / test.length / 20
      assert(math.abs(r.getDouble(4) - expected) < 1e-4,
        s"$t tau=$tau10")
    }
  }

  test("byte entropy: bounds and identities on the ascii corpus") {
    val rows = run("q_multimodal_byte_entropy").collect()
    val texts = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val text = texts(r.getLong(0))
      assert(r.getLong(1) == text.length)
      assert(r.getLong(2) == text.distinct.length)
      // entropy in [0, ln(distinct)]
      assert(r.getDouble(3) >= 0 &&
        r.getDouble(3) <= math.log(r.getLong(2).toDouble) + 1e-9)
      // re-derive exactly (ascending byte order fold)
      val n = text.length.toDouble
      val ent = text.groupBy(identity).toSeq
        .map { case (c, g) => (c.toInt, g.length / n) }
        .sortBy(_._1)
        .foldLeft(0.0) { case (a, (_, p)) => a + p * math.log(p) }
      assert(math.abs(r.getDouble(3) - (-ent)) < 1e-5)
      assert(r.getLong(4) == text.charAt(0).toLong)
      assert(r.getLong(5) == text.charAt(1).toLong)
    }
  }
}
