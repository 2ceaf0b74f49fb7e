package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 10 — try_* NULL semantics, VARIANT path
  * extraction vs the string-path twin, struct lexicographic order. */
class Pipeline42Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("try family: nulls exactly where the unsafe form would abort") {
    // (l_orderkey, l_linenumber) is NOT unique in the fixture --
    // compare the full expected multiset, stringified and sorted
    val expected = Tables.lineitem(spark, dir).collect().map { r =>
      val ok = r.getAs[Long]("l_orderkey")
      val ln = r.getAs[Int]("l_linenumber").toLong
      val q = math.round(r.getAs[Double]("l_quantity"))
      val pc = math.round(r.getAs[Double]("l_extendedprice") * 100)
      val rf = r.getAs[String]("l_returnflag")
      val gap = if (q == 25) "null"
        else f"${pc.toDouble / (q - 25)}%.6f"
      val mixed = if (rf == "R") pc.toString else "null"
      val el = if (ln == 1) q.toString
        else if (ln == 2) pc.toString else "null"
      val ts = if (q > 31) "null" else f"2024-01-$q%02d"
      s"$ok|$ln|$gap|$mixed|$el|$ts"
    }.sorted
    val got = run("q_fn_try").collect().map { r =>
      val gap = if (r.isNullAt(2)) "null" else f"${r.getDouble(2)}%.6f"
      val mixed = if (r.isNullAt(3)) "null" else r.getLong(3).toString
      val el = if (r.isNullAt(4)) "null" else r.getLong(4).toString
      val ts = if (r.isNullAt(5)) "null"
        else r.getAs[java.sql.Timestamp](5).toLocalDateTime
          .toLocalDate.toString
      s"${r.getLong(0)}|${r.getLong(1)}|$gap|$mixed|$el|$ts"
    }.sorted
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e) }
  }

  test("variant: typed gets agree with the q_fn_json string path") {
    val rows = run("q_fn_variant").collect()
    val viaJson = Tables.events(spark, dir).collect().map { r =>
      val props = r.getAs[String]("props")
      val k = "\"k\": (-?\\d+)".r.findFirstMatchIn(props).get.group(1)
      (r.getAs[Long]("event_id"), k)
    }.toMap
    assert(rows.length == viaJson.size)
    rows.foreach { r =>
      val k = viaJson(r.getLong(0))
      assert(r.getLong(1) == k.toLong)
      assert(r.getDouble(2) == k.toDouble)
      assert(r.getString(3) == k)
      assert(r.getBoolean(4), "missing path must be null")
      assert(r.getBoolean(5) == (r.getLong(0) % 7 == 0),
        "corrupt iff we appended a brace")
    }
  }

  test("struct: array_max is lexicographic (q first, ln tiebreak)") {
    val rows = run("q_fn_struct").collect()
    val byOrder = Tables.lineitem(spark, dir).collect().map { r =>
      r.getAs[Long]("l_orderkey") ->
        ((math.round(r.getAs[Double]("l_quantity")),
          r.getAs[Int]("l_linenumber").toLong))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.length == byOrder.size)
    rows.foreach { r =>
      val lines = byOrder(r.getLong(0))
      assert(r.getLong(1) == lines.length)
      val mx = lines.max
      assert(r.getLong(2) == mx._1 && r.getLong(3) == mx._2)
      assert(r.getLong(4) == lines.map(_._1).min)
      val first3 = lines.take(3).map(t => s"${t._1}:${t._2}").mkString(",")
      assert(r.getString(5) == first3)
    }
  }
}
