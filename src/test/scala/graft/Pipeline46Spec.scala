package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 14 — trigram census, concordance windows,
  * CH index re-derived from the int8 grid. */
class Pipeline46Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("path trigrams: re-derive from per-user ordered sequences") {
    val seqs = Tables.events(spark, dir).collect()
      .map { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"),
          ts.getTime * 1000 + ts.getNanos / 1000 % 1000,
          r.getAs[Long]("event_id"), r.getAs[String]("event_type"))
      }
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3)).map(_._4).toSeq).toMap
    val tris = seqs.values.toSeq.flatMap(_.sliding(3).filter(_.length == 3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = run("q_events_path_trigrams").collect()
    assert(rows.length == tris.size)
    val tot = tris.values.sum
    rows.foreach { r =>
      val key = Seq(r.getString(0), r.getString(1), r.getString(2))
      assert(tris(key) == r.getLong(3), key.mkString(">"))
      assert(r.getLong(4) == 1000000L * r.getLong(3) / tot)
    }
  }

  test("concordance: window contains the probe at the right offset") {
    val rows = run("q_text_concordance").collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split(" ")
          .filter(_.nonEmpty)).toMap
    rows.foreach { r =>
      val probe = r.getString(0)
      val toks = texts(r.getLong(1))
      val ord = r.getLong(2).toInt
      assert(toks(ord - 1) == probe)
      val start = math.max(ord - 2, 1)
      val end = math.min(ord + 2, toks.length)
      assert(r.getString(3) ==
        toks.slice(start - 1, end).mkString(" "))
    }
    // every occurrence of every probe appears exactly once
    val expected = texts.toSeq.flatMap { case (d, toks) =>
      toks.zipWithIndex.collect {
        case (t, i) if Set("spark", "join", "data")(t) => (t, d, i + 1L)
      }
    }.toSet
    assert(rows.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet == expected)
  }

  test("calinski-harabasz: re-derives from the int8 grid; ch > 0") {
    val vecs = Tables.embeddings(spark, dir).collect().map { r =>
      (r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding")).toArray
          .map(x => math.floor(x * 127.0).toLong))
    }
    val n = vecs.length; val k = vecs.map(_._1).distinct.length
    val ss = vecs.flatMap(_._2).map(x => x * x).sum
    val cellMilli = vecs.groupBy(_._1).toSeq.flatMap { case (_, vs) =>
      (0 until 64).map { d =>
        val s = vs.map(_._2(d)).sum
        math.round(1000.0 * s * s / vs.length)
      }
    }.sum
    val tMilli = (0 until 64).map { d =>
      val s = vecs.map(_._2(d)).sum
      math.round(1000.0 * s * s / n)
    }.sum
    val w = ss * 1000 - cellMilli
    val b = cellMilli - tMilli
    val ch = (b.toDouble / (k - 1)) / (w.toDouble / (n - k))
    val r = run("q_ml_calinski_harabasz").collect().head
    assert(r.getLong(0) == n && r.getLong(1) == k)
    assert(r.getLong(2) == w && r.getLong(3) == b)
    assert(math.abs(r.getDouble(4) - ch) < 1e-6)
    assert(r.getDouble(4) > 0)
  }
}
