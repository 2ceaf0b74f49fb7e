package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-16 batch 56 — Jaro–Winkler, multilabel metrics,
  * PCM frame RMS. */
class Pipeline88Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("jaro-winkler kernel: classic published values and edge cases") {
    import graft.functions.JaroWinkler.similarity
    assert(math.abs(similarity("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(similarity("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(similarity("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    // bonus gate: jaro 0.6 <= 0.7 -> NO prefix bonus (oracle probe r16)
    assert(similarity("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    assert(similarity("crate", "trace") == 0.7333333333333334)
    assert(similarity("abc", "abc") == 1.0)
    assert(similarity("", "") == 1.0)
    assert(similarity("", "abc") == 0.0)
    assert(similarity("a", "b") == 0.0)
  }

  test("dedup jaro: full JVM brute force over the blocks equals the query") {
    val parts = Tables.part(spark, dir)
      .selectExpr("p_brand", "cast(p_size as long)",
        "cast(p_partkey as long)", "p_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = parts.toSeq.groupBy(p => (p._1, p._2)).values.flatMap { blk =>
      for (x <- blk; y <- blk if x._3 < y._3) yield {
        val jw = BigDecimal(
          graft.functions.JaroWinkler.similarity(x._4, y._4))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (x._1, x._3, y._3, jw)
      }
    }.filter(_._4 >= 0.9).toSeq
      .sortBy(t => (-t._4, t._2, t._3)).take(100)
    val got = run("q_dedup_jaro").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
    // the sf0.001 part table is too sparse per block to cross 0.9 —
    // prove the kernel DOES fire on a manufactured near-pair instead
    assert(graft.functions.JaroWinkler.similarity(
      parts.head._4, parts.head._4 + "x") > 0.9)
  }

  test("multilabel metrics: JVM set-algebra re-derivation") {
    val row = run("q_ml_multilabel_metrics").head
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "day(ts)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val users = ev.map(_._1).distinct
    val labels = ev.map(_._2).distinct
    val truth = ev.filter(_._3 <= 15).map(e => (e._1, e._2)).toSet
    val pred = ev.filter(_._3 > 15).map(e => (e._1, e._2)).toSet
    val tp = (truth & pred).size
    val fp = (pred -- truth).size
    val fn = (truth -- pred).size
    val totDiff = fp + fn
    val nExact = users.count(u =>
      labels.forall(l => truth((u, l)) == pred((u, l))))
    assert(row.getLong(0) == users.length)
    assert(row.getLong(1) == labels.length)
    assert(row.getLong(2) ==
      1000000L * totDiff / (users.length.toLong * labels.length))
    assert(row.getLong(3) == 1000000L * nExact / users.length)
    assert(math.abs(row.getDouble(4) - tp.toDouble / (tp + fp)) < 1e-6)
    assert(math.abs(row.getDouble(5) - tp.toDouble / (tp + fn)) < 1e-6)
    assert(math.abs(row.getDouble(6) - 2.0 * tp / (2 * tp + fp + fn)) < 1e-6)
    val macroF1 = labels.map { l =>
      val t = users.count(u => truth((u, l))); val p = users.count(u => pred((u, l)))
      val tpl = users.count(u => truth((u, l)) && pred((u, l)))
      val (fpl, fnl) = (p - tpl, t - tpl)
      if (2 * tpl + fpl + fnl == 0) 0.0
      else 2.0 * tpl / (2 * tpl + fpl + fnl)
    }.sum / labels.length
    assert(math.abs(row.getDouble(7) - macroF1) < 1e-6)
  }

  test("pcm rms: JVM frame re-derivation; byte counts conserve") {
    val g = run("q_multimodal_pcm_rms").collect()
    val docs = Tables.documents(spark, dir)
      .selectExpr("cast(doc_id as long)", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g.length == docs.size)
    g.foreach { r =>
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      assert(r.getLong(1) == bytes.length.toLong)
      val rmss = bytes.grouped(256).map { fr =>
        val sq = fr.map(b => { val d = (b & 0xff) - 128L; d * d }).sum
        math.round(math.sqrt(sq.toDouble / fr.length) * 1e6)
      }.toSeq
      assert(r.getLong(2) == rmss.length.toLong)
      assert(r.getLong(3) == rmss.sum / rmss.length)
      assert(r.getLong(4) == rmss.max)
    }
  }
}
