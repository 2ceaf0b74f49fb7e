package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-14 batch 33 — SPRT, tf-idf cosine on stored
  * candidates, weighted correlation. */
class Pipeline65Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("sprt: first boundary crossing of the exact LLR walk") {
    val rows = Tables.events(spark, dir)
      .selectExpr("event_type", "cast(ts as date) as d",
        "value > 250.0 as hi")
      .groupBy("event_type", "d")
      .agg(count(lit(1)).as("n"),
        sum(when(col("hi"), 1L).otherwise(0L)).as("x"))
      .orderBy("event_type", "d").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3)))
    val la = math.log(0.55 / 0.45); val lb = math.log(0.45 / 0.55)
    val b = math.log(19.0)
    val g = run("q_ml_sprt").collect()
    val byType = rows.groupBy(_._1)
    assert(g.length == byType.size)
    g.foreach { row =>
      val series = byType(row.getString(0)).sortBy(_._2)
      var llr = 0.0; var done = false
      var decDay = ""; var decLlr = 0.0; var dec = "continue"
      series.foreach { case (_, day, n, x) =>
        if (!done) {
          llr += x * la + (n - x) * lb
          decDay = day; decLlr = llr
          if (llr >= b) { dec = "accept_h1"; done = true }
          else if (llr <= -b) { dec = "accept_h0"; done = true }
        }
      }
      assert(row.getDate(1).toString == decDay)
      assert(math.abs(row.getDouble(2) - decLlr) < 1e-6)
      assert(row.getString(3) == dec)
    }
  }

  test("tfidf cosine: exact quantized-weight re-derivation") {
    val toks = graft.api.Text
      .tokens(Tables.documents(spark, dir), "doc_id", "text")
      .select("doc_id", "token").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = Tables.documents(spark, dir).count()
    val tf = toks.groupBy(identity).view.mapValues(_.length.toLong)
    val df = toks.distinct.groupBy(_._2).view.mapValues(_.length.toLong)
    val idfq = df.mapValues(d =>
      math.rint(math.log(nDocs.toDouble / d) * 1e6).toLong).toMap
    val w = tf.map { case ((doc, tok), f) => (doc, tok) -> f * idfq(tok) }
    val byDoc = w.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, t), v) => t -> v }.toMap).toMap
    val g = run("q_dedup_tfidf_cosine").collect()
    assert(g.nonEmpty)
    g.foreach { row =>
      val a = byDoc(row.getLong(0)); val c = byDoc(row.getLong(1))
      // iterator, NOT the key Set: equal products must not dedupe
      val dot = a.keys.iterator.filter(c.contains)
        .map(t => BigInt(a(t)) * c(t)).sum
      val na = a.values.map(v => BigInt(v) * v).sum
      val nb = c.values.map(v => BigInt(v) * v).sum
      val cos = dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
      assert(math.abs(row.getDouble(2) - cos) < 1e-6,
        s"pair=(${row.getLong(0)},${row.getLong(1)})" +
          s" got=${row.getDouble(2)} expected=$cos dot=$dot" +
          s" na=$na nb=$nb aTok=${a.size} cTok=${c.size}")
      assert(row.getDouble(2) > 0 && row.getDouble(2) <= 1 + 1e-9)
    }
  }

  test("weighted corr: BigInt weighted-moment re-derivation") {
    val rows = Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag", "cast(round(l_quantity) as bigint)",
        "cast(round(l_extendedprice * 100) as bigint)",
        "cast(round(l_discount * 100) as bigint)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val g = run("q_agg_weighted_corr").collect()
    assert(g.length == rows.map(_._1).distinct.length)
    g.foreach { row =>
      val gr = rows.filter(_._1 == row.getString(0))
      val sw = gr.map(r => BigInt(r._2)).sum
      val swx = gr.map(r => BigInt(r._2) * r._3).sum
      val swy = gr.map(r => BigInt(r._2) * r._4).sum
      val swxx = gr.map(r => BigInt(r._2) * r._3 * r._3).sum
      val swyy = gr.map(r => BigInt(r._2) * r._4 * r._4).sum
      val swxy = gr.map(r => BigInt(r._2) * r._3 * r._4).sum
      val corr = (sw * swxy - swx * swy).toDouble /
        math.sqrt((sw * swxx - swx * swx).toDouble *
          (sw * swyy - swy * swy).toDouble)
      assert(math.abs(row.getDouble(1) - corr) < 1e-6)
      assert(math.abs(row.getDouble(1)) <= 1.0)
    }
  }
}
