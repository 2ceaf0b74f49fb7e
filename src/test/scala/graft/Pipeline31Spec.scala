package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-13 batch 7 — TextRank structural invariants (the
  * exact-oracle compare carries the arithmetic; here the graph-side
  * laws) and the distinct-window exact twin's conservation against
  * dau_mau-style recounts. */
class Pipeline31Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("textrank: top-20 from the corpus vocabulary, ordered, deterministic") {
    val a = run("q_text_textrank").collect()
    val b = run("q_text_textrank").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == 20)
    val vocab = graft.api.Text.tokens(Tables.documents(spark, dir),
      "doc_id", "text").select("token").distinct().collect()
      .map(_.getString(0)).toSet
    assert(a.forall(r => vocab(r.getString(0))))
    assert(a.forall(_.getLong(1) > 0))
    val keys = a.map(r => (-r.getLong(1), r.getString(0)))
    assert(keys.toSeq == keys.sorted.toSeq) // (rank desc, word asc)
  }

  test("distinct window: per-window users <= events; day totals conserve") {
    val w = run("q_stream_distinct_window").collect()
    assert(w.nonEmpty)
    w.foreach(r => assert(r.getLong(2) <= r.getLong(3) &&
      r.getLong(2) >= 1))
    // summing window event counts reproduces the raw stream size
    assert(w.map(_.getLong(3)).sum ==
      Tables.events(spark, dir).count())
    // a window's distinct users can never exceed the day's dau
    val dau = run("q_events_dau_mau").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    w.foreach { r =>
      val day = r.getTimestamp(0).toLocalDateTime.toLocalDate
      assert(r.getLong(2) <= dau(day))
    }
  }
}
