package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 46 — user lifecycle, content-defined
  * chunking. */
class Pipeline78Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("lifecycle: stages partition users; per-user re-derivation") {
    val anchor = java.sql.Timestamp.valueOf("2024-01-31 00:00:00")
      .getTime * 1000L
    val day = 86400000000L
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) t", "event_type",
        "cast(round(value * 100) as bigint) c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val exp = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      val first = es.map(_._2).min; val last = es.map(_._2).max
      val (age, rec) = (anchor - first, anchor - last)
      val stage =
        if (rec <= 7 * day && age <= 7 * day) "1_new"
        else if (rec <= 7 * day) "2_active"
        else if (rec <= 14 * day) "3_at_risk"
        else "4_churned"
      (stage, es.length.toLong,
        es.filter(_._3 == "purchase").map(_._4).sum)
    }.groupBy(_._1).map { case (st, xs) =>
      (st, xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val g = run("q_events_lifecycle").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g.toSeq == exp)
    assert(g.map(_._2).sum == ev.map(_._1).distinct.length.toLong)
  }

  test("cdc chunks: conservation, boundary re-derivation, shared flags") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val P = 1000000007L
    // JVM re-derivation of the chunking
    def chunksOf(text: String): Seq[(Long, Long)] = {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      var w = 1L; for (_ <- 0 until 7) w = w * 131 % P
      val out = collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = 0; var roll = 0L
      def close(e: Int): Unit = {
        var h = 0L
        (start until e).foreach(j => h = (h * 131 + (bytes(j) & 0xff)) % P)
        out += ((e - start).toLong -> h); start = e
      }
      (0 until n).foreach { i =>
        roll =
          if (i < 8) (roll * 131 + (bytes(i) & 0xff)) % P
          else {
            var t = (roll - (bytes(i - 8) & 0xff) * w) % P
            if (t < 0) t += P
            (t * 131 + (bytes(i) & 0xff)) % P
          }
        if (i >= 7 && roll % 64 == 0) close(i + 1)
      }
      if (start < n) close(n)
      out.toSeq
    }
    val perDoc = docs.map { case (id, t) => id -> chunksOf(t) }.toMap
    val hashCounts = perDoc.toSeq
      .flatMap { case (id, cs) => cs.map(c => (c._2, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val g = run("q_dedup_cdc_chunks").collect()
    assert(g.length == docs.length)
    g.foreach { r =>
      val cs = perDoc(r.getLong(0))
      assert(r.getLong(1) == cs.length.toLong, s"n_chunks ${r.getLong(0)}")
      assert(r.getLong(2) == cs.map(_._1).sum, "byte conservation")
      assert(r.getLong(3) == cs.map(_._1).max)
      val shared = cs.count(c => hashCounts(c._2) > 1)
      assert(r.getLong(4) == shared.toLong, s"shared ${r.getLong(0)}")
    }
    // the template-heavy fixture actually exercises sharing
    assert(g.exists(_.getLong(4) > 0))
    // multiple chunks per doc on average (the mod-64 boundary fires)
    assert(g.map(_.getLong(1)).sum > g.length)
  }
}
