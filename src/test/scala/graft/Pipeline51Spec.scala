package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 19 — Youden argmax vs a driver scan,
  * temporal-split leakage identities. */
class Pipeline51Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("youden j: argmax re-derives from a driver-side ROC scan") {
    val scored = Tables.embeddings(spark, dir).collect().map { r =>
      val sc = r.getSeq[Float](r.fieldIndex("embedding"))
        .map(x => math.floor(x * 127.0).toLong).sum
      (sc, r.getAs[Int]("label") >= 5)
    }
    val nPos = scored.count(_._2).toLong
    val nNeg = scored.length - nPos
    val best = scored.map(_._1).distinct.sorted.map { th =>
      val tp = scored.count(s => s._1 >= th && s._2).toLong
      val fp = scored.count(s => s._1 >= th && !s._2).toLong
      val j = 1000000 * tp / nPos + 1000000 * (nNeg - fp) / nNeg -
        1000000
      (j, -th, tp, fp)
    }.max
    val r = run("q_ml_youden_j").collect().head
    assert(r.getLong(0) == -best._2, "threshold")
    assert(r.getLong(1) == best._3 && r.getLong(2) == best._4)
    assert(r.getLong(5) == best._1, "j_ppm")
    assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000)
  }

  test("temporal split: no post-cutoff data in features, no leakage") {
    val evs = Tables.events(spark, dir).collect().map(r =>
      (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate,
        r.getAs[String]("event_type"),
        math.round(r.getAs[Double]("value") * 100)))
    val cutoff = evs.map(_._2).max.minusDays(14)
    val pre = evs.filter(!_._2.isAfter(cutoff))
    val post = evs.filter(_._2.isAfter(cutoff))
    val rows = run("q_ml_label_temporal").collect()
    // exactly the users with pre-cutoff history
    assert(rows.map(_.getLong(0)).toSet == pre.map(_._1).toSet)
    rows.foreach { r =>
      val u = r.getLong(0)
      val mine = pre.filter(_._1 == u)
      assert(r.getLong(1) ==
        cutoff.toEpochDay - mine.map(_._2.toEpochDay).max)
      assert(r.getLong(2) == mine.length)
      assert(r.getLong(3) ==
        mine.filter(_._3 == "purchase").map(_._4).sum)
      val lbl = post.exists(e => e._1 == u && e._3 == "purchase")
      assert(r.getLong(4) == (if (lbl) 1L else 0L))
      assert(r.getString(5) == (if (u % 10 < 8) "train" else "test"))
    }
  }
}
