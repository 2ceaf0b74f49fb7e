package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 47 — LTTB downsampling. */
class Pipeline79Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("lttb: exact bucket-winner re-derivation + endpoint rule") {
    val series = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("y"))
      .orderBy("event_type", "h")
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    val expected = series.flatMap { case (ty, ys) =>
      val n = ys.length
      val buckets = ys.zipWithIndex.groupBy(_._2 / 24)
      def bsum(b: Int) = buckets.get(b).map { xs =>
        (xs.map(_._2.toLong).sum, xs.map(_._1).sum, xs.length.toLong) }
      val picks = buckets.keys.toSeq.sorted.flatMap { b =>
        (bsum(b - 1), bsum(b + 1)) match {
          case (Some((sat, say, na)), Some((sct, scy, nc))) =>
            val best = buckets(b).map { case (y, t) =>
              val score = ((BigInt(sat) * nc - BigInt(sct) * na) *
                (BigInt(y) * na - say) -
                (BigInt(sat) - BigInt(t) * na) *
                  (BigInt(scy) * na - BigInt(say) * nc)).abs
              (score, t.toLong, y)
            }.maxBy(x => (x._1, -x._2))
            Some((ty, best._2, best._3))
          case _ => None
        }
      }
      val ends = Seq((ty, 0L, ys.head), (ty, (n - 1).toLong, ys.last))
      (picks ++ ends).distinct
    }.toSeq.sortBy(x => (x._1, x._2))
    val g = SparkEntry.queries("q_time_lttb")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(g == expected)
    // downsampling actually happened: far fewer points than hours
    val hours = series.values.map(_.length).sum
    assert(g.length < hours / 5)
  }
}
