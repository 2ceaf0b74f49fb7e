package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-15 batch 43 — binaryFile roundtrip, byte histogram,
  * column entropy profile. */
class Pipeline75Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("binaryfile: roundtrip checksum equals source-of-truth bytes") {
    val docs = Tables.documents(spark, dir)
      .where(col("doc_id") % 50 === 0).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val g = run("q_source_binaryfile").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g.size == docs.length)
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      var acc = 0L
      bytes.foreach(b => acc = (acc * 131 + (b & 0xff)) % 1000000007L)
      val (_, len, sum) = (id, g(id)._1, g(id)._2)
      assert(len == bytes.length.toLong, s"doc $id length")
      assert(sum == acc, s"doc $id checksum")
    }
    // rerun hits the store-once path and returns identical rows
    val again = run("q_source_binaryfile").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(again.toMap == g.map { case (k, v) => k -> v._2 })
  }

  test("byte histogram: conservation + per-byte re-derivation") {
    val g = run("q_multimodal_byte_histogram").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = collection.mutable.Map.empty[Long, Long]
    Tables.documents(spark, dir).select("text").collect()
      .foreach(_.getString(0).getBytes("UTF-8")
        .foreach(b => exp(b & 0xffL) = exp.getOrElse(b & 0xffL, 0L) + 1))
    assert(g.map(x => x._1 -> x._2).toMap == exp.toMap)
    val total = exp.values.sum
    g.foreach { case (_, n, ppm) =>
      assert(ppm == 1000000L * n / total)
    }
    // ASCII corpus: all bytes printable
    assert(g.forall(x => x._1 >= 32 && x._1 < 127))
  }

  test("col entropy: exact fold re-derivation, norm bounds") {
    val g = run("q_profile_col_entropy").collect()
    assert(g.length == 4)
    val statuses = Tables.orders(spark, dir)
      .groupBy("o_orderstatus").count().collect().map(_.getLong(1))
    val n = statuses.sum.toDouble
    val h = statuses.sorted.map(c => -(c / n) * math.log(c / n)).sum
    val row = g.find(_.getString(0) == "orders.o_orderstatus").get
    assert(math.abs(row.getDouble(3) - h) < 1e-5)
    g.foreach { r =>
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1 + 1e-9)
      assert(r.getLong(5) >= 1000000L / r.getLong(2)) // top >= uniform
    }
  }
}
