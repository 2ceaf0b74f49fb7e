package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-14 batch 20 — DeLong CI re-derivation, BLEU-2
  * clipped-precision identities on synthetic pairs. */
class Pipeline52Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("delong: auc matches rank formula; ci brackets auc; se > 0") {
    val scored = Tables.embeddings(spark, dir).collect().map { r =>
      val sc = r.getSeq[Float](r.fieldIndex("embedding"))
        .map(x => math.floor(x * 127.0).toLong).sum
      (sc, r.getAs[Int]("label") >= 5)
    }
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filter(!_._2).map(_._1)
    // exact rank AUC via placements
    val v10 = pos.map(p =>
      (neg.count(_ < p) + 0.5 * neg.count(_ == p)) / neg.length)
    val v01 = neg.map(n =>
      (pos.count(_ > n) + 0.5 * pos.count(_ == n)) / pos.length)
    val auc = v10.sum / pos.length
    def sampleVar(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val se = math.sqrt(sampleVar(v10) / pos.length +
      sampleVar(v01) / neg.length)
    val r = run("q_ml_auc_delong").collect().head
    assert(r.getLong(0) == pos.length && r.getLong(1) == neg.length)
    assert(math.abs(r.getDouble(2) - auc) < 1e-5, "auc")
    assert(math.abs(r.getDouble(3) - se) < 1e-5, "se")
    assert(r.getDouble(4) < r.getDouble(2) &&
      r.getDouble(2) < r.getDouble(5))
    assert(math.abs(r.getDouble(5) - r.getDouble(4) -
      2 * 1.959963984540054 * r.getDouble(3)) < 1e-4)
  }

  test("bleu-2: identical pair scores 1.0; disjoint pair scores 0") {
    // the graded fixture's >=8-band pairs are near-identical clones;
    // verify every emitted pair's bleu is in (0, 1] and re-derive one
    val rows = run("q_text_bleu_pairs").collect()
    val texts = Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split(" ")
          .filter(_.nonEmpty).toSeq).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hyp = texts(r.getLong(0)); val ref = texts(r.getLong(1))
      assert(r.getLong(2) == hyp.length && r.getLong(3) == ref.length)
      def clip(n: Int): Long = {
        val h = hyp.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
        val g = ref.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
        h.map { case (k, c) => math.min(c, g.getOrElse(k, 0)) }.sum
      }
      val (m1, m2) = (clip(1), clip(2))
      assert(r.getLong(4) == m1 && r.getLong(5) == m2,
        s"pair ${r.getLong(0)}-${r.getLong(1)}")
      val expected = if (m1 == 0 || m2 == 0) 0.0
        else math.min(1.0,
          math.exp(1.0 - ref.length.toDouble / hyp.length)) *
          math.sqrt((m1.toDouble / hyp.length) *
            (m2.toDouble / (hyp.length - 1)))
      assert(math.abs(r.getDouble(6) - expected) < 1e-5)
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1.0)
    }
  }
}
