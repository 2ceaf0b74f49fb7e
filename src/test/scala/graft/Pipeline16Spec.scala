package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ring 2: round-9 batch-6 ML-classifier wrappers — the only gate for
  * these seeded/iterative MLlib fits (no oracle): held-out support
  * conservation, sane label spaces, signal bounds matched to what the
  * fixture can support (the documents fixture shares one 31-word
  * vocabulary across languages, so NB's ceiling IS the majority
  * class; the embedding KMeans cluster target IS separable, so SVC
  * must beat chance on balanced accuracy), and refit determinism.
  * All at sf0.001.
  */
class Pipeline16Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("naive bayes: held-out conservation, majority floor, determinism") {
    val rs = run("q_ml_naive_bayes").collect()
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(rs.map(_.getString(0)).toSet.subsetOf(langs))
    val nTest = Tables.documents(spark, dir)
      .where(org.apache.spark.sql.functions.expr("pmod(doc_id, 5) = 0"))
      .count()
    assert(rs.map(_.getLong(1)).sum == nTest, "every test doc scored once")
    val tp = rs.map(_.getLong(2)).sum
    val majority = rs.map(_.getLong(1)).max
    // the fixture's shared 31-word vocabulary caps lexical language
    // signal: NB must reach AT LEAST the majority-class floor (it
    // cannot do better on this corpus, and below it would mean a
    // broken fit)
    assert(tp >= majority, s"accuracy $tp under majority floor $majority")
    assert(rs.map(_.toSeq).toSeq ==
      run("q_ml_naive_bayes").collect().map(_.toSeq).toSeq)
  }

  test("svc: balanced accuracy beats chance on the cluster target") {
    val rs = run("q_ml_svc_eval").collect()
    assert(rs.map(_.getLong(0)).toSet == Set(0L, 1L))
    val recalls = rs.map(_.getLong(4))
    val balanced = recalls.sum / recalls.length
    assert(balanced > 550000L,
      s"balanced accuracy ${balanced}ppm must beat the 500000 chance line")
    assert(rs.map(_.toSeq).toSeq ==
      run("q_ml_svc_eval").collect().map(_.toSeq).toSeq,
      "seeded refit is deterministic")
  }
}
