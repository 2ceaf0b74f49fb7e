package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the native graft_polyhash Catalyst expression —
  * must be bit-identical to the interpreted HOF fold it replaces
  * (api.Text.polyHash) on every string either form can see. */
class TextExprsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def hofSql(c: String): String =
    s"aggregate(sequence(1, length($c)), 0L, " +
      s"(a, i) -> (a * 131 + ascii(substring($c, i, 1))) % 1000000007)"

  test("graft_polyhash equals the HOF fold on the multilingual corpus") {
    functions.TextExprs.ensureRegistered(spark)
    val toks = graft.api.Text.tokens(
      Tables.documents(spark, TestSpark.sf001), "doc_id", "text")
    val both = toks.select(
      expr("graft_polyhash(token)").as("native"),
      expr(hofSql("token")).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0)
    // and the fold actually leaves the trivial range (regression guard
    // against a degenerate hash)
    assert(both.where(col("native") >= 1000000L).count() > 0)
  }

  test("graft_polyhash equals the HOF fold on unicode edges") {
    val sp = spark
    functions.TextExprs.ensureRegistered(sp)
    import sp.implicits._
    val edges = Seq("", "a", "abc", "Zürich", "ναί", "日本語テキスト",
      "🙂x🙂", "mixé 字", "", "ascii only words")
      .toDF("t")
    val both = edges.select(col("t"),
      expr("graft_polyhash(t)").as("native"),
      expr(hofSql("t")).as("hof"))
    val bad = both.where(col("native") =!= col("hof")).collect()
    assert(bad.isEmpty, bad.mkString(";"))
  }

  test("graft_polyhash null and type semantics") {
    functions.TextExprs.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_polyhash(CAST(NULL AS STRING)) AS n," +
        " graft_polyhash('') AS e").head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 0L)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_polyhash(1)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_polyhash"))
  }
}
