package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-2 pipeline operators (SURVEY §2.12). */
class Pipeline2Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf001
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("content-md5 dedup partitions the corpus") {
    val d = run("q_dedup_content_md5")
    val total = Tables.documents(spark, dir).count()
    assert(d.agg(sum("dup_cnt")).head.getLong(0) == total)
    assert(d.where(col("dup_cnt") < 1).count() == 0)
  }

  test("pii mask never lengthens digit runs and counts are non-negative") {
    val m = run("q_text_pii_mask")
    assert(m.where(col("n_nums") < 0 || col("n_emails") < 0).count() == 0)
    // masking a >=3-digit run with the 5-char '<NUM>' can lengthen a doc,
    // but a doc with no matches must keep its exact length
    val joined = m.join(Tables.documents(spark, dir), "doc_id")
      .where(col("n_nums") === 0 && col("n_emails") === 0)
    assert(joined.where(col("masked_len") =!= length(col("text"))).count() == 0)
  }

  test("int8 quantization stays in [-128, 127]") {
    val q = run("q_vec_quantize_int8")
    val bad = q.where(
      col("q0") < -128 || col("q0") > 127 ||
        col("q1") < -128 || col("q1") > 127 ||
        col("q2") < -128 || col("q2") > 127 ||
        col("q3") < -128 || col("q3") > 127)
    assert(bad.count() == 0)
    assert(q.count() == Tables.embeddings(spark, dir).count())
  }

  test("near-dup prune: kept + removed per lang = corpus per lang") {
    val p = run("q_dedup_near_prune")
    val perLang = Tables.documents(spark, dir).groupBy("lang").count()
    val joined = p.join(perLang, "lang")
      .where(col("kept") + col("removed") =!= col("count"))
    assert(joined.count() == 0)
    assert(p.agg(sum("removed")).head.getLong(0) > 0) // planted dups exist
  }

  test("salted join result equals the plain join") {
    val salted = run("q_join_skew_salted").collect().toSeq
    val plain = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("order_cnt"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_total"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(salted == plain)
  }

  test("salted join spreads a synthetic hot key (60% of rows) and matches plain") {
    val SALT = 8
    val fact = spark.range(10000).select(col("id"),
      when(col("id") % 10 < 6, lit(7L)).otherwise(col("id") % 100).as("k"))
    val dim = spark.range(100).select(col("id").as("dk"), (col("id") * 3).as("v"))
    val saltedDim = dim.withColumn("salt", explode(expr(s"sequence(0, ${SALT - 1})")))
    val factS = fact.withColumn("fsalt", pmod(col("id"), lit(SALT)).cast("int"))
    // the hot key really is spread: all SALT salt values occur for it
    assert(factS.where(col("k") === 7).select("fsalt").distinct().count() == SALT)
    val salted = factS.join(saltedDim.hint("shuffle_hash"),
        col("k") === col("dk") && col("fsalt") === col("salt"))
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("sv"))
      .orderBy("k").collect().toSeq
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("sv"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("bucketed join: no shuffle below the join (co-located buckets)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    run("q_join_bucketed").count() // materializes the bucketed tables
    // table names are suffixed per (session, sfDir) — recover them from
    // the catalog rather than re-deriving the tag
    val names = spark.catalog.listTables().collect().map(_.name)
    val liT = names.filter(_.startsWith("graft_li_b")).sorted.head
    val ordT = names.filter(_.startsWith("graft_ord_b")).sorted.head
    val j = spark.table(liT).hint("merge")
      .join(spark.table(ordT), col("l_orderkey") === col("o_orderkey"))
    val shuffles = j.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"expected shuffle-free bucketed join:\n$j")
  }

  test("partitioned roundtrip matches a direct filtered aggregate") {
    val rt = run("q_source_partitioned_roundtrip").collect().toSeq
    val direct = Tables.orders(spark, dir)
      .where(col("o_orderkey") < 4000 && col("o_orderstatus") === "F")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_total"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(rt == direct)
  }
}
