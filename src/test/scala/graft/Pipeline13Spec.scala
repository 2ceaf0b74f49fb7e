package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-9 batch-3 wideners — structural contracts beyond the
  * DuckDB oracle: banded KS == naive global-window KS, RFM user
  * conservation, chi-square marginal identities, and balanced-sample
  * exactness vs the naive per-label rank. All at sf0.001.
  */
class Pipeline13Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("ks test: banded CDF scan equals the naive global-window D") {
    import org.apache.spark.sql.expressions.Window
    val r = run("q_ml_ks_test").head()
    val (n1, n2, dppm, dat) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(dppm >= 0 && dppm <= 1000000L)
    val g = Tables.events(spark, dir)
      .where(col("event_type").isin("purchase", "click"))
      .select((col("event_type") === "purchase").as("isP"),
        expr("cast(round(value * 100) as bigint)").as("c"))
      .groupBy("c")
      .agg(sum(when(col("isP"), 1L).otherwise(0L)).as("g1"),
        sum(when(col("isP"), 0L).otherwise(1L)).as("g2"))
    val w = Window.orderBy(col("c").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = g.withColumn("c1", sum("g1").over(w))
      .withColumn("c2", sum("g2").over(w))
      .select(col("c"),
        abs(col("c1") * n2 - col("c2") * n1).multiply(1000000L)
          .divide(n1 * n2).cast("long").as("ppm"))
      .orderBy(col("ppm").desc, col("c").asc).head()
    assert(n1 + n2 == Tables.events(spark, dir)
      .where(col("event_type").isin("purchase", "click")).count())
    assert(dppm == naive.getLong(1), s"D $dppm != naive ${naive.getLong(1)}")
    assert(dat == naive.getLong(0), s"argmax $dat != naive ${naive.getLong(0)}")
  }

  test("rfm: users partition into segments; purchase cents conserve") {
    val df = run("q_events_rfm").cache()
    try {
      val ev = Tables.events(spark, dir)
      assert(df.agg(sum("n_users")).head().getLong(0) ==
        ev.select("user_id").distinct().count())
      assert(df.where(col("r_score") < 1 || col("r_score") > 3 ||
        col("f_score") < 1 || col("f_score") > 3 ||
        col("m_score") < 1 || col("m_score") > 3).count() == 0)
      val cents = ev.where(col("event_type") === "purchase")
        .agg(sum(expr("cast(round(value * 100) as bigint)")))
        .head().getLong(0)
      assert(df.agg(sum("tot_cents")).head().getLong(0) == cents)
    } finally { df.unpersist(); () }
  }

  test("chisq: marginals conserve, contributions non-negative") {
    val df = run("q_ml_chisq").cache()
    try {
      val n = df.agg(sum("n_obs")).head().getLong(0)
      assert(n == Tables.orders(spark, dir).count())
      assert(df.where(col("contrib") < 0).count() == 0)
      // sum of floor(R*C*1000/N) over cells is within |cells| of N*1000
      val em = df.agg(sum("expected_milli")).head().getLong(0)
      val cells = df.count()
      assert(em <= n * 1000 && em > n * 1000 - cells * 1000,
        s"expected_milli total $em vs ${n * 1000}")
    } finally { df.unpersist(); () }
  }

  test("balanced sample: exact min-class count per label, hash-minimal picks") {
    import org.apache.spark.sql.expressions.Window
    val df = run("q_sample_balanced").cache()
    try {
      val counts = Tables.embeddings(spark, dir)
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("cnt")).cache()
      val target = counts.agg(min("cnt")).head().getLong(0)
      val per = df.groupBy("label").agg(count(lit(1)).as("k"))
      assert(per.where(col("k") =!= target).count() == 0,
        s"every label keeps exactly $target")
      assert(per.count() == counts.count(), "every label present")
      assert(df.select("vec_id").distinct().count() == df.count())
      // picks equal the naive per-label hash rank
      val w = Window.partitionBy("label")
        .orderBy(col("h").asc, col("vec_id").asc)
      val naive = Tables.embeddings(spark, dir)
        .select(col("label").cast("long").as("label"), col("vec_id"),
          expr("pmod(vec_id * 1103515245L + 12345L, 1000000007L)").as("h"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= target)
        .select(col("label"), col("vec_id"), col("rk"))
      val mism = df.join(naive, Seq("label", "vec_id"), "full_outer")
        .where(col("pick_rank").isNull || col("rk").isNull ||
          col("pick_rank") =!= col("rk")).count()
      assert(mism == 0, "banded picks equal naive per-label ranks")
      counts.unpersist()
    } finally { df.unpersist(); () }
  }
}
