package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-9 analytics wideners — structural contracts the DuckDB
  * oracle (ring 1, which pins exact values) cannot express: rank-math
  * invariants, conservation across the attribution split, moment-math
  * range bounds, normalization idempotence, and the interpolation
  * bracketing property. All at sf0.001.
  */
class Pipeline11Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("win distribution: rank math invariants per segment") {
    val df = run("q_win_distribution").cache()
    try {
      // cd/pr in (0,1]; deciles within 1..10 and non-decreasing with cd
      assert(df.where(col("cd") <= 0 || col("cd") > 1).count() == 0)
      assert(df.where(col("pr") < 0 || col("pr") > 1).count() == 0)
      assert(df.where(col("decile") < 1 || col("decile") > 10).count() == 0)
      // per segment: max cd is exactly 1, and every decile is populated
      // when the segment has >= 10 rows
      val seg = df.groupBy("segment")
        .agg(max("cd").as("mx"), count(lit(1)).as("n"),
          countDistinct("decile").as("nd"))
      assert(seg.where(col("mx") =!= 1.0).count() == 0)
      assert(seg.where(col("n") >= 10 && col("nd") =!= 10).count() == 0)
    } finally { df.unpersist(); () }
  }

  test("completeness: one row per column, ppm consistent with counts") {
    val rs = run("q_profile_completeness").collect()
    assert(rs.map(_.getString(0)).toSet == Set("text", "lang", "source"))
    rs.foreach { r =>
      val (n, nn, nb, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(ppm == (n - nn - nb) * 1000000L / n)
      assert(r.getLong(4) <= n - nn) // distinct bounded by non-null rows
    }
  }

  test("attribution: attributed counts conserve against purchase totals") {
    val df = run("q_events_attribution").cache()
    try {
      assert(df.where(col("n_attributed") > col("n_purchases")).count() == 0)
      assert(df.where(col("n_attributed") === 0 &&
        col("attr_cents") =!= 0).count() == 0)
      val total = df.agg(sum("n_purchases")).head().getLong(0)
      val purchases = Tables.events(spark, dir)
        .where(col("event_type") === "purchase").count()
      assert(total == purchases, "every purchase lands in exactly one user row")
    } finally { df.unpersist(); () }
  }

  test("corr: coefficients in [-1,1], basket size drives basket value") {
    val rs = run("q_agg_corr").collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0)
      // order value is the sum of its (positive) line values, so more
      // lines must mean more cents — strong positive by construction
      assert(c > 0.3, s"status ${r.getString(0)} corr $c")
    }
  }

  test("normalize: canonical form is a fixpoint and token math holds") {
    def canon(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(
        lower(c), "[^\\p{L}\\p{N} ]", " "), " +", " "))
    val norm = Tables.documents(spark, dir)
      .withColumn("norm", canon(col("text")))
    // idempotent: normalizing the canonical form changes nothing
    val again = norm.withColumn("norm2", canon(col("norm")))
    assert(again.where(col("norm") =!= col("norm2")).count() == 0)
    val df = run("q_text_normalize")
    // tokens = spaces + 1 on the non-empty canonical form
    val bad = df.join(norm.select(col("doc_id"), col("norm")), "doc_id")
      .where(col("norm") =!= "")
      .where(col("n_tokens") =!= expr(
        "length(norm) - length(replace(norm, ' ', '')) + 1"))
    assert(bad.count() == 0)
    assert(df.select("doc_id").distinct().count() == df.count())
  }

  test("normalize: Unicode classes keep every non-Latin doc (VERDICT r12 #1)") {
    // the r12 ASCII class [^a-z0-9 ] collapsed every zh doc to the
    // empty canonical form (all sharing md5('')-class fingerprints);
    // \p{L}\p{N} must keep them — EVERY fixture doc has a non-empty
    // canonical form, and zh forms are pairwise distinct like the
    // raw texts.
    val df = run("q_text_normalize")
      .join(Tables.documents(spark, dir).select("doc_id", "lang"),
        "doc_id").cache()
    try {
      assert(df.where(col("lang") === "zh").count() > 0)
      assert(df.where(col("n_chars_norm") === 0).count() == 0,
        "no doc may normalize to the empty string")
      val zh = df.where(col("lang") === "zh")
      assert(zh.select("fp_md5").distinct().count() > 1,
        "zh docs must not share one canonical fingerprint")
    } finally { df.unpersist(); () }
  }

  test("markov: per-src ppm shares near 1e6; counts conserve transitions") {
    val df = run("q_events_markov").cache()
    try {
      // integer floor division loses < |dst alphabet| ppm per src
      val shares = df.groupBy("src")
        .agg(sum("ppm").as("p"), count(lit(1)).as("k"))
      assert(shares.where(col("p") > 1000000L ||
        col("p") <= lit(1000000L) - col("k")).count() == 0)
      val totalTransitions = df.agg(sum("n")).head().getLong(0)
      val users = Tables.events(spark, dir)
        .groupBy("user_id").agg(count(lit(1)).as("c"))
      val expected = users.agg(sum(col("c") - 1)).head().getLong(0)
      assert(totalTransitions == expected,
        "each user contributes exactly (events - 1) transitions")
    } finally { df.unpersist(); () }
  }

  test("benford: digits partition orders; literal expectation table") {
    val rs = run("q_profile_benford").collect()
    assert(rs.map(_.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
    val n = rs.map(_.getLong(1)).sum
    assert(n == Tables.orders(spark, dir).count())
    val exp = rs.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(exp.get(1L).forall(_ == 301030L) && exp.get(9L).forall(_ == 45757L))
  }

  test("linfit: moment-exact OLS agrees with the double covariance form") {
    val rs = run("q_ml_linfit").collect()
    assert(rs.nonEmpty)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("y"))
      .select(col("event_type"),
        expr("cast(datediff(d, date '1970-01-01') as double)").as("x"),
        col("y").cast("double"))
    val ref = daily.groupBy("event_type")
      .agg((covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("slope"),
        avg("y").as("my"), avg("x").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2) - r.getDouble(1) * r.getDouble(3)))
      .toMap
    rs.foreach { r =>
      val (slope, icept) = ref(r.getString(0))
      assert(math.abs(r.getDouble(2) - slope) < 1e-3, s"slope ${r}")
      assert(math.abs(r.getDouble(3) - icept) < 1e-1, s"intercept ${r}")
    }
  }

  test("dup rate: clone arithmetic consistent with the corpus") {
    val r = run("q_profile_dup_rate").head()
    val (nDocs, nUnique, cloneDocs, cloneGroups, maxClone, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    assert(nDocs == Tables.documents(spark, dir).count())
    assert(nUnique ==
      Tables.documents(spark, dir).select("text").distinct().count())
    assert(cloneDocs >= 2 * cloneGroups)
    assert(cloneDocs - cloneGroups == nDocs - nUnique)
    assert((cloneGroups > 0) == (maxClone >= 2))
    assert(ppm == (nDocs - nUnique) * 1000000L / nDocs)
  }

  test("asof nearest: bucketed plan equals the naive tolerance join") {
    val tolUs = 6L * 3600L * 1000000L
    val e = Tables.events(spark, dir).where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts").as("ets"))
    val p = Tables.events(spark, dir).where(col("event_type") === "purchase")
      .select(col("event_id").as("pur_id"), col("user_id"),
        col("ts").as("pts"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("err_id"))
      .orderBy(abs(col("diff_us")).asc, col("pts").asc, col("pur_id").asc)
    val naive = e.join(p, "user_id")
      .withColumn("diff_us", expr("unix_micros(pts) - unix_micros(ets)"))
      .where(abs(col("diff_us")) <= tolUs)
      .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select("err_id", "pur_id", "diff_us")
      .collect().map(_.toString).toSet
    val got = run("q_join_asof_nearest").collect().map(_.toString).toSet
    assert(got.nonEmpty, "fixture must produce nearest matches")
    assert(got == naive)
  }

  test("interp: observed cells pass through; interp brackets neighbors") {
    val df = run("q_time_interp").cache()
    try {
      assert(df.where(col("src") === "interp").count() > 0,
        "fixture must exercise the interpolation path")
      // every cell valued; interp values sit inside the global observed
      // range per type (linear interpolation cannot overshoot)
      assert(df.where(col("v").isNull).count() == 0)
      val bounds = df.where(col("src") === "obs").groupBy("event_type")
        .agg(min("v").as("lo"), max("v").as("hi"))
      val out = df.where(col("src") =!= "obs").join(bounds, "event_type")
        .where(col("v") < col("lo") || col("v") > col("hi"))
      assert(out.count() == 0)
      // grid is dense: every type covers the same full calendar
      val days = df.select("d").distinct().count()
      val perType = df.groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(perType.where(col("n") =!= days).count() == 0)
    } finally { df.unpersist(); () }
  }
}
