package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-9 batch-2 wideners — structural contracts beyond the
  * DuckDB oracle (ring 1): the weighted-median mass property, banded
  * rank == naive window rank for Gini, rank-sum AUC == the O(n²)
  * pair-count definition, calibration/cohort/resample conservation,
  * and moment-math range bounds. All at sf0.001.
  */
class Pipeline12Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("weighted median: defining mass property per flag") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
        expr("cast(round(l_quantity) as bigint)").as("v"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("w"))
      .cache()
    try {
      val rs = run("q_agg_weighted_median").collect()
      assert(rs.nonEmpty)
      rs.foreach { r =>
        val (flag, q1, med, q3) =
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        assert(q1 <= med && med <= q3, s"$flag quartiles ordered")
        val tot = li.where(col("flag") === flag)
          .agg(sum("w")).head().getLong(0)
        val below = li.where(col("flag") === flag && col("v") < med)
          .agg(coalesce(sum("w"), lit(0L))).head().getLong(0)
        val upto = li.where(col("flag") === flag && col("v") <= med)
          .agg(sum("w")).head().getLong(0)
        assert(below * 2 < tot, s"$flag: mass strictly below median < half")
        assert(upto * 2 >= tot, s"$flag: mass up to median >= half")
        assert(tot == r.getLong(4))
      }
    } finally { li.unpersist(); () }
  }

  test("gini: banded two-phase rank equals the naive per-segment window") {
    import org.apache.spark.sql.expressions.Window
    val ranked = operators.Pipeline12.giniRanked(spark, dir).cache()
    try {
      val w = Window.partitionBy("segment")
        .orderBy(col("x").asc, col("custkey").asc)
      val naive = ranked.select("segment", "custkey", "x")
        .withColumn("i_naive", row_number().over(w).cast("long"))
      val diff = ranked.join(naive, Seq("segment", "custkey"))
        .where(col("i") =!= col("i_naive")).count()
      assert(diff == 0, "banded rank must equal the naive global rank")
      val g = run("q_agg_gini").collect()
      assert(g.nonEmpty)
      g.foreach { r =>
        val ppm = r.getLong(2)
        assert(ppm >= 0 && ppm < 1000000L, s"gini_ppm in [0,1e6): $ppm")
      }
    } finally { ranked.unpersist(); () }
  }

  test("pareto: k80 is minimal — top-k80 covers 80%, k80−1 does not") {
    val ranked = operators.Pipeline12.giniRanked(spark, dir).cache()
    try {
      run("q_win_pareto").collect().foreach { r =>
        val (seg, n, k80, tot) =
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4))
        assert(k80 >= 1 && k80 <= n)
        // top-k customers = ranks > n - k (ascending rank frame)
        def topSum(k: Long): Long = ranked
          .where(col("segment") === seg && col("i") > n - k)
          .agg(coalesce(sum("x"), lit(0L))).head().getLong(0)
        assert(topSum(k80) * 5 >= tot * 4, s"$seg: top-$k80 covers 80%")
        if (k80 > 1)
          assert(topSum(k80 - 1) * 5 < tot * 4,
            s"$seg: k80 is minimal")
      }
    } finally { ranked.unpersist(); () }
  }

  test("decile report: conservation, monotone deciles, shares sum to ~1e6") {
    val df = run("q_agg_decile_report").cache()
    try {
      val ranked = operators.Pipeline12.giniRanked(spark, dir)
      assert(df.agg(sum("n_custs")).head().getLong(0) == ranked.count())
      df.groupBy("segment")
        .agg(sum("share_ppm").as("tot"), sum("cents").as("c"),
          max("decile").as("mx"), min("decile").as("mn"))
        .collect().foreach { r =>
          // Σ floor shares within |deciles| ppm of exactly 1e6
          assert(r.getLong(1) > 1000000L - 11 && r.getLong(1) <= 1000000L)
          assert(r.getLong(3) >= 1L && r.getLong(3) <= 10L)
        }
      // decile 10 (top) outearns decile 1 in every segment
      val top = df.where(col("decile") === 10)
        .select(col("segment"), col("cents").as("top_c"))
      val bot = df.where(col("decile") === 1)
        .select(col("segment"), col("cents").as("bot_c"))
      assert(top.join(bot, "segment")
        .where(col("top_c") < col("bot_c")).count() == 0)
    } finally { df.unpersist(); () }
  }

  test("auc: rank-sum identity equals the O(n^2) pair definition") {
    val sc = Tables.embeddings(spark, dir)
      .select((col("label") >= 5).as("pos"),
        expr("aggregate(transform(cast(embedding as array<double>)," +
          " x -> cast(floor(x * 127.0D) as bigint)), 0L," +
          " (a, x) -> a + x)").as("score")).cache()
    try {
      val pos = sc.where(col("pos")).select(col("score").as("sp"))
      val neg = sc.where(!col("pos")).select(col("score").as("sn"))
      val pairs = pos.crossJoin(neg)
        .agg(sum(when(col("sp") > col("sn"), 2L)
          .when(col("sp") === col("sn"), 1L).otherwise(0L)).as("u2"),
          count(lit(1)).as("np_nn"))
        .head()
      val expected = pairs.getLong(0) * 500000L / pairs.getLong(1)
      val r = run("q_ml_auc").head()
      assert(r.getLong(0) + r.getLong(1) == sc.count())
      assert(r.getLong(2) == expected,
        s"auc_ppm ${r.getLong(2)} != naive $expected")
    } finally { sc.unpersist(); () }
  }

  test("calibration: conservation and bucket-bounded means") {
    val rs = run("q_ml_calibration").collect()
    val total = rs.map(_.getLong(1)).sum
    assert(total == Tables.embeddings(spark, dir).count())
    rs.foreach { r =>
      val (b, n, np, ppm, milli) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np <= n && ppm >= 0 && ppm <= 1000000L)
      // mean score lies inside the bucket's value range
      val lo = b * 1024 - 8192
      assert(milli >= lo * 1000 - 1000 && milli < (lo + 1024) * 1000,
        s"bucket $b mean $milli outside [$lo, ${lo + 1024})")
    }
  }

  test("cohort: event conservation, users partition into cohorts at age 0") {
    val df = run("q_events_cohort").cache()
    try {
      val ev = Tables.events(spark, dir)
      assert(df.agg(sum("n_events")).head().getLong(0) == ev.count())
      assert(df.where(col("age_wk") < 0).count() == 0)
      val age0Users = df.where(col("age_wk") === 0)
        .agg(sum("n_users")).head().getLong(0)
      val distinctUsers = ev.select("user_id").distinct().count()
      assert(age0Users == distinctUsers,
        "every user appears in exactly one cohort at age 0")
    } finally { df.unpersist(); () }
  }

  test("resample: order conservation and OHLC range sanity") {
    val df = run("q_time_resample").cache()
    try {
      val o = Tables.orders(spark, dir)
      assert(df.agg(sum("n_orders")).head().getLong(0) == o.count())
      assert(df.where(col("open_cents") < col("lo_cents") ||
        col("open_cents") > col("hi_cents") ||
        col("close_cents") < col("lo_cents") ||
        col("close_cents") > col("hi_cents")).count() == 0)
      assert(df.where(col("week_idx") < 0).count() == 0)
      val vol = df.agg(sum("vol_cents")).head().getLong(0)
      val direct = o.agg(sum(expr(
        "cast(round(o_totalprice * 100) as bigint)"))).head().getLong(0)
      assert(vol == direct, "weekly volumes conserve total cents")
    } finally { df.unpersist(); () }
  }

  test("skewkurt: mean matches avg(quantity); moments in sane ranges") {
    val rs = run("q_agg_skewkurt").collect()
    assert(rs.map(_.getString(0)).toSet.subsetOf(Set("A", "N", "R")))
    rs.foreach { r =>
      val flag = r.getString(0)
      val direct = Tables.lineitem(spark, dir)
        .where(col("l_returnflag") === flag)
        .agg(avg("l_quantity")).head().getDouble(0)
      assert(math.abs(r.getDouble(2) - direct) < 1e-4,
        s"$flag mean_qty ${r.getDouble(2)} vs $direct")
      // uniform-ish 1..50 quantities: skew near 0, platykurtic
      assert(math.abs(r.getDouble(3)) < 0.5, s"$flag skew ${r.getDouble(3)}")
      val k = r.getDouble(4)
      assert(k > -2.0 && k < 1.0, s"$flag kurtosis_ex $k")
    }
  }
}
