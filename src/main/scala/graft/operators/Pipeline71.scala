package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.66 round-15 batch 39 — SQL-semantics and data-quality closers:
  * the null-aware anti join (NOT IN's three-valued-logic trap as a
  * physical plan), population stability index (the industry drift
  * readout beside the KS matrix), functional-dependency profiling,
  * the Kruskal-Wallis k-group rank test (Mann-Whitney's
  * generalization), and expected calibration error (the one-number
  * readout of the calibration table).
  */
object Pipeline71 extends graft.QueryModule {

  /** NULL-AWARE ANTI JOIN — `NOT IN (subquery)` over a NULLABLE key,
    * the three-valued-logic trap every SQL engine must honor: one
    * NULL in the subquery makes NOT IN never-true (x <> NULL is
    * UNKNOWN), so variant "with_null" returns 0 rows while the
    * same-shaped "no_null" variant returns the real anti count.
    * Catalyst compiles the nullable NOT IN to a BROADCAST HASH join
    * with isNullAwareAntiJoin=true (Pipeline71Spec pins it) — the
    * single-column NAAJ fast path, NOT a nested-loop scan of the
    * negated disjunction.
    *
    * 100 TB: the dim side (rich customers) broadcasts — NAAJ
    * requires a broadcast build side by contract, and the build is
    * the small filtered key set; the fact side streams with no
    * shuffle. */
  def joinNullAwareAnti(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_naaj_orders")
    Tables.customer(s, dir).createOrReplaceTempView("graft_naaj_customer")
    s.sql(
      """SELECT 'no_null' AS variant, COUNT(*) AS n_orders
        |FROM graft_naaj_orders
        |WHERE o_custkey NOT IN
        |  (SELECT CASE WHEN c_acctbal < -1e18 THEN NULL
        |               ELSE c_custkey END
        |   FROM graft_naaj_customer WHERE c_acctbal >= 5000)
        |UNION ALL
        |SELECT 'with_null', COUNT(*)
        |FROM graft_naaj_orders
        |WHERE o_custkey NOT IN
        |  (SELECT CASE WHEN c_acctbal < 0 THEN NULL
        |               ELSE c_custkey END
        |   FROM graft_naaj_customer WHERE c_acctbal >= 5000
        |      OR c_acctbal < 0)
        |ORDER BY variant""".stripMargin)
  }

  /** POPULATION STABILITY INDEX of the order-total distribution,
    * reference period (orderdate < 1998-01-01) vs current: PSI =
    * Σ_bins (p−q)·ln(p/q) over 10 fixed 50k-dollar bands with +1
    * Laplace smoothing (no empty-bin ln(0), deterministic).
    * Bin counts are exact integers; p, q and each term are fixed
    * per-bin double dags; the TOTAL folds bin-ordered (the levene
    * idiom — never an order-dependent double SUM).
    *
    * 100 TB: one map-side-partial hash agg to (bin, period) counts;
    * everything after runs on the 10-row bin frame. */
  def mlPsi(s: SparkSession, dir: String): DataFrame = {
    val bins = Tables.orders(s, dir)
      .select(least(expr("cast(round(o_totalprice * 100) as bigint)" +
          " div 5000000"), lit(9L)).as("bin"),
        (col("o_orderdate") < lit("1998-01-01").cast("date")).as("ref"))
      .groupBy("bin")
      .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("ref"), 0L).otherwise(1L)).as("n_cur"))
    val tot = bins.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"),
      count(lit(1)).as("b"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        expr("(cast(n_ref + 1 as double) / (tr + b))").as("p"),
        expr("(cast(n_cur + 1 as double) / (tc + b))").as("q"))
      .withColumn("term", expr("(p - q) * ln(p / q)"))
      .groupBy()
      .agg(expr("array_sort(collect_list(struct(bin, n_ref, n_cur," +
        " term)))").as("l"))
      .select(explode(col("l")).as("x"),
        expr("aggregate(l, 0D, (a, e) -> a + e.term)").as("psit"))
      .select(expr("x.bin").as("bin"), expr("x.n_ref").as("n_ref"),
        expr("x.n_cur").as("n_cur"),
        round(expr("x.term"), 6).as("psi_term"),
        round(col("psit"), 6).as("psi_total"))
      .orderBy("bin")
  }

  /** FUNCTIONAL-DEPENDENCY PROFILE — does X determine Y? For each
    * declared candidate FD: |distinct X|, |distinct (X,Y)|, the
    * number of violating X groups (those seeing >1 distinct Y) and
    * the holds flag — the schema-inference primitive a data-quality
    * layer runs beside the q_profile_pk_check / referential-integrity
    * reports. Candidates span held (key → attribute) and violated
    * (attribute → attribute) cases so both branches are graded.
    *
    * 100 TB: each FD is one (X,Y) distinct-pair agg + one X-keyed
    * count agg — two shuffles on the declared key, map-side partial
    * both times. */
  def profileFdCheck(s: SparkSession, dir: String): DataFrame = {
    def fd(df: DataFrame, name: String): DataFrame = {
      val pairs = df.toDF("x", "y").distinct()
      val perX = pairs.groupBy("x").agg(count(lit(1)).as("ny"))
      perX.agg(lit(name).as("fd"),
        count(lit(1)).as("n_lhs"),
        sum("ny").as("n_pairs"),
        sum(when(col("ny") > 1, 1L).otherwise(0L)).as("n_violating_lhs"))
        .withColumn("holds", col("n_violating_lhs") === 0L)
    }
    Seq(
      fd(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        "orders: o_orderkey -> o_custkey"),
      fd(Tables.orders(s, dir).select("o_custkey", "o_orderpriority"),
        "orders: o_custkey -> o_orderpriority"),
      fd(Tables.nation(s, dir).select("n_nationkey", "n_regionkey"),
        "nation: n_nationkey -> n_regionkey"),
      fd(Tables.customer(s, dir).select("c_nationkey", "c_mktsegment"),
        "customer: c_nationkey -> c_mktsegment"),
      fd(Tables.lineitem(s, dir).select("l_partkey", "l_suppkey"),
        "lineitem: l_partkey -> l_suppkey"))
      .reduce(_.unionAll(_)).orderBy("fd")
  }

  /** KRUSKAL-WALLIS H — the k-group rank ANOVA (q_ml_mannwhitney's
    * generalization) of order totals across the 3 order statuses,
    * with tie correction. Average ranks come EXACT in half units
    * from the value-grouped frame (2·r̄_v = 2·cum_below + n_v + 1,
    * the mlAuc/mannwhitney identity); per-group rank sums S_g = 2·R_g
    * accumulate in decimal(38,0); H = 3/(N(N+1))·Σ S_g²/n_g − 3(N+1)
    * and the tie factor C = 1 − Σ(t³−t)/(N³−N) fold over the ≤3-row
    * group frame in status order (levene idiom). No global sort:
    * the cumulative-count scan is Dist.bandedCumSum (per-band window
    * + broadcast band offsets over the price-domain-bounded bands).
    *
    * 100 TB: one map-side-partial hash agg to the (cents, status)
    * value frame is the only full pass; the banded scan and the
    * 3-row folds bound everything after. */
  def mlKruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("x"),
        col("o_orderstatus").as("g"))
      .groupBy("x")
      .agg(sum(when(col("g") === "F", 1L).otherwise(0L)).as("nf"),
        sum(when(col("g") === "O", 1L).otherwise(0L)).as("no"),
        sum(when(col("g") === "P", 1L).otherwise(0L)).as("np"),
        count(lit(1)).as("tv"))
    val ranked = graft.api.Dist.bandedCumSum(cells, Seq(), "x",
      bandWidth = 5000000L, sumCols = Seq("tv"), inclusive = false)
    val g = ranked.agg(
      sum(expr("nf + no + np")).as("n"),
      sum("nf").as("n_f"), sum("no").as("n_o"), sum("np").as("n_p"),
      sum(expr("cast(nf as decimal(38,0)) * (2 * cum_tv + tv + 1)"))
        .as("sf"),
      sum(expr("cast(no as decimal(38,0)) * (2 * cum_tv + tv + 1)"))
        .as("so"),
      sum(expr("cast(np as decimal(38,0)) * (2 * cum_tv + tv + 1)"))
        .as("sp"),
      sum(expr("cast(tv as decimal(38,0)) * tv * tv - tv")).as("t3"))
    g.select(col("n"), col("n_f"), col("n_o"), col("n_p"),
        expr("3D / (cast(n as double) * (n + 1))" +
          " * (cast(sf as double) * cast(sf as double) / n_f" +
          "  + cast(so as double) * cast(so as double) / n_o" +
          "  + cast(sp as double) * cast(sp as double) / n_p)" +
          " - 3D * (n + 1)").as("h"),
        expr("1D - cast(t3 as double)" +
          " / (cast(n as double) * n * n - n)").as("c"))
      .select(col("n"), col("n_f"), col("n_o"), col("n_p"),
        lit(2L).as("df"),
        round(col("h"), 6).as("h"),
        round(col("h") / col("c"), 6).as("h_tie_adj"))
  }

  /** EXPECTED CALIBRATION ERROR of the int8 embedding score mapped
    * to [0,1] milli-probabilities (the q_ml_brier_decomposition
    * mapping, 10 bins): ECE = Σ (n_k/N)·|acc_k − conf_k| plus MCE =
    * max_k |acc_k − conf_k| — the one-number miscalibration readout
    * of the q_ml_calibration table. Bin sums exact integers; the
    * bin fold runs bin-ordered (levene idiom); MCE is an
    * order-independent max.
    *
    * 100 TB: one scored-frame pass to 10 bins; folds on the 10-row
    * frame. */
  def mlEce(s: SparkSession, dir: String): DataFrame = {
    val binned = Pipeline12.scored(s, dir)
      .select(expr("((score + 8128) * 1000) div 16256").as("p_milli"),
        when(col("pos"), 1L).otherwise(0L).as("y"))
      .select(col("p_milli"), col("y"),
        least(expr("p_milli div 100"), lit(9L)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("nk"), sum("p_milli").as("sp"),
        sum("y").as("sy"))
    binned.agg(sum("nk").as("n"), count(lit(1)).as("n_bins"),
        expr("array_sort(collect_list(struct(bin, nk, sp, sy)))").as("l"))
      .selectExpr("n", "n_bins",
        "round(aggregate(l, 0D, (a, x) -> a + x.nk * abs(" +
          "cast(x.sy as double) / x.nk" +
          " - cast(x.sp as double) / x.nk / 1000D)) / n, 6) as ece",
        "round(aggregate(l, 0D, (a, x) -> greatest(a, abs(" +
          "cast(x.sy as double) / x.nk" +
          " - cast(x.sp as double) / x.nk / 1000D))), 6) as mce")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_null_aware_anti" -> joinNullAwareAnti,
    "q_ml_psi" -> mlPsi,
    "q_profile_fd_check" -> profileFdCheck,
    "q_ml_kruskal_wallis" -> mlKruskalWallis,
    "q_ml_ece" -> mlEce)

  def oracleSql: Map[String, String] = Map(
    "q_join_null_aware_anti" ->
      """SELECT 'no_null' AS variant, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT CASE WHEN c_acctbal < -1e18 THEN NULL
        |               ELSE c_custkey END
        |   FROM customer WHERE c_acctbal >= 5000)
        |UNION ALL
        |SELECT 'with_null', CAST(COUNT(*) AS BIGINT)
        |FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT CASE WHEN c_acctbal < 0 THEN NULL
        |               ELSE c_custkey END
        |   FROM customer WHERE c_acctbal >= 5000 OR c_acctbal < 0)
        |ORDER BY variant""".stripMargin,
    "q_ml_psi" ->
      """WITH b AS (SELECT
        |    least(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000,
        |      9) AS bin,
        |    (o_orderdate < DATE '1998-01-01') AS ref
        |  FROM orders),
        |c AS (SELECT bin,
        |    CAST(SUM(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ref,
        |    CAST(SUM(CASE WHEN ref THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_cur
        |  FROM b GROUP BY bin),
        |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
        |    CAST(SUM(n_cur) AS BIGINT) AS tc,
        |    CAST(COUNT(*) AS BIGINT) AS nb FROM c),
        |terms AS (SELECT bin, n_ref, n_cur,
        |    (CAST(n_ref + 1 AS DOUBLE) / (tr + nb)
        |      - CAST(n_cur + 1 AS DOUBLE) / (tc + nb))
        |    * ln((CAST(n_ref + 1 AS DOUBLE) / (tr + nb))
        |        / (CAST(n_cur + 1 AS DOUBLE) / (tc + nb))) AS term
        |  FROM c CROSS JOIN t),
        |tot AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(term ORDER BY bin)), (a, x) -> a + x) AS psit
        |  FROM terms)
        |SELECT bin, n_ref, n_cur, ROUND(term, 6) AS psi_term,
        |  ROUND(psit, 6) AS psi_total
        |FROM terms CROSS JOIN tot ORDER BY bin""".stripMargin,
    "q_profile_fd_check" ->
      """WITH cand AS (
        |  SELECT 'orders: o_orderkey -> o_custkey' AS fd,
        |    o_orderkey AS x, CAST(o_custkey AS VARCHAR) AS y FROM orders
        |  UNION ALL
        |  SELECT 'orders: o_custkey -> o_orderpriority',
        |    o_custkey, o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT 'nation: n_nationkey -> n_regionkey',
        |    n_nationkey, CAST(n_regionkey AS VARCHAR) FROM nation
        |  UNION ALL
        |  SELECT 'customer: c_nationkey -> c_mktsegment',
        |    c_nationkey, c_mktsegment FROM customer
        |  UNION ALL
        |  SELECT 'lineitem: l_partkey -> l_suppkey',
        |    l_partkey, CAST(l_suppkey AS VARCHAR) FROM lineitem),
        |pairs AS (SELECT DISTINCT fd, x, y FROM cand),
        |perx AS (SELECT fd, x, CAST(COUNT(*) AS BIGINT) AS ny
        |  FROM pairs GROUP BY fd, x)
        |SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_lhs,
        |  CAST(SUM(ny) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_lhs,
        |  (SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END) = 0) AS holds
        |FROM perx GROUP BY fd ORDER BY fd""".stripMargin,
    "q_ml_kruskal_wallis" ->
      """WITH cells AS (SELECT
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nf,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_o,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(COUNT(*) AS BIGINT) AS tv
        |  FROM orders GROUP BY 1),
        |r AS (SELECT *,
        |    CAST(COALESCE(SUM(tv) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_tv
        |  FROM cells),
        |g AS (SELECT CAST(SUM(nf + n_o + np) AS BIGINT) AS n,
        |    CAST(SUM(nf) AS BIGINT) AS n_f,
        |    CAST(SUM(n_o) AS BIGINT) AS n_o,
        |    CAST(SUM(np) AS BIGINT) AS n_p,
        |    SUM(CAST(nf AS HUGEINT) * (2 * cum_tv + tv + 1)) AS sf,
        |    SUM(CAST(n_o AS HUGEINT) * (2 * cum_tv + tv + 1)) AS so,
        |    SUM(CAST(np AS HUGEINT) * (2 * cum_tv + tv + 1)) AS sp,
        |    SUM(CAST(tv AS HUGEINT) * tv * tv - tv) AS t3
        |  FROM r),
        |h AS (SELECT n, n_f, n_o, n_p,
        |    3.0 / (CAST(n AS DOUBLE) * (n + 1))
        |    * (CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE) / n_f
        |      + CAST(so AS DOUBLE) * CAST(so AS DOUBLE) / n_o
        |      + CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n_p)
        |    - 3.0 * (n + 1) AS hraw,
        |    1.0 - CAST(t3 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n * n - n) AS c
        |  FROM g)
        |SELECT n, n_f, n_o, n_p, CAST(2 AS BIGINT) AS df,
        |  ROUND(hraw, 6) AS h, ROUND(hraw / c, 6) AS h_tie_adj
        |FROM h""".stripMargin,
    "q_ml_ece" ->
      """WITH sc AS (
        |  SELECT (label >= 5) AS pos,
        |    CAST(list_sum(list_transform(embedding::DOUBLE[],
        |      x -> CAST(floor(x * 127.0) AS BIGINT))) AS BIGINT)
        |      AS score
        |  FROM embeddings),
        |p AS (SELECT ((score + 8128) * 1000) // 16256 AS p_milli,
        |    CASE WHEN pos THEN 1 ELSE 0 END AS y FROM sc),
        |b AS (SELECT least(p_milli // 100, 9) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS nk,
        |    CAST(SUM(p_milli) AS BIGINT) AS sp,
        |    CAST(SUM(y) AS BIGINT) AS sy
        |  FROM p GROUP BY 1),
        |t AS (SELECT CAST(SUM(nk) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_bins,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(nk * abs(CAST(sy AS DOUBLE) / nk
        |        - CAST(sp AS DOUBLE) / nk / 1000.0) ORDER BY bin)),
        |      (a, x) -> a + x) AS esum,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(abs(CAST(sy AS DOUBLE) / nk
        |        - CAST(sp AS DOUBLE) / nk / 1000.0) ORDER BY bin)),
        |      (a, x) -> greatest(a, x)) AS mce
        |  FROM b)
        |SELECT n, n_bins, ROUND(esum / n, 6) AS ece,
        |  ROUND(mce, 6) AS mce
        |FROM t""".stripMargin)
}
