package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.49 round-14 batch 4 — feature-screening and eval-statistics
  * closers: mutual information, WoE/IV encoding, log-loss, the
  * Mann-Whitney U test, Cramér's V, and the deterministic
  * reservoir-style uniform sampler. Every key oracle-exact: integer
  * counts everywhere, ln only at the final rendering (the
  * q_agg_entropy ordered-fold discipline), and banded prefix sums
  * instead of global windows.
  */
object Pipeline36 extends graft.QueryModule {

  /** MUTUAL INFORMATION feature screening — MI(feature; label) in
    * nats for three categorical lineitem features (returnflag,
    * linestatus, ship-year) against the binary deep-discount label
    * (discount ≥ 5%): the information-theoretic sibling of the
    * chi-square (q_ml_chisq) / ANOVA (q_ml_anova_select) / variance
    * (q_ml_variance_selector) screening rungs. All counts exact
    * integers from ONE hash agg over the 3-way unpivoted scan; MI is
    * Σ (n_xy/n)·ln(n·n_xy/(n_x·n_y)) folded in sorted (value, label)
    * order (the q_agg_entropy determinism pattern) and rounded once.
    *
    * 100 TB: the only full-data pass is the map-side-partial count agg
    * over the exploded (feature, value, label) triples (3 rows per
    * input row, still one shuffle of a ≤42-cell frame); marginals and
    * the fold run on that support-sized cell frame via broadcast
    * joins. */
  def mlMutualInfo(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      expr("cast(round(l_discount * 100) as bigint) >= 5").as("y"),
      col("l_returnflag"), col("l_linestatus"),
      year(col("l_shipdate")).cast("string").as("shipyear"))
    // r16: stack() instead of explode(map(...)) — same three rows per
    // input row without building a per-row ArrayBasedMapData
    val long = li.selectExpr("y",
        "stack(3, 'returnflag', l_returnflag," +
          " 'linestatus', l_linestatus," +
          " 'shipyear', shipyear) as (feature, v)")
    val cells = long.groupBy("feature", "v", "y")
      .agg(count(lit(1)).as("nxy"))
    val tot = cells.groupBy("feature").agg(sum("nxy").as("n"))
    val nx = cells.groupBy("feature", "v").agg(sum("nxy").as("nx"))
    val ny = cells.groupBy("feature", "y").agg(sum("nxy").as("ny"))
    cells.join(broadcast(tot), "feature")
      .join(broadcast(nx), Seq("feature", "v"))
      .join(broadcast(ny), Seq("feature", "y"))
      .groupBy("feature")
      .agg(max("n").as("n"),
        countDistinct("v").as("n_values"),
        expr("aggregate(array_sort(collect_list(struct(v, y," +
          " cast(nxy as double) * ln(cast(n as double) * nxy" +
          " / (cast(nx as double) * ny)) as t)))," +
          " cast(0 as double), (a, x) -> a + x.t)").as("s"))
      .select(col("feature"), col("n"), col("n_values"),
        round(col("s") / col("n"), 6).as("mi_nats"))
      .orderBy("feature")
  }

  /** WEIGHT OF EVIDENCE + INFORMATION VALUE — the credit-scoring /
    * feature-encoding standard for a categorical predictor against a
    * binary outcome: per order priority, WoE = ln of the good/bad
    * distribution ratio (+0.5 Laplace smoothing on the cell counts —
    * the documented zero-cell guard) and its IV contribution
    * (dist_good − dist_bad)·WoE. Outcome: order finished ('F').
    * Counts exact from one hash agg; the per-category ln/product
    * renders once, rounded to 6.
    *
    * 100 TB: one map-side-partial count agg over the scan; the 5-row
    * (priority × counts) frame crosses with the 1-row totals — no
    * windows, no second full pass. */
  def mlWoeIv(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        (col("o_orderstatus") === "F").as("bad"))
      .groupBy("priority")
      .agg(sum(when(col("bad"), 0L).otherwise(1L)).as("n_good"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_bad"))
    val tot = cells.agg(sum("n_good").as("g"), sum("n_bad").as("b"))
    cells.crossJoin(broadcast(tot))
      .select(col("priority"), col("n_good"), col("n_bad"),
        round(expr("ln(((n_good + 0.5D) / g) / ((n_bad + 0.5D) / b))"),
          6).as("woe"),
        round(expr("(cast(n_good as double) / g" +
          " - cast(n_bad as double) / b)" +
          " * ln(((n_good + 0.5D) / g) / ((n_bad + 0.5D) / b))"), 6)
          .as("iv_contrib"))
      .orderBy("priority")
  }

  /** LOG-LOSS (binary cross-entropy) of the shared int8 embedding
    * score against the label — the proper-scoring-rule companion of
    * q_ml_brier_score on the SAME milli-grid probability map
    * (p_milli = ((score+8128)·1000) div 16256, clamped to [1, 999] so
    * ln never sees 0 or 1): LL = −Σ[y·ln p + (1−y)·ln(1−p)]/n. The
    * per-row terms group to the ≤999-value probability grid first, so
    * the double fold runs over a DOMAIN-bounded frame in sorted order
    * (deterministic on any partitioning), rounded once.
    *
    * 100 TB: one map-side-partial hash agg to the milli grid; the
    * ln fold touches ≤999 rows. */
  def mlLogLoss(s: SparkSession, dir: String): DataFrame =
    Pipeline12.scored(s, dir)
      .select(col("pos"),
        expr("greatest(1L, least(999L," +
          " ((score + 8128) * 1000) div 16256))").as("p_milli"))
      .groupBy("p_milli")
      .agg(count(lit(1)).as("nv"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("npv"))
      .agg(sum("nv").as("n"), sum("npv").as("n_pos"),
        expr("aggregate(array_sort(collect_list(struct(p_milli," +
          " npv * ln(p_milli / 1000.0D)" +
          " + (nv - npv) * ln(1.0D - p_milli / 1000.0D) as t)))," +
          " cast(0 as double), (a, x) -> a + x.t)").as("s"))
      .select(col("n"), col("n_pos"),
        round(-col("s") / col("n"), 6).as("log_loss"))

  /** MANN-WHITNEY U rank-sum test — purchase vs click event values
    * (cents grid): the nonparametric two-sample location test beside
    * the parametric q_ml_ab_ttest and distributional q_ml_ks_test.
    * Average ranks with EXACT tie handling, no global sort: values
    * group to the cents domain, the below-count prefix sum is the
    * banded machinery (graft.api.Dist.bandedCumSum — per-band windows
    * + broadcast band offsets), and the rank sum folds in exact
    * half-units (2·R1 = Σ n1v·(2·cum_below + t_v + 1), all integers in
    * decimal(38,0)). Normal approximation with the standard tie
    * correction; sigma/z render once, rounded to 6.
    *
    * 100 TB: one map-side-partial agg to the value domain; the banded
    * prefix sum shuffles the support-sized domain frame only. */
  def mlMannwhitney(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(s, dir)
      .where(col("event_type").isin("purchase", "click"))
      .select(expr("cast(round(value * 100) as bigint)").as("x"),
        (col("event_type") === "purchase").as("g1"))
      .groupBy("x")
      .agg(sum(when(col("g1"), 1L).otherwise(0L)).as("n1v"),
        sum(when(col("g1"), 0L).otherwise(1L)).as("n2v"),
        count(lit(1)).as("tv"))
    graft.api.Dist.bandedCumSum(g, Seq(), "x", bandWidth = 2000L,
        sumCols = Seq("tv"), inclusive = false)
      .agg(sum("n1v").as("n1"), sum("n2v").as("n2"),
        sum(expr("cast(n1v as decimal(38,0))" +
          " * (2 * cum_tv + tv + 1)")).as("r1h"),
        sum(expr("cast(tv as decimal(38,0)) * tv * tv - tv")).as("t3"))
      .select(col("n1"), col("n2"),
        expr("cast(r1h - cast(n1 as decimal(38,0)) * (n1 + 1)" +
          " as double) / 2").as("u1"),
        expr("cast(n1 as double) * n2 / 2").as("mu"),
        expr("sqrt(cast(n1 as double) * n2 / 12.0D" +
          " * ((n1 + n2 + 1) - cast(t3 as double)" +
          " / (cast(n1 + n2 as double) * (n1 + n2 - 1))))").as("sg"))
      .select(col("n1"), col("n2"), col("u1"), col("mu"),
        round(col("sg"), 6).as("sigma"),
        round((col("u1") - col("mu")) / col("sg"), 6).as("z"))
  }

  /** CRAMÉR'S V association strength for two categorical pairs —
    * (returnflag × linestatus) on lineitem and (status × priority) on
    * orders: the [0,1]-normalized effect size q_ml_chisq's raw χ²
    * lacks. Each cell's (n·o − r·c) numerator is EXACT in
    * decimal(38,0) and casts to double once; the ≤15-cell sum folds
    * in sorted (row, col) order (the q_agg_entropy determinism
    * pattern — decimal-div floors are NOT portable: Spark `div`
    * truncates, DuckDB decimal `//` rounds at result scale first);
    * χ² and V = √(χ²/(n·min(r−1, c−1))) render once, rounded to 6.
    *
    * 100 TB: one map-side-partial contingency agg per pair; the χ²
    * arithmetic runs on ≤15-cell frames with broadcast marginals. */
  def mlCramersV(s: SparkSession, dir: String): DataFrame = {
    def pair(df: DataFrame, name: String): DataFrame = {
      val cells = df.toDF("a", "b").groupBy("a", "b")
        .agg(count(lit(1)).as("o"))
      val ra = cells.groupBy("a").agg(sum("o").as("rx"))
      val cb = cells.groupBy("b").agg(sum("o").as("cy"))
      val tot = cells.agg(sum("o").as("n"),
        countDistinct("a").as("r"), countDistinct("b").as("c"))
      cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
        .crossJoin(broadcast(tot))
        .agg(max("n").as("n"), max("r").as("r"), max("c").as("c"),
          expr("aggregate(array_sort(collect_list(struct(a, b," +
            " pow(cast(cast(n as decimal(38,0)) * o" +
            " - cast(rx as decimal(38,0)) * cy as double), 2)" +
            " / (cast(n as double) * rx * cy) as t)))," +
            " cast(0 as double), (acc, x) -> acc + x.t)").as("chi2r"))
        .select(lit(name).as("pair"), col("n"), col("r"), col("c"),
          round(col("chi2r"), 6).as("chi2"),
          round(expr("sqrt(chi2r / (n * least(r - 1, c - 1)))"), 6)
            .as("v"))
    }
    val li = pair(Tables.lineitem(s, dir)
      .select("l_returnflag", "l_linestatus"), "lineitem_flag_status")
    val or = pair(Tables.orders(s, dir)
      .select("o_orderstatus", "o_orderpriority"),
      "orders_status_priority")
    li.unionAll(or).orderBy("pair")
  }

  /** DETERMINISTIC RESERVOIR SAMPLE — k = 50 rows per event type,
    * uniform without replacement, via the arithmetic-hash rank
    * (h = (1103515245·event_id + 12345) mod 2³¹−1; a keyed reservoir
    * and a top-k by random rank draw the same distribution, but the
    * hash rank is reproducible on any engine and any partitioning —
    * the §2.0.7 arithmetic-hash rule, same constants as the MinHash
    * perm table). The rank-filter plans as WindowGroupLimit: each map
    * task pre-prunes to 50 rows per type BEFORE the shuffle, so the
    * exchange carries ≤ 50·tasks·types rows, not the corpus.
    *
    * 100 TB: group-limit pushdown bounds the shuffle; the 5-type
    * window never sees more than 50 rows per task per type. */
  def sampleReservoir(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(col("h").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        expr("(1103515245L * event_id + 12345L) % 2147483647L").as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 50)
      .select(col("event_type"), col("rn"), col("event_id"), col("h"))
      .orderBy("event_type", "rn")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_mutual_info" -> mlMutualInfo,
    "q_ml_woe_iv" -> mlWoeIv,
    "q_ml_log_loss" -> mlLogLoss,
    "q_ml_mannwhitney" -> mlMannwhitney,
    "q_ml_cramers_v" -> mlCramersV,
    "q_sample_reservoir" -> sampleReservoir)

  def oracleSql: Map[String, String] = Map(
    "q_ml_mutual_info" ->
      """WITH base AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) >= 5 AS y,
        |    l_returnflag AS rf, l_linestatus AS ls,
        |    CAST(year(l_shipdate) AS VARCHAR) AS sy FROM lineitem),
        |long AS (
        |  SELECT 'returnflag' AS feature, rf AS v, y FROM base
        |  UNION ALL SELECT 'linestatus', ls, y FROM base
        |  UNION ALL SELECT 'shipyear', sy, y FROM base),
        |cells AS (SELECT feature, v, y, CAST(COUNT(*) AS BIGINT) AS nxy
        |          FROM long GROUP BY feature, v, y),
        |tot AS (SELECT feature, CAST(SUM(nxy) AS BIGINT) AS n
        |        FROM cells GROUP BY feature),
        |nx AS (SELECT feature, v, CAST(SUM(nxy) AS BIGINT) AS nx
        |       FROM cells GROUP BY feature, v),
        |ny AS (SELECT feature, y, CAST(SUM(nxy) AS BIGINT) AS ny
        |       FROM cells GROUP BY feature, y),
        |j AS (SELECT c.feature, c.v, c.y, c.nxy, t.n, nx.nx, ny.ny
        |      FROM cells c JOIN tot t USING (feature)
        |      JOIN nx USING (feature, v)
        |      JOIN ny ON ny.feature = c.feature AND ny.y = c.y)
        |SELECT feature, MAX(n) AS n,
        |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_values,
        |  ROUND(list_reduce(list(CAST(nxy AS DOUBLE)
        |      * ln(CAST(n AS DOUBLE) * nxy / (CAST(nx AS DOUBLE) * ny))
        |      ORDER BY v, y), (a, b) -> a + b) / MAX(n), 6) AS mi_nats
        |FROM j GROUP BY feature ORDER BY feature""".stripMargin,
    "q_ml_woe_iv" ->
      """WITH cells AS (SELECT o_orderpriority AS priority,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n_good,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_bad
        |  FROM orders GROUP BY priority),
        |tot AS (SELECT CAST(SUM(n_good) AS BIGINT) AS g,
        |               CAST(SUM(n_bad) AS BIGINT) AS b FROM cells)
        |SELECT priority, n_good, n_bad,
        |  ROUND(ln(((n_good + 0.5) / g) / ((n_bad + 0.5) / b)), 6)
        |    AS woe,
        |  ROUND((CAST(n_good AS DOUBLE) / g - CAST(n_bad AS DOUBLE) / b)
        |    * ln(((n_good + 0.5) / g) / ((n_bad + 0.5) / b)), 6)
        |    AS iv_contrib
        |FROM cells CROSS JOIN tot ORDER BY priority""".stripMargin,
    "q_ml_log_loss" ->
      """WITH sc AS (
        |  SELECT (label >= 5) AS pos,
        |    greatest(1, least(999,
        |      ((CAST(list_sum(list_transform(embedding::DOUBLE[],
        |          x -> CAST(floor(x * 127.0) AS BIGINT))) AS BIGINT)
        |        + 8128) * 1000) // 16256)) AS p_milli
        |  FROM embeddings),
        |g AS (SELECT p_milli, CAST(COUNT(*) AS BIGINT) AS nv,
        |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS npv
        |  FROM sc GROUP BY p_milli)
        |SELECT CAST(SUM(nv) AS BIGINT) AS n,
        |  CAST(SUM(npv) AS BIGINT) AS n_pos,
        |  ROUND(-list_reduce(list(npv * ln(p_milli / 1000.0)
        |      + (nv - npv) * ln(1.0 - p_milli / 1000.0)
        |      ORDER BY p_milli), (a, b) -> a + b) / SUM(nv), 6)
        |    AS log_loss
        |FROM g""".stripMargin,
    "q_ml_mannwhitney" ->
      """WITH base AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
        |    (event_type = 'purchase') AS g1 FROM events
        |  WHERE event_type IN ('purchase', 'click')),
        |g AS (SELECT x,
        |    CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1v,
        |    CAST(SUM(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS n2v,
        |    CAST(COUNT(*) AS BIGINT) AS tv FROM base GROUP BY x),
        |c AS (SELECT x, n1v, n2v, tv,
        |    CAST(COALESCE(SUM(tv) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_tv FROM g),
        |s AS (SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
        |    CAST(SUM(n2v) AS BIGINT) AS n2,
        |    SUM(CAST(n1v AS DECIMAL(38,0)) * (2 * cum_tv + tv + 1))
        |      AS r1h,
        |    SUM(CAST(tv AS DECIMAL(38,0)) * tv * tv - tv) AS t3
        |  FROM c),
        |u AS (SELECT n1, n2,
        |    CAST(r1h - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS DOUBLE)
        |      / 2 AS u1,
        |    CAST(n1 AS DOUBLE) * n2 / 2 AS mu,
        |    sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
        |      * ((n1 + n2 + 1) - CAST(t3 AS DOUBLE)
        |        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))) AS sg
        |  FROM s)
        |SELECT n1, n2, u1, mu, ROUND(sg, 6) AS sigma,
        |  ROUND((u1 - mu) / sg, 6) AS z FROM u""".stripMargin,
    "q_ml_cramers_v" -> {
      def pairSql(src: String, a: String, b: String, name: String) =
        s"""SELECT '$name' AS pair, n, r, c,
          |  ROUND(chi2r, 6) AS chi2,
          |  ROUND(sqrt(chi2r / (n * least(r - 1, c - 1))), 6) AS v
          |FROM (
          |  SELECT MAX(n) AS n, MAX(r) AS r, MAX(c) AS c,
          |    list_reduce(list(
          |      pow(CAST(CAST(n AS DECIMAL(38,0)) * o
          |        - CAST(rx AS DECIMAL(38,0)) * cy AS DOUBLE), 2)
          |      / (CAST(n AS DOUBLE) * rx * cy)
          |      ORDER BY a, b), (acc, x) -> acc + x) AS chi2r
          |  FROM (
          |    SELECT cells.a, cells.b, cells.o, ra.rx, cb.cy,
          |      tot.n, tot.r, tot.c
          |    FROM (SELECT $a AS a, $b AS b,
          |            CAST(COUNT(*) AS BIGINT) AS o
          |          FROM $src GROUP BY 1, 2) cells
          |    JOIN (SELECT $a AS a, CAST(COUNT(*) AS BIGINT) AS rx
          |          FROM $src GROUP BY 1) ra USING (a)
          |    JOIN (SELECT $b AS b, CAST(COUNT(*) AS BIGINT) AS cy
          |          FROM $src GROUP BY 1) cb USING (b)
          |    CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |        CAST(COUNT(DISTINCT $a) AS BIGINT) AS r,
          |        CAST(COUNT(DISTINCT $b) AS BIGINT) AS c
          |      FROM $src) tot))""".stripMargin
      pairSql("lineitem", "l_returnflag", "l_linestatus",
        "lineitem_flag_status") + "\nUNION ALL\n" +
        pairSql("orders", "o_orderstatus", "o_orderpriority",
          "orders_status_priority") + "\nORDER BY pair"
    },
    "q_sample_reservoir" ->
      """SELECT event_type, rn, event_id, h FROM (
        |  SELECT event_type, event_id, h,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY h, event_id) AS BIGINT) AS rn
        |  FROM (SELECT event_type, event_id,
        |      CAST((1103515245 * event_id + 12345) % 2147483647
        |        AS BIGINT) AS h FROM events))
        |WHERE rn <= 50 ORDER BY event_type, rn""".stripMargin)
}
