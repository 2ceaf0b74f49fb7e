package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.41 round-13 batch 4 — readouts OVER the round's own structures
  * plus two profile staples: decomposition strength scores (scoring
  * the SAME q_time_decompose build), per-edge neighborhood Jaccard
  * (over the SAME triangle enumeration as the clustering
  * coefficient), an inter-arrival gap profile, a kNN classifier
  * evaluator on the exact cosine path, and the new-vs-returning
  * user growth profile. Four of five exactly oracle-able (kNN too —
  * five of five).
  */
object Pipeline28 extends graft.QueryModule {

  /** SEASONAL / TREND STRENGTH per event type — the classical
    * decomposition-quality scores (F_seas = 1 − Var(resid)/
    * Var(seas+resid), F_trend = 1 − Var(resid)/Var(trend+resid),
    * clamped at 0) over the SAME gap-filled decomposition
    * q_time_decompose reports (shared Pipeline27.decomposeParts), in
    * exact integers: on full-window days, resid = v − trend − seas,
    * deseasonalized = v − trend, detrended = v − seas; each variance
    * is the scale-free integer moment n·Σx² − (Σx)² in decimal(38,0)
    * (order-free, no division until the final ratio), and
    * strength_ppm = greatest(0, 1e6 − (1e6·Vr) div Vx) — both
    * engines share the truncation and the clamp.
    *
    * 100 TB: one moment hash agg over the support-sized (type × day)
    * decomposition frame; everything else is |types|-row arithmetic. */
  def timeSeasonalStrength(s: SparkSession, dir: String): DataFrame =
    Pipeline27.decomposeParts(s, dir)
      .where(col("trend").isNotNull)
      .select(col("event_type"),
        expr("cast(v - trend - seas as decimal(38,0))").as("r"),
        expr("cast(v - trend as decimal(38,0))").as("sr"),
        expr("cast(v - seas as decimal(38,0))").as("tr"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("r").as("s_r"), sum(expr("r * r")).as("q_r"),
        sum("sr").as("s_sr"), sum(expr("sr * sr")).as("q_sr"),
        sum("tr").as("s_tr"), sum(expr("tr * tr")).as("q_tr"))
      .select(col("event_type"), col("n").as("n_full"),
        expr("case when n * q_sr - s_sr * s_sr > 0 then" +
          " greatest(cast(0 as bigint), cast(1000000 -" +
          " (1000000 * (n * q_r - s_r * s_r))" +
          " div (n * q_sr - s_sr * s_sr) as bigint)) end")
          .as("seas_strength_ppm"),
        expr("case when n * q_tr - s_tr * s_tr > 0 then" +
          " greatest(cast(0 as bigint), cast(1000000 -" +
          " (1000000 * (n * q_r - s_r * s_r))" +
          " div (n * q_tr - s_tr * s_tr) as bigint)) end")
          .as("trend_strength_ppm"))
      .orderBy("event_type")

  /** PER-EDGE NEIGHBORHOOD JACCARD over the stored ≥8-band graph —
    * the structural-similarity score of each candidate PAIR (the
    * link-prediction measure q_graph_common_neighbors ranks
    * NON-edges by, here resolved for the edges themselves): for each
    * stored pair, |N(u)∩N(v)| is the edge's triangle count from the
    * SAME degree-oriented enumeration as the clustering coefficient
    * (shared Pipeline27.triParts — each triangle explodes to its 3
    * id-normalized edges), and
    * jaccard_ppm = 1e6·cn div (deg(u)+deg(v)−2−cn) (NULL when the
    * union is empty — a mutually-isolated pair).
    *
    * 100 TB: the enumeration is the O(m^1.5) oriented wedge join;
    * the edge explode is 3× the triangle count; degree attaches are
    * support-frame equi-joins. */
  def graphEdgeJaccard(s: SparkSession, dir: String): DataFrame = {
    val (pairs, deg, tri) = Pipeline27.triParts(s, dir)
    val edges = tri.select(least(col("a"), col("b")).as("d1"),
        greatest(col("a"), col("b")).as("d2"))
      .unionAll(tri.select(least(col("a"), col("c")).as("d1"),
        greatest(col("a"), col("c")).as("d2")))
      .unionAll(tri.select(col("b").as("d1"), col("c").as("d2")))
      .groupBy("d1", "d2").agg(count(lit(1)).as("cn"))
    pairs.join(edges, Seq("d1", "d2"), "left")
      .withColumn("cn", coalesce(col("cn"), lit(0L)))
      .join(deg.select(col("n").as("d1"), col("dg").as("dg1")), "d1")
      .join(deg.select(col("n").as("d2"), col("dg").as("dg2")), "d2")
      .select(col("d1"), col("d2"), col("cn").as("common_neighbors"),
        col("dg1").as("deg1"), col("dg2").as("deg2"),
        when(expr("dg1 + dg2 - 2 - cn") > 0,
          expr("(1000000 * cn) div (dg1 + dg2 - 2 - cn)"))
          .as("jaccard_ppm"))
      .orderBy("d1", "d2")
  }

  /** INTER-ARRIVAL GAP PROFILE per event type — the traffic-shape
    * staple beside q_events_anomaly's rate z-scores: per-user gap
    * between consecutive events (µs — integer-exact, no unit
    * truncation), then per type the gap count, truncating mean, and
    * exact p50/p90/max by the q_agg_trimmed ceil-rank discipline
    * (rank (p·n+99) div 100 over a per-type sort window — the exact
    * twin; at 100 TB the KLL sketch path is the documented swap, the
    * trimmed/outliers precedent).
    *
    * 100 TB: the lag window partitions by (type, user) — row-scale
    * but key-parallel; the rank window is the exact-percentile dial
    * documented above. */
  def eventsInterarrival(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy("event_type", "user_id")
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"), col("ts"),
        col("event_id"))
      .withColumn("gap_us",
        expr("unix_micros(ts)") - lag(expr("unix_micros(ts)"), 1).over(wu))
      .where(col("gap_us").isNotNull)
    val n = gaps.groupBy("event_type").agg(count(lit(1)).as("n_gaps"),
      sum("gap_us").as("s"), max("gap_us").as("max_us"))
    val wr = Window.partitionBy("event_type").orderBy("gap_us")
    gaps.select(col("event_type"), col("gap_us"))
      .withColumn("rk", row_number().over(wr))
      .join(broadcast(n), "event_type")
      .groupBy(col("event_type"), col("n_gaps"), col("s"), col("max_us"))
      .agg(min(when(col("rk") === expr("(50 * n_gaps + 99) div 100"),
          col("gap_us"))).as("p50_us"),
        min(when(col("rk") === expr("(90 * n_gaps + 99) div 100"),
          col("gap_us"))).as("p90_us"))
      .select(col("event_type"), col("n_gaps"),
        expr("s div n_gaps").as("mean_us"), col("p50_us"),
        col("p90_us"), col("max_us"))
      .orderBy("event_type")
  }

  /** kNN CLASSIFIER EVALUATOR (k = 5, cosine) — the instance-based
    * classifier beside the parametric eval family (LR, trees, NB,
    * SVC): for the 20 probe vectors, the 5 nearest neighbors by the
    * EXACT cosine path (q_sim_cosine_topk's plan — norms once,
    * native graft_dot, round 6 dp, vec_id tie-break), majority label
    * with (votes desc, label asc) tie-break, compared to the probe's
    * own label. Fully oracle-able — the one ML evaluator with an
    * exact SQL twin end to end.
    *
    * 100 TB: probes broadcast, corpus side one scan (the cosine_topk
    * bound); vote windows run on the ≤100-row candidate frame. */
  def mlKnnEval(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("e2"))
      .withColumn("n2", expr("sqrt(graft_dot(e2, e2))"))
    val pr = all.where(col("vec_id") <= 20)
      .select(col("vec_id").as("probe_id"), col("label").as("plabel"),
        col("e2").as("e1"), col("n2").as("n1"))
    val nn = all.crossJoin(broadcast(pr))
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        round(expr("graft_dot(e1, e2)") / (col("n1") * col("n2")), 6))
      .withColumn("rn", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("cos").desc, col("vec_id").asc)))
      .where(col("rn") <= 5)
    val votes = nn.groupBy("probe_id", "plabel", "label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("votes").desc, col("label").asc)))
      .where(col("vr") === 1)
    votes.select(col("probe_id"),
        col("plabel").cast("long").as("label"),
        col("label").cast("long").as("pred_label"), col("votes"),
        (col("plabel") === col("label")).as("correct"))
      .orderBy("probe_id")
  }

  /** NEW vs RETURNING USERS per active day — the growth-accounting
    * profile beside q_events_dau_mau: per calendar day with activity,
    * distinct actives, the users whose FIRST-ever activity is that
    * day, the returning remainder, and the new share in exact ppm.
    *
    * 100 TB: one distinct (user, day) shuffle, one per-user min agg;
    * the day-level join runs on support-sized frames — no window, no
    * funnel, no BNLJ. */
  def eventsNewReturning(s: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .localCheckpoint() // two consumers: dau + first-day frame
    val dau = act.groupBy("d").agg(count(lit(1)).as("dau"))
    val firsts = act.groupBy("user_id").agg(min("d").as("d"))
      .groupBy("d").agg(count(lit(1)).as("new_users"))
    dau.join(firsts, Seq("d"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .select(col("d").as("day"), col("dau"), col("new_users"),
        expr("dau - new_users").as("returning"),
        expr("(1000000 * new_users) div dau").as("new_share_ppm"))
      .orderBy("day")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_seasonal_strength" -> timeSeasonalStrength,
    "q_graph_edge_jaccard" -> graphEdgeJaccard,
    "q_events_interarrival" -> eventsInterarrival,
    "q_ml_knn_eval" -> mlKnnEval,
    "q_events_new_returning" -> eventsNewReturning)

  /** The decompose CTE chain (daily..seas + the joined frame) — the
    * single source shared with q_time_decompose's oracle body. */
  private val decomposeCte: String =
    """daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
      |    SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
      |bounds AS (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
      |           FROM daily GROUP BY event_type),
      |spine AS (SELECT event_type,
      |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
      |  FROM bounds),
      |filled AS (SELECT s.event_type, s.d, COALESCE(daily.v, 0) AS v
      |  FROM spine s LEFT JOIN daily
      |    ON daily.event_type = s.event_type AND daily.d = s.d),
      |wtr AS (SELECT event_type, d, v, isodow(d) - 1 AS wd,
      |    SUM(v) OVER w AS s7, COUNT(*) OVER w AS c7
      |  FROM filled WINDOW w AS (PARTITION BY event_type ORDER BY d
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |wtr2 AS (SELECT event_type, d, wd, v,
      |    CASE WHEN c7 = 7 THEN s7 // 7 END AS trend,
      |    CASE WHEN c7 = 7 THEN 7 * v - s7 END AS detr7
      |  FROM wtr),
      |seas AS (SELECT event_type, wd,
      |    CAST(CASE WHEN SUM(detr7) >= 0
      |      THEN SUM(detr7) // (7 * COUNT(*))
      |      ELSE -((-SUM(detr7)) // (7 * COUNT(*))) END AS BIGINT)
      |      AS seas
      |  FROM wtr2 WHERE detr7 IS NOT NULL GROUP BY event_type, wd)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_time_seasonal_strength" -> ("WITH " + decomposeCte + ",\n" +
      """base AS (SELECT w.event_type,
        |    CAST(w.v - w.trend - s.seas AS HUGEINT) AS r,
        |    CAST(w.v - w.trend AS HUGEINT) AS sr,
        |    CAST(w.v - s.seas AS HUGEINT) AS tr
        |  FROM wtr2 w JOIN seas s
        |    ON s.event_type = w.event_type AND s.wd = w.wd
        |  WHERE w.trend IS NOT NULL),
        |m AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(r) AS s_r, SUM(r * r) AS q_r,
        |    SUM(sr) AS s_sr, SUM(sr * sr) AS q_sr,
        |    SUM(tr) AS s_tr, SUM(tr * tr) AS q_tr
        |  FROM base GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n_full,
        |  CASE WHEN n * q_sr - s_sr * s_sr > 0 THEN
        |    GREATEST(CAST(0 AS BIGINT), CAST(1000000 -
        |      (1000000 * (n * q_r - s_r * s_r))
        |      // (n * q_sr - s_sr * s_sr) AS BIGINT)) END
        |    AS seas_strength_ppm,
        |  CASE WHEN n * q_tr - s_tr * s_tr > 0 THEN
        |    GREATEST(CAST(0 AS BIGINT), CAST(1000000 -
        |      (1000000 * (n * q_r - s_r * s_r))
        |      // (n * q_tr - s_tr * s_tr) AS BIGINT)) END
        |    AS trend_strength_ppm
        |FROM m ORDER BY event_type""".stripMargin),
    "q_graph_edge_jaccard" -> (Pipeline23.pairsHead + ",\n" +
      """deg AS (SELECT src AS n, CAST(COUNT(*) AS BIGINT) AS dg
        |        FROM e0 GROUP BY src),
        |ori AS (SELECT CASE WHEN a.dg < b.dg
        |                 OR (a.dg = b.dg AND p.d1 < p.d2)
        |               THEN p.d1 ELSE p.d2 END AS src,
        |               CASE WHEN a.dg < b.dg
        |                 OR (a.dg = b.dg AND p.d1 < p.d2)
        |               THEN p.d2 ELSE p.d1 END AS dst
        |        FROM pairs p JOIN deg a ON a.n = p.d1
        |        JOIN deg b ON b.n = p.d2),
        |tr AS (SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
        |       FROM ori o1 JOIN ori o2
        |         ON o2.src = o1.src AND o1.dst < o2.dst
        |       JOIN pairs p3 ON p3.d1 = o1.dst AND p3.d2 = o2.dst),
        |ed AS (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS cn FROM (
        |    SELECT LEAST(a, b) AS d1, GREATEST(a, b) AS d2 FROM tr
        |    UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM tr
        |    UNION ALL SELECT b, c FROM tr) GROUP BY d1, d2)
        |SELECT p.d1, p.d2,
        |  CAST(COALESCE(ed.cn, 0) AS BIGINT) AS common_neighbors,
        |  a.dg AS deg1, b.dg AS deg2,
        |  CASE WHEN a.dg + b.dg - 2 - COALESCE(ed.cn, 0) > 0 THEN
        |    CAST((1000000 * COALESCE(ed.cn, 0))
        |      // (a.dg + b.dg - 2 - COALESCE(ed.cn, 0)) AS BIGINT) END
        |    AS jaccard_ppm
        |FROM pairs p
        |LEFT JOIN ed ON ed.d1 = p.d1 AND ed.d2 = p.d2
        |JOIN deg a ON a.n = p.d1 JOIN deg b ON b.n = p.d2
        |ORDER BY p.d1, p.d2""".stripMargin),
    "q_events_interarrival" ->
      """WITH g AS (SELECT event_type,
        |    date_diff('microsecond',
        |      lag(ts) OVER (PARTITION BY event_type, user_id
        |                    ORDER BY ts, event_id), ts) AS gap_us
        |  FROM events),
        |gg AS (SELECT event_type, gap_us,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY gap_us) AS rk
        |  FROM g WHERE gap_us IS NOT NULL),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |    SUM(CAST(gap_us AS HUGEINT)) AS s,
        |    CAST(MAX(gap_us) AS BIGINT) AS max_us
        |  FROM gg GROUP BY event_type)
        |SELECT n.event_type, n.n_gaps,
        |  CAST(n.s // n.n_gaps AS BIGINT) AS mean_us,
        |  CAST(MIN(CASE WHEN gg.rk = (50 * n.n_gaps + 99) // 100
        |    THEN gg.gap_us END) AS BIGINT) AS p50_us,
        |  CAST(MIN(CASE WHEN gg.rk = (90 * n.n_gaps + 99) // 100
        |    THEN gg.gap_us END) AS BIGINT) AS p90_us,
        |  n.max_us
        |FROM gg JOIN n ON n.event_type = gg.event_type
        |GROUP BY n.event_type, n.n_gaps, n.s, n.max_us
        |ORDER BY n.event_type""".stripMargin,
    "q_ml_knn_eval" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |nn AS (SELECT probe_id, plabel, label FROM (
        |    SELECT p.vec_id AS probe_id, p.label AS plabel,
        |      a.label AS label,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |        ORDER BY ROUND(list_cosine_similarity(p.v, a.v), 6)
        |          DESC, a.vec_id ASC) AS rn
        |    FROM e p JOIN e a
        |      ON p.vec_id <= 20 AND a.vec_id <> p.vec_id)
        |  WHERE rn <= 5),
        |v AS (SELECT probe_id, plabel, label,
        |    CAST(COUNT(*) AS BIGINT) AS votes,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id
        |      ORDER BY COUNT(*) DESC, label ASC) AS vr
        |  FROM nn GROUP BY probe_id, plabel, label)
        |SELECT probe_id, CAST(plabel AS BIGINT) AS label,
        |  CAST(v.label AS BIGINT) AS pred_label, votes,
        |  plabel = v.label AS correct
        |FROM v WHERE vr = 1 ORDER BY probe_id""".stripMargin,
    "q_events_new_returning" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |             FROM events),
        |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau
        |        FROM act GROUP BY d),
        |fs AS (SELECT user_id, MIN(d) AS d FROM act GROUP BY user_id),
        |nw AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users
        |       FROM fs GROUP BY d)
        |SELECT dau.d AS day, dau.dau,
        |  CAST(COALESCE(nw.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(dau.dau - COALESCE(nw.new_users, 0) AS BIGINT)
        |    AS returning,
        |  CAST((1000000 * COALESCE(nw.new_users, 0)) // dau.dau
        |    AS BIGINT) AS new_share_ppm
        |FROM dau LEFT JOIN nw ON nw.d = dau.d
        |ORDER BY day""".stripMargin)
}
