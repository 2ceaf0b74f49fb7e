package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.50 round-14 batch 5 — corpus-statistics + feature-generation
  * closers: Zipf rank-frequency fit and hapax/type-token lexical
  * diversity (the two corpus-health diagnostics beside q_text_quality),
  * count-min sketch (the mergeable counter beside HLL/KLL/theta/freq),
  * calendar lag features (the time-series feature-gen every
  * forecasting pipeline runs), and URL parsing through Spark's real
  * parse_url against an independent regex oracle.
  */
object Pipeline37 extends graft.QueryModule {

  /** ZIPF RANK-FREQUENCY FIT — token frequencies ranked (no global
    * sort: the banded-rank machinery over an inverted-count key) and
    * the log-log OLS line fitted from four ordered folds over the
    * vocabulary frame (the q_agg_entropy determinism pattern): a
    * heavy-tailed natural corpus fits slope ≈ −1; the fixture's flat
    * 31-word vocabulary fits near 0 — exactly the diagnostic a corpus
    * health check wants (template/generated text shows as a Zipf
    * break). One row: type/token counts + slope/intercept.
    *
    * 100 TB: one tokenize + count agg is the only full-data pass;
    * ranking and the folds run on the vocabulary-sized frame
    * (banded, never SinglePartition). */
  def textZipf(s: SparkSession, dir: String): DataFrame = {
    val cnt = graft.api.Text.tokens(Tables.documents(s, dir),
        "doc_id", "text")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("nf", lit(1000000000L) - col("cnt"))
    val ranked = graft.api.Dist.bandedRank(cnt, Seq(), "nf", "token",
        bandWidth = 1048576L)
      .select(col("rank"), col("cnt"),
        log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    ranked
      .agg(count(lit(1)).as("n_types"), sum("cnt").as("n_tokens"),
        expr("array_sort(collect_list(struct(rank, x, y)))").as("l"))
      .selectExpr("n_types", "n_tokens",
        "aggregate(l, 0D, (a, s) -> a + s.x) as sx",
        "aggregate(l, 0D, (a, s) -> a + s.y) as sy",
        "aggregate(l, 0D, (a, s) -> a + s.x * s.y) as sxy",
        "aggregate(l, 0D, (a, s) -> a + s.x * s.x) as sxx")
      .selectExpr("n_types", "n_tokens",
        "round((n_types * sxy - sx * sy)" +
          " / (n_types * sxx - sx * sx), 6) as slope",
        "round((sy - (n_types * sxy - sx * sy)" +
          " / (n_types * sxx - sx * sx) * sx) / n_types, 6)" +
          " as intercept")
  }

  /** HAPAX / TYPE-TOKEN lexical diversity per source — token count,
    * type count, hapax count (within-source frequency 1), type-token
    * ratio and hapax share in exact ppm: the vocabulary-growth
    * (Heaps-law) health check — generated/boilerplate text shows as
    * collapsed TTR, scraped noise as inflated hapax share. All
    * integers.
    *
    * 100 TB: one tokenize pass → one (source, token) hash agg →
    * one source agg; nothing else touches the corpus. */
  def textHapax(s: SparkSession, dir: String): DataFrame =
    graft.api.Text.tokens(Tables.documents(s, dir), "doc_id", "text")
      .join(Tables.documents(s, dir).select("doc_id", "source"),
        "doc_id")
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"),
        expr("(1000000 * n_types) div n_tokens").as("ttr_ppm"),
        expr("(1000000 * n_hapax) div n_types").as("hapax_ppm"))
      .orderBy("source")

  /** COUNT-MIN SKETCH — the point-query counter sketch beside the
    * board's HLL (distinct), KLL (quantiles), theta (set ops) and
    * frequent-items rungs: depth 4 × width 64, rows hashed with the
    * §2.0.7 arithmetic perm constants over the SAME polynomial token
    * ids MinHash uses, counters folded from the vocabulary count
    * frame (weighted by token count — identical to per-occurrence
    * updates, one agg instead of 4× the corpus). Probes: the top-5
    * tokens; CMS estimate = min over rows, always ≥ exact
    * (one-sided error — the property the spec pins).
    *
    * 100 TB: the tokenize + count agg is the only full-data pass;
    * the 256-counter table and probes live on vocab-sized frames.
    * Counters are mergeable integer cells — shard-and-add, the same
    * ingest-once contract as the HLL/theta stores. */
  def aggCountmin(s: SparkSession, dir: String): DataFrame = {
    val cnt = graft.api.Text.tokens(Tables.documents(s, dir),
        "doc_id", "text")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("tid", graft.api.Text.polyHash("token"))
      .localCheckpoint(true)
    val hs = TextOps.permTable.take(4)
    val counters = cnt
      .select(explode(array(hs.map { case (j, a, b) =>
        struct(lit(j).as("j"),
          expr(s"((${a}L * tid + ${b}L) % 2147483647) % 64")
            .as("bucket"), col("cnt").as("c"))
      }: _*)).as("hb"))
      .groupBy(col("hb.j").as("j"), col("hb.bucket").as("bucket"))
      .agg(sum("hb.c").as("cell"))
    val top5 = cnt.orderBy(col("cnt").desc, col("token").asc).limit(5)
    top5
      .select(col("token"), col("cnt").as("exact"),
        explode(array(hs.map { case (j, a, b) =>
          struct(lit(j).as("j"),
            expr(s"((${a}L * tid + ${b}L) % 2147483647) % 64")
              .as("bucket"))
        }: _*)).as("pb"))
      .join(broadcast(counters),
        col("pb.j") === col("j") && col("pb.bucket") === col("bucket"))
      .groupBy("token")
      .agg(max("exact").as("exact"), min("cell").as("cms_est"))
      .select(col("token"), col("exact"), col("cms_est"),
        (col("cms_est") - col("exact")).as("overcount"))
      .orderBy("token")
  }

  /** CALENDAR LAG FEATURES — the per-entity time-series feature frame
    * every forecasting/training pipeline generates: per (user, day),
    * daily spend cents plus previous-day value, trailing-7-day sum
    * and active-day count (calendar RANGE frames — row-lag silently
    * skips gap days), and weekday (Monday = 0, the one day-numbering
    * both engines define identically). All integers.
    *
    * 100 TB: one daily agg pass; the windows partition by user_id —
    * bounded per-key state, no global sort. */
  def timeLagFeatures(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), expr("cast(ts as date)").as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("v_cents"))
      .withColumn("ed", expr("datediff(d, date'1970-01-01')").cast("long"))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ed").rangeBetween(-1, -1)
    val w7 = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ed").rangeBetween(-7, -1)
    daily.select(col("user_id"), col("d"), col("v_cents"),
        coalesce(sum("v_cents").over(w1), lit(0L)).as("prev_day_cents"),
        coalesce(sum("v_cents").over(w7), lit(0L)).as("prior7_cents"),
        count(lit(1)).over(w7).as("prior7_days"),
        expr("weekday(d)").cast("long").as("dow"))
      .orderBy("user_id", "d")
  }

  /** URL PARSING — Spark's real parse_url (codegen'd java.net.URI
    * semantics) over deterministic URLs synthesized from the document
    * frame, graded against an INDEPENDENT regex oracle: host, path,
    * and one query parameter. The web-corpus ingest primitive (URL
    * canonicalization, host-level dedup/quotas all start here).
    *
    * 100 TB: a pure narrow projection — no shuffle at all beyond the
    * final presentation sort. */
  def fnUrl(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id"), lit("?lang="), col("lang"), lit("&v="),
          col("n_chars")).as("url"))
      .select(col("doc_id"), col("url"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"),
        expr("parse_url(url, 'QUERY', 'v')").as("v_param"))
      .orderBy("doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_zipf" -> textZipf,
    "q_text_hapax" -> textHapax,
    "q_agg_countmin" -> aggCountmin,
    "q_time_lag_features" -> timeLagFeatures,
    "q_fn_url" -> fnUrl)

  private val tokensSql =
    """SELECT doc_id, tokens[s] AS token
      |FROM (SELECT doc_id, tokens, unnest(range(1, len(tokens)+1)) AS s
      |      FROM (SELECT doc_id, str_split(lower(text), ' ') AS tokens
      |            FROM documents))
      |WHERE tokens[s] <> ''""".stripMargin

  private def cmsHashValues: String =
    TextOps.permTable.take(4)
      .map { case (j, a, b) => s"($j, $a, $b)" }.mkString(", ")

  def oracleSql: Map[String, String] = Map(
    "q_text_zipf" ->
      s"""WITH cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |             FROM ($tokensSql) GROUP BY token),
        |ranked AS (SELECT cnt,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC)
        |      AS BIGINT) AS rank FROM cnt),
        |f AS (SELECT rank, cnt, ln(CAST(rank AS DOUBLE)) AS x,
        |             ln(CAST(cnt AS DOUBLE)) AS y FROM ranked),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        |    list_reduce(list(x ORDER BY rank), (a, b) -> a + b) AS sx,
        |    list_reduce(list(y ORDER BY rank), (a, b) -> a + b) AS sy,
        |    list_reduce(list(x * y ORDER BY rank), (a, b) -> a + b)
        |      AS sxy,
        |    list_reduce(list(x * x ORDER BY rank), (a, b) -> a + b)
        |      AS sxx
        |  FROM f)
        |SELECT n_types, n_tokens,
        |  ROUND((n_types * sxy - sx * sy)
        |    / (n_types * sxx - sx * sx), 6) AS slope,
        |  ROUND((sy - (n_types * sxy - sx * sy)
        |    / (n_types * sxx - sx * sx) * sx) / n_types, 6) AS intercept
        |FROM s""".stripMargin,
    "q_text_hapax" ->
      s"""WITH tok AS ($tokensSql),
        |st AS (SELECT d.source, t.token, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM tok t JOIN documents d USING (doc_id)
        |       GROUP BY d.source, t.token)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST((1000000 * COUNT(*)) // SUM(c) AS BIGINT) AS ttr_ppm,
        |  CAST((1000000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END))
        |    // COUNT(*) AS BIGINT) AS hapax_ppm
        |FROM st GROUP BY source ORDER BY source""".stripMargin,
    "q_agg_countmin" ->
      s"""WITH cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    ${TextOps.polyHashSql("token")} AS tid
        |  FROM ($tokensSql) GROUP BY token),
        |hashes(j, a, b) AS (VALUES $cmsHashValues),
        |counters AS (SELECT j,
        |    ((a * tid + b) % 2147483647) % 64 AS bucket,
        |    CAST(SUM(cnt) AS BIGINT) AS cell
        |  FROM cnt CROSS JOIN hashes GROUP BY j, bucket),
        |top5 AS (SELECT token, cnt AS exact, tid FROM cnt
        |         ORDER BY cnt DESC, token ASC LIMIT 5),
        |pb AS (SELECT t.token, t.exact, h.j,
        |    ((h.a * t.tid + h.b) % 2147483647) % 64 AS bucket
        |  FROM top5 t CROSS JOIN hashes h)
        |SELECT token, MAX(exact) AS exact,
        |  CAST(MIN(c.cell) AS BIGINT) AS cms_est,
        |  CAST(MIN(c.cell) - MAX(exact) AS BIGINT) AS overcount
        |FROM pb JOIN counters c USING (j, bucket)
        |GROUP BY token ORDER BY token""".stripMargin,
    "q_time_lag_features" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS v_cents
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |keyed AS (SELECT user_id, d, v_cents,
        |    CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT)
        |      AS ed FROM daily)
        |SELECT user_id, d, v_cents,
        |  CAST(COALESCE(SUM(v_cents) OVER (PARTITION BY user_id
        |    ORDER BY ed RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS prev_day_cents,
        |  CAST(COALESCE(SUM(v_cents) OVER (PARTITION BY user_id
        |    ORDER BY ed RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS prior7_cents,
        |  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ed
        |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
        |    AS prior7_days,
        |  CAST(isodow(d) - 1 AS BIGINT) AS dow
        |FROM keyed ORDER BY user_id, d""".stripMargin,
    "q_fn_url" ->
      """WITH u AS (SELECT doc_id,
        |    'https://' || source || '.example.com/docs/' || doc_id
        |      || '?lang=' || lang || '&v=' || n_chars AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  regexp_extract(url, 'https?://([^/]+)', 1) AS host,
        |  regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
        |  regexp_extract(url, '[?&]v=([^&]*)', 1) AS v_param
        |FROM u ORDER BY doc_id""".stripMargin)
}
