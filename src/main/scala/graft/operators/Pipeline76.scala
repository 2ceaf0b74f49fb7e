package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.71 round-15 batch 44 — classic-OLAP and systems closers: the
  * SKYLINE (Pareto-dominance frontier) query, bitmap-index exact
  * distinct counting (the word/bit trick warehouses use to make
  * COUNT DISTINCT mergeable), and label-centroid cosine distances
  * over quantized embedding sums (the cluster-geometry readout,
  * exact because the centroids are integer vectors).
  */
object Pipeline76 extends graft.QueryModule {

  /** SKYLINE — the 2D Pareto-dominance frontier "biggest orders,
    * earliest" (maximize total cents, minimize order date): an order
    * is dominated iff another has price ≥ AND date ≤ with one strict.
    * Two pruning stages keep everything domain-bounded: (1) per DATE
    * only the max-price orders can survive (one hash agg), (2) the
    * date-ascending running max over the ≤|calendar| date frame
    * keeps a date iff its max price strictly exceeds every earlier
    * date's — the staircase. Ties on (date, price) are all
    * non-dominated and all reported.
    *
    * 100 TB: the full pass is the (date, max-price) agg (map-side
    * partial); the staircase window runs on the calendar-bounded
    * date frame, and the survivors join back on (date, cents) to
    * recover order keys. */
  def aggSkyline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate").as("d"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val perDate = pts.groupBy("d").agg(max("cents").as("mx"))
    val w = Window.orderBy(col("d").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierDates = perDate
      .withColumn("prior_mx", max("mx").over(w))
      .where(col("prior_mx").isNull || col("mx") > col("prior_mx"))
      .select(col("d"), col("mx").as("cents"))
    pts.join(frontierDates, Seq("d", "cents"))
      .select(col("o_orderkey"), col("d").as("o_orderdate"),
        col("cents"))
      .orderBy("o_orderdate", "o_orderkey")
  }

  /** BITMAP-INDEX EXACT DISTINCT — users per event type counted
    * through 63-bit bitmap words (word = id div 63, mask = 1 <<
    * (id mod 63) — 63, not 64: DuckDB range-checks a signed shift
    * into the sign bit, so the portable word leaves bit 63 unused —
    * bit_or per (type, word), popcount-sum per type):
    * the warehouse trick that makes exact COUNT DISTINCT a MERGEABLE
    * aggregate (bitmap words union under OR across any partitioning
    * — the re-aggregation property approx sketches give up accuracy
    * for). Pipeline76Spec pins equality with countDistinct.
    *
    * 100 TB: the (type, word) agg is map-side partial (each task
    * ORs its local masks); words shuffle once; the popcount rollup
    * runs on the word frame. */
  def aggBitmapDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .select(col("event_type"),
        expr("user_id div 63").as("word"),
        expr("shiftleft(1L, cast(user_id % 63 as int))").as("mask"))
      .groupBy("event_type", "word")
      .agg(expr("bit_or(mask)").as("bits"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_words"),
        sum(expr("bit_count(bits)")).cast("long").as("n_users"))
      .orderBy("event_type")
  }

  /** LABEL-CENTROID COSINE DISTANCES — per label the 64-dim SUM of
    * floor(x·1000) quantized embeddings (integer vectors, so the
    * centroid geometry is EXACT: cosine of the sum vectors equals
    * cosine of the mean vectors), then all 45 label pairs' cosine
    * with every dot/norm product in decimal(38,0) and ONE double
    * division at the end — "how separated are the classes", the
    * geometry readout behind silhouette/ANN-recall numbers.
    *
    * 100 TB: one posexplode + (label, dim) partial agg is the full
    * pass; the pair join runs on the 10-row label domain
    * (broadcast). */
  def vecCentroidDistance(s: SparkSession, dir: String): DataFrame = {
    val sums = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(expr("transform(embedding," +
          " x -> cast(floor(cast(x as double) * 1000) as bigint))"))
          .as(Seq("dim", "q")))
      .groupBy("label", "dim")
      .agg(sum("q").as("sq"))
    val vecs = sums.groupBy("label")
      .agg(expr("array_sort(collect_list(struct(dim, sq)))").as("v"),
        sum(expr("cast(sq as decimal(38,0)) * sq")).as("nrm"))
    val a = vecs.select(col("label").as("l1"), col("v").as("v1"),
      col("nrm").as("n1"))
    val b = vecs.select(col("label").as("l2"), col("v").as("v2"),
      col("nrm").as("n2"))
    a.join(broadcast(b), col("l1") < col("l2"))
      .select(col("l1"), col("l2"),
        expr("aggregate(zip_with(v1, v2, (x, y) ->" +
          " cast(x.sq as decimal(38,0)) * y.sq)," +
          " cast(0 as decimal(38,0)), (acc, p) -> acc + p)").as("dot"),
        col("n1"), col("n2"))
      .select(col("l1"), col("l2"),
        round(expr("cast(dot as double)" +
          " / sqrt(cast(n1 as double) * cast(n2 as double))"), 6)
          .as("cosine"))
      .orderBy("l1", "l2")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_skyline" -> aggSkyline,
    "q_agg_bitmap_distinct" -> aggBitmapDistinct,
    "q_vec_centroid_distance" -> vecCentroidDistance)

  def oracleSql: Map[String, String] = Map(
    "q_agg_skyline" ->
      """WITH pts AS (SELECT o_orderkey, o_orderdate AS d,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |perdate AS (SELECT d, CAST(MAX(cents) AS BIGINT) AS mx
        |  FROM pts GROUP BY d),
        |fr AS (SELECT d, mx AS cents FROM (
        |    SELECT d, mx, MAX(mx) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prior_mx
        |    FROM perdate)
        |  WHERE prior_mx IS NULL OR mx > prior_mx)
        |SELECT p.o_orderkey, p.d AS o_orderdate, p.cents
        |FROM pts p JOIN fr ON fr.d = p.d AND fr.cents = p.cents
        |ORDER BY o_orderdate, o_orderkey""".stripMargin,
    "q_agg_bitmap_distinct" ->
      """WITH m AS (SELECT event_type, user_id // 63 AS word,
        |    (CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER))
        |      AS mask
        |  FROM events),
        |w AS (SELECT event_type, word, bit_or(mask) AS bits
        |  FROM m GROUP BY event_type, word)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(bit_count(bits)) AS BIGINT) AS n_users
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_vec_centroid_distance" ->
      """WITH q AS (SELECT CAST(label AS BIGINT) AS label, i AS dim,
        |    CAST(FLOOR(v[i] * 1000) AS BIGINT) AS qv
        |  FROM (SELECT label, embedding::DOUBLE[] AS v,
        |          unnest(range(1, len(embedding) + 1)) AS i
        |        FROM embeddings)),
        |sums AS (SELECT label, dim, CAST(SUM(qv) AS BIGINT) AS sq
        |  FROM q GROUP BY label, dim),
        |nrm AS (SELECT label,
        |    SUM(CAST(sq AS HUGEINT) * sq) AS n2 FROM sums GROUP BY label),
        |dots AS (SELECT a.label AS l1, b.label AS l2,
        |    SUM(CAST(a.sq AS HUGEINT) * b.sq) AS dot
        |  FROM sums a JOIN sums b ON b.dim = a.dim
        |    AND a.label < b.label
        |  GROUP BY a.label, b.label)
        |SELECT d.l1, d.l2,
        |  ROUND(CAST(d.dot AS DOUBLE)
        |    / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6)
        |    AS cosine
        |FROM dots d JOIN nrm na ON na.label = d.l1
        |JOIN nrm nb ON nb.label = d.l2
        |ORDER BY l1, l2""".stripMargin)
}
