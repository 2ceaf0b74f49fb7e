package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.73 round-15 batch 46 — lifecycle and content-defined-chunking
  * closers: the new/active/at-risk/churned user-lifecycle table (the
  * recency segmentation every growth dashboard leads with) and
  * Rabin-style CONTENT-DEFINED CHUNKING of the payload bytes (the
  * dedup primitive data lakes run below the document level —
  * asymmetric containment verify already ships as
  * q_dedup_containment, which is why this batch has no third key:
  * the duplicate-key guard caught the planned one).
  */
object Pipeline78 extends graft.QueryModule {

  /** USER LIFECYCLE — per user (first_ts, last_ts) against the fixed
    * anchor 2024-01-31: `new` (first seen in the last 7 days),
    * `active` (older first-seen, last seen within 7), `at_risk`
    * (last seen 7-14 days ago), `churned` (older). Per stage: users,
    * events, exact purchase cents — the recency segmentation a
    * growth dashboard leads with. All integer timestamp arithmetic
    * against a literal anchor (no now(): rerun-deterministic).
    *
    * 100 TB: one per-user min/max agg (map-side partial), then a
    * 4-group rollup. */
  def eventsLifecycle(s: SparkSession, dir: String): DataFrame = {
    val anchor = lit("2024-01-31 00:00:00").cast("timestamp")
    val day = 86400000000L
    val perUser = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(min("ts").as("first_ts"), max("ts").as("last_ts"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)")).otherwise(0L))
          .as("purchase_cents"))
      .withColumn("age_us",
        expr(s"unix_micros(cast('2024-01-31 00:00:00' as timestamp))" +
          s" - unix_micros(first_ts)"))
      .withColumn("rec_us",
        expr(s"unix_micros(cast('2024-01-31 00:00:00' as timestamp))" +
          s" - unix_micros(last_ts)"))
      .withColumn("stage",
        when(col("rec_us") <= lit(7 * day) && col("age_us") <= lit(7 * day),
          "1_new")
          .when(col("rec_us") <= lit(7 * day), "2_active")
          .when(col("rec_us") <= lit(14 * day), "3_at_risk")
          .otherwise("4_churned"))
    perUser.groupBy("stage")
      .agg(count(lit(1)).as("n_users"),
        sum("n_events").as("n_events"),
        sum("purchase_cents").as("purchase_cents"))
      .orderBy("stage")
  }

  /** CONTENT-DEFINED CHUNKING (Rabin-style CDC) of the payload bytes
    * — a chunk boundary closes at byte i when the trailing 8-byte
    * rolling polyhash ≡ 0 (mod 64) (expected chunk ~64 bytes; the
    * boundary depends only on CONTENT, so an insertion reshuffles
    * one chunk instead of every fixed window — the property that
    * makes CDC the data-lake sub-document dedup primitive). Per doc:
    * chunk count, max chunk length, and how many of its chunks are
    * SHARED (content-hash seen in >1 doc) — the dedupable-bytes
    * readout. Byte loop in a partition kernel; chunk hashes are the
    * §2.0.7 arithmetic polyhash, so the DuckDB twin recomputes them
    * from substrings exactly.
    *
    * 100 TB: the kernel emits one row per CHUNK (never per byte);
    * the shared-chunk join groups on the content hash — the
    * q_dedup_content_md5 shape one level below documents. */
  def dedupCdcChunks(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val P = 1000000007L
    val chunks = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = bytes.length
        val out = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var start = 0
        var roll = 0L
        var w = 1L; for (_ <- 0 until 7) w = w * 131 % P
        var chunkIdx = 0L
        def close(endExcl: Int): Unit = {
          var h = 0L
          var j = start
          while (j < endExcl) { h = (h * 131 + (bytes(j) & 0xff)) % P; j += 1 }
          out += ((id, chunkIdx, (endExcl - start).toLong, h))
          chunkIdx += 1
          start = endExcl
        }
        var i = 0
        while (i < n) {
          roll =
            if (i < 8) (roll * 131 + (bytes(i) & 0xff)) % P
            else {
              var t = (roll - (bytes(i - 8) & 0xff) * w) % P
              if (t < 0) t += P
              (t * 131 + (bytes(i) & 0xff)) % P
            }
          if (i >= 7 && roll % 64 == 0) close(i + 1)
          i += 1
        }
        if (start < n) close(n)
        out.iterator
      }
      .toDF("doc_id", "chunk_idx", "len", "h")
      .localCheckpoint(true)
    val shared = chunks.groupBy("h")
      .agg(countDistinct("doc_id").as("nd"))
      .where(col("nd") > 1).select("h")
    chunks
      .join(shared.withColumn("sh", lit(1L)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("len").as("n_bytes"),
        max("len").as("max_chunk"),
        sum(when(col("sh").isNotNull, 1L).otherwise(0L))
          .as("n_shared_chunks"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_lifecycle" -> eventsLifecycle,
    "q_dedup_cdc_chunks" -> dedupCdcChunks)

  def oracleSql: Map[String, String] = Map(
    "q_events_lifecycle" ->
      """WITH pu AS (SELECT user_id,
        |    MIN(ts) AS first_ts, MAX(ts) AS last_ts,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS purchase_cents
        |  FROM events GROUP BY user_id),
        |st AS (SELECT *,
        |    epoch_us(TIMESTAMP '2024-01-31 00:00:00')
        |      - epoch_us(first_ts) AS age_us,
        |    epoch_us(TIMESTAMP '2024-01-31 00:00:00')
        |      - epoch_us(last_ts) AS rec_us
        |  FROM pu),
        |lbl AS (SELECT *,
        |    CASE WHEN rec_us <= 7 * 86400000000 AND
        |              age_us <= 7 * 86400000000 THEN '1_new'
        |         WHEN rec_us <= 7 * 86400000000 THEN '2_active'
        |         WHEN rec_us <= 14 * 86400000000 THEN '3_at_risk'
        |         ELSE '4_churned' END AS stage
        |  FROM st)
        |SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  CAST(SUM(purchase_cents) AS BIGINT) AS purchase_cents
        |FROM lbl GROUP BY stage ORDER BY stage""".stripMargin,
    "q_dedup_cdc_chunks" ->
      """WITH pos AS MATERIALIZED (SELECT doc_id, text, i,
        |    list_reduce(list_transform(range(i - 7, i + 1),
        |      j -> CAST(ascii(substring(text, j, 1)) AS BIGINT)),
        |      (a, b) -> (a * 131 + b) % 1000000007) AS h
        |  FROM (SELECT doc_id, text,
        |          unnest(range(8, strlen(text) + 1)) AS i
        |        FROM documents)),
        |bnd AS MATERIALIZED (SELECT doc_id, text, i FROM pos
        |  WHERE h % 64 = 0),
        |spans AS MATERIALIZED (SELECT doc_id, text,
        |    COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0)
        |      + 1 AS start,
        |    i AS fin
        |  FROM bnd
        |  UNION ALL
        |  SELECT d.doc_id, d.text,
        |    COALESCE((SELECT MAX(b.i) FROM bnd b
        |              WHERE b.doc_id = d.doc_id), 0) + 1,
        |    strlen(d.text)
        |  FROM documents d
        |  WHERE COALESCE((SELECT MAX(b.i) FROM bnd b
        |                  WHERE b.doc_id = d.doc_id), 0)
        |    < strlen(d.text)),
        |chunks AS MATERIALIZED (SELECT doc_id,
        |    fin - start + 1 AS len,
        |    list_reduce(list_transform(range(start, fin + 1),
        |      j -> CAST(ascii(substring(text, j, 1)) AS BIGINT)),
        |      (a, b) -> (a * 131 + b) % 1000000007) AS h
        |  FROM spans),
        |shared AS MATERIALIZED (SELECT h FROM chunks
        |  GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1)
        |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(c.len) AS BIGINT) AS n_bytes,
        |  CAST(MAX(c.len) AS BIGINT) AS max_chunk,
        |  CAST(SUM(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_shared_chunks
        |FROM chunks c LEFT JOIN shared sh ON sh.h = c.h
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)
}
