package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity / multimodal operators beyond the SURVEY §2.8 core:
  * blocked embedding near-dup, IVF-style ANN, and binary-column
  * multimodal plumbing with a stubbed decoder.
  *
  * Dot products here are UNROLLED 64-term GetArrayItem expressions —
  * whole-stage-codegen'd, ~6x faster than interpreted higher-order
  * lambdas, and the ascending-index add order matches DuckDB's list
  * functions bit-for-bit.
  */
object ExtraVector extends graft.QueryModule {

  private val DIM = 64

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("e", expr("transform(embedding, x -> cast(x AS double))"))

  /** Codegen-friendly dot(a, b): a[0]*b[0] + ... + a[63]*b[63]. */
  private def dot(a: String, b: String): Column =
    (0 until DIM).map(i => col(a).getItem(i) * col(b).getItem(i))
      .reduce(_ + _)

  private def norm(a: String): Column =
    sqrt((0 until DIM).map(i => col(a).getItem(i) * col(a).getItem(i))
      .reduce(_ + _))

  /** Embedding near-dup pairs, BLOCKED by label (the blocked-dedup
    * shape: at 100 TB the block key comes from a coarse quantizer so
    * the pair space is per-block, never all-pairs global). */
  def dedupEmbedCosine(s: SparkSession, dir: String): DataFrame = {
    val v = emb(s, dir).select(col("label"), col("vec_id"), col("e"))
      .withColumn("n", norm("e"))
    val a = v.select(col("label"), col("vec_id").as("d1"),
      col("e").as("e1"), col("n").as("n1"))
    val b = v.select(col("label"), col("vec_id").as("d2"),
      col("e").as("e2"), col("n").as("n2"))
    a.join(b, "label").where(col("d1") < col("d2"))
      .withColumn("cos", round(dot("e1", "e2") / (col("n1") * col("n2")), 6))
      .where(col("cos") >= 0.4)
      .select("label", "d1", "d2", "cos")
      .orderBy(col("cos").desc, col("d1").asc, col("d2").asc)
      .limit(100)
  }

  /** IVF-style ANN: coarse cells = per-label centroids (deterministic
    * quantizer), every vector assigned to its NEAREST cell, probes scan
    * the 3 nearest cells and re-rank exactly. NO oracle (approx by
    * design); ExtraSpec bounds recall vs q_sim_cosine_topk. */
  def simAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val exploded = emb(s, dir)
      .select(col("vec_id"), col("label"), posexplode(col("e")))
      .select(col("vec_id"), col("label"), col("pos").as("dim"), col("col").as("v"))
    val cents = exploded.groupBy("label", "dim").agg(avg(col("v")).as("c"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("dim"), col("c"))))
        .as("pairs"))
      .select(col("label").as("cell"),
        expr("transform(pairs, p -> p.c)").as("ce"))
    val withCells = emb(s, dir).crossJoin(broadcast(cents))
      .withColumn("d2c", dot("e", "ce") / (norm("e") * norm("ce")))
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2c").desc, col("cell").asc)
    val assigned = withCells
      .withColumn("rk", row_number().over(assignW))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("e"), col("cell"))
    val probeCells = withCells.where(col("vec_id") <= 20)
      .withColumn("rk", row_number().over(assignW))
      .where(col("rk") <= 3)
      .select(col("vec_id").as("probe_id"), col("e").as("e1"), col("cell"))
    val cands = assigned.join(broadcast(probeCells), "cell")
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("e1"), col("vec_id"), col("e").as("e2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands
      .withColumn("cos", round(dot("e1", "e2") / (norm("e1") * norm("e2")), 6))
      .select("probe_id", "vec_id", "cos")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .orderBy("probe_id", "rn")
  }

  /** Multimodal binary plumbing: text payload as an opaque binary
    * column + typed metadata, "decoded" by a partition-batched stub.
    * The mapPartitions hook is where a real image/audio decoder would
    * run (per-partition batch shape, no driver collect); the stub
    * computes a deterministic byte checksum so the pipeline is
    * oracle-checkable end-to-end (ASCII corpus: bytes == ascii codes). */
  def multimodalBinary(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    val decoded = payloads.mapPartitions { it =>
      // decoder stub: real multimodal impl decodes the payload here
      it.map { case (id, bytes) =>
        val head = bytes.take(16).map(b => (b & 0xff).toLong).sum
        (id, bytes.length.toLong, head + bytes.length)
      }
    }.toDF("doc_id", "n_bytes", "feat")
    decoded
      .withColumn("mime", lit("text/plain"))
      .select("doc_id", "mime", "n_bytes", "feat")
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_embed_cosine" -> dedupEmbedCosine,
    "q_sim_ann_ivf" -> simAnnIvf,
    "q_multimodal_binary" -> multimodalBinary)

  def oracleSql: Map[String, String] = Map(
    "q_dedup_embed_cosine" ->
      """WITH v AS (SELECT label, vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT label, d1, d2, cos FROM (
        |  SELECT a.label, a.vec_id AS d1, b.vec_id AS d2,
        |    ROUND(list_cosine_similarity(a.e, b.e), 6) AS cos
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cos >= 0.4
        |ORDER BY cos DESC, d1 ASC, d2 ASC LIMIT 100""".stripMargin,
    "q_multimodal_binary" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN i <= 16 THEN ascii(substring(text, i, 1)) ELSE 0 END) AS BIGINT) AS head
        |  FROM (SELECT doc_id, text, unnest(range(1, strlen(text)+1)) AS i
        |        FROM documents)
        |  GROUP BY doc_id)
        |SELECT c.doc_id, 'text/plain' AS mime,
        |  CAST(strlen(d.text) AS BIGINT) AS n_bytes,
        |  CAST(c.head + strlen(d.text) AS BIGINT) AS feat
        |FROM ch c JOIN documents d USING (doc_id)
        |ORDER BY doc_id""".stripMargin)
}
