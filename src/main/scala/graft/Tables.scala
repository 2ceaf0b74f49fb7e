package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loaders over the driver-generated parquet fixtures
  * (FIXTURES.md). All graded queries read through here so the scan path
  * (vectorized parquet, pushdown, pruning) is uniform.
  *
  * 100 TB design note: these are plain `spark.read.parquet` scans — on a
  * real cluster the same call reads a partitioned directory tree; nothing
  * here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** events.ts is physical parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). With
    * spark.sql.legacy.parquet.nanosAsLong=true (set by Verify/Bench/
    * Smoke sessions) it arrives as Long nanos; all fixture values are
    * µs-aligned (ns % 1000 == 0, probed), so integer-div to micros is
    * exact and matches DuckDB's own ns->µs read of the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    import org.apache.spark.sql.types.LongType
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
