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
  /** events.ts normalizer — absorbs fixture-schema drift so every
    * downstream operator always sees `ts: TimestampType` (UTC session tz).
    * Physical encodings seen across driver fixture generations:
    *   - parquet TIMESTAMP(NANOS): Spark 4 refuses the timestamp read
    *     ([PARQUET_TYPE_ILLEGAL]); with
    *     spark.sql.legacy.parquet.nanosAsLong=true (set by Verify/Bench/
    *     Smoke sessions) it arrives as Long nanos. Fixture values are
    *     µs-aligned (ns % 1000 == 0, probed), so integer-div to micros
    *     is exact and matches DuckDB's ns->µs read of the same file.
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) (current
    *     fixtures): Spark 4 reads TIMESTAMP_NTZ. Under the UTC session
    *     timezone the cast to TimestampType is value-identical to
    *     DuckDB's naive read, so all oracle SQL stays valid.
    *   - already TimestampType: pass through.
    * Every real user hits one of these the first time their parquet
    * writer flips isAdjustedToUTC — this is the drift absorber. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
