package graft

import org.apache.spark.sql.SparkSession

/** Dev tool mirroring the driver's t1 smoke: run SparkEntry.entry and
  * print its row count (driver checks rows>0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // keep saveAsTable (bucketed-join demo) out of the repo even when
      // launched without build.sbt's javaOptions
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n (driver requires >0)")
    spark.stop()
  }
}
