package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: scan every graded query's physical plan for scale
  * anti-patterns (cartesian products, nested-loop joins, single-
  * partition exchanges) and print offenders — the round-close audit
  * behind SURVEY §4's claims. Plans are built, not executed. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val patterns = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
      "Exchange SinglePartition")
    var clean = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan.toString
        val hits = patterns.filter(plan.contains)
        if (hits.isEmpty) clean += 1
        else println(s"AUDIT $name: ${hits.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"AUDIT $name: PLAN FAILED ${e.getMessage}")
      }
    }
    println(s"AUDIT clean=$clean of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
