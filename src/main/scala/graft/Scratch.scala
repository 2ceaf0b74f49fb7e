package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only plan lab (not graded): time/explain variants of a query
  * shape side by side. Deleted or repurposed between rounds.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import Det._

    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          println(f"  stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"runTime=${m.executorRunTime / 1e3}%8.2f s " +
            f"cpuTime=${m.executorCpuTime / 1e9}%8.2f s " +
            f"gc=${m.jvmGCTime / 1e3}%6.2f s  ${si.name.takeWhile(_ != '\n').take(60)}")
        }
      })

    // same guarded cast as Bench (ADVICE r5): report 0 rather than die
    // on a JVM without the com.sun bean
    val procCpu: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean =>
          () => math.max(b.getProcessCpuTime, 0L)
        case _ => () => 0L
      }
    def time(name: String)(f: => DataFrame): Unit = {
      // several reps: first run carries codegen, report all
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime(); val c0 = procCpu()
        val n = f.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (procCpu() - c0) / 1e9
        println(f"$name%-24s run$i wall=$wall%7.2f s  cpu=$cpu%7.2f s  rows=$n")
      }
    }

    def lineitem = Tables.lineitem(spark, sfDir)
    lineitem.count() // warm

    // A: current committed shape — repartition by suppkey BEFORE agg
    def vA = {
      val rev = lineitem
        .repartition(spark.sparkContext.defaultParallelism, col("l_suppkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(revenue).as("rev_dec"))
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("rev_dec").desc, col("l_partkey").asc)
      rev.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("l_suppkey"), col("l_partkey"),
          col("rev_dec").cast("double").as("part_revenue"), col("rn"))
        .orderBy("l_suppkey", "rn")
    }

    // B: naive two-shuffle — agg on its keys, window reshuffles
    def vB = {
      val rev = lineitem
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(revenue).as("rev_dec"))
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("rev_dec").desc, col("l_partkey").asc)
      rev.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("l_suppkey"), col("l_partkey"),
          col("rev_dec").cast("double").as("part_revenue"), col("rn"))
        .orderBy("l_suppkey", "rn")
    }

    // C: r3-close shape — agg, then repartition, then window
    def vC = {
      val rev = lineitem
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(revenue).as("rev_dec"))
        .repartition(spark.sparkContext.defaultParallelism, col("l_suppkey"))
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("rev_dec").desc, col("l_partkey").asc)
      rev.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("l_suppkey"), col("l_partkey"),
          col("rev_dec").cast("double").as("part_revenue"), col("rn"))
        .orderBy("l_suppkey", "rn")
    }

    time("A repart-before-agg")(vA)
    time("C agg-repart-window")(vC)
    time("B two-shuffle")(vB)
    spark.stop()
  }
}
