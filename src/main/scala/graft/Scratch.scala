package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only plan lab (not graded): r14 repurpose — adjudicate the
  * q_ml_als_recommend_all 508-CPU-s driver reading (VERDICT r13 #1).
  * Times the ALS fit, the raw recommendForAllUsers scan, and the full
  * graded query separately, at configurable MLlib blockSize, with
  * per-stage GC/CPU metrics. Run with SPARK_DRIVER_MEM to probe the
  * memory-pressure hypothesis.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val blockSize = args.drop(1).headOption.map(_.toInt).getOrElse(4096)
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

    @volatile var gcTotal = 0.0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          gcTotal += m.jvmGCTime / 1e3
          if (m.executorRunTime > 200)
            println(f"  stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
              f"runTime=${m.executorRunTime / 1e3}%8.2f s " +
              f"cpuTime=${m.executorCpuTime / 1e9}%8.2f s " +
              f"gc=${m.jvmGCTime / 1e3}%6.2f s  ${si.name.takeWhile(_ != '\n').take(60)}")
        }
      })

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[T](label: String)(f: => T): T = {
      val g0 = gcTotal
      val t0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"$label%-34s wall=$wall%7.2f s  cpu=$cpu%7.2f s  taskGc=${gcTotal - g0}%6.2f s")
      r
    }

    Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    println(s"heap=${Runtime.getRuntime.maxMemory() / (1 << 20)} MiB  blockSize=$blockSize")

    time("payload #1")(
      SparkEntry.queries("q_dedup_payload")(spark, sfDir).count())
    time("payload #2")(
      SparkEntry.queries("q_dedup_payload")(spark, sfDir).count())
    spark.stop()
  }
}
