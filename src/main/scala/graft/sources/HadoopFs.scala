package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Executor-safe Hadoop FileSystem plumbing for the custom format writers
  * (ZNG/VNG). The driver's Hadoop configuration is captured as a plain
  * `Map[String, String]` (serializable), and each task rebuilds a
  * `Configuration` from it so writes go through `FileSystem.create` — on a
  * real cluster the part files land on the shared filesystem (HDFS, S3A,
  * file: on NFS), not executor-local disk as `java.nio.file` would.
  */
object HadoopFs {

  /** Serializable snapshot of the session's Hadoop configuration. */
  def confMap(spark: SparkSession): Map[String, String] =
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap

  private def confOf(m: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Driver-side: ensure the output directory exists, created FRESH —
    * overwrite semantics like every built-in `mode("overwrite")` sink. A
    * bare mkdirs would leave stale part files from a previous (possibly
    * wider-partitioned) write mixed into the new output.
    */
  def prepareDir(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true): Unit
    fs.mkdirs(p): Unit
  }

  /** Executor-side: open a part file for writing under `dir`. */
  def create(conf: Map[String, String], dir: String, name: String): java.io.OutputStream = {
    val p = new Path(dir, name)
    p.getFileSystem(confOf(conf)).create(p, true)
  }

  /** Driver-side listing with one retry on transient emptiness — the
    * single place a format reader touches the directory. Downstream
    * loads get the explicit file list, never a glob, so a read
    * immediately after a write can't race a second, inconsistent
    * listing — the behavior you want on an eventually-consistent
    * object store. (Replaces the old retryListing glob-and-retry, whose
    * FileNotFoundException rescue papered over the race.)
    */
  def dataFiles(spark: SparkSession, path: String): Seq[String] = {
    val first =
      try listDataFiles(spark, path)
      catch { case _: java.io.FileNotFoundException => Seq.empty[String] }
    if (first.nonEmpty) first
    else { Thread.sleep(500); listDataFiles(spark, path) }
  }

  /** Binary contents of a path's data files, loaded by explicit file
    * list (one driver-side listing, no re-glob).
    */
  def binaryFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(dataFiles(spark, path): _*)

  /** Driver-side directory test that works for any Hadoop scheme. */
  def isDirectory(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.getFileStatus(p).isDirectory catch { case _: java.io.FileNotFoundException => false }
  }

  /** Driver-side: the data files under `path` (itself, if a plain file) —
    * marker/hidden entries (_SUCCESS, .crc) skipped, name-sorted for
    * deterministic planning.
    */
  def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) Seq(path)
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getLen > 0 &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).sorted
  }

  /** Executor-side positioned reads — the columnar segment fetch for VNG:
    * one open stream per file, `readFully(pos, …)` per segment, so a
    * pruned scan touches only the byte ranges of the columns it needs
    * (the point of a columnar format on a 100 TB object store).
    */
  final class RangeReader(conf: Map[String, String], path: String) extends AutoCloseable {
    private val p = new Path(path)
    private val in = p.getFileSystem(confOf(conf)).open(p)
    def read(pos: Long, len: Int): Array[Byte] = {
      val buf = new Array[Byte](len)
      in.readFully(pos, buf)
      buf
    }
    def close(): Unit = in.close()
  }

  /** Executor-side STREAMING open — constant memory regardless of file
    * size (text scans must never materialize a whole object; a 100 TB
    * store has multi-GB log files).
    */
  def open(conf: Map[String, String], path: String): java.io.InputStream = {
    val p = new Path(path)
    p.getFileSystem(confOf(conf)).open(p)
  }

  /** Executor-side: read a file fully (zng streams decode from a byte
    * array; part files are bounded by the writing partition's size).
    */
  def readAll(conf: Map[String, String], path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(confOf(conf))
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
}
