package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Lake-lite: a versioned pool of data objects with a commit journal
  * (reference: lake/ pools+branches+commits, runtime/sam/op/load/load.go).
  *
  * Layout (one pool = one directory):
  *   <root>/<pool>/data/<commitId>/   parquet data objects (distributed write)
  *   <root>/<pool>/commits.jsonl      append-only commit journal (driver-side
  *                                    metadata only, like zed's journal)
  *
  * Scan is merge-on-read: the union of all live commits' parquet dirs with
  * schema merge — the same shape as zed's Lister/SeqScan over pool objects,
  * with Spark handling partition planning and pushdown per file.
  */
object Lake {

  final case class Commit(id: String, author: String, message: String, ts: Long)

  private def poolDir(root: String, pool: String) = Paths.get(root, pool)
  private def journal(root: String, pool: String) = poolDir(root, pool).resolve("commits.jsonl")

  def create(root: String, pool: String): Unit = {
    Files.createDirectories(poolDir(root, pool).resolve("data"))
    val j = journal(root, pool)
    if (!Files.exists(j)) Files.createFile(j)
  }

  def exists(root: String, pool: String): Boolean = Files.exists(journal(root, pool))

  /** `load` — commit a query result into a pool (load.go:11-30). The data
    * write is a distributed parquet write; only the tiny journal append is
    * driver-side, mirroring zed's commit-journal design.
    */
  def load(df: DataFrame, root: String, pool: String,
           author: String = "graft", message: String = ""): String = {
    if (!exists(root, pool)) create(root, pool)
    val id = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    val dataDir = poolDir(root, pool).resolve("data").resolve(id)
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val rec =
      s"""{"id":"$id","author":"${author.replace("\"", "'")}","message":"${message.replace("\"", "'")}","ts":${System.currentTimeMillis()}}"""
    Files.write(journal(root, pool), (rec + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)
    id
  }

  def commits(root: String, pool: String): Seq[Commit] = {
    if (!exists(root, pool)) return Seq.empty
    val idRe = """"id":"([^"]+)"""".r
    val authorRe = """"author":"([^"]*)"""".r
    val msgRe = """"message":"([^"]*)"""".r
    val tsRe = """"ts":(\d+)""".r
    scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(journal(root, pool))).asScala.toSeq
      .filter(_.nonEmpty)
      .map { l =>
        Commit(
          idRe.findFirstMatchIn(l).map(_.group(1)).getOrElse(""),
          authorRe.findFirstMatchIn(l).map(_.group(1)).getOrElse(""),
          msgRe.findFirstMatchIn(l).map(_.group(1)).getOrElse(""),
          tsRe.findFirstMatchIn(l).map(_.group(1).toLong).getOrElse(0L))
      }
  }

  /** `from <pool>` — merge-on-read scan of all commits (optionally as of a
    * given commit id, like zed's `pool@commit`).
    */
  def scan(spark: SparkSession, root: String, pool: String,
           asOf: Option[String] = None): DataFrame = {
    val all = commits(root, pool)
    val live = asOf match {
      case Some(id) =>
        val idx = all.indexWhere(_.id == id)
        require(idx >= 0, s"no such commit: $id")
        all.take(idx + 1)
      case None => all
    }
    require(live.nonEmpty, s"pool $pool is empty")
    val dirs = live.map(c => poolDir(root, pool).resolve("data").resolve(c.id).toString)
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  /** `mirror` — copy the stream to a mirror sink while passing it through
    * (runtime/sam/op/mirror/mirror.go; multi-output graphs mux.go). The
    * shared plan is computed once per action; for expensive upstreams the
    * caller persists first.
    */
  def mirror(df: DataFrame, mirrorSink: DataFrame => Unit): DataFrame = {
    mirrorSink(df)
    df
  }
}
