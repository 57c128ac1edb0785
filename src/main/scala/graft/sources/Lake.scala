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

  final case class Commit(id: String, author: String, message: String, ts: Long,
                          branch: String = "main", kind: String = "commit",
                          target: String = "",
                          keyMin: Option[String] = None,
                          keyMax: Option[String] = None)

  private def poolDir(root: String, pool: String) = Paths.get(root, pool)
  private def journal(root: String, pool: String) = poolDir(root, pool).resolve("commits.jsonl")

  /** Create a pool, optionally with a pool KEY (`zed create -orderby`,
    * lake/pool.go): loads are range-sorted by the key so every data
    * object — and every parquet row group inside it — covers a tight
    * key range, and the journal records each object's [min,max]. A
    * keyed pool's range scans then prune twice: whole objects
    * driver-side from the journal (the seek-index analog,
    * lake/seekindex/writer.go) and row groups inside surviving objects
    * from parquet stats via the pushed predicate.
    */
  def create(root: String, pool: String, key: Option[String] = None): Unit = {
    Files.createDirectories(poolDir(root, pool).resolve("data"))
    key.foreach { k =>
      Files.write(poolDir(root, pool).resolve("pool.json"),
        (s"""{"key":"$k"}""" + "\n").getBytes(StandardCharsets.UTF_8))
    }
    val j = journal(root, pool)
    if (!Files.exists(j)) Files.createFile(j)
  }

  /** The pool's key field, if it was created with one. */
  def poolKey(root: String, pool: String): Option[String] = {
    val f = poolDir(root, pool).resolve("pool.json")
    if (!Files.exists(f)) None
    else """"key":"([^"]+)"""".r.findFirstMatchIn(
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8)).map(_.group(1))
  }

  def exists(root: String, pool: String): Boolean = Files.exists(journal(root, pool))

  /** `load` — commit a query result into a pool (load.go:11-30). The data
    * write is a distributed parquet write; only the tiny journal append is
    * driver-side, mirroring zed's commit-journal design.
    */
  def load(df: DataFrame, root: String, pool: String,
           author: String = "graft", message: String = "",
           branch: String = "main"): String = {
    if (!exists(root, pool)) create(root, pool)
    val id = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    val dataDir = poolDir(root, pool).resolve("data").resolve(id)
    val key = poolKey(root, pool).filter(df.columns.contains)
    // the object's key range rides the WRITE job itself (Observation
    // metrics over the flowing rows) — exact, no second pass over the
    // input, and no re-read of a just-written directory (a listing
    // immediately after a write has been observed partial on this host)
    val obs = key.map(_ => new org.apache.spark.sql.Observation())
    val sorted = (key, obs) match {
      // keyed pool: range-sort so each file and row group covers a tight
      // key slice — this is what makes the journal's [min,max] and the
      // parquet stats selective at scan time
      case (Some(k), Some(o)) =>
        import org.apache.spark.sql.functions.{col, max, min}
        // observe ABOVE the range exchange: the boundary-sampling pass
        // re-executes the subtree below it, which would double-count or
        // short-circuit metrics placed before the exchange
        df.repartitionByRange(col(k)).sortWithinPartitions(col(k))
          .observe(o, min(col(k)).cast("string").as("kmin"),
            max(col(k)).cast("string").as("kmax"))
      case _ => df
    }
    sorted.write.mode("errorifexists").parquet(dataDir.toString)
    val range = obs.map { o =>
      val m = o.get
      def named(key: String, idx: Int): String =
        m.get(key).orElse(m.values.toSeq.lift(idx)).flatMap(Option(_))
          .map(_.toString).getOrElse("")
      (named("kmin", 0), named("kmax", 1))
    }
    val rangeJson = range.map { case (lo, hi) =>
      s""","keymin":"${lo.replace("\"", "'")}","keymax":"${hi.replace("\"", "'")}""""
    }.getOrElse("")
    appendRec(root, pool,
      s"""{"id":"$id","kind":"commit","branch":"$branch","author":"${author.replace("\"", "'")}","message":"${message.replace("\"", "'")}"$rangeJson,"ts":${System.currentTimeMillis()}}""")
    id
  }

  private def appendRec(root: String, pool: String, rec: String): Unit =
    Files.write(journal(root, pool), (rec + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)

  /** `branch <pool> <name> [@commit]` — a named ref forking from a commit
    * (lake/root.go:363-381, cmd/super/db/branch). A journal record, no
    * data movement: the branch sees its ancestors up to the fork point
    * plus its own commits.
    */
  def branch(root: String, pool: String, name: String, from: Option[String] = None): Unit = {
    require(exists(root, pool), s"no such pool: $pool")
    val forkAt = from.orElse(
      commits(root, pool).filter(c => c.kind == "commit" && c.branch == "main")
        .lastOption.map(_.id)).getOrElse("")
    appendRec(root, pool,
      s"""{"id":"$name","kind":"branch","target":"$forkAt","ts":${System.currentTimeMillis()}}""")
  }

  def branches(root: String, pool: String): Seq[String] =
    "main" +: commits(root, pool).filter(_.kind == "branch").map(_.id)

  /** `delete` — a data object leaves the live set as a NEW journal record
    * (runtime/sam/op/meta/deleter.go: deletes are commits, history stays
    * intact — `@commit` time travel still sees the object).
    */
  def delete(root: String, pool: String, commitId: String, branch: String = "main"): Unit = {
    require(exists(root, pool), s"no such pool: $pool")
    appendRec(root, pool,
      s"""{"id":"${java.util.UUID.randomUUID().toString.replace("-", "").take(16)}","kind":"delete","branch":"$branch","target":"$commitId","ts":${System.currentTimeMillis()}}""")
  }

  def commits(root: String, pool: String): Seq[Commit] = {
    if (!exists(root, pool)) return Seq.empty
    val idRe = """"id":"([^"]+)"""".r
    val authorRe = """"author":"([^"]*)"""".r
    val msgRe = """"message":"([^"]*)"""".r
    val tsRe = """"ts":(\d+)""".r
    val branchRe = """"branch":"([^"]*)"""".r
    val kindRe = """"kind":"([^"]*)"""".r
    val targetRe = """"target":"([^"]*)"""".r
    val kminRe = """"keymin":"([^"]*)"""".r
    val kmaxRe = """"keymax":"([^"]*)"""".r
    scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(journal(root, pool))).asScala.toSeq
      .filter(_.nonEmpty)
      .map { l =>
        Commit(
          idRe.findFirstMatchIn(l).map(_.group(1)).getOrElse(""),
          authorRe.findFirstMatchIn(l).map(_.group(1)).getOrElse(""),
          msgRe.findFirstMatchIn(l).map(_.group(1)).getOrElse(""),
          tsRe.findFirstMatchIn(l).map(_.group(1).toLong).getOrElse(0L),
          branchRe.findFirstMatchIn(l).map(_.group(1)).getOrElse("main"),
          kindRe.findFirstMatchIn(l).map(_.group(1)).getOrElse("commit"),
          targetRe.findFirstMatchIn(l).map(_.group(1)).getOrElse(""),
          kminRe.findFirstMatchIn(l).map(_.group(1)),
          kmaxRe.findFirstMatchIn(l).map(_.group(1)))
      }
  }

  /** Journal records visible from a branch head: the branch's own records
    * plus main ancestors at or before the fork point, in journal order.
    */
  private def visibleOn(all: Seq[Commit], branch: String): Seq[Commit] = {
    val forkAt = all.find(c => c.kind == "branch" && c.id == branch).map(_.target)
    val mainIds = all.filter(x => x.kind == "commit" && x.branch == "main").map(_.id)
    def onBranch(c: Commit): Boolean =
      c.branch == branch || (forkAt match {
        case Some(f) => c.branch == "main" && mainIds.indexOf(c.id) <= mainIds.indexOf(f)
        case None    => false
      })
    all.filter(onBranch)
  }

  /** Replay a visible journal slice in order: a commit (re-)adds its object
    * id, a delete removes its target. Order matters — a commit appended
    * AFTER a delete (revert-of-delete) restores the object, and a delete
    * after a commit removes it, exactly like the reference's journal replay.
    */
  private def liveIds(visible: Seq[Commit]): Seq[String] =
    visible.foldLeft(Vector.empty[String]) { (live, c) =>
      c.kind match {
        case "commit" => if (live.contains(c.id)) live else live :+ c.id
        case "delete" => live.filterNot(_ == c.target)
        case _        => live
      }
    }

  /** `from <pool>[@commit|@branch]` — merge-on-read scan of the live
    * commits: a branch sees ancestors up to its fork plus its own
    * commits, minus anything a delete record on the branch removed.
    */
  def scan(spark: SparkSession, root: String, pool: String,
           asOf: Option[String] = None,
           keyRange: Option[(String, String)] = None): DataFrame = {
    val all = commits(root, pool)
    val branchNames = all.filter(_.kind == "branch").map(_.id).toSet
    val (branch, upTo) = asOf match {
      case Some(b) if branchNames(b) || b == "main" => (b, None)
      case other => ("main", other)
    }
    val visible = upTo match {
      case Some(id) =>
        val idx = all.indexWhere(_.id == id)
        require(idx >= 0, s"no such commit: $id")
        all.take(idx + 1)
      case None => visibleOn(all, branch)
    }
    val live = liveIds(visible)
    require(live.nonEmpty, s"pool $pool is empty")
    // object-level range pruning from the journal's [keymin,keymax] — the
    // seek-index analog: a keyed pool's range scan never opens an object
    // whose recorded range can't overlap. Objects without a recorded
    // range (unkeyed loads) are conservatively kept.
    val key = poolKey(root, pool)
    val byId = visible.filter(_.kind == "commit").map(c => c.id -> c).toMap
    val pruned = (key, keyRange) match {
      case (Some(_), Some((lo, hi))) =>
        val kept = live.filter { id =>
          byId.get(id).forall(c => (c.keyMin, c.keyMax) match {
            // an empty recorded range means the object has no keyed rows
            // at all — nothing in it can match any range
            case (Some(""), Some("")) => false
            case (Some(mn), Some(mx)) =>
              !(cmpKey(mx, lo).exists(_ < 0) || cmpKey(mn, hi).exists(_ > 0))
            case _ => true
          })
        }
        if (kept.nonEmpty) kept else live.take(1) // keep a scannable frame for schema
      case _ => live
    }
    val dirs = pruned.map(id => poolDir(root, pool).resolve("data").resolve(id).toString)
    val df = spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    // in-object pruning: the key predicate pushes to parquet, where the
    // load-time range sort makes row-group [min,max] stats selective
    (key, keyRange) match {
      case (Some(k), Some((lo, hi)))
          if castable(lo, df.schema(k).dataType) && castable(hi, df.schema(k).dataType) =>
        import org.apache.spark.sql.functions.{col, lit}
        df.filter(col(k) >= lit(lo).cast(df.schema(k).dataType) &&
          col(k) <= lit(hi).cast(df.schema(k).dataType))
      // a bound that doesn't parse in the key's type would cast to null
      // and wrongly drop every row — leave filtering to the caller
      case _ => df
    }
  }

  /** Order two rendered key values: numerically when both parse as
    * numbers, lexicographically when neither does (exact for strings and
    * for the uniform-width datetime renders Spark's string cast emits).
    * MIXED classes are incomparable (None) — pruning must keep the
    * object rather than guess.
    */
  private def cmpKey(a: String, b: String): Option[Int] = {
    val na = try Some(BigDecimal(a)) catch { case _: NumberFormatException => None }
    val nb = try Some(BigDecimal(b)) catch { case _: NumberFormatException => None }
    (na, nb) match {
      case (Some(x), Some(y)) => Some(x.compare(y))
      case (None, None) => Some(a.compareTo(b))
      case _ => None
    }
  }

  /** Does `v` parse in the key column's type? Guards the scan-level row
    * filter against cast-to-null false drops.
    */
  private def castable(v: String, dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    try dt match {
      case LongType | IntegerType | ShortType | ByteType => { v.trim.toLong; true }
      case DoubleType | FloatType | _: DecimalType => { BigDecimal(v.trim); true }
      case StringType => true
      case TimestampType | TimestampNTZType =>
        java.sql.Timestamp.valueOf(v.replace("T", " ").stripSuffix("Z")); true
      case DateType => java.sql.Date.valueOf(v.take(10)); true
      case _ => false
    } catch { case _: Exception => false }
  }

  /** `merge <branch>` — fold a branch's commits into its parent
    * (lake/root.go MergeBranch; cmd/super/db/merge): the child's data
    * objects become visible on the parent via new journal records over
    * the SAME data (no data movement), then the branch ref stays for
    * history like the reference's fast-forward.
    */
  def merge(root: String, pool: String, branch: String, parent: String = "main"): Seq[String] = {
    require(exists(root, pool), s"no such pool: $pool")
    val all = commits(root, pool)
    val childCommits = all.filter(c => c.kind == "commit" && c.branch == branch)
    val childDeletes = all.filter(c => c.kind == "delete" && c.branch == branch)
    childCommits.foreach { c =>
      appendRec(root, pool,
        s"""{"id":"${c.id}","kind":"commit","branch":"$parent","author":"${c.author}","message":"merge $branch: ${c.message}","ts":${System.currentTimeMillis()}}""")
    }
    childDeletes.foreach { d =>
      appendRec(root, pool,
        s"""{"id":"${d.id}","kind":"delete","branch":"$parent","target":"${d.target}","ts":${System.currentTimeMillis()}}""")
    }
    childCommits.map(_.id)
  }

  /** `revert <commit>` — a NEW commit that undoes a previous one
    * (cmd/super/db/revert): reverting a data commit deletes its object
    * from the live set; reverting a delete restores the object. History
    * stays intact either way.
    */
  def revert(root: String, pool: String, commitId: String, branch: String = "main"): Unit = {
    require(exists(root, pool), s"no such pool: $pool")
    val all = commits(root, pool)
    val target = all.find(_.id == commitId).getOrElse(
      throw new IllegalArgumentException(s"no such commit: $commitId"))
    target.kind match {
      case "commit" => delete(root, pool, commitId, branch)
      case "delete" =>
        // restore: re-commit the deleted object's id on this branch
        appendRec(root, pool,
          s"""{"id":"${target.target}","kind":"commit","branch":"$branch","author":"revert","message":"revert $commitId","ts":${System.currentTimeMillis()}}""")
      case other => throw new IllegalArgumentException(s"cannot revert a $other record")
    }
  }

  /** `compact` — rewrite the branch's live objects into ONE object
    * (cmd/super/db/compact): a distributed read+write, then the old
    * objects leave the live set (still reachable by time travel until
    * vacuum).
    */
  def compact(spark: SparkSession, root: String, pool: String,
              branch: String = "main"): String = {
    val df = scan(spark, root, pool, Some(branch))
    val all = commits(root, pool)
    // Everything the branch sees — its own objects AND fork ancestors — is
    // folded into the compact object, so all of it leaves this branch's
    // live set (branch-scoped deletes: other branches keep seeing the
    // originals).
    val old = liveIds(visibleOn(all, branch))
    val id = load(df, root, pool, "compact", s"compact ${old.length} objects", branch)
    old.foreach(cid => delete(root, pool, cid, branch))
    id
  }

  /** `vacuum` — physically remove data objects no LIVE commit on any
    * branch references (cmd/super/db/vacuum): reclaims space and gives up
    * time travel to the removed objects, exactly like the reference.
    */
  def vacuum(root: String, pool: String): Seq[String] = {
    require(exists(root, pool), s"no such pool: $pool")
    val all = commits(root, pool)
    // An object is live if ANY branch head still sees it (the reference's
    // vacuum removes only objects unreferenced by every branch): a delete
    // on one branch must not reclaim an object another branch still scans.
    val live = branches(root, pool).flatMap(b => liveIds(visibleOn(all, b))).toSet
    val dataDir = poolDir(root, pool).resolve("data")
    val removed = Option(dataDir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !live(f.getName))
      .map { f => org.apache.commons.io.FileUtils.deleteQuietly(f); f.getName }
    removed.toSeq
  }

  /** Drop a pool entirely (service DELETE /pool). */
  def drop(root: String, pool: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(poolDir(root, pool).toFile): Unit

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
