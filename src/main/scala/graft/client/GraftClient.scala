package graft.client

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.time.Duration

import graft.sources.{ZValue, ZsonParser}

/** Typed client for the graft REST service — the analog of the
  * reference's API client (api/client/connection.go; python/superdb's
  * Client). Pure JDK `java.net.http`, no extra dependencies; responses
  * stream line-by-line, so a large query result never materializes in
  * client memory.
  *
  * ```scala
  * val c = new GraftClient("http://127.0.0.1:9867")
  * c.query("from events | head 3").foreach(println)       // raw ZSON lines
  * c.queryValues("from events | count()").foreach(v => …) // parsed values
  * ```
  */
final class GraftClient(baseUrl: String,
    timeout: Duration = Duration.ofMinutes(5)) {

  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  private def enc(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def uri(path: String, params: Seq[(String, String)]): URI = {
    val q = params.filter(_._2 != null)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    URI.create(baseUrl + path + (if (q.isEmpty) "" else s"?$q"))
  }

  private def request(method: String, path: String,
      params: Seq[(String, String)], body: Option[String]): HttpRequest = {
    val b = HttpRequest.newBuilder(uri(path, params)).timeout(timeout)
    (method, body) match {
      case ("POST", Some(s)) => b.POST(HttpRequest.BodyPublishers.ofString(s))
      case ("POST", None) => b.POST(HttpRequest.BodyPublishers.noBody())
      case ("DELETE", _) => b.DELETE()
      case _ => b.GET()
    }
    b.build()
  }

  /** Error payload from the service ({error:"…"} line, status != 200). */
  final case class ServiceError(status: Int, message: String)
      extends RuntimeException(s"service error $status: $message")

  /** Streamed lines of a response; raises ServiceError on non-200. */
  private def lines(method: String, path: String,
      params: Seq[(String, String)] = Seq.empty,
      body: Option[String] = None): Iterator[String] = {
    val resp = http.send(request(method, path, params, body),
      HttpResponse.BodyHandlers.ofLines())
    val it = resp.body().iterator()
    if (resp.statusCode() != 200) {
      val msg = if (it.hasNext) it.next() else ""
      throw ServiceError(resp.statusCode(), msg)
    }
    new Iterator[String] {
      def hasNext: Boolean = it.hasNext
      def next(): String = it.next()
    }
  }

  /** Run a Zed query; the result streams as ZSON lines (fmt="text" for
    * the text writer's form). `limit` caps rows service-side; 0 =
    * unlimited. `output` selects one named leg of a multi-output graph.
    */
  def query(zed: String, dir: String = null, fmt: String = "zson",
      limit: Int = 0, output: String = null): Iterator[String] =
    lines("POST", "/query", Seq(
      "dir" -> dir, "fmt" -> fmt,
      "limit" -> (if (limit > 0) limit.toString else null),
      "output" -> output), Some(zed))

  /** Query returning PARSED zed values (one per result row). */
  def queryValues(zed: String, dir: String = null, limit: Int = 0,
      output: String = null): Iterator[ZValue] =
    query(zed, dir, "zson", limit, output)
      .filter(_.nonEmpty).map(l => new ZsonParser(l).parseOne())

  /** Multi-output query: every named leg, framed by the service's
    * QueryChannelSet/QueryChannelEnd control lines (api.go) — returned
    * as (channel, lines) pairs in service order.
    */
  def queryChannels(zed: String, dir: String = null,
      limit: Int = 0): Seq[(String, Seq[String])] = {
    val setRe = """"type":"QueryChannelSet".*"channel":"([^"]*)"""".r
    val endRe = """"type":"QueryChannelEnd"""".r
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    var current: String = null
    var buf = scala.collection.mutable.ArrayBuffer.empty[String]
    lines("POST", "/query", Seq(
      "dir" -> dir, "channels" -> "true",
      "limit" -> (if (limit > 0) limit.toString else null)), Some(zed))
      .foreach { l =>
        setRe.findFirstMatchIn(l) match {
          case Some(m) => current = m.group(1); buf = scala.collection.mutable.ArrayBuffer.empty
          case None =>
            if (endRe.findFirstIn(l).isDefined) { out += ((current, buf.toSeq)); current = null }
            else if (current != null) buf += l
        }
      }
    out.toSeq
  }

  def status(): Boolean =
    try lines("GET", "/status").mkString.contains("ok")
    catch { case _: Exception => false }

  // ---- lake surface (api/client pool+branch endpoints) ----

  final case class PoolInfo(name: String, commits: Int)

  def pools(root: String): Seq[PoolInfo] = {
    val nameRe = """name:"([^"]*)"""".r
    val commitsRe = """commits:(\d+)""".r
    lines("GET", "/pools", Seq("root" -> root)).filter(_.nonEmpty).map { l =>
      PoolInfo(
        nameRe.findFirstMatchIn(l).map(_.group(1)).getOrElse(""),
        commitsRe.findFirstMatchIn(l).map(_.group(1).toInt).getOrElse(0))
    }.toSeq
  }

  /** Create a pool; `key` sets the pool key (`zed create -orderby` —
    * loads range-sort by it and range scans prune, Lake.scala).
    */
  def createPool(root: String, name: String, key: String = null): Unit =
    lines("POST", "/pool", Seq("root" -> root, "name" -> name, "key" -> key))
      .foreach(_ => ())

  def dropPool(root: String, name: String): Unit =
    lines("DELETE", "/pool", Seq("root" -> root, "name" -> name)).foreach(_ => ())

  /** Commit a query's result into a pool; returns the commit id. */
  def load(root: String, pool: String, zed: String, dir: String = null,
      branch: String = "main", author: String = "client",
      message: String = ""): String = {
    val idRe = """commit:"([^"]*)"""".r
    val resp = lines("POST", "/load", Seq(
      "root" -> root, "pool" -> pool, "dir" -> dir,
      "branch" -> branch, "author" -> author, "message" -> message),
      Some(zed)).mkString
    idRe.findFirstMatchIn(resp).map(_.group(1))
      .getOrElse(throw ServiceError(200, s"no commit id in: $resp"))
  }

  def createBranch(root: String, pool: String, name: String,
      at: String = null): Unit =
    lines("POST", "/branch", Seq(
      "root" -> root, "pool" -> pool, "name" -> name, "at" -> at)).foreach(_ => ())

  def branches(root: String, pool: String): Seq[String] = {
    val re = """branch:"([^"]*)"""".r
    lines("GET", "/branch", Seq("root" -> root, "pool" -> pool))
      .flatMap(l => re.findFirstMatchIn(l).map(_.group(1))).toSeq
  }

  def mergeBranch(root: String, pool: String, branch: String,
      into: String = "main"): Int = {
    val re = """merged:(\d+)""".r
    val resp = lines("POST", "/merge", Seq(
      "root" -> root, "pool" -> pool, "branch" -> branch, "into" -> into)).mkString
    re.findFirstMatchIn(resp).map(_.group(1).toInt).getOrElse(0)
  }

  def revert(root: String, pool: String, commit: String,
      branch: String = "main"): Unit =
    lines("POST", "/revert", Seq(
      "root" -> root, "pool" -> pool, "commit" -> commit,
      "branch" -> branch)).foreach(_ => ())

  def compact(root: String, pool: String, branch: String = "main"): String = {
    val re = """compacted:"([^"]*)"""".r
    val resp = lines("POST", "/compact", Seq(
      "root" -> root, "pool" -> pool, "branch" -> branch)).mkString
    re.findFirstMatchIn(resp).map(_.group(1)).getOrElse("")
  }

  def vacuum(root: String, pool: String): Int = {
    val re = """vacuumed:(\d+)""".r
    val resp = lines("POST", "/vacuum", Seq("root" -> root, "pool" -> pool)).mkString
    re.findFirstMatchIn(resp).map(_.group(1).toInt).getOrElse(0)
  }

  /** Lake activity events after `since` (SSE replay; a long-poll client
    * reconnects with the last id it saw). Returns (id, data) pairs.
    */
  def events(since: Long = 0): Seq[(Long, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = -1L
    lines("GET", "/events", Seq("since" -> since.toString)).foreach { l =>
      if (l.startsWith("id: ")) id = l.drop(4).trim.toLong
      else if (l.startsWith("data: ") && id >= 0) { out += ((id, l.drop(6))); id = -1 }
    }
    out.toSeq
  }
}
