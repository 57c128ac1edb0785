package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession

import graft.lang.Graft
import graft.sources.{Formats, Lake, ZsonIO}

/** REST query service (reference: service/core.go:171-206 — POST /query,
  * pool listing; responses stream ZSON lines like zed's ZNG-over-HTTP).
  *
  * JDK-built-in HTTP server — query compilation and execution are fully
  * distributed Spark work; only response serialization passes the driver,
  * capped by the `limit` parameter exactly like the reference's paged
  * responses.
  *
  *   POST /query    body = the Zed query text
  *                  ?dir=<sfDir>  ?fmt=zson|text  ?limit=N
  *   GET  /pools?root=<lakeRoot>          pool listing
  *   GET  /status                         liveness
  */
final class Service(spark: SparkSession, defaultDir: String, port: Int) {

  @volatile private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // streaming response: chunked transfer + toLocalIterator — driver
    // memory stays one partition regardless of result size (the
    // reference's paged ZNG-over-HTTP); `limit` is a guard, 0 = unlimited
    server.createContext("/query", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val params = query(ex)
          val dir = params.getOrElse("dir", defaultDir)
          val fmt = params.getOrElse("fmt", "zson")
          val limit = params.getOrElse("limit", "0").toInt
          // named multi-output graphs (op/mux.go): ?output=<name> selects
          // one labeled leg; ?channels=true streams EVERY leg framed by
          // the reference's control messages (api.go QueryChannelSet/End);
          // without either the combined stream flows
          if (params.get("channels").contains("true")) {
            val outs = Graft.queryOutputs(spark, dir, body)
            ex.getResponseHeaders.add("Content-Type", "application/x-zson")
            ex.sendResponseHeaders(200, 0)
            val os = new java.io.BufferedOutputStream(ex.getResponseBody, 64 * 1024)
            def line(s: String): Unit = {
              os.write(s.getBytes(StandardCharsets.UTF_8)); os.write('\n')
            }
            outs.foreach { case (name, leg0) =>
              val leg = if (limit > 0) leg0.limit(limit) else leg0
              line(s"""{"type":"QueryChannelSet","value":{"channel":"${Service.esc(name)}"}}""")
              val lit = ZsonIO.toZson(leg).toLocalIterator()
              while (lit.hasNext) line(lit.next())
              line(s"""{"type":"QueryChannelEnd","value":{"channel":"${Service.esc(name)}"}}""")
            }
            os.flush()
            ex.getResponseBody.close()
            return
          }
          val df0 = params.get("output") match {
            case Some(name) =>
              val outs = Graft.queryOutputs(spark, dir, body)
              outs.collectFirst { case (n, f) if n == name => f }.getOrElse(
                throw new IllegalArgumentException(
                  s"no such output: $name (have ${outs.map(_._1).mkString(", ")})"))
            case None => Graft.query(spark, dir, body)
          }
          val df = if (limit > 0) df0.limit(limit) else df0
          val it = (fmt match {
            case "text" => Formats.textLines(df)
            case _ => ZsonIO.toZson(df)
          }).toLocalIterator()
          ex.getResponseHeaders.add("Content-Type", "application/x-zson")
          ex.sendResponseHeaders(200, 0) // 0 = chunked transfer encoding
          val os = new java.io.BufferedOutputStream(ex.getResponseBody, 64 * 1024)
          while (it.hasNext) {
            os.write(it.next().getBytes(StandardCharsets.UTF_8))
            os.write('\n')
          }
          os.flush()
          ex.getResponseBody.close()
        } catch {
          case e: Exception =>
            val msg = (s"""{error:"${Service.esc(String.valueOf(e.getMessage))}"}""" + "\n")
              .getBytes(StandardCharsets.UTF_8)
            try {
              ex.sendResponseHeaders(400, msg.length)
              ex.getResponseBody.write(msg)
            } catch { case _: Exception => } // headers already sent mid-stream
            finally ex.getResponseBody.close()
        }
      }
    })
    server.createContext("/pools", handler { ex =>
      val root = query(ex).getOrElse("root", "/tmp/graft_lake")
      val pools = Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty)
        .filter(f => Lake.exists(root, f.getName))
        .map(f => s"""{name:"${Service.esc(f.getName)}",commits:${Lake.commits(root, f.getName).length}}""")
      (200, pools.mkString("", "\n", "\n"))
    })
    // POST /load?root=<lakeRoot>&pool=<name>[&author=..&message=..]
    // body = a Zed query; the result is committed into the pool (load.go
    // via the REST surface — service/core.go's branch-load endpoint)
    server.createContext("/load", handler { ex =>
      val params = query(ex)
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val root = params.getOrElse("root", "/tmp/graft_lake")
      val pool = params.getOrElse("pool",
        throw new IllegalArgumentException("pool parameter required"))
      val df = Graft.query(spark, params.getOrElse("dir", defaultDir), body)
      val id = Lake.load(df, root, pool,
        params.getOrElse("author", "service"), params.getOrElse("message", ""),
        params.getOrElse("branch", "main"))
      event(s"""{kind:"commit",pool:"${Service.esc(pool)}",commit:"$id"}""")
      (200, s"""{commit:"$id",pool:"$pool"}""" + "\n")
    })
    server.createContext("/status", handler { _ => (200, "{status:\"ok\"}\n") })
    // pool/branch CRUD (service/core.go:171-206 pool-create/-delete,
    // branch-create endpoints)
    server.createContext("/pool", handler { ex =>
      val params = query(ex)
      val root = params.getOrElse("root", "/tmp/graft_lake")
      val name = params.getOrElse("name",
        throw new IllegalArgumentException("name parameter required"))
      ex.getRequestMethod match {
        case "POST" =>
          // ?key= sets the pool key (reference PoolPostRequest layout
          // keys — `zed create -orderby`): loads range-sort by it and
          // range scans prune objects/row groups
          Lake.create(root, name, params.get("key"))
          event(s"""{kind:"pool-create",pool:"${Service.esc(name)}"}""")
          (200, s"""{pool:"${Service.esc(name)}",created:true}""" + "\n")
        case "DELETE" =>
          Lake.drop(root, name)
          event(s"""{kind:"pool-delete",pool:"${Service.esc(name)}"}""")
          (200, s"""{pool:"${Service.esc(name)}",deleted:true}""" + "\n")
        case other => (405, s"""{error:"method $other not allowed"}""" + "\n")
      }
    })
    server.createContext("/branch", handler { ex =>
      val params = query(ex)
      val root = params.getOrElse("root", "/tmp/graft_lake")
      val pool = params.getOrElse("pool",
        throw new IllegalArgumentException("pool parameter required"))
      ex.getRequestMethod match {
        case "POST" =>
          val name = params.getOrElse("name",
            throw new IllegalArgumentException("name parameter required"))
          Lake.branch(root, pool, name, params.get("at"))
          event(s"""{kind:"branch-create",pool:"${Service.esc(pool)}",branch:"${Service.esc(name)}"}""")
          (200, s"""{pool:"${Service.esc(pool)}",branch:"${Service.esc(name)}"}""" + "\n")
        case _ =>
          (200, Lake.branches(root, pool)
            .map(b => s"""{branch:"${Service.esc(b)}"}""").mkString("", "\n", "\n"))
      }
    })
    // lake maintenance (cmd/super/db/{merge,revert,compact,vacuum})
    server.createContext("/merge", handler { ex =>
      val p = query(ex)
      val merged = Lake.merge(p.getOrElse("root", "/tmp/graft_lake"),
        p("pool"), p("branch"), p.getOrElse("into", "main"))
      (200, s"""{merged:${merged.length}}""" + "\n")
    })
    server.createContext("/revert", handler { ex =>
      val p = query(ex)
      Lake.revert(p.getOrElse("root", "/tmp/graft_lake"), p("pool"),
        p("commit"), p.getOrElse("branch", "main"))
      (200, s"""{reverted:"${Service.esc(p("commit"))}"}""" + "\n")
    })
    server.createContext("/compact", handler { ex =>
      val p = query(ex)
      val id = Lake.compact(spark, p.getOrElse("root", "/tmp/graft_lake"),
        p("pool"), p.getOrElse("branch", "main"))
      (200, s"""{compacted:"$id"}""" + "\n")
    })
    server.createContext("/vacuum", handler { ex =>
      val p = query(ex)
      val removed = Lake.vacuum(p.getOrElse("root", "/tmp/graft_lake"), p("pool"))
      (200, s"""{vacuumed:${removed.length}}""" + "\n")
    })
    // GET /events[?since=N] — server-sent events of lake activity
    // (service/core.go /events SSE). Replays the retained log from
    // `since` and closes; a long-poll client re-connects with its last id.
    server.createContext("/events", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val since = query(ex).getOrElse("since", "0").toLong
        ex.getResponseHeaders.add("Content-Type", "text/event-stream")
        ex.sendResponseHeaders(200, 0)
        val os = ex.getResponseBody
        events.synchronized {
          events.foreach { case (id, data) =>
            if (id > since)
              os.write(s"id: $id\nevent: lake\ndata: $data\n\n".getBytes(StandardCharsets.UTF_8))
          }
        }
        os.close()
      }
    })
    server.setExecutor(null) // serial — Spark parallelizes inside each query
    server.start()
    server.getAddress.getPort
  }

  // bounded in-memory event log feeding /events (SSE)
  private val events = scala.collection.mutable.ArrayDeque.empty[(Long, String)]
  private val eventSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private def event(data: String): Unit = events.synchronized {
    events.append((eventSeq.incrementAndGet(), data))
    if (events.length > 1000) events.removeHead(): Unit
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> java.net.URLDecoder.decode(v, "UTF-8") }
      .toMap

  private def handler(f: HttpExchange => (Int, String)): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val (code, body) =
        try f(ex)
        catch { case e: Exception =>
          (400, s"""{error:"${Service.esc(String.valueOf(e.getMessage))}"}""" + "\n") }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/x-zson")
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
    }
  }
}

object Service {
  /** ZSON string-literal escaping for interpolated response text. */
  private[graft] def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")

  /** `runMain graft.Service [port] [dir]` — serve until killed. */
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(9867) // zed's default port
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val svc = new Service(spark, dir, port)
    val actual = svc.start()
    println(s"graft service listening on 127.0.0.1:$actual")
    Thread.currentThread().join()
  }
}
