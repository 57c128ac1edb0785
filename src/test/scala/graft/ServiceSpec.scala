package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI

/** REST service round-trip (reference service/ztests style: POST a query,
  * diff the response text).
  */
class ServiceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private var svc: Service = _
  private var port: Int = 0
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    svc = new Service(spark, "/root/testdata/sf0.001", 0) // ephemeral port
    port = svc.start()
  }

  override def afterAll(): Unit = {
    if (svc != null) svc.stop()
    spark.stop()
  }

  private def post(path: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def get(path: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("POST /query runs a pipeline and streams ZSON lines") {
    val (code, body) = post("/query", "from events | count() by event_type | sort event_type")
    assert(code == 200)
    val lines = body.trim.split("\n")
    assert(lines.length == 5)
    assert(lines.head.matches("""\{event_type:"click",count:\d+\}"""))
  }

  test("POST /query honors fmt=text and limit") {
    val (code, body) = post("/query?fmt=text&limit=3", "from nation | sort n_nationkey | cut n_nationkey, n_name")
    assert(code == 200)
    val lines = body.trim.split("\n")
    assert(lines.length == 3 && lines.head == "0\tNATION_0")
  }

  test("/query streams the full result chunked (no truncation)") {
    val (code, body) = post("/query?fmt=text", "from events | cut event_id")
    assert(code == 200)
    assert(body.trim.split("\n").length == 1000) // all sf0.001 events
  }

  test("bad query returns a structured error, not a 500") {
    val (code, body) = post("/query", "from nowhere | bogus !!!")
    assert(code == 400 && body.contains("error"))
  }

  test("POST /load commits a query result into a lake pool") {
    val root = java.nio.file.Files.createTempDirectory("graft-svc-lake").toString
    val enc = java.net.URLEncoder.encode(root, "UTF-8")
    val (code, body) = post(s"/load?root=$enc&pool=svc",
      "from nation | where n_regionkey == 0")
    assert(code == 200 && body.contains("commit:"))
    val (code2, listing) = get(s"/pools?root=$enc")
    assert(code2 == 200 && listing.contains("svc"))
    // the loaded pool is queryable via the lake API
    assert(graft.sources.Lake.scan(spark, root, "svc").count() == 5)
  }

  test("GET /status answers") {
    val (code, body) = get("/status")
    assert(code == 200 && body.contains("ok"))
  }
}
