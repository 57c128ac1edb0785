package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import scala.jdk.CollectionConverters._

/** End-to-end execution of the reference's OWN golden tests: each ztest's
  * `input` (ZSON) runs through the engine with its `zed` program and the
  * result is compared against the expected `output` as an order-insensitive
  * multiset of canonicalized values (sorted keys, decorators stripped,
  * numerics normalized — the engine is relational, zed is ordered and
  * per-value typed, so textual equality is not the bar).
  *
  * The floor pins the measured pass count so semantic regressions fail CI.
  * Unpassed remainder: heterogeneous multi-shape streams, union/error
  * values, first-class type machinery, and ordered-output tests.
  */
class ZtestExecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(8)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override def afterAll(): Unit = spark.stop()

  private def canon(n0: com.fasterxml.jackson.databind.JsonNode): String = {
    val n = n0
    if (n == null || n.isNull) "null"
    else if (n.isObject)
      n.properties().asScala.toSeq
        .filterNot(_.getValue.isNull)
        .sortBy(_.getKey)
        .map(e => "\"" + e.getKey + "\":" + canon(e.getValue))
        .mkString("{", ",", "}")
    else if (n.isArray) (0 until n.size()).map(i => canon(n.get(i))).mkString("[", ",", "]")
    else if (n.isNumber) {
      val d = n.asDouble()
      if (d == Math.floor(d) && Math.abs(d) < 1e15) d.toLong.toString else d.toString
    } else n.toString
  }

  private def normalize(zsonLines: Seq[String]): Seq[String] =
    zsonLines.map(_.trim).filter(_.nonEmpty).flatMap { l =>
      try {
        var n = mapper.readTree(graft.sources.ZsonIO.zsonLineToJson(l))
        if (n.isObject && n.size() == 1 && n.has("this")) n = n.get("this")
        Some(canon(n))
      } catch { case _: Exception => None }
    }.sorted

  private def runCase(zed: String, input: String): Seq[String] = {
    import spark.implicits._
    val json = input.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map(graft.sources.ZsonIO.zsonLineToJson)
      .map(j => if (j.startsWith("{")) j else s"""{"this":$j}""")
      .toSeq
    val df = spark.read.json(spark.createDataset(json))
    graft.sources.ZsonIO.toZson(graft.lang.Graft.queryOn(df, zed)).collect().toSeq
  }

  private def extractCases(): Seq[(String, String, String)] = {
    val out = Vector.newBuilder[(String, String, String)]
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get("/root/reference"))
      .iterator().asScala
      .filter(p => p.toString.contains("ztests") && p.toString.endsWith(".yaml"))
    for (f <- files) {
      val lines = java.nio.file.Files.readAllLines(f).asScala
      def block(key: String): Option[String] = {
        val idx = lines.indexWhere(_.startsWith(s"$key: |"))
        if (idx < 0) None
        else {
          val b = lines.drop(idx + 1)
            .takeWhile(l => l.startsWith("  ") || l.trim.isEmpty)
            .map(_.stripPrefix("  "))
          Some(b.mkString("\n").trim)
        }
      }
      def inline(key: String): Option[String] =
        lines.find(l => l.startsWith(s"$key: ") && !l.startsWith(s"$key: |")).map { l =>
          var q = l.drop(key.length + 2).trim
          if ((q.startsWith("'") && q.endsWith("'") && q.length > 1) ||
              (q.startsWith("\"") && q.endsWith("\"") && q.length > 1))
            q = q.substring(1, q.length - 1)
          q
        }
      for {
        zed <- block("zed").orElse(inline("zed"))
        in <- block("input")
        outp <- block("output")
        if zed.nonEmpty && in.nonEmpty && outp.nonEmpty
      } out += ((zed, in, outp))
    }
    out.result()
  }

  test("at least 130 reference golden tests pass end-to-end") {
    val cases = extractCases()
    assert(cases.length > 450, s"corpus extraction looks broken: ${cases.length}")
    var pass = 0
    for ((zed, in, want) <- cases) {
      try {
        val got = normalize(runCase(zed, in))
        val expect = normalize(want.linesIterator.toSeq)
        if (got == expect && expect.nonEmpty) pass += 1
      } catch { case _: Exception => }
    }
    info(s"end-to-end golden-test passes: $pass / ${cases.length}")
    assert(pass >= 130, s"golden-test pass count regressed to $pass")
  }
}
