package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Parser compatibility sweep over the reference's OWN ztest corpus: every
  * `zed:` program in /root/reference's ztests is fed to the frontend. The
  * bar asserts the measured compat rate so regressions in grammar coverage
  * fail loudly. (Unparsed remainder: spreads, lateral expression
  * subqueries, unicode escapes, and other long-tail forms.)
  */
class ZtestParseSpec extends AnyFunSuite {

  private def extractQueries(): Seq[String] = {
    val root = java.nio.file.Paths.get("/root/reference")
    val out = Vector.newBuilder[String]
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.contains("ztests") && p.toString.endsWith(".yaml"))
    for (f <- files) {
      val lines = java.nio.file.Files.readAllLines(f).asScala
      var i = 0
      while (i < lines.length) {
        val l = lines(i)
        if (l.startsWith("zed: |")) {
          // block scalar: indented lines that follow
          val block = Vector.newBuilder[String]
          i += 1
          while (i < lines.length && (lines(i).startsWith("  ") || lines(i).trim.isEmpty)
                 && !lines(i).startsWith("input") && !lines(i).startsWith("output")) {
            block += lines(i).stripPrefix("  ")
            i += 1
          }
          out += block.result().mkString("\n").trim
        } else if (l.startsWith("zed: ")) {
          var q = l.drop(5).trim
          if ((q.startsWith("'") && q.endsWith("'") && q.length > 1) ||
              (q.startsWith("\"") && q.endsWith("\"") && q.length > 1))
            q = q.substring(1, q.length - 1)
          out += q
          i += 1
        } else i += 1
      }
    }
    out.result().filter(_.nonEmpty)
  }

  test("frontend parses at least 80% of the reference's ztest queries") {
    val qs = extractQueries()
    assert(qs.length > 400, s"corpus extraction looks broken: ${qs.length}")
    var ok = 0
    for (q <- qs) {
      try { lang.Parser.parse(q); ok += 1 }
      catch { case _: Exception => }
    }
    val rate = ok.toDouble / qs.length
    info(f"parsed $ok/${qs.length} (${rate * 100}%.1f%%) of reference ztest queries")
    assert(rate >= 0.80, f"parse compat regressed to ${rate * 100}%.1f%%")
  }
}
