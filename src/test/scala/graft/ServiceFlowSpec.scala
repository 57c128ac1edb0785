package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Replays the reference's SERVICE script-ztests (service/ztests: bash
  * scripts starting an HTTP lake service and driving it via the CLI and
  * curl). `source service.sh` starts an in-process graft.Service; curl
  * commands hit the REAL HTTP surface; db/query commands share the same
  * backing lake. The floor pins the measured pass count.
  */
class ServiceFlowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(8)

  override def afterAll(): Unit = spark.stop()

  test("reference service script-ztest flows replay end-to-end") {
    spark.sparkContext.setLogLevel("ERROR")
    val cases = ScriptHarness.extract(Seq("/root/reference/service/ztests"))
    assert(cases.length >= 60, s"service extraction looks broken: ${cases.length}")
    var pass = 0
    var unsupported = 0
    val failures = Vector.newBuilder[(String, String)]
    for (c <- cases) {
      try {
        if (ScriptHarness.matches(c, ScriptHarness.run(spark, c))) pass += 1
        else failures += ((c.file, "output mismatch"))
      } catch {
        case e: MdtestHarness.Unsupported =>
          unsupported += 1
          failures += ((c.file, e.getMessage))
        case e: Throwable =>
          failures += ((c.file, s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(200)))
      }
    }
    info(s"service script flows: $pass / ${cases.length} pass " +
      s"($unsupported unsupported)")
    if (sys.env.contains("SVCFLOW_VERBOSE"))
      failures.result().foreach { case (f, why) =>
        info(s"FAIL $f :: ${why.linesIterator.take(2).mkString(" | ").take(200)}")
      }
    assert(pass >= 70, s"service flow pass count regressed: $pass")
  }
}
