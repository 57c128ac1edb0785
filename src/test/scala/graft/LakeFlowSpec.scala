package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Replays the reference's SCRIPT-style lake/CLI ztests (bash scripts
  * under lake/ztests and cmd/super/db/ztests driving init/create/load/
  * query/branch/merge/revert/compact/vacuum/delete/drop/log sequences)
  * through the engine's own Lake + query APIs via ScriptHarness. The
  * floor pins the measured pass count so lake-flow regressions fail CI.
  */
class LakeFlowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(8)

  override def afterAll(): Unit = spark.stop()

  test("reference lake script-ztest flows replay end-to-end") {
    spark.sparkContext.setLogLevel("ERROR")
    val cases = ScriptHarness.extract(Seq(
      "/root/reference/lake/ztests",
      "/root/reference/cmd/super/db/ztests",
      "/root/reference/cmd/super/query/ztests"))
    assert(cases.length >= 50, s"script extraction looks broken: ${cases.length}")
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
    info(s"lake script flows: $pass / ${cases.length} pass " +
      s"($unsupported unsupported)")
    if (sys.env.contains("LAKEFLOW_VERBOSE"))
      failures.result().foreach { case (f, why) =>
        info(s"FAIL $f :: ${why.linesIterator.take(2).mkString(" | ").take(200)}")
      }
    assert(pass >= 85, s"lake flow pass count regressed: $pass")
  }
}
