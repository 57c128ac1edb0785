package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end execution of the reference's OWN golden tests: each ztest's
  * input (typed ZSON / zeek / csv / json per its input-flags) runs through
  * the engine with its `zed` program, the result renders in the test's
  * output format (zson/csv/zeek/json/table/text), and values compare
  * canonically — ORDERED when the program implies an order (zed is an
  * ordered sequence, docs/language/pipeline-model.md:6-16), as a multiset
  * otherwise. Decorator widths and named types canon away; error values,
  * typed nulls, unions and per-row shapes do NOT (they must be produced).
  *
  * The floor pins the measured pass count so semantic regressions fail CI.
  * Remainder (2): top-level typed-null records, map keys distinct only
  * by type.
  */
class ZtestExecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(8)

  override def afterAll(): Unit = spark.stop()

  test("at least 472 reference golden tests pass end-to-end") {
    spark.sparkContext.setLogLevel("ERROR")
    val cases = ZtestHarness.extractCases()
    assert(cases.length > 450, s"corpus extraction looks broken: ${cases.length}")
    var pass = 0
    for (c <- cases) {
      try {
        if (ZtestHarness.matches(c, ZtestHarness.run(spark, c))) pass += 1
        else if (sys.env.contains("ZTEST_VERBOSE")) info(s"FAIL ${c.file}")
      } catch { case e: Exception =>
        if (sys.env.contains("ZTEST_VERBOSE"))
          info(s"FAIL ${c.file} :: ${String.valueOf(e.getMessage).take(150)}")
      }
    }
    info(s"end-to-end golden-test passes: $pass / ${cases.length}")
    assert(pass >= 472, s"golden-test pass count regressed to $pass")
  }
}
