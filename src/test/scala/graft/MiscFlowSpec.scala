package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Replays the reference's REMAINING script-style ztests — the
  * directories not already pinned by LakeFlowSpec (lake/db/query) and
  * ServiceFlowSpec (service): compiler + parser error surfaces, zfmt
  * canonicalization, the zio codec CLIs (zng/zson/zjson/csv/json/zeek/
  * arrow/parquet/vng), runtime operator scripts (sam + vam + vcache),
  * manage/dev utilities, and the doc-language scripts. Same harness,
  * same exact-output bar (ztest/ztest.go script style).
  */
class MiscFlowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(8)

  override def afterAll(): Unit = spark.stop()

  test("reference misc script-ztest flows replay end-to-end") {
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = Seq(
      "/root/reference/ztests",
      "/root/reference/compiler/ztests",
      "/root/reference/compiler/parser/ztests",
      "/root/reference/zfmt/ztests",
      "/root/reference/zson/ztests",
      "/root/reference/vng/ztests",
      "/root/reference/zio/zngio/ztests",
      "/root/reference/zio/zsonio/ztests",
      "/root/reference/zio/zjsonio/ztests",
      "/root/reference/zio/anyio/ztests",
      "/root/reference/zio/csvio/ztests",
      "/root/reference/zio/jsonio/ztests",
      "/root/reference/zio/zeekio/ztests",
      "/root/reference/zio/arrowio/ztests",
      "/root/reference/zio/parquetio/ztests",
      "/root/reference/zio/vngio/ztests",
      "/root/reference/zio/lakeio/ztests",
      "/root/reference/zio/emitter/ztests",
      "/root/reference/runtime/ztests",
      "/root/reference/runtime/vcache/ztests",
      "/root/reference/runtime/vam/op/ztests",
      "/root/reference/runtime/sam/op/ztests",
      "/root/reference/runtime/sam/op/join/ztests",
      "/root/reference/runtime/sam/op/meta/ztests",
      "/root/reference/runtime/sam/op/groupby/ztests",
      "/root/reference/runtime/sam/op/fuse/ztests",
      "/root/reference/runtime/sam/expr/ztests",
      "/root/reference/runtime/sam/expr/agg/ztests",
      "/root/reference/runtime/sam/expr/function/ztests",
      "/root/reference/cmd/super/db/manage/ztests",
      "/root/reference/cmd/super/dev/vector/ztests",
      "/root/reference/cmd/super/dev/dig/ztests",
      "/root/reference/docs/language/ztests"
    ).filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))
    val only = sys.env.get("MISCFLOW_ONLY")
    val cases = ScriptHarness.extract(dirs)
      .filter(c => only.forall(c.file.contains))
    assert(only.isDefined || cases.length >= 190,
      s"script extraction looks broken: ${cases.length}")
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
          failures += ((c.file, "UNSUPPORTED: " + e.getMessage))
        case e: Throwable =>
          failures += ((c.file, s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(200)))
      }
    }
    info(s"misc script flows: $pass / ${cases.length} pass " +
      s"($unsupported unsupported)")
    if (sys.env.contains("MISCFLOW_VERBOSE"))
      failures.result().foreach { case (f, why) =>
        info(s"FAIL $f :: ${why.linesIterator.take(2).mkString(" | ").take(200)}")
      }
    if (only.isEmpty)
      assert(pass >= 100, s"misc flow pass count regressed: $pass")
  }
}
