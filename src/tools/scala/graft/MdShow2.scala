package graft
import org.scalatest.funsuite.AnyFunSuite
class MdShow2 extends AnyFunSuite {
  test("show zjson md") {
    val spark = GraftSession.local(4)
    val wd = java.nio.file.Files.createTempDirectory("mdshow")
    java.nio.file.Files.write(wd.resolve("input.zson"),
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/docs/formats/zjson.md")), "UTF-8")
        .split("```mdtest-input input.zson\n")(1).split("```")(0).getBytes("UTF-8"))
    val sh = new MdtestHarness.Shell(spark, wd)
    val out = sh.runBlock("super query -f zjson input.zson | jq .")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/zjson_got.txt"), out.getBytes("UTF-8"))
    println("WROTE /tmp/zjson_got.txt")
    spark.stop()
  }
}
