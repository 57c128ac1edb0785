package graft
import org.scalatest.funsuite.AnyFunSuite
class SvcOne extends AnyFunSuite {
  test("one service flow") {
    val spec = sys.env.getOrElse("SVCONE", "")
    if (spec.nonEmpty) {
      val spark = GraftSession.local(4)
      spark.sparkContext.setLogLevel("ERROR")
      val cases = ScriptHarness.extract(Seq("/root/reference/service/ztests"))
        .filter(_.file.contains(spec))
      for (c <- cases) {
        println(s"== ${c.file}")
        try {
          val r = ScriptHarness.run(spark, c)
          println("--- stdout ---"); println(r.stdout)
          println("--- stderr ---"); println(r.stderr)
          println("match=" + ScriptHarness.matches(c, r))
          c.outputs.foreach(o => { println(s"--- want ${o.name} (re=${o.isRegex}) ---"); println(o.text) })
        } catch { case e: Throwable => println("ERR: " + e); e.printStackTrace() }
      }
    }
  }
}
