package graft

import org.scalatest.funsuite.AnyFunSuite

/** Run a single doc example by file substring + ord: MDONE="over.md 0" */
class MdOne extends AnyFunSuite {
  test("one doc example") {
    val spec = sys.env.getOrElse("MDONE", "")
    if (spec.nonEmpty) {
      val parts = spec.split("\\s+")
      val (sub, ord) = (parts(0), parts(1).toInt)
      val spark = GraftSession.local(4)
      spark.sparkContext.setLogLevel("ERROR")
      val files = MdtestHarness.extractFiles().filter(_.path.contains(sub))
      for (f <- files; c <- f.cases if c.ord == ord) {
        println(s"== ${f.path}#$ord")
        val sh = new MdtestHarness.Shell(spark,
          MdtestHarness.workDirFor(f, MdtestHarness.dirOf(c.cmdInfo)))
        try {
          val got = sh.runBlock(c.command)
          println("--- got ---"); println(got)
          println("--- want ---"); println(c.output)
          println("compare=" + MdtestHarness.compare(c, got))
        } catch { case e: Throwable => println("ERR: " + e) }
      }
    }
  }
}
