package graft

/** Throwaway debug entry — not part of the suite. Replays one
  * script-style ztest yaml (arg 1) and prints full stdout/stderr plus
  * the expected outputs for eyeball diffing.
  */
object FlowDbg {
  def main(args: Array[String]): Unit = {
    val yaml = args.headOption.getOrElse(
      "/root/reference/service/ztests/python.yaml")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val c = ScriptHarness.extract(Seq(
      java.nio.file.Paths.get(yaml).getParent.toString))
      .find(_.file == yaml).getOrElse(sys.error(s"not found: $yaml"))
    try {
      val r = ScriptHarness.run(spark, c)
      println("=== STDOUT")
      println(r.stdout)
      println("=== STDERR")
      println(r.stderr)
      println("=== MATCH " + ScriptHarness.matches(c, r))
      for (o <- c.outputs) {
        println(s"=== EXPECTED ${o.name}${if (o.isRegex) " (regex)" else ""}")
        println(o.text)
      }
    } catch { case e: Exception =>
      println("=== THREW")
      e.printStackTrace()
    }
    spark.stop()
  }
}
