package graft

/** Throwaway debug entry — not part of the suite. Runs one inline ztest
  * case: args = zed program, input, [inputFlags], [outputFlags].
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    def env(k: String, d: String) = sys.env.getOrElse(k, d)
    val zed = if (args.nonEmpty) args(0) else env("SCRZ", "yield len(ksuid())")
    val input = if (args.length > 1) args(1) else env("SCRIN", "null")
    val inFlags = if (args.length > 2) args(2) else env("SCRINF", "")
    val outFlags = if (args.length > 3) args(3) else env("SCROUTF", "")
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val c = ZtestHarness.ZCase("scratch", zed, input, inFlags, "", outFlags)
    try {
      val got = ZtestHarness.run(spark, c)
      println("=== GOT")
      got.foreach(println)
    } catch { case e: Exception =>
      println("=== EXC " + e)
      e.printStackTrace()
    }
    spark.stop()
  }
}
