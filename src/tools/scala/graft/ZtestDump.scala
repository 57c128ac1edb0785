package graft

/** Diagnostic: run every reference golden test and dump pass/fail with the
  * failure category (parse / exec exception / wrong output) so rounds can
  * target the biggest gap. Run:
  *   sbt 'Test/runMain graft.ZtestDump /tmp/ztest_dump.txt'
  */
object ZtestDump {
  def main(args: Array[String]): Unit = {
    val outPath = if (args.nonEmpty) args(0) else "/tmp/ztest_dump.txt"
    val filter = if (args.length > 1) args(1) else ""
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val cases = ZtestHarness.extractCases()
      .filter(c => filter.isEmpty || c.file.contains(filter))
    val sb = new StringBuilder
    var pass, parseFail, execFail, wrong = 0
    for (c <- cases) {
      val parsed =
        try { Right(graft.lang.Parser.parse(c.zed)) }
        catch { case e: Exception => Left(e) }
      parsed match {
        case Left(e) =>
          parseFail += 1
          sb.append(s"=== PARSEFAIL ${c.file}\n--- zed\n${c.zed}\n--- err\n${e.getMessage}\n\n")
        case Right(_) =>
          try {
            val got = ZtestHarness.run(spark, c)
            if (ZtestHarness.matches(c, got)) pass += 1
            else {
              wrong += 1
              val w = ZtestHarness.canonAll(c.output).map(_.mkString("\n")).getOrElse("<unparseable>")
              val g = ZtestHarness.canonAll(got.mkString("\n")).map(_.mkString("\n")).getOrElse("<unparseable>")
              sb.append(s"=== WRONG ${c.file}\n--- zed\n${c.zed}\n--- flags\nin[${c.inputFlags}] out[${c.outputFlags}] ordered=${ZtestHarness.orderImplied(c.zed)}\n--- input\n${c.input}\n--- want\n${c.output}\n--- wantN\n$w\n--- gotN\n$g\n--- gotRaw\n${got.mkString("\n")}\n\n")
            }
          } catch {
            case e: Exception =>
              execFail += 1
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(3).mkString(" | ")
              sb.append(s"=== EXECFAIL ${c.file}\n--- zed\n${c.zed}\n--- input\n${c.input}\n--- err\n${e.getClass.getSimpleName}: $msg\n\n")
          }
      }
    }
    sb.insert(0, s"TOTAL=${cases.length} PASS=$pass PARSEFAIL=$parseFail EXECFAIL=$execFail WRONG=$wrong\n\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), sb.toString.getBytes)
    println(s"TOTAL=${cases.length} PASS=$pass PARSEFAIL=$parseFail EXECFAIL=$execFail WRONG=$wrong -> $outPath")
    spark.stop()
  }
}
