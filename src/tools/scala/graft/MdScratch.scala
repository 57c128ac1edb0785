package graft

/** Throwaway debug entry for doc-example cases:
  * Test/runMain graft.MdScratch <file-substring> <ord> — runs every block
  * of the matching file up to and including <ord>, printing got vs want
  * for the target block.
  */
object MdScratch {
  def main(args: Array[String]): Unit = {
    val sub = args(0)
    val ord = args(1).toInt
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val f = MdtestHarness.extractFiles().find(_.path.contains(sub)).get
    val shell = new MdtestHarness.Shell(spark, MdtestHarness.workDirFor(f, None))
    val dirShells = scala.collection.mutable.Map.empty[String, MdtestHarness.Shell]
    try {
      for (c <- f.cases if c.ord <= ord) {
        val sh = MdtestHarness.dirOf(c.cmdInfo) match {
          case Some(d) => dirShells.getOrElseUpdate(d,
            new MdtestHarness.Shell(spark, MdtestHarness.workDirFor(f, Some(d))))
          case None => shell
        }
        val r = try Right(sh.runBlock(c.command)) catch { case e: Throwable => Left(e) }
        if (c.ord == ord) {
          println(s"=== CMD [${c.cmdInfo}]\n${c.command}")
          r match {
            case Right(got) =>
              println(s"=== GOT (level ${MdtestHarness.compare(c, got)})\n$got=== WANT [${c.outInfo}]\n${c.output}")
            case Left(e) =>
              println("=== EXC " + e)
              e.printStackTrace()
          }
        }
      }
    } finally spark.stop()
  }
}
