package graft
object ScriptDbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val it = java.nio.file.Files.walk(java.nio.file.Paths.get("/root/reference"))
      .iterator()
    val b = Vector.newBuilder[String]
    while (it.hasNext) {
      val p = it.next()
      if (java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString == "ztests") b += p.toString
    }
    val cases = ScriptHarness.extract(b.result())
    for (sub <- args; c <- cases.filter(_.file.contains(sub))) {
      println("##### " + c.file)
      try {
        val r = ScriptHarness.run(spark, c)
        println("--- stdout got\n" + r.stdout + "--- stderr got\n" + r.stderr)
        c.outputs.foreach(o => println(s"--- want ${o.name} (re=${o.isRegex})\n${o.text}"))
        println("MATCH=" + ScriptHarness.matches(c, r))
      } catch { case e: Throwable => println("EXC " + e); e.printStackTrace() }
    }
    spark.stop()
  }
}
