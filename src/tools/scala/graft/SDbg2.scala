package graft
object SDbg2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(2)
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println("==== [" + q + "] len=" + q.length)
      try println(graft.lang.Zfmt.semantic(spark, q, true, 0, None))
      catch { case e: Throwable => println("EXC " + e.getMessage) }
    }
    spark.stop()
  }
}
