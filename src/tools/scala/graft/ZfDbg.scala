package graft
object ZfDbg {
  def main(args: Array[String]): Unit = {
    for (q <- args) {
      println("==== " + q)
      try println(graft.lang.Zfmt.canonical(q))
      catch { case e: Throwable => println("EXC " + e.getMessage) }
    }
  }
}
