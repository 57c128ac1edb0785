package graft
object PDbg {
  def main(args: Array[String]): Unit = {
    for (q <- args) {
      println("==== " + q)
      try { graft.lang.Parser.parse(q); println("parse ok") }
      catch { case e: Throwable => println("EXC " + e.getMessage) }
      try println(graft.lang.Zfmt.canonical(q))
      catch { case e: Throwable => println("CANON EXC " + e.getMessage) }
    }
  }
}
