package graft
object EDbg {
  def main(args: Array[String]): Unit = {
    try {
      val v = graft.sources.ZsonParser.parseAll("""{e:%bang (enum(foo,bar,baz))}""")
      println("parsed: " + v)
    } catch { case e: Throwable => println("EXC " + e.getMessage) }
  }
}
