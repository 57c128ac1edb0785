package graft

/** Throwaway debug entry — not part of the suite. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val input = """{
    info: "Connection Example",
    src: {
        addr: 10.1.1.2,
        port: 80 (uint16)
    } (=socket),
    dst: {
        addr: 10.0.1.2,
        port: 20130
    } (socket)
} (=conn)
null(conn)
"""
    try {
      val vs = graft.sources.ZsonParser.parseAll(input)
      println("PARSED OK: " + vs.length)
      vs.foreach(v => println(graft.sources.ZValue.zsonText(v)))
    } catch { case e: Exception => println("FAIL: " + e) }
  }
}
