package graft
object Scratch2 {
  def main(args: Array[String]): Unit = {
    import graft.sources._
    val line = """|{0:1,0(uint64):2,0(=t):3,"0":4}|"""
    val v = new ZsonParser(line).parseOne()
    println("PARSED: " + v)
    println("ZSON: " + ZValue.zsonText(ZValue.unwrap(v)))
    println("JSON: " + ZFormat.jsonText(v))
  }
}
