package graft
object ParseProbe {
  def main(args: Array[String]): Unit = {
    for (q <- Seq(
      "type mystring=string\nfrom test \\ count()",
      "type mystring=string\nfrom test | count()",
      "type mystring=string",
      "from test \\ count()")) {
      val r = try { graft.lang.Parser.parse(q); "OK" }
              catch { case e: Exception => e.getMessage }
      println(s"=== [${q.replace("\n", "\\n")}] -> $r")
    }
  }
}
