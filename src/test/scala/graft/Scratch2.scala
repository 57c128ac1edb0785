package graft
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val input = "{_path:\"conn\",x:1}\n{_path:\"unknown\",x:2}"
    for (zed <- Seq(
      "type conn = {a:string}\nconst schemas = |{\"conn\": conn}|\ncut s:=schemas[_path]",
      "type conn = {a:string}\nconst schemas = |{\"conn\": conn}|\ncut m:=missing(schemas[_path])",
      "const m2 = |{\"conn\": 7}|\ncut s:=m2[_path]")) {
      try {
        val df = lang.Graft.queryOn(sources.ZsonReader.fromText(spark, input), zed)
        println("ZED|" + zed.linesIterator.toSeq.last)
        sources.ZsonIO.toZson(df).collect().foreach(l => println("  OUT|" + l))
      } catch { case e: Exception => println("EXC|" + e.getMessage.take(200)) }
    }
    spark.stop()
  }
}
