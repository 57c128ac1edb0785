package graft

/** Debug: run SCRZ over SCRIN, show the final frame's schema and raw rows
  * (variant struct fields visible), plus toZson output.
  */
object VarDbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val zed = sys.env.getOrElse("SCRZ", "yield this")
    val input = sys.env.getOrElse("SCRIN", "null")
    val in = graft.sources.ZsonReader.fromText(spark, input)
    val res = graft.lang.Graft.queryOn(in, zed)
    println("== schema: " + res.schema.treeString)
    res.collect().foreach(r => println("== row: " + r))
    graft.sources.ZsonIO.toZson(res).collect().foreach(l => println("== zson: " + l))
    spark.stop()
  }
}
