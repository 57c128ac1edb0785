package graft

/** Query probe: zson input + query -> schema/shapes/output.
  * Usage: Test/runMain graft.QDbg '<query>' '<zson line>' ...
  */
object QDbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val q = args.head
    val df0 = graft.sources.ZsonReader.fromText(spark, args.tail.mkString("\n"))
    val df = graft.lang.Graft.queryOn(df0, q)
    println("== schema: " + df.schema.treeString.linesIterator.take(12).mkString("\n"))
    df.schema.fields.foreach { f =>
      if (f.metadata.contains("shapes"))
        println("   shapes: " + f.metadata.getStringArray("shapes").mkString(" | "))
      if (f.metadata.contains("graft.zedType"))
        println(s"   zedType(${f.name}): " + f.metadata.getString("graft.zedType"))
    }
    println("== out:")
    graft.sources.ZsonIO.toZson(df).collect().foreach(println)
    spark.stop()
  }
}
