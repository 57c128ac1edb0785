package graft

/** Throwaway debug entry — zson text → frame → zng → frame → zson, with
  * the intermediate carrier rows printed.
  */
object UDbg {
  def main(args: Array[String]): Unit = {
    val text = sys.env.getOrElse("UIN",
      "{u:80(int32)((string,int32))((string,[int32],[string],(string,int32)))}")
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val frame = graft.sources.ZsonReader.fromText(spark, text, tag = true).coalesce(1)
    println("=== SCHEMA TAGS")
    val tagIdx = frame.schema.fieldNames.indexOf(graft.operators.Het.typeTag)
    frame.collect().foreach { r =>
      println("  tag=" + (if (tagIdx >= 0) r.getString(tagIdx) else "-"))
      println("  row=" + r)
    }
    println("=== BASE ZSON")
    graft.sources.ZsonIO.toZson(frame).collect().foreach(println)
    val dir = java.nio.file.Files.createTempDirectory("udbg")
    graft.sources.ZngIO.write(frame, s"$dir/a.zng")
    println("=== ZNG HEX")
    val f = new java.io.File(s"$dir/a.zng").listFiles()
      .filter(_.getName.endsWith(".zng")).head
    println(java.nio.file.Files.readAllBytes(f.toPath)
      .map("%02x".format(_)).mkString(" "))
    val back = graft.sources.ZngIO.read(spark, s"$dir/a.zng").coalesce(1)
    println("=== BACK ROWS")
    val tagIdx2 = back.schema.fieldNames.indexOf(graft.operators.Het.typeTag)
    back.collect().foreach { r =>
      println("  tag=" + (if (tagIdx2 >= 0) r.getString(tagIdx2) else "-"))
      println("  row=" + r)
    }
    println("=== BACK ZSON")
    graft.sources.ZsonIO.toZson(back).collect().foreach(println)
    spark.stop()
  }
}
