package graft

import graft.sources.{Formats, ZsonIO, ZsonReader}

/** Round-trip probe: zson text -> df -> <fmt> file -> df -> zson lines.
  * Usage: Test/runMain graft.RtDbg <fmt> '<zson line>' ['<zson line>' ...]
  */
object RtDbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val fmt = args.head
    val text = args.tail.mkString("\n")
    val df = ZsonReader.fromText(spark, text)
    println("== input df schema: " + df.schema.treeString)
    df.schema.fields.foreach { f =>
      if (f.metadata.contains("shapes"))
        println("   shapes: " + f.metadata.getStringArray("shapes").mkString(" | "))
      if (f.metadata.contains("ztype"))
        println(s"   ztype(${f.name}): " + f.metadata.getString("ztype"))
    }
    println("== direct zson out:")
    ZsonIO.toZson(df).collect().foreach(println)
    val d = java.nio.file.Files.createTempDirectory("rtdbg")
    val p = d.resolve("out." + fmt)
    Formats.write(df.coalesce(1), p.toString, fmt)
    val back = Formats.read(spark, p.toString)
    println("== read-back schema: " + back.schema.treeString)
    back.schema.fields.foreach { f =>
      if (f.metadata.contains("shapes"))
        println("   shapes: " + f.metadata.getStringArray("shapes").mkString(" | "))
      if (f.metadata.contains("ztype"))
        println(s"   ztype(${f.name}): " + f.metadata.getString("ztype"))
    }
    println("== round-trip zson out:")
    ZsonIO.toZson(back).collect().foreach(println)
    spark.stop()
  }
}
