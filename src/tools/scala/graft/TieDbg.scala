package graft

/** Throwaway debug entry — prints the lake valueAsBytes tiebreak bytes
  * per row of a het zson file.
  */
object TieDbg {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/in.zson")
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.sources.ZsonIO.read(spark, path)
    df.printSchema()
    val tagIdx = df.schema.fieldNames.indexOf(graft.operators.Het.typeTag)
    println(s"tagIdx=$tagIdx shapes=" + (if (tagIdx >= 0 &&
      df.schema.fields(tagIdx).metadata.contains("shapes"))
      df.schema.fields(tagIdx).metadata.getStringArray("shapes").length else -1))
    try graft.sources.ZjsonIO.toZjson(df).collect().foreach(l =>
      if (l.contains("union")) println("ZJSON " + l.take(400)))
    catch { case e: Exception => println("zjson failed: " + e) }
    graft.sources.ZngBody.tiebreak(df) match {
      case None => println("NO TIEBREAK")
      case Some(tb) =>
        val rows = df.withColumn("__tb", tb).collect()
        for (r <- rows) {
          val b = r.getAs[Array[Byte]]("__tb")
          val hex = if (b == null) "NULL" else b.map("%02x".format(_)).mkString
          val tag = if (tagIdx >= 0) r.getString(tagIdx).take(60) else "?"
          println(f"${hex.take(40)}%-42s $tag")
        }
    }
    spark.stop()
  }
}
