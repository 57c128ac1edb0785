package graft
object SvcDbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val wd = java.nio.file.Files.createTempDirectory("dbg")
    val in = graft.sources.ZsonReader.fromText(spark,
      "{ts:2018-03-24T17:16:15.624089Z,addr:10.128.0.241,uid:\"a\"} {ts:2018-03-24T17:16:16.624089Z,addr:10.47.1.10,uid:\"b\"}")
    in.schema.fields.foreach(f => println(f.name + " " + f.dataType + " md=" + f.metadata))
    graft.sources.Lake.create(wd.toString, "logs", Some("addr"), "asc", true)
    graft.sources.Lake.load(in, wd.toString, "logs")
    val sc = graft.sources.Lake.scan(spark, wd.toString, "logs")
    sc.schema.fields.foreach(f => println("scan: " + f.name + " " + f.dataType + " md=" + f.metadata.json.take(120)))
    println(graft.sources.ZsonIO.toZson(sc).collect().mkString("\n"))
    val cut = graft.lang.Graft.queryOn(sc, "cut addr")
    println(graft.sources.ZsonIO.toZson(cut).collect().mkString("\n"))
    spark.stop()
  }
}
