package graft

/** Debug: zng byte size of a zson file under different orderings. */
object ZngSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    for (f <- args) {
      val df = graft.sources.ZsonReader.fromText(spark,
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8"))
      val (rows, _) = graft.sources.Lake.bodyStats(df)
      val tmp = java.nio.file.Files.createTempDirectory("szprobe")
      graft.sources.ZngIO.write(df.coalesce(1), tmp.toString)
      val sz = Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-")).map(_.length).sum
      println(s"$f rows=$rows zngBytes=$sz")
    }
    spark.stop()
  }
}
