package graft

object PqDbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val conn = graft.sources.Formats.read(spark,
      "/root/reference/zio/parquetio/ztests/conn.parquet")
    val dns = graft.sources.Formats.read(spark,
      "/root/reference/zio/parquetio/ztests/dns.parquet")
    println("conn rows=" + conn.count() + " dns rows=" + dns.count())
    val comb = graft.operators.ZedOps.combine(conn, dns)
    println("combined schema fields=" + comb.schema.fieldNames.mkString(","))
    comb.schema.fields.find(_.name == graft.operators.Het.typeTag).foreach { f =>
      if (f.metadata.contains("shapes"))
        println("shapes:\n" + f.metadata.getStringArray("shapes").mkString("\n"))
    }
    println("rows=" + comb.count())
    graft.sources.ZsonIO.toZson(comb).collect().take(3).foreach(println)
    spark.stop()
  }
}
