package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main — loops the ZNG write (encode) path. */
object ProfZngW {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val n = 2000000L
    val conn = spark.range(n).select(
      (lit(1.521912491e9) + col("id") * 0.001).as("ts"),
      concat(lit("C"), md5(col("id").cast("string")).substr(1, 16)).as("uid"),
      (col("id") % 60000 + 1024).as("orig_p"),
      when(col("id") % 11 === 0, "udp").otherwise("tcp").as("proto"),
      (col("id") % 1000).cast("double").divide(100.0).as("duration"),
      (col("id") % 100000).as("orig_bytes"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof-zw").toString
    val zngDir = s"$tmp/conn.zng"
    graft.sources.ZngIO.write(conn, zngDir)
    val df = graft.sources.ZngIO.read(spark, zngDir)
    df.write.format("noop").mode("overwrite").save() // warm the read
    println(s"[prof-zw] pid=${ProcessHandle.current().pid()}")
    val iters = args.headOption.map(_.toInt).getOrElse(20)
    var i = 0
    while (i < iters) {
      val t0 = System.nanoTime()
      graft.sources.ZngIO.write(df, s"$tmp/out-$i")
      println(f"[prof-zw] iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$tmp/out-$i"))
      i += 1
    }
    spark.stop()
  }
}
