package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main — not part of the engine. Loops the
  * cut_vng_noprune bench query so a JFR profiler can be attached.
  */
object ProfNoprune {
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
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof-np").toString
    val vngDir = s"$tmp/conn.vng"
    graft.sources.VngIO.write(conn, vngDir)
    println(s"[prof-np] pid=${ProcessHandle.current().pid()}")
    val iters = args.headOption.map(_.toInt).getOrElse(20)
    spark.conf.set("graft.vng.prune", "false")
    var i = 0
    while (i < iters) {
      val t0 = System.nanoTime()
      graft.sources.VngIO.read(spark, vngDir).agg(count(col("uid")).as("n"))
        .write.format("noop").mode("overwrite").save()
      println(f"[prof-np] iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      i += 1
    }
    spark.stop()
  }
}
