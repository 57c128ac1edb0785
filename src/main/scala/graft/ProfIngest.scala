package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main — not part of the engine. */
object ProfIngest {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof").toString
    val n = 2000000L
    import org.apache.spark.sql.functions._
    val conn = spark.range(n).select(
      (lit(1.521912491e9) + col("id") * 0.001).as("ts"),
      concat(lit("C"), md5(col("id").cast("string")).substr(1, 16)).as("uid"),
      concat(lit("10."), (col("id") % 250 + 1).cast("string"), lit("."),
        (col("id") / 250 % 250 + 1).cast("long").cast("string"), lit(".17")).as("orig_h"),
      (col("id") % 60000 + 1024).as("orig_p"),
      concat(lit("52.85.83."), (col("id") % 200).cast("string")).as("resp_h"),
      when(col("id") % 7 === 0, 443L).otherwise(80L).as("resp_p"),
      when(col("id") % 11 === 0, "udp").otherwise("tcp").as("proto"),
      when(col("id") % 5 === 0, "http").otherwise("ssl").as("service"),
      (col("id") % 1000).cast("double").divide(100.0).as("duration"),
      (col("id") % 100000).as("orig_bytes"),
      (col("id") % 900000).as("resp_bytes"),
      when(col("id") % 3 === 0, "SF").otherwise("S0").as("conn_state"),
      (col("id") % 50).as("orig_pkts"),
      (col("id") % 70).as("resp_pkts"))
    val zngDir = s"$tmp/conn.zng"
    graft.sources.ZngIO.write(conn, zngDir)

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name: min ${ts.min}%.3f s  (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val p = s"$tmp/conn.parquet"
    conn.write.mode("overwrite").parquet(p)
    // warm
    graft.sources.ZngIO.write(graft.sources.ZngIO.read(spark, zngDir), s"$tmp/warm")
    time("pass1 shape discovery only") {
      graft.sources.ZngIO.read(spark, zngDir)
    }
    time("read+decode (noop sink)") {
      graft.sources.ZngIO.read(spark, zngDir).write.format("noop").mode("overwrite").save()
    }
    time("read+decode (toRdd drain)") {
      graft.sources.ZngIO.read(spark, zngDir).queryExecution.toRdd
        .foreachPartition(it => while (it.hasNext) it.next())
    }
    time("read+decode (count)") {
      graft.sources.ZngIO.read(spark, zngDir).count()
    }
    println("[prof] zng read plan:")
    println(graft.sources.ZngIO.read(spark, zngDir).queryExecution.executedPlan.toString.take(1500))
    time("full copy (read+decode+encode+write)") {
      graft.sources.ZngIO.write(graft.sources.ZngIO.read(spark, zngDir), s"$tmp/out1")
    }
    time("encode only (parquet->zng)") {
      graft.sources.ZngIO.write(spark.read.parquet(p), s"$tmp/out2")
    }
    time("parquet scan only (noop)") {
      spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    }
    val zeekDir = s"$tmp/conn.zeek"
    graft.sources.ZeekIO.write(conn, zeekDir)
    graft.sources.ZeekIO.read(spark, zeekDir).write.format("noop").mode("overwrite").save()
    time("zeek read only (noop)") {
      graft.sources.ZeekIO.read(spark, zeekDir).write.format("noop").mode("overwrite").save()
    }
    time("zeek full copy (read+zng write)") {
      graft.sources.ZngIO.write(graft.sources.ZeekIO.read(spark, zeekDir), s"$tmp/out3")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
