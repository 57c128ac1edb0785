package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe — not part of the engine. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val n = 2000000L
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
    val zeekDir = s"$tmp/conn.zeek"
    graft.sources.ZeekIO.write(conn, zeekDir)
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name: min ${ts.min}%.3f s  (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    // warm
    spark.read.textFile(zeekDir).filter(l => !l.startsWith("#")).count()
    time("textFile count") {
      spark.read.textFile(zeekDir).count()
    }
    time("textFile filter count") {
      spark.read.textFile(zeekDir).filter(l => !l.startsWith("#")).count()
    }
    time("split only -> noop") {
      spark.read.textFile(zeekDir).filter(l => !l.startsWith("#"))
        .toDF().select(split(col("value"), "\t").as("p"))
        .write.format("noop").mode("overwrite").save()
    }
    time("split+element_at strings -> noop") {
      val p = col("p")
      spark.read.textFile(zeekDir).filter(l => !l.startsWith("#"))
        .toDF().select(split(col("value"), "\t").as("p"))
        .select((1 to 14).map(i => element_at(p, i).as(s"c$i")): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("zeek stats scan only") {
      // mirror of ZeekIO.read's uniform probe
      spark.read.format("binaryFile").load(s"$zeekDir/*")
        .select("content").as[Array[Byte]].rdd
        .map(b => b.length).collect()
    }
    def partsDf = spark.read.textFile(zeekDir).filter(l => !l.startsWith("#"))
      .toDF().select(split(col("value"), "\t").as("p"))
    def cleaned(i: Int) = {
      val raw = element_at(col("p"), i)
      when(raw === "-", lit(null)).otherwise(raw)
    }
    time("long casts only (6 fields)") {
      partsDf.select(Seq(4, 6, 10, 11, 13, 14).map(i => cleaned(i).cast("long").as(s"c$i")): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("double casts (ts+duration)") {
      partsDf.select(Seq(1, 9).map(i => cleaned(i).cast("double").as(s"c$i")): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("string chain (6 fields, no udf)") {
      partsDf.select(Seq(2, 3, 5, 7, 8, 12).map(i =>
        when(cleaned(i) === "(empty)", lit("")).otherwise(cleaned(i)).as(s"c$i")): _*)
        .write.format("noop").mode("overwrite").save()
    }
    val unesc = udf((s: String) => if (s == null) null else s.reverse.reverse)
    time("string chain (6 fields, with guarded udf)") {
      partsDf.select(Seq(2, 3, 5, 7, 8, 12).map(i =>
        when(cleaned(i) === "(empty)", lit(""))
          .otherwise(when(cleaned(i).contains("\\"), unesc(cleaned(i))).otherwise(cleaned(i)))
          .as(s"c$i")): _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("full ZeekIO.read -> noop") {
      graft.sources.ZeekIO.read(spark, zeekDir).write.format("noop").mode("overwrite").save()
    }
    val df = graft.sources.ZeekIO.read(spark, zeekDir)
    println("[probe] plan:")
    println(df.queryExecution.executedPlan.toString.take(3000))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
