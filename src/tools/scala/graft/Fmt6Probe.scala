package graft

import org.apache.spark.sql.functions._

/** Scratch probe: the zeek writer's integer-path "%.6f" must be byte-equal
  * to the Formatter for every in-guard value. Random + boundary micros and
  * ns, compared via Spark itself (same codegen the writer uses).
  */
object Fmt6Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    val rnd = new java.util.Random(42)
    val micros = (Seq(0L, 1L, -1L, 999999L, -999999L, 1000000L, -1000000L,
      1521912491000000L, -62135596800000000L, 3999999999999999L,
      -3999999999999999L, 4000000000000000L, -4000000000000001L,
      253402300799999999L, Long.MaxValue / 1000, Long.MinValue / 1000) ++
      (1 to 300000).map(_ => rnd.nextLong() % 4000000000000000L) ++
      (1 to 300000).map(_ => rnd.nextLong())).toDF("us")
    // timestamp path: new micros6 vs old Formatter
    val tsBad = micros.select(
      col("us"),
      expr("null").as("_"),
      // inline the writer's NEW expression via the same building blocks
      {
        def pos(u: org.apache.spark.sql.Column) = {
          val frac = pmod(u, lit(1000000L))
          concat(((u - frac) / lit(1e6)).cast("long").cast("string"),
            lit("."), lpad(frac.cast("string"), 6, "0"))
        }
        val us = col("us")
        val safe = abs(us) < lit(4000000000000000L)
        when(safe && us >= 0, pos(us))
          .when(safe, concat(lit("-"), pos(-us)))
          .otherwise(format_string("%.6f", us.cast("double") / 1e6))
      }.as("nw"),
      format_string("%.6f", col("us").cast("double") / 1e6).as("old"))
      .filter(col("nw") =!= col("old"))
    val nBadTs = tsBad.count()
    if (nBadTs > 0) tsBad.show(20, truncate = false)
    // duration ns path
    val ns = (Seq(0L, 1L, 999L, 1000L, -1000L, 1500L, 300000000L,
      -9000000000000000L, 9000000000000000L, 8999999999999000L) ++
      (1 to 300000).map(_ => (rnd.nextLong() % 9000000000000L) * 1000) ++
      (1 to 300000).map(_ => rnd.nextLong() % 9000000000000000L)).toDF("ns")
    val durBad = ns.select(col("ns"),
      {
        def pos(u: org.apache.spark.sql.Column) = {
          val frac = pmod(u, lit(1000000L))
          concat(((u - frac) / lit(1e6)).cast("long").cast("string"),
            lit("."), lpad(frac.cast("string"), 6, "0"))
        }
        def micros6(us: org.apache.spark.sql.Column) = {
          val safe = abs(us) < lit(4000000000000000L)
          when(safe && us >= 0, pos(us))
            .when(safe, concat(lit("-"), pos(-us)))
            .otherwise(format_string("%.6f", us.cast("double") / 1e6))
        }
        val c = col("ns")
        val sub = pmod(c, lit(1000L))
        val intOk = sub === 0 && abs(c) < lit(9000000000000000L)
        when(intOk, micros6(((c - sub) / lit(1e3)).cast("long")))
          .otherwise(format_string("%.6f", c.cast("double") / 1e9))
      }.as("nw"),
      format_string("%.6f", col("ns").cast("double") / 1e9).as("old"))
      .filter(col("nw") =!= col("old"))
    val nBadDur = durBad.count()
    if (nBadDur > 0) durBad.show(20, truncate = false)
    println(s"[fmt6] ts mismatches=$nBadTs dur mismatches=$nBadDur")
    spark.stop()
  }
}
