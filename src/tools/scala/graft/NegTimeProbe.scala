package graft

import graft.sources.{ZValue, ZsonReader}
import graft.sources.ZValue._

/** Scratch probe: fromRDD (InternalDecoder path) must equal fromValues
  * (external rowOf path) for negative / extreme µs-aligned times, big
  * ints, uint64, durations.
  */
object NegTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val vals: Seq[ZValue] = Seq(
      -1000000L, -1L * 1000, 0L, 1000L, -62135596800000000L * 1000,
      253402300799000000L * 1000, -123456789000L).map(ns =>
      VRec(Vector("t" -> VTime(ns), "d" -> VDur(ns),
        "i" -> (VInt(ns, "int64"): ZValue),
        "u" -> (VUint64(BigDecimal(math.abs(ns))): ZValue),
        "s" -> (VStr(s"v$ns"): ZValue))): ZValue)
    val ext = ZsonReader.fromValues(spark, vals, tag = true)
    val internal = ZsonReader.fromRDD(
      spark, spark.sparkContext.parallelize(vals, 2), tag = true)
    val a = ext.collect().map(_.toString).sorted.toSeq
    val b = internal.collect().map(_.toString).sorted.toSeq
    println(s"[negtime] schemas equal: ${ext.schema == internal.schema}")
    println(s"[negtime] rows equal: ${a == b}")
    if (a != b) { a.foreach(x => println(s"  ext: $x")); b.foreach(x => println(s"  int: $x")) }
    spark.stop()
  }
}
