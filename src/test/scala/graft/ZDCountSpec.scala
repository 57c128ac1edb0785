package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZDCount

/** Pins the reference-exact dcount sketch (functions/ZDCount.scala):
  * the documented estimate for 10k distinct int64s (dcount.md: 9987),
  * small-count exactness, merge semantics, and the value encoding.
  */
class ZDCountSpec extends AnyFunSuite {

  private def insertInt(regs: Array[Byte], i: Long): Unit = {
    val b = ZDCount.encode(java.lang.Long.valueOf(i),
      org.apache.spark.sql.types.LongType, None)
    ZDCount.insertHash(regs, ZDCount.metroHash64(b, b.length, 1337L))
  }

  test("seq 10000 estimates 9987 — the reference's documented value") {
    val regs = new Array[Byte](ZDCount.M)
    for (i <- 1L to 10000L) insertInt(regs, i)
    assert(ZDCount.estimate(regs) == 9987L)
  }

  test("small counts are exact") {
    val regs = new Array[Byte](ZDCount.M)
    for (i <- Seq(1L, 2L, 2L, 3L)) insertInt(regs, i)
    assert(ZDCount.estimate(regs) == 3L)
  }

  test("merge = register maxima (the reference's partial semantics)") {
    val a = new Array[Byte](ZDCount.M)
    val b = new Array[Byte](ZDCount.M)
    val whole = new Array[Byte](ZDCount.M)
    for (i <- 1L to 5000L) { insertInt(a, i); insertInt(whole, i) }
    for (i <- 5001L to 10000L) { insertInt(b, i); insertInt(whole, i) }
    ZDCount.mergeInto(a, b)
    assert(java.util.Arrays.equals(a, whole))
    assert(ZDCount.estimate(a) == 9987L)
  }

  test("type id participates in the hash (same bytes, different type)") {
    // int64(1) vs uint64(1) must count as TWO (dcount.go appends type id)
    val regs = new Array[Byte](ZDCount.M)
    insertInt(regs, 1L)
    val b = ZDCount.encode(java.lang.Long.valueOf(1L),
      org.apache.spark.sql.types.LongType, Some("uint64"))
    ZDCount.insertHash(regs, ZDCount.metroHash64(b, b.length, 1337L))
    assert(ZDCount.estimate(regs) == 2L)
  }
}
