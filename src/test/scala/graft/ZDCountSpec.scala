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

  test("null counts as a distinct value (dcount.go hashes typeID+empty)") {
    // reference: `1 2 null` -> dcount 3 (only `missing` is skipped)
    val regs = new Array[Byte](ZDCount.M)
    insertInt(regs, 1L); insertInt(regs, 2L)
    val nb = ZDCount.encodeNull(org.apache.spark.sql.types.LongType, None)
    ZDCount.insertHash(regs, ZDCount.metroHash64(nb, nb.length, 1337L))
    assert(ZDCount.estimate(regs) == 3L)
    // a second null is the SAME value — still 3
    ZDCount.insertHash(regs, ZDCount.metroHash64(nb, nb.length, 1337L))
    assert(ZDCount.estimate(regs) == 3L)
  }

  test("uint64 above Long.MaxValue encodes its unsigned bit pattern") {
    // 18446744073709551615 = 2^64-1 -> low-64 two's complement = -1
    val big = new java.math.BigDecimal("18446744073709551615")
    val b = ZDCount.encode(big, org.apache.spark.sql.types.DecimalType(20, 0), None)
    // counted uvarint of 0xFFFFFFFFFFFFFFFF after the uint64 type id (3):
    // id varint (3<<1=6) then eight 0xff bytes
    assert(b(0) == 6.toByte)
    assert(b.length == 9 && b.drop(1).forall(_ == 0xff.toByte))
    // distinct from uint64(1)
    val regs = new Array[Byte](ZDCount.M)
    ZDCount.insertHash(regs, ZDCount.metroHash64(b, b.length, 1337L))
    val one = ZDCount.encode(java.lang.Long.valueOf(1L),
      org.apache.spark.sql.types.LongType, Some("uint64"))
    ZDCount.insertHash(regs, ZDCount.metroHash64(one, one.length, 1337L))
    assert(ZDCount.estimate(regs) == 2L)
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
