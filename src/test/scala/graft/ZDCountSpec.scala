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

  // ---- sparse mode (HLL++ p'=25; axiomhq sparse behavior) ------------------

  private def insertIntSk(sk: ZDCount.Sketch, i: Long): Unit = {
    val b = ZDCount.encode(java.lang.Long.valueOf(i),
      org.apache.spark.sql.types.LongType, None)
    sk.insertHash(ZDCount.metroHash64(b, b.length, 1337L))
  }

  test("sparse estimates are EXACT through the mid-range the dense sketch misses") {
    // the reference stays sparse (linear counting over 2^25) until the
    // compressed entry list outgrows 16 KiB — counts up to ~4k are exact
    for (n <- Seq(100, 500, 1000, 2000, 3000)) {
      val sk = new ZDCount.Sketch
      for (i <- 1L to n.toLong) insertIntSk(sk, i)
      assert(sk.dense == null, s"n=$n should still be sparse")
      assert(sk.estimate() == n.toLong, s"n=$n")
    }
  }

  test("sketch converts to dense past 16KiB and lands the documented 9987") {
    val sk = new ZDCount.Sketch
    for (i <- 1L to 10000L) insertIntSk(sk, i)
    assert(sk.dense != null, "10k distinct must have converted to dense")
    assert(sk.estimate() == 9987L)
  }

  test("conversion is lossless: dense-from-sparse equals direct dense insertion") {
    // most entries are flag-0 (< 2^26), so deltas compress to ~2 bytes and
    // the 16 KiB conversion fires around ~8k distinct — 9000 is past it
    val sk = new ZDCount.Sketch
    val direct = new Array[Byte](ZDCount.M)
    for (i <- 1L to 9000L) { insertIntSk(sk, i); insertInt(direct, i) }
    assert(sk.dense != null)
    assert(java.util.Arrays.equals(sk.dense, direct))
  }

  test("merge semantics are order-independent across sparse/dense partials") {
    // two sparse halves == sequential (exact)
    val a = new ZDCount.Sketch; val b = new ZDCount.Sketch
    for (i <- 1L to 1000L) insertIntSk(a, i)
    for (i <- 800L to 1800L) insertIntSk(b, i)
    a.merge(b)
    assert(a.dense == null && a.estimate() == 1800L)
    // sparse + dense == sequential dense
    val c = new ZDCount.Sketch; val d = new ZDCount.Sketch
    for (i <- 1L to 700L) insertIntSk(c, i)
    for (i <- 500L to 10000L) insertIntSk(d, i)
    val seq = new ZDCount.Sketch
    for (i <- 1L to 10000L) insertIntSk(seq, i)
    c.merge(d)
    assert(c.estimate() == seq.estimate())
  }

  test("sketch serialization round-trips both modes") {
    val sp = new ZDCount.Sketch
    for (i <- 1L to 1500L) insertIntSk(sp, i)
    val sp2 = ZDCount.deserializeSketch(sp.serialized)
    assert(sp2.dense == null && sp2.estimate() == 1500L)
    assert(sp2.listBytes == sp.listBytes)
    val dn = new ZDCount.Sketch
    for (i <- 1L to 10000L) insertIntSk(dn, i)
    val dn2 = ZDCount.deserializeSketch(dn.serialized)
    assert(dn2.estimate() == 9987L)
  }

  test("sparse estimates stay near-exact on random values (collisions " +
       "are corrected statistically by linear counting)") {
    // random inputs CAN collide in the 2^25 entry space (expected ~n²/2m
    // collisions); linear counting corrects in expectation, so the bar
    // is ±0.2% — far inside the dense sketch's ±0.8% stddev
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1000, 4000)) {
      val sk = new ZDCount.Sketch
      val seen = scala.collection.mutable.HashSet.empty[Long]
      while (seen.size < n) seen += rnd.nextLong()
      seen.foreach(insertIntSk(sk, _))
      assert(sk.dense == null)
      val est = sk.estimate()
      assert(math.abs(est - n) <= math.max(1, n / 500), s"n=$n est=$est")
    }
  }

  test("sparse entry encode/decode matches the HLL++ paper layout") {
    // flag-0: 11 between-precision bits nonzero, rho derivable
    val x0 = 3L << 39 // idx14=0, extra bits 0b00000000011
    val k0 = ZDCount.encodeSparse(x0)
    assert((k0 & 1) == 0)
    assert(ZDCount.sparseIdx(k0) == 0)
    assert(ZDCount.sparseRho(k0) == 10) // 9 leading zeros in the 11 + 1
    // flag-1: between-precision bits zero → stored rho over low 39 + 11
    val x1 = 0x0000000000000001L
    val k1 = ZDCount.encodeSparse(x1)
    assert((k1 & 1) == 1)
    assert(ZDCount.sparseIdx(k1) == 0)
    assert(ZDCount.sparseRho(k1) == 11 + 39) // 38 zeros + 1, plus pp-p
    // sentinel: all-zero low bits cap rho at 40 + 11 (matches dense cap 51)
    val k2 = ZDCount.encodeSparse(0L)
    assert(ZDCount.sparseRho(k2) == 51)
  }
}
