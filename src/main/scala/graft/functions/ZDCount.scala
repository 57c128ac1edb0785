package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `dcount` with the REFERENCE's exact sketch semantics
  * (runtime/sam/expr/agg/dcount.go): each value hashes as
  * `countedVarint(typeID) ++ valueBytes` (the zed primitive body
  * encoding) through MetroHash64(seed=1337) into a 2^14-register
  * HyperLogLog estimated with the loglog-beta bias correction — so the
  * approximate COUNTS the reference documents (e.g. 9987 for seq 10000)
  * reproduce exactly, and partials merge as register maxima just like
  * the reference's sketch-merge partials.
  *
  * SPARSE mode. Like the reference's axiomhq sketch, the aggregate starts
  * sparse: each hash is kept as an HLL++ 25-bit-precision encoded entry
  * (top 25 bits, plus an explicit 6-bit rho when the 11 bits between
  * precisions are zero — the paper's EncodeHash) and estimated by linear
  * counting over 2^25 virtual registers, which is EXACT for every
  * cardinality the sparse phase can hold. The sketch converts to the
  * dense 2^14 registers when the varint-delta-compressed entry list
  * outgrows 16 KiB (~7-8k distinct values — flag-0 entries are < 2^26 so
  * deltas run ~2 bytes; the documented 10k case is past it and dense,
  * which is why 9987 matches). Conversion is LOSSLESS —
  * the dense registers derived from sparse entries equal direct dense
  * insertion — so the estimate does not depend on when the threshold
  * fires, only on which side of it the final cardinality lands; the
  * reference checks its threshold every ~164 inserts rather than every
  * insert, so within that sliver of the boundary the two engines can
  * disagree on the final mode (≤0.05% of the domain; documented here).
  */
object ZDCount {

  final val P = 14
  final val M = 1 << P // 16384
  final val PP = 25 // sparse precision (HLL++ p'; axiomhq pp)
  final val MP = 1 << PP

  // ---- MetroHash64 (public algorithm; the sketch's 64-bit hash) ----------

  private final val K0 = 0xD6D018F5L
  private final val K1 = 0xA2AA033BL
  private final val K2 = 0x62992FC1L
  private final val K3 = 0x30BC5B29L

  @inline private def rotr(x: Long, r: Int): Long =
    java.lang.Long.rotateRight(x, r)

  @inline private def le64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def le16(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8)

  def metroHash64(buf: Array[Byte], len: Int, seed: Long): Long = {
    var hash = (seed + K2) * K0
    var p = 0
    if (len >= 32) {
      var v0 = hash; var v1 = hash; var v2 = hash; var v3 = hash
      while (len - p >= 32) {
        v0 += le64(buf, p) * K0; v0 = rotr(v0, 29) + v2
        v1 += le64(buf, p + 8) * K1; v1 = rotr(v1, 29) + v3
        v2 += le64(buf, p + 16) * K2; v2 = rotr(v2, 29) + v0
        v3 += le64(buf, p + 24) * K3; v3 = rotr(v3, 29) + v1
        p += 32
      }
      v2 ^= rotr(((v0 + v3) * K0) + v1, 37) * K1
      v3 ^= rotr(((v1 + v2) * K1) + v0, 37) * K0
      v0 ^= rotr(((v0 + v2) * K0) + v3, 37) * K1
      v1 ^= rotr(((v1 + v3) * K1) + v2, 37) * K0
      hash += v0 ^ v1
    }
    if (len - p >= 16) {
      var v0 = hash + le64(buf, p) * K2; v0 = rotr(v0, 29) * K3
      var v1 = hash + le64(buf, p + 8) * K2; v1 = rotr(v1, 29) * K3
      v0 ^= rotr(v0 * K0, 21) + v1
      v1 ^= rotr(v1 * K3, 21) + v0
      hash += v1
      p += 16
    }
    if (len - p >= 8) {
      hash += le64(buf, p) * K3; p += 8
      hash ^= rotr(hash, 55) * K1
    }
    if (len - p >= 4) {
      hash += le32(buf, p) * K3; p += 4
      hash ^= rotr(hash, 26) * K1
    }
    if (len - p >= 2) {
      hash += le16(buf, p) * K3; p += 2
      hash ^= rotr(hash, 48) * K1
    }
    if (len - p >= 1) {
      hash += (buf(p) & 0xffL) * K3
      hash ^= rotr(hash, 37) * K1
    }
    hash ^= rotr(hash, 28)
    hash *= K0
    hash ^= rotr(hash, 29)
    hash
  }

  // ---- HLL registers ------------------------------------------------------

  /** Insert one 64-bit hash: register = top P bits, rho = leading zeros
    * of the remaining bits (sentinel-capped) + 1.
    */
  def insertHash(regs: Array[Byte], x: Long): Unit = {
    val i = (x >>> (64 - P)).toInt
    val w = (x << P) | (1L << (P - 1))
    val rho = (java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
    if (rho > regs(i)) regs(i) = rho
  }

  def mergeInto(dst: Array[Byte], src: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (src(i) > dst(i)) dst(i) = src(i); i += 1 }
  }

  // ---- sparse mode (HLL++ EncodeHash at p'=25; axiomhq sparse.go) ----------

  /** Encode a 64-bit hash as a sparse entry (uint32 carried in a Long):
    * top-25-bit index, flag 0 — unless the 11 bits between the dense and
    * sparse precisions are all zero, in which case the rho of the low 39
    * bits is stored explicitly (6 bits, sentinel-capped at 40), flag 1.
    */
  def encodeSparse(x: Long): Long = {
    val idx25 = x >>> (64 - PP)
    if ((idx25 & ((1L << (PP - P)) - 1)) == 0) {
      val w = (x << PP) | ((1L << PP) - 1)
      val zeros = java.lang.Long.numberOfLeadingZeros(w) + 1 // 1..40
      (idx25 << 7) | (zeros.toLong << 1) | 1L
    } else idx25 << 1
  }

  /** Dense register index of a sparse entry. */
  def sparseIdx(k: Long): Int =
    (if ((k & 1) == 1) k >>> (7 + (PP - P)) else k >>> (1 + (PP - P))).toInt

  /** Dense rho of a sparse entry (DecodeHash). */
  def sparseRho(k: Long): Int =
    if ((k & 1) == 1) ((k >>> 1) & 0x3F).toInt + (PP - P)
    else {
      val extra = ((k >>> 1) & ((1L << (PP - P)) - 1)).toInt // nonzero
      java.lang.Integer.numberOfLeadingZeros(extra) - (32 - (PP - P)) + 1
    }

  /** Byte length of one varint-encoded delta in the compressed list. */
  @inline def vlen(d: Long): Int =
    if (d < (1L << 7)) 1 else if (d < (1L << 14)) 2
    else if (d < (1L << 21)) 3 else if (d < (1L << 28)) 4 else 5

  /** Sparse-or-dense sketch buffer. `entries` holds the DISTINCT encoded
    * sparse entries (sorted, unsigned) with `listBytes` tracking the
    * varint-delta-compressed size the reference's compressedList would
    * occupy; crossing 16 KiB converts (losslessly) to dense registers.
    */
  final class Sketch {
    var dense: Array[Byte] = null
    var entries: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet[java.lang.Long]()
    var listBytes: Int = 0

    def insertHash(x: Long): Unit =
      if (dense != null) ZDCount.insertHash(dense, x)
      else insertEntry(encodeSparse(x))

    def insertEntry(k: Long): Unit = {
      if (dense != null) {
        val rho = sparseRho(k)
        val i = sparseIdx(k)
        if (rho > dense(i)) dense(i) = rho.toByte
        return
      }
      val kk = java.lang.Long.valueOf(k)
      if (entries.contains(kk)) return
      val lo = entries.floor(kk)
      val hi = entries.ceiling(kk)
      val loV = if (lo == null) 0L else lo.longValue() // first delta is absolute
      listBytes += vlen(k - loV)
      if (hi != null) listBytes += vlen(hi.longValue() - k) - vlen(hi.longValue() - loV)
      entries.add(kk)
      if (listBytes > M) toDense() // list outgrew 16 KiB (axiomhq toNormal)
    }

    def toDense(): Unit = if (dense == null) {
      val regs = new Array[Byte](M)
      val it = entries.iterator()
      while (it.hasNext) {
        val k = it.next().longValue()
        val i = sparseIdx(k)
        val rho = sparseRho(k)
        if (rho > regs(i)) regs(i) = rho.toByte
      }
      dense = regs
      entries = null
      listBytes = 0
    }

    def merge(other: Sketch): Unit =
      if (dense == null && other.dense == null) {
        val it = other.entries.iterator()
        while (it.hasNext) insertEntry(it.next().longValue())
      } else {
        toDense(); other.toDense()
        mergeInto(dense, other.dense)
      }

    /** Sparse: linear counting over 2^25 virtual registers (exact until
      * conversion); dense: loglog-beta. Go's float→uint conversion
      * truncates, so the sparse path floors like the reference.
      */
    def estimate(): Long =
      if (dense != null) ZDCount.estimate(dense)
      else {
        val m = MP.toDouble
        val n = entries.size
        if (n == 0) 0L else (m * math.log(m / (m - n))).toLong
      }

    def serialized: Array[Byte] =
      if (dense != null) {
        val out = new Array[Byte](1 + M)
        out(0) = 1
        System.arraycopy(dense, 0, out, 1, M)
        out
      } else {
        val out = java.nio.ByteBuffer.allocate(1 + 4 + entries.size * 4)
        out.put(0.toByte).putInt(entries.size)
        val it = entries.iterator()
        while (it.hasNext) out.putInt(it.next().intValue())
        out.array()
      }
  }

  def deserializeSketch(bytes: Array[Byte]): Sketch = {
    val sk = new Sketch
    if (bytes(0) == 1) {
      sk.dense = java.util.Arrays.copyOfRange(bytes, 1, 1 + M)
      sk.entries = null
    } else {
      val in = java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
      val n = in.getInt()
      var i = 0
      while (i < n) { sk.insertEntry(in.getInt().toLong & 0xFFFFFFFFL); i += 1 }
    }
    sk
  }

  /** loglog-beta estimate for p=14 (the reference sketch's estimator). */
  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var ez = 0.0
    var i = 0
    while (i < M) {
      val r = regs(i)
      if (r == 0) ez += 1
      sum += 1.0 / java.lang.Double.longBitsToDouble((1023L + r) << 52)
      i += 1
    }
    val m = M.toDouble
    val zl = math.log(ez + 1)
    val beta = -0.370393911 * ez + 0.070471823 * zl + 0.17393686 * math.pow(zl, 2) +
      0.16339839 * math.pow(zl, 3) + -0.09237745 * math.pow(zl, 4) +
      0.03738027 * math.pow(zl, 5) + -0.005384159 * math.pow(zl, 6) +
      0.00042419 * math.pow(zl, 7)
    val alpha = 0.7213 / (1 + 1.079 / m)
    val est = alpha * m * (m - ez) / (beta + sum)
    (est + 0.5).toLong
  }

  // ---- zed value encoding (primitive.go / zcode/counted.go) ---------------

  /** zed type ID for a Spark-typed dcount input (type.go Primary IDs). */
  def typeIdOf(dt: DataType, meta: Option[String]): Int = meta match {
    case Some("uint64") => 3
    case Some("time") => 13
    case Some("duration") => 12
    case Some("ip") => 26
    case _ =>
      dt match {
        case LongType | IntegerType | ShortType | ByteType => 9 // widened int64
        case _: DecimalType => 3 // uint64 carrier
        case DoubleType => 16
        case FloatType => 15
        case StringType => 25
        case BooleanType => 23
        case BinaryType => 24
        case TimestampType | TimestampNTZType => 13
        case NullType => 29
        case _ => 25
      }
  }

  /** zed primitive-name → type ID (type.go Primary IDs). */
  val primIds: Map[String, Int] = Map(
    "uint8" -> 0, "uint16" -> 1, "uint32" -> 2, "uint64" -> 3,
    "int8" -> 6, "int16" -> 7, "int32" -> 8, "int64" -> 9,
    "duration" -> 12, "time" -> 13,
    "float16" -> 14, "float32" -> 15, "float64" -> 16,
    "bool" -> 23, "bytes" -> 24, "string" -> 25, "ip" -> 26, "net" -> 27,
    "type" -> 28, "null" -> 29)

  /** Encode a VARIANT (runtime-typed) value from its carrier slots:
    * t names the runtime type, n/s/b carry the payload (z holds exact
    * text when the double carrier can't).
    */
  def encodeVariant(row: InternalRow): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(24)
    val t = if (row.isNullAt(4)) "null" else row.getUTF8String(4).toString
    val z = if (row.isNullAt(5)) null else row.getUTF8String(5).toString
    val id = primIds.getOrElse(t, 30)
    appendCountedVarint(out, id.toLong)
    def longVal: Long =
      if (z != null && z.matches("-?\\d+")) {
        // full uint64 range: values above Long.MaxValue parse unsigned to
        // the same 64-bit pattern the reference encodes (2^53..2^63 would
        // also lose precision through the double carrier)
        try z.toLong
        catch {
          case _: NumberFormatException =>
            try java.lang.Long.parseUnsignedLong(z)
            catch { case _: NumberFormatException =>
              if (!row.isNullAt(1)) row.getDouble(1).toLong else 0L }
        }
      }
      else if (!row.isNullAt(1)) row.getDouble(1).toLong
      else 0L
    t match {
      case _ if row.isNullAt(0) => () // null value: empty body
      case "int8" | "int16" | "int32" | "int64" => appendCountedVarint(out, longVal)
      case "uint8" | "uint16" | "uint32" | "uint64" =>
        appendCountedUvarint(out, longVal)
      case "duration" | "time" => appendCountedVarint(out, longVal)
      case "float16" | "float32" =>
        var bits = java.lang.Float.floatToIntBits(
          if (row.isNullAt(1)) 0f else row.getDouble(1).toFloat).toLong
        var k = 0
        while (k < 4) { out.write((bits & 0xff).toInt); bits >>>= 8; k += 1 }
      case "float64" =>
        var bits = java.lang.Double.doubleToLongBits(
          if (row.isNullAt(1)) 0d else row.getDouble(1))
        var k = 0
        while (k < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; k += 1 }
      case "string" =>
        if (!row.isNullAt(2)) {
          val b = row.getUTF8String(2).getBytes; out.write(b, 0, b.length)
        }
      case "bool" => out.write(if (!row.isNullAt(3) && row.getBoolean(3)) 1 else 0)
      case "ip" =>
        val text = if (!row.isNullAt(2)) row.getUTF8String(2).toString
                   else if (z != null) z else ""
        try {
          val b = java.net.InetAddress.getByName(text).getAddress
          out.write(b, 0, b.length)
        } catch { case _: Exception =>
          val b = text.getBytes("UTF-8"); out.write(b, 0, b.length) }
      case _ =>
        // containers / named types: canonical text is a deterministic
        // stand-in (the reference's context-relative complex IDs aren't
        // reproducible engine-side)
        val text = if (z != null) z
          else if (!row.isNullAt(2)) row.getUTF8String(2).toString else ""
        val b = text.getBytes("UTF-8"); out.write(b, 0, b.length)
    }
    out.toByteArray
  }

  private def appendCountedUvarint(out: java.io.ByteArrayOutputStream, u0: Long): Unit = {
    var u = u0
    while (u != 0) { out.write((u & 0xff).toInt); u >>>= 8 }
  }

  private def appendCountedVarint(out: java.io.ByteArrayOutputStream, i: Long): Unit =
    appendCountedUvarint(out, if (i >= 0) i << 1 else (-i << 1) | 1)

  /** A null input: type id + EMPTY body (dcount.go Consume hashes nulls
    * as distinct values; only `missing` is skipped upstream). A null
    * VARIANT cell has no runtime type — the null type id stands in.
    */
  def encodeNull(dt: DataType, meta: Option[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8)
    val id =
      if (graft.sources.ZsonIO.isVariantType(dt)) 29
      else typeIdOf(dt, meta)
    appendCountedVarint(out, id.toLong)
    out.toByteArray
  }

  /** scratch = countedVarint(typeID) ++ value body (dcount.go Consume). */
  def encode(v: Any, dt: DataType, meta: Option[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(24)
    appendCountedVarint(out, typeIdOf(dt, meta).toLong)
    v match {
      case null => ()
      case s: UTF8String =>
        val b = s.getBytes; out.write(b, 0, b.length)
      case s: String =>
        val b = s.getBytes("UTF-8"); out.write(b, 0, b.length)
      case b: Boolean => out.write(if (b) 1 else 0)
      case d: Double =>
        var bits = java.lang.Double.doubleToLongBits(d)
        var k = 0
        while (k < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; k += 1 }
      case f: Float =>
        var bits = java.lang.Float.floatToIntBits(f).toLong
        var k = 0
        while (k < 4) { out.write((bits & 0xff).toInt); bits >>>= 8; k += 1 }
      case n: Number if meta.contains("uint64") =>
        appendCountedUvarint(out, n.longValue())
      // uint64 carriers above Long.MaxValue: the two's-complement low 64
      // bits ARE the unsigned bit pattern (the uvarint shifts unsigned)
      case d: java.math.BigDecimal => // uint64 carrier
        appendCountedUvarint(out, d.toBigInteger.longValue())
      case d: org.apache.spark.sql.types.Decimal =>
        appendCountedUvarint(out, d.toJavaBigDecimal.toBigInteger.longValue())
      case n: Number => appendCountedVarint(out, n.longValue())
      case b: Array[Byte] => out.write(b, 0, b.length)
      case other =>
        val b = String.valueOf(other).getBytes("UTF-8"); out.write(b, 0, b.length)
    }
    out.toByteArray
  }
}

/** Spark aggregate wrapping the reference sketch: buffer = a sparse-or-
  * dense [[ZDCount.Sketch]]; update inserts the encoded value's metro
  * hash; merge unions sparse entry sets or takes dense register maxima
  * (the reference's partial semantics — order-independent because the
  * sparse→dense conversion is lossless); eval linear-counts while sparse
  * and loglog-beta estimates once dense.
  */
case class ZDCountAgg(child: Expression,
                      typeMeta: Option[String] = None,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ZDCount.Sketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "zdcount"

  override def createAggregationBuffer(): ZDCount.Sketch = new ZDCount.Sketch

  private lazy val isVariant =
    graft.sources.ZsonIO.isVariantType(child.dataType)

  override def update(buffer: ZDCount.Sketch, input: InternalRow): ZDCount.Sketch = {
    val v = child.eval(input)
    // the reference skips only `missing` (expr/agg.go Apply); dcount.go
    // Consume hashes a null as its type id + EMPTY body — null IS a
    // distinct counted value
    val b =
      if (v == null) ZDCount.encodeNull(child.dataType, typeMeta)
      else if (isVariant) ZDCount.encodeVariant(v.asInstanceOf[InternalRow])
      else ZDCount.encode(v, child.dataType, typeMeta)
    buffer.insertHash(ZDCount.metroHash64(b, b.length, 1337L))
    buffer
  }

  override def merge(buffer: ZDCount.Sketch, other: ZDCount.Sketch): ZDCount.Sketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ZDCount.Sketch): Any = buffer.estimate()

  override def serialize(buffer: ZDCount.Sketch): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): ZDCount.Sketch =
    ZDCount.deserializeSketch(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ZDCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ZDCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZDCountAgg =
    copy(child = newChildren.head)
}
