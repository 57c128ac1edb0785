package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, SpecializedGetters}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.ByteArrayOutputStream

/** ZNG binary format (reference: docs/formats/zng.md, zio/zngio/).
  *
  * Real spec-conformant encoding: typedef frames assigning stream type IDs
  * from 30, values frames of (type-id uvarint + tag-encoded body), signed
  * ints sign-magnitude counted-varint encoded to minimal little-endian
  * bytes (zcode/counted.go), end-of-stream 0xff.
  * The reader additionally handles LZ4-compressed frames (compression.md
  * format 0) and skips control frames.
  *
  * Spark integration: the writer emits one independent ZNG stream per
  * partition (streams concatenate legally per spec §2.4); the reader lists
  * files via Spark's binaryFile source and decodes each stream DISTRIBUTED
  * straight to typed values (decodeZValue), so mixed-type streams fuse
  * into the same tagged/variant frame as any heterogeneous input — with
  * full union/enum/error/named-type fidelity at file scale.
  */
object ZngIO {

  // ---- low-level encoding ----------------------------------------------------

  private[graft] def uvarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Signed counted varint (zng.md §2.2.2, zcode/counted.go:59): the
    * magnitude is shifted left one with the sign in the low bit —
    * NOT zigzag — then emitted as minimal little-endian bytes.
    * -1 → 0x03; Long.MinValue overflows to the reserved encoding 0x01.
    */
  private[graft] def signedBytes(n: Long): Array[Byte] = {
    var u = if (n >= 0) n << 1 else ((-n) << 1) | 1L
    val buf = Array.newBuilder[Byte]
    while (u != 0) { buf += (u & 0xff).toByte; u >>>= 8 }
    buf.result()
  }

  private[graft] def leBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)

  // primitive IDs (zng.md §3)
  private val ID_INT8 = 6; private val ID_INT16 = 7
  private val ID_INT32 = 8; private val ID_INT64 = 9
  private val ID_DURATION = 12; private val ID_TIME = 13
  private val ID_FLOAT32 = 15; private val ID_FLOAT64 = 16
  private val ID_BOOL = 23; private val ID_BYTES = 24
  private val ID_STRING = 25; private val ID_NULL = 29
  private val ID_IP = 26; private val ID_NET = 27

  private def primId(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(ID_INT8)
    case ShortType => Some(ID_INT16)
    case IntegerType => Some(ID_INT32)
    case LongType => Some(ID_INT64)
    case FloatType => Some(ID_FLOAT32)
    case DoubleType => Some(ID_FLOAT64)
    case BooleanType => Some(ID_BOOL)
    case BinaryType => Some(ID_BYTES)
    case StringType => Some(ID_STRING)
    case TimestampType | TimestampNTZType | DateType => Some(ID_TIME)
    case _: DayTimeIntervalType => Some(ID_DURATION)
    case NullType => Some(ID_NULL)
    // Decimal(20,0) is the engine's FULL-RANGE uint64 carrier (value.go
    // carries uint64 natively; 2^64−1 doesn't fit a long — SURVEY §1.4);
    // other decimals have no zed type and ride as float64
    case dt: DecimalType if dt.precision == 20 && dt.scale == 0 => Some(3)
    case _: DecimalType => Some(ID_FLOAT64)
    case _ => None
  }

  /** Assign stream type IDs (from 30) for the complex types of a schema,
    * emitting typedefs in dependency order (zng.md §2.1).
    */
  private[sources] final class TypeTable {
    val defs = new ByteArrayOutputStream()
    private var next = 30
    private val ids = scala.collection.mutable.Map.empty[DataType, Int]

    def idOf(dt: DataType): Int = primId(dt).getOrElse(ids.getOrElseUpdate(dt, define(dt)))

    private def counted(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      uvarint(defs, b.length.toLong); defs.write(b, 0, b.length)
    }

    private def define(dt: DataType): Int = dt match {
      case st: StructType =>
        val fieldIds = st.fields.map(f => idOf(f.dataType)) // define children first
        defs.write(0x00)
        uvarint(defs, st.fields.length.toLong)
        st.fields.zip(fieldIds).foreach { case (f, id) =>
          counted(f.name); uvarint(defs, id.toLong)
        }
        val id = next; next += 1; id
      case ArrayType(et, _) =>
        val inner = idOf(et)
        defs.write(0x01); uvarint(defs, inner.toLong)
        val id = next; next += 1; id
      case MapType(kt, vt, _) =>
        val k = idOf(kt); val v = idOf(vt)
        defs.write(0x03); uvarint(defs, k.toLong); uvarint(defs, v.toLong)
        val id = next; next += 1; id
      case other =>
        throw new IllegalArgumentException(s"zng: unsupported type $other")
    }
  }

  // tag = 0 for null, length+1 otherwise (§2.2.1)
  private def tagged(out: ByteArrayOutputStream, body: Array[Byte]): Unit = {
    uvarint(out, body.length + 1L); out.write(body, 0, body.length)
  }
  private def nullTag(out: ByteArrayOutputStream): Unit = out.write(0)

  private[sources] def encodeValue(out: ByteArrayOutputStream, v: Any, dt: DataType): Unit = {
    if (v == null) { nullTag(out); return }
    dt match {
      case ByteType => tagged(out, signedBytes(v.asInstanceOf[Byte].toLong))
      case ShortType => tagged(out, signedBytes(v.asInstanceOf[Short].toLong))
      case IntegerType => tagged(out, signedBytes(v.asInstanceOf[Int].toLong))
      case LongType => tagged(out, signedBytes(v.asInstanceOf[Long]))
      case FloatType =>
        tagged(out, leBytes(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL, 4))
      case DoubleType =>
        tagged(out, leBytes(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8))
      case BooleanType => tagged(out, Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0))
      case StringType => tagged(out, v.toString.getBytes("UTF-8"))
      case BinaryType => tagged(out, v.asInstanceOf[Array[Byte]])
      case dt: DecimalType if dt.precision == 20 && dt.scale == 0 =>
        // uint64 carrier: unsigned little-endian minimal bytes
        var x = BigInt(v.asInstanceOf[java.math.BigDecimal].toBigInteger)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
        while (x != 0) { buf += (x & 0xff).toByte; x >>= 8 }
        tagged(out, buf.toArray)
      case _: DecimalType =>
        tagged(out, leBytes(java.lang.Double.doubleToLongBits(
          v.asInstanceOf[java.math.BigDecimal].doubleValue()), 8))
      case TimestampType =>
        val ns = v.asInstanceOf[java.sql.Timestamp].toInstant
        tagged(out, signedBytes(ns.getEpochSecond * 1000000000L + ns.getNano))
      case TimestampNTZType =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
        tagged(out, signedBytes(inst.getEpochSecond * 1000000000L + inst.getNano))
      case DateType =>
        val d = v.asInstanceOf[java.sql.Date]
        tagged(out, signedBytes(d.toLocalDate.toEpochDay * 86400L * 1000000000L))
      case _: DayTimeIntervalType =>
        val dur = v.asInstanceOf[java.time.Duration]
        tagged(out, signedBytes(Math.addExact(
          Math.multiplyExact(dur.getSeconds, 1000000000L), dur.getNano.toLong)))
      case st: StructType =>
        val inner = new ByteArrayOutputStream()
        val r = v.asInstanceOf[Row]
        st.fields.zipWithIndex.foreach { case (f, i) =>
          encodeValue(inner, if (r.isNullAt(i)) null else r.get(i), f.dataType)
        }
        tagged(out, inner.toByteArray)
      case ArrayType(et, _) =>
        val inner = new ByteArrayOutputStream()
        v.asInstanceOf[scala.collection.Seq[Any]].foreach(e => encodeValue(inner, e, et))
        tagged(out, inner.toByteArray)
      case MapType(kt, vt, _) =>
        // normalized: entries sorted by encoded key bytes (§2.2.3)
        val entries = v.asInstanceOf[scala.collection.Map[Any, Any]].toSeq.map { case (k, mv) =>
          val kb = new ByteArrayOutputStream(); encodeValue(kb, k, kt)
          val vb = new ByteArrayOutputStream(); encodeValue(vb, mv, vt)
          (kb.toByteArray, vb.toByteArray)
        }.sortWith((a, b) => java.util.Arrays.compare(a._1, b._1) < 0)
        val inner = new ByteArrayOutputStream()
        entries.foreach { case (kb, vb) =>
          inner.write(kb, 0, kb.length); inner.write(vb, 0, vb.length)
        }
        tagged(out, inner.toByteArray)
      case other => throw new IllegalArgumentException(s"zng: unsupported type $other")
    }
  }

  private def sizeOfUvarint(v: Long): Int = {
    var n = 1; var x = v >>> 7
    while (x != 0) { n += 1; x >>>= 7 }
    n
  }

  /** One block with the reference writer's framing (zngio/writer.go
    * writeBlock): LZ4-compress, keep the compressed form only when it is
    * smaller than the raw payload (pierrec CompressBlock into a buffer of
    * the payload's size), else raw.
    */
  /** Diagnostic CLI knobs (-zng.compress=false / -zng.readmax): frames
    * write raw / reads cap the frame length. Set by the test harness in
    * local mode; cluster data paths keep the defaults.
    */
  @volatile private[graft] var compressFrames: Boolean = true
  @volatile private[graft] var readMaxFrame: Long = Long.MaxValue

  /** Walk the stream's frame headers; fail like the reference reader when
    * one exceeds the -zng.readmax cap (zngio/reader.go ReadPayload).
    */
  private[graft] def checkReadMax(name: String, bytes: Array[Byte]): Unit = {
    if (readMaxFrame == Long.MaxValue) return
    val c = new Cursor(bytes, 0)
    while (!c.done) {
      val code = c.u8()
      if (code != 0xff) {
        val len = ((c.uvarint() << 4) | (code & 0xf).toLong)
        if (len > readMaxFrame)
          throw new IllegalArgumentException(
            s"$name: zngio: frame length ($len) exceeds maximum allowed ($readMaxFrame)")
        c.pos += len.toInt
      }
    }
  }

  private[sources] def frame(t: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val len = payload.length
    if (len > 0 && compressFrames) {
      // byte-exact reference compressor (Lz4Block): returns 0 when the
      // compressed form wouldn't beat the raw payload, exactly like the
      // reference writer's CompressBlock-into-len(b) fallback
      val zbuf = new Array[Byte](len)
      val zlen = Lz4Block.compress(payload, len, zbuf)
      if (zlen > 0) {
        val total = zlen + 1 + sizeOfUvarint(len.toLong)
        out.write((t << 4) | (total & 0xf) | 0x40)
        uvarint(out, (total >> 4).toLong)
        out.write(0x00) // CompressionFormatLZ4
        uvarint(out, len.toLong)
        out.write(zbuf, 0, zlen)
        return out.toByteArray
      }
    }
    out.write((t << 4) | (len & 0xf)) // V=0, C=0, T, L
    uvarint(out, (len >> 4).toLong)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Stream-encode rows of one schema as a ZNG stream: types frame first
    * (fully determined by the schema), then bounded values frames as rows
    * arrive — at most one ~1 MiB frame is buffered, never the partition.
    */
  def encodeStreamTo(out: java.io.OutputStream, rows: Iterator[Row], schema: StructType): Unit = {
    val table = new TypeTable
    val topId = table.idOf(schema)
    val tf = frame(0, table.defs.toByteArray) // types frame
    out.write(tf, 0, tf.length)
    val values = new ByteArrayOutputStream()
    def flush(): Unit = {
      val vf = frame(1, values.toByteArray)
      out.write(vf, 0, vf.length); values.reset()
    }
    rows.foreach { r =>
      uvarint(values, topId.toLong)
      val body = new ByteArrayOutputStream()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        encodeValue(body, if (r.isNullAt(i)) null else r.get(i), f.dataType)
      }
      val b = body.toByteArray
      uvarint(values, b.length + 1L)
      values.write(b, 0, b.length)
      if (values.size() >= 512 * 1024) flush() // reference FrameThresh (zngio DefaultFrameThresh)
    }
    if (values.size() > 0) flush()
    out.write(0xff) // end of stream
  }

  /** Encode a complete single-stream ZNG byte sequence for rows of one schema. */
  def encodeStream(rows: Iterator[Row], schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    encodeStreamTo(out, rows, schema)
    out.toByteArray
  }

  /** Distributed write: one ZNG stream file per partition, through the
    * Hadoop FileSystem API so the parts land on the shared filesystem
    * (HDFS/S3A/file:) rather than executor-local disk. Encodes straight
    * from the physical plan's InternalRows (queryExecution.toRdd) — no
    * per-row InternalRow→Row deconversion, strings stay UTF-8 bytes from
    * Tungsten memory to the wire.
    */
  def write(df: DataFrame, path: String): Unit = {
    // TAGGED frames write per-row TYPED values: each row re-types against
    // its shape so zed types (ip/time/named, per-row shapes) hit the wire
    // — and the engine's tag column itself never leaks into the file
    if (df.columns.contains(graft.operators.Het.typeTag)) {
      writeTagged(df, path)
      return
    }
    // Untagged frames carrying RUNTIME-typed (variant) columns — e.g. a
    // boxed het scalar stream (`yield 1,[1,2,3]`) — must write each row's
    // runtime value with its own type; the internal encoders below would
    // leak the engine's union carrier onto the wire. And a this-only
    // frame is the BARE-VALUE carrier: the wire sees the value itself,
    // never a {this:…} wrapper (zq.md's concat + hexdump doc examples
    // pin both).
    val dataNames = df.schema.fields.toIndexedSeq
      .filterNot(f => f.metadata.contains("graft.scopeVar")).map(_.name)
    if (dataNames == Seq("this") ||
        df.schema.fields.exists(f => !f.metadata.contains("graft.scopeVar") &&
          ZsonIO.isVariantType(f.dataType))) {
      writeRuntimeSlow(df, path)
      return
    }
    val schema = df.schema
    HadoopFs.prepareDir(df.sparkSession, path)
    val confMap = HadoopFs.confMap(df.sparkSession)
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val out = HadoopFs.create(confMap, path, f"part-$pid%05d.zng")
      try encodeInternalStreamTo(out, rows, schema) finally out.close()
      Iterator.empty
    }.count(): Unit
  }

  /** Typed-shape field encoder over INTERNAL rows: the zed type from the
    * shape drives the wire form (ips as address bytes, ns-long carriers
    * as time, named types via the type table), the Spark type drives the
    * access. None = this (shape, carrier) pair needs the slow row path.
    */
  private[graft] def shapeFieldEncoder(zt: ZType, dt: DataType)
      : Option[(ByteBuf, SpecializedGetters, Int) => Unit] = ZType.strip(zt) match {
    case ZType.Prim("ip") if dt == StringType => Some { (out, g, i) =>
      val s = g.getUTF8String(i).toString
      try {
        val b = java.net.InetAddress.getByName(s).getAddress
        out.writeUvarint(b.length + 1L); out.writeBytes(b)
      } catch { case _: Exception =>
        val b = s.getBytes("UTF-8"); out.writeUvarint(b.length + 1L); out.writeBytes(b) }
    }
    case ZType.Prim("net") if dt == StringType => Some { (out, g, i) =>
      val s = g.getUTF8String(i).toString
      try {
        val Array(addr, bits) = s.split("/", 2)
        val ab = java.net.InetAddress.getByName(addr).getAddress
        val mask = new Array[Byte](ab.length)
        val nbits = bits.toInt
        for (k <- mask.indices) {
          val keep = math.max(0, math.min(8, nbits - k * 8))
          mask(k) = (if (keep == 0) 0 else (0xff << (8 - keep)) & 0xff).toByte
        }
        out.writeUvarint(ab.length * 2 + 1L)
        out.writeBytes(ab); out.writeBytes(mask)
      } catch { case _: Exception =>
        val b = s.getBytes("UTF-8"); out.writeUvarint(b.length + 1L); out.writeBytes(b) }
    }
    case ZType.Prim("time") if dt == LongType =>
      Some((out, g, i) => out.writeTaggedSigned(g.getLong(i))) // ns carrier
    case ZType.Prim("duration") if dt == LongType =>
      Some((out, g, i) => out.writeTaggedSigned(g.getLong(i)))
    // uintN are UNSIGNED minimal-LE on the wire (no zigzag) — the signed
    // internalFieldEncoder would round-trip v as 2v
    case ZType.Prim("uint64") if dt == LongType =>
      Some((out, g, i) => out.writeTaggedUnsigned(g.getLong(i)))
    case ZType.Prim("uint8") if dt == ShortType =>
      Some((out, g, i) => out.writeTaggedUnsigned(g.getShort(i).toLong & 0xffL))
    case ZType.Prim("uint8") if dt == IntegerType =>
      Some((out, g, i) => out.writeTaggedUnsigned(g.getInt(i).toLong & 0xffL))
    case ZType.Prim("uint16") if dt == IntegerType =>
      Some((out, g, i) => out.writeTaggedUnsigned(g.getInt(i).toLong & 0xffffL))
    case ZType.Prim("uint32") if dt == LongType =>
      Some((out, g, i) => out.writeTaggedUnsigned(g.getLong(i) & 0xffffffffL))
    case ZType.Prim("uint64") if dt == DecimalType(20, 0) =>
      Some(internalFieldEncoder(dt)) // Decimal(20,0) case is already unsigned-LE
    // float16 is 2-byte IEEE half on the wire, not float32 bits
    case ZType.Prim("float16") if dt == FloatType || dt == DoubleType =>
      Some { (out, g, i) =>
        val d = if (dt == FloatType) g.getFloat(i).toDouble else g.getDouble(i)
        out.writeTaggedFixedLE(ZFormat.toHalfBits(d).toLong & 0xffffL, 2)
      }
    case ZType.Prim(p) if Set("int8", "int16", "int32", "int64",
        "float32", "float64", "string",
        "bool", "bytes", "time", "duration", "null")(p) &&
        sparkPrimMatches(p, dt) =>
      Some(internalFieldEncoder(dt))
    case ZType.Rec(fs) => dt match {
      case st: StructType if !ZsonIO.isVariantType(st) &&
          fs.length == st.fields.length =>
        val subs = fs.zip(st.fields).map { case ((_, ft), sf) =>
          shapeFieldEncoder(ft, sf.dataType)
        }
        if (subs.exists(_.isEmpty)) None
        else {
          val encs = subs.map(_.get)
          val inner = new ByteBuf(256)
          Some { (out, g, i) =>
            val row = g.getStruct(i, encs.length)
            inner.reset()
            var k = 0
            while (k < encs.length) {
              if (row.isNullAt(k)) inner.writeNullTag() else encs(k)(inner, row, k)
              k += 1
            }
            out.writeUvarint(inner.size + 1L)
            inner.writeTo(out)
          }
        }
      case _ => None
    }
    case ZType.Arr(et) => dt match {
      case ArrayType(edt, _) =>
        shapeFieldEncoder(et, edt).map { enc =>
          val inner = new ByteBuf(256)
          (out: ByteBuf, g: SpecializedGetters, i: Int) => {
            val arr = g.getArray(i)
            inner.reset()
            var k = 0
            while (k < arr.numElements()) {
              if (arr.isNullAt(k)) inner.writeNullTag() else enc(inner, arr, k)
              k += 1
            }
            out.writeUvarint(inner.size + 1L)
            inner.writeTo(out)
          }
        }
      case _ => None
    }
    case ZType.SetT(et) => dt match {
      // set values are already normalized (read/construction order) —
      // the wire form matches the array encoding
      case ArrayType(edt, _) =>
        shapeFieldEncoder(et, edt).map { enc =>
          val inner = new ByteBuf(256)
          (out: ByteBuf, g: SpecializedGetters, i: Int) => {
            val arr = g.getArray(i)
            inner.reset()
            var k = 0
            while (k < arr.numElements()) {
              if (arr.isNullAt(k)) inner.writeNullTag() else enc(inner, arr, k)
              k += 1
            }
            out.writeUvarint(inner.size + 1L)
            inner.writeTo(out)
          }
        }
      case _ => None
    }
    case ZType.EnumT(symbols) if dt == StringType =>
      // enums encode as the SYMBOL INDEX (unsigned)
      val index = symbols.zipWithIndex.toMap
      Some { (out, g, i) =>
        index.get(g.getUTF8String(i).toString) match {
          case Some(ix) =>
            var x = ix.toLong
            val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
            while (x != 0) { bytes += (x & 0xff).toByte; x >>= 8 }
            out.writeUvarint(bytes.length + 1L); out.writeBytes(bytes.toArray)
          case None => out.writeNullTag()
        }
      }
    case ZType.Named(_, innerT) => shapeFieldEncoder(innerT, dt)
    case _ => None
  }

  private def sparkPrimMatches(p: String, dt: DataType): Boolean = (p, dt) match {
    case ("int8", ByteType) | ("int16", ShortType) | ("int32", IntegerType) |
         ("int64", LongType) | ("float32", FloatType) |
         ("float64", DoubleType) | ("string", StringType) |
         ("bool", BooleanType) | ("bytes", BinaryType) |
         ("time", TimestampType) | ("time", TimestampNTZType) |
         ("null", NullType) => true
    case _ => false
  }

  private def writeTagged(df: DataFrame, path: String): Unit = {
    val het = graft.operators.Het
    val schema = df.schema
    val dataF = StructType(schema.fields.filter(f =>
      f.name != het.typeTag && !f.metadata.contains("graft.scopeVar")))
    val tagIdx = schema.fieldIndex(het.typeTag)
    val shapes: Seq[String] = {
      val f = schema.fields(tagIdx)
      if (f.metadata.contains("shapes")) f.metadata.getStringArray("shapes").toSeq
      else Seq.empty
    }
    // FAST path: every shape compiles to a typed internal-row encoder —
    // one pass over internal rows, zero external-Row materialization.
    // Encoder lambdas hold scratch ByteBufs, so the map is rebuilt inside
    // each partition; the driver only validates that every shape compiles.
    def buildEncoders(sch: StructType)
        : Option[Map[String, (ZT, Array[(Int, (ByteBuf, SpecializedGetters, Int) => Unit)])]] =
      if (shapes.isEmpty) None
      else {
        val built = shapes.map { tag =>
          try {
            val zt0 = ZsonParser.parseType(ZType.stripNullWrap(tag))
            ZType.strip(zt0) match {
              case ZType.Rec(fs) =>
                val colEncs = fs.map { case (n, ft) =>
                  val ci = sch.fieldNames.indexOf(n)
                  if (ci < 0) None
                  else shapeFieldEncoder(ft, sch.fields(ci).dataType).map(ci -> _)
                }
                if (colEncs.exists(_.isEmpty)) None
                else Some(tag -> (toZT(zt0), colEncs.map(_.get).toArray))
              case _ => None
            }
          } catch { case _: Exception => None }
        }
        if (built.exists(_.isEmpty)) None else Some(built.map(_.get).toMap)
      }
    HadoopFs.prepareDir(df.sparkSession, path)
    val confMap = HadoopFs.confMap(df.sparkSession)
    buildEncoders(schema) match {
      case Some(_) =>
        df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
          val encMap = buildEncoders(schema).get
          val out = HadoopFs.create(confMap, path, f"part-$pid%05d.zng")
          val table = new ZtTable
          // tag dispatch stays in the byte domain: the String-keyed form
          // re-decoded and re-hashed the tag text per ROW (toString + two
          // map lookups). UTF8String keys hash the bytes, the id is folded
          // into the entry, and a last-tag inline cache turns the
          // homogeneous-stream case into one byte-equals per row.
          // (idOf assignment iterates encMap exactly as before, so type
          // ids and the defs-frame bytes are unchanged.)
          type Encs = Array[(Int, (ByteBuf, SpecializedGetters, Int) => Unit)]
          val encByTag = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, (Long, Encs)]()
          encMap.foreach { case (tag, (t, encs)) =>
            encByTag.put(org.apache.spark.unsafe.types.UTF8String.fromString(tag),
              (table.idOf(t).toLong, encs))
          }
          var lastTag: org.apache.spark.unsafe.types.UTF8String = null
          var lastE: (Long, Encs) = null
          val body = new ByteArrayOutputStream()
          val buf = new ByteBuf(1 << 12)
          try {
            rows.foreach { r =>
              val tagU = r.getUTF8String(tagIdx)
              if (lastTag == null || !lastTag.equals(tagU)) {
                val e = encByTag.get(tagU)
                if (e == null) throw new NoSuchElementException(tagU.toString)
                lastTag = tagU.clone() // the scan buffer behind tagU is reused
                lastE = e
              }
              val encs = lastE._2
              uvarint(body, lastE._1)
              buf.reset()
              var k = 0
              while (k < encs.length) {
                val (ci, enc) = encs(k)
                if (r.isNullAt(ci)) buf.writeNullTag() else enc(buf, r, ci)
                k += 1
              }
              uvarint(body, buf.size + 1L)
              buf.writeTo(body)
              if (body.size >= 512 * 1024 || table.defs.size() >= 512 * 1024) { // reference FrameThresh
                if (table.defs.size() > 0) {
                  out.write(frame(0, table.defs.toByteArray)); table.defs.reset()
                }
                out.write(frame(1, body.toByteArray)); body.reset()
              }
            }
            if (table.defs.size() > 0) out.write(frame(0, table.defs.toByteArray))
            if (body.size() > 0) out.write(frame(1, body.toByteArray))
            out.write(0xff)
          } finally out.close()
          Iterator.empty
        }.count(): Unit
      case None =>
        writeTaggedSlow(df, path, dataF, tagIdx)
    }
  }

  /** Untagged frame with variant columns: rebuild each row's runtime value
    * and write it with its own type (the same per-value typed encoding the
    * tagged slow path uses, minus the tag).
    */
  private def writeRuntimeSlow(df: DataFrame, path: String): Unit = {
    val dataF = StructType(df.schema.fields.filter(f =>
      !f.metadata.contains("graft.scopeVar")))
    val dataIdxs = df.schema.fields.zipWithIndex.collect {
      case (f, i) if !f.metadata.contains("graft.scopeVar") => i
    }
    HadoopFs.prepareDir(df.sparkSession, path)
    val confMap = HadoopFs.confMap(df.sparkSession)
    // this-only frames unwrap the bare-value carrier: convert the single
    // column directly (variant columns carry their runtime type; static
    // ones use the column's zed type, honoring type-valued metadata)
    val thisOnly: Option[(Int, DataType, ZType)] =
      if (dataF.fields.map(_.name).toSeq == Seq("this")) {
        val f = dataF.fields.head
        val zt =
          if (f.metadata.contains("graft.zedType"))
            ZType.Prim(f.metadata.getString("graft.zedType"))
          // a boxed variant carrier has no static zed type — its Spark
          // struct is the engine's union carrier ({k,n,s,...}), never a
          // record shape; null rows must be null(null), not the carrier
          else if (ZsonIO.isVariantType(f.dataType)) ZType.Prim("null")
          else try ZsonParser.parseType(graft.functions.Shaper.zedTypeOf(f.dataType))
          catch { case _: Exception => ZType.Prim("string") }
        Some((dataIdxs.head, f.dataType, zt))
      } else None
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val fn = ZFormat.rowValueFn(dataF)
      val out = HadoopFs.create(confMap, path, f"part-$pid%05d.zng")
      val table = new ZtTable
      val body = new ByteArrayOutputStream()
      try {
        rows.foreach { row =>
          val v = thisOnly match {
            case Some((i, dt, zt)) =>
              if (row.isNullAt(i)) ZValue.VNull(zt)
              else ZValue.fromExternal(row.get(i), dt, zt)
            case None =>
              fn(org.apache.spark.sql.Row.fromSeq(dataIdxs.toIndexedSeq.map(row.get)))
          }
          val t = toZT(ZValue.typeOf(v))
          val id = table.idOf(t)
          uvarint(body, id.toLong)
          encodeZTagged(body, v, t)
          if (body.size >= 512 * 1024 || table.defs.size() >= 512 * 1024) { // reference FrameThresh
            if (table.defs.size() > 0) {
              out.write(frame(0, table.defs.toByteArray)); table.defs.reset()
            }
            out.write(frame(1, body.toByteArray)); body.reset()
          }
        }
        if (table.defs.size() > 0) out.write(frame(0, table.defs.toByteArray))
        if (body.size() > 0) out.write(frame(1, body.toByteArray))
        out.write(0xff)
      } finally out.close()
      Iterator.empty
    }.count(): Unit
  }

  private def writeTaggedSlow(df: DataFrame, path: String,
      dataF: StructType, tagIdx: Int): Unit = {
    val het = graft.operators.Het
    val dataIdxs = df.schema.fields.zipWithIndex.collect {
      case (f, i) if f.name != het.typeTag &&
        !f.metadata.contains("graft.scopeVar") => i
    }
    val confMap = HadoopFs.confMap(df.sparkSession)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val fn = ZFormat.rowValueFn(dataF)
      val out = HadoopFs.create(confMap, path, f"part-$pid%05d.zng")
      val table = new ZtTable
      val body = new ByteArrayOutputStream()
      try {
        rows.foreach { row =>
          val tag = row.getString(tagIdx)
          val base = fn(org.apache.spark.sql.Row.fromSeq(dataIdxs.toIndexedSeq.map(row.get)))
          // re-type against the row's shape; non-record shapes unwrap
          // their `this` carrier
          val v =
            try {
              val zt0 = ZsonParser.parseType(ZType.stripNullWrap(tag))
              // a null(<type>) tag means the whole row IS a typed null —
              // the physical columns are merge artifacts
              if (ZType.isNullWrap(tag)) ZValue.VNull(zt0)
              else {
                val subject = (ZType.strip(zt0), base) match {
                  // record shape in a MERGED frame: restrict to the shape's
                  // own fields — sibling columns are other shapes' nulls
                  // (the fast-path encoders read only the shape's columns)
                  case (rec: ZType.Rec, ZValue.VRec(fs)) =>
                    val byName = fs.toMap
                    ZValue.VRec(rec.fields.flatMap { case (n, _) =>
                      byName.get(n).map(n -> _) })
                  case (_: ZType.Rec, _) => base
                  // non-record shape in a MERGED frame: the value rides the
                  // `this` carrier; sibling columns are other shapes' nulls
                  case (_, ZValue.VRec(fs)) if fs.exists(_._1 == "this") =>
                    fs.collectFirst { case ("this", inner) => inner }.get
                  case _ => base
                }
                ZsonParser.retype(subject, zt0)
              }
            } catch { case _: Exception => base }
          val t = toZT(ZValue.typeOf(v))
          val id = table.idOf(t)
          uvarint(body, id.toLong)
          encodeZTagged(body, v, t)
          if (body.size >= 512 * 1024 || table.defs.size() >= 512 * 1024) { // reference FrameThresh
            if (table.defs.size() > 0) {
              out.write(frame(0, table.defs.toByteArray)); table.defs.reset()
            }
            out.write(frame(1, body.toByteArray)); body.reset()
          }
        }
        if (table.defs.size() > 0) out.write(frame(0, table.defs.toByteArray))
        if (body.size() > 0) out.write(frame(1, body.toByteArray))
        out.write(0xff)
      } finally out.close()
      Iterator.empty
    }.count(): Unit
  }

  // ---- InternalRow-native encoding (the data-path writer) -------------------

  /** Compile one field's wire encoder over Catalyst internal values — the
    * write twin of the internal decode path. Same wire bytes as
    * encodeValue on the external value (ZngSpec pins byte equality).
    * Container encoders own one reusable inner buffer each (schemas are
    * finite trees, calls are sequential within a partition).
    */
  private def internalFieldEncoder(dt: DataType)
      : (ByteBuf, SpecializedGetters, Int) => Unit = dt match {
    case ByteType => (out, g, i) => out.writeTaggedSigned(g.getByte(i).toLong)
    case ShortType => (out, g, i) => out.writeTaggedSigned(g.getShort(i).toLong)
    case IntegerType => (out, g, i) => out.writeTaggedSigned(g.getInt(i).toLong)
    case LongType => (out, g, i) => out.writeTaggedSigned(g.getLong(i))
    case FloatType => (out, g, i) =>
      out.writeTaggedFixedLE(java.lang.Float.floatToIntBits(g.getFloat(i)).toLong & 0xffffffffL, 4)
    case DoubleType => (out, g, i) =>
      out.writeTaggedFixedLE(java.lang.Double.doubleToLongBits(g.getDouble(i)), 8)
    case BooleanType => (out, g, i) => {
      out.writeUvarint(2L); out.writeByte(if (g.getBoolean(i)) 1 else 0)
    }
    case StringType => (out, g, i) => {
      val b = g.getUTF8String(i).getBytes
      out.writeUvarint(b.length + 1L); out.writeBytes(b)
    }
    case BinaryType => (out, g, i) => {
      val b = g.getBinary(i)
      out.writeUvarint(b.length + 1L); out.writeBytes(b)
    }
    case dt: DecimalType if dt.precision == 20 && dt.scale == 0 => (out, g, i) => {
      // uint64 carrier: unsigned little-endian minimal bytes
      var x = BigInt(g.getDecimal(i, 20, 0).toJavaBigDecimal.toBigInteger)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while (x != 0) { buf += (x & 0xff).toByte; x >>= 8 }
      out.writeUvarint(buf.length + 1L); out.writeBytes(buf.toArray)
    }
    case d: DecimalType => (out, g, i) =>
      out.writeTaggedFixedLE(java.lang.Double.doubleToLongBits(
        g.getDecimal(i, d.precision, d.scale).toDouble), 8)
    // internal timestamps are epoch micros; the wire carries ns
    case TimestampType | TimestampNTZType => (out, g, i) =>
      out.writeTaggedSigned(Math.multiplyExact(g.getLong(i), 1000L))
    case DateType => (out, g, i) =>
      out.writeTaggedSigned(g.getInt(i) * 86400L * 1000000000L)
    case _: DayTimeIntervalType => (out, g, i) =>
      out.writeTaggedSigned(Math.multiplyExact(g.getLong(i), 1000L))
    case st: StructType =>
      val n = st.fields.length
      val encs = st.fields.map(f => internalFieldEncoder(f.dataType))
      val inner = new ByteBuf()
      (out, g, i) => {
        val r = g.getStruct(i, n)
        inner.reset()
        var j = 0
        while (j < n) {
          if (r.isNullAt(j)) inner.writeNullTag() else encs(j)(inner, r, j)
          j += 1
        }
        out.writeUvarint(inner.size + 1L); inner.writeTo(out)
      }
    case ArrayType(et, _) =>
      val enc = internalFieldEncoder(et)
      val inner = new ByteBuf()
      (out, g, i) => {
        val a = g.getArray(i)
        inner.reset()
        var j = 0
        while (j < a.numElements()) {
          if (a.isNullAt(j)) inner.writeNullTag() else enc(inner, a, j)
          j += 1
        }
        out.writeUvarint(inner.size + 1L); inner.writeTo(out)
      }
    case MapType(kt, vt, _) =>
      val kEnc = internalFieldEncoder(kt)
      val vEnc = internalFieldEncoder(vt)
      (out, g, i) => {
        // normalized: entries sorted by encoded key bytes (§2.2.3)
        val m = g.getMap(i)
        val ka = m.keyArray(); val va = m.valueArray()
        val entries = (0 until m.numElements()).map { j =>
          val kb = new ByteBuf(64)
          if (ka.isNullAt(j)) kb.writeNullTag() else kEnc(kb, ka, j)
          val vb = new ByteBuf(64)
          if (va.isNullAt(j)) vb.writeNullTag() else vEnc(vb, va, j)
          (kb.toByteArray, vb.toByteArray)
        }.sortWith((a, b) => java.util.Arrays.compare(a._1, b._1) < 0)
        val inner = new ByteBuf(256)
        entries.foreach { case (kb, vb) => inner.writeBytes(kb); inner.writeBytes(vb) }
        out.writeUvarint(inner.size + 1L); inner.writeTo(out)
      }
    case NullType => (out, _, _) => out.writeNullTag()
    case other => throw new IllegalArgumentException(s"zng: unsupported type $other")
  }

  /** Stream-encode internal rows of one schema — identical wire output to
    * encodeStreamTo, without the external-Row detour.
    */
  def encodeInternalStreamTo(out: java.io.OutputStream,
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      schema: StructType): Unit = {
    val table = new TypeTable
    val topId = table.idOf(schema)
    val tf = frame(0, table.defs.toByteArray) // types frame
    out.write(tf, 0, tf.length)
    val values = new ByteBuf(1 << 20)
    def flush(): Unit = {
      // shared frame writer: LZ4-compresses when smaller, like the
      // external encoder — the two paths stay byte-identical
      val vf = frame(1, values.toByteArray)
      out.write(vf, 0, vf.length)
      values.reset()
    }
    val encs = schema.fields.map(f => internalFieldEncoder(f.dataType))
    val n = encs.length
    val body = new ByteBuf(1 << 12)
    rows.foreach { r =>
      values.writeUvarint(topId.toLong)
      body.reset()
      var i = 0
      while (i < n) {
        if (r.isNullAt(i)) body.writeNullTag() else encs(i)(body, r, i)
        i += 1
      }
      values.writeUvarint(body.size + 1L)
      body.writeTo(values)
      if (values.size >= 512 * 1024) flush() // reference FrameThresh (zngio DefaultFrameThresh)
    }
    if (values.size > 0) flush()
    out.write(0xff) // end of stream
  }

  // ---- decoding --------------------------------------------------------------

  private[sources] sealed trait ZT
  private[sources] case class ZPrim(id: Int) extends ZT
  private[sources] case class ZRecord(fields: Seq[(String, ZT)]) extends ZT
  private[sources] case class ZArray(elem: ZT) extends ZT
  private[sources] case class ZSet(elem: ZT) extends ZT
  private[sources] case class ZMap(k: ZT, v: ZT) extends ZT
  private[sources] case class ZUnion(alts: Seq[ZT]) extends ZT
  private[sources] case class ZEnum(symbols: Seq[String]) extends ZT
  private[sources] case class ZError(inner: ZT) extends ZT
  private[sources] case class ZNamed(name: String, inner: ZT) extends ZT

  /** Σ value-body byte lengths over a written zng file/dir — the
    * reference's scan statistic (bytes_read counts val.Bytes() sizes,
    * runtime scanner progress) — compression-independent.
    */
  def valueByteSum(path: String): Long = {
    val f = new java.io.File(path)
    val files: Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq
          .filter(p => p.isFile && !p.getName.startsWith("_") &&
            !p.getName.startsWith("."))
          .sortBy(_.getName)
      else Seq(f)
    var sum = 0L
    for (file <- files) {
      val buf = java.nio.file.Files.readAllBytes(file.toPath)
      val c = new Cursor(buf, 0)
      while (!c.done) {
        val code = c.u8()
        if (code != 0xff) {
          val compressed = (code & 0x40) != 0
          val t = (code >> 4) & 0x3
          val len = ((c.uvarint() << 4) | (code & 0xf).toLong).toInt
          val raw = c.bytes(len)
          if (t == 1) { // values frame
            val payload =
              if (!compressed) raw
              else {
                val pc = new Cursor(raw, 0)
                pc.u8() // format
                val usize = pc.uvarint().toInt
                val comp = java.util.Arrays.copyOfRange(raw, pc.pos, raw.length)
                val out = new Array[Byte](usize)
                net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
                  .decompress(comp, 0, out, 0, usize)
                out
              }
            val vc = new Cursor(payload, 0)
            while (!vc.done) {
              vc.uvarint() // type id
              val tag = vc.uvarint()
              if (tag > 0) { val n = (tag - 1).toInt; vc.pos += n; sum += n }
            }
          }
        }
      }
    }
    sum
  }

  /** Decode a (single-stream) zng file into its typedef payload and the
    * raw per-value slices (`type-id uvarint + tag + body`, exactly as they
    * sit in the values frames) plus each value's body length. Used by the
    * lake's seek-index builder to RE-frame an object into per-stride
    * streams with byte-exact lengths (reference lake/data/writer.go cuts
    * streams with zngio EndStream; each stream re-emits its types frame).
    */
  private[graft] def parseStream(path: String): (Array[Byte], Seq[(Array[Byte], Int)]) = {
    val f = new java.io.File(path)
    val files: Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq
          .filter(p => p.isFile && !p.getName.startsWith("_") &&
            !p.getName.startsWith("."))
          .sortBy(_.getName)
      else Seq(f)
    val types = new ByteArrayOutputStream()
    val values = Vector.newBuilder[(Array[Byte], Int)]
    for (file <- files) {
      val buf = java.nio.file.Files.readAllBytes(file.toPath)
      val c = new Cursor(buf, 0)
      while (!c.done) {
        val code = c.u8()
        if (code != 0xff) {
          val compressed = (code & 0x40) != 0
          val t = (code >> 4) & 0x3
          val len = ((c.uvarint() << 4) | (code & 0xf).toLong).toInt
          val raw = c.bytes(len)
          val payload =
            if (!compressed) raw
            else {
              val pc = new Cursor(raw, 0)
              pc.u8() // format
              val usize = pc.uvarint().toInt
              val comp = java.util.Arrays.copyOfRange(raw, pc.pos, raw.length)
              val out = new Array[Byte](usize)
              net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
                .decompress(comp, 0, out, 0, usize)
              out
            }
          if (t == 0) types.write(payload, 0, payload.length)
          else if (t == 1) {
            val vc = new Cursor(payload, 0)
            while (!vc.done) {
              val start = vc.pos
              vc.uvarint() // type id
              val tag = vc.uvarint()
              val bodyLen = if (tag > 0) (tag - 1).toInt else 0
              vc.pos += bodyLen
              values += java.util.Arrays.copyOfRange(payload, start, vc.pos) -> bodyLen
            }
          }
        }
      }
    }
    (types.toByteArray, values.result())
  }

  private[sources] final class Cursor(val buf: Array[Byte], var pos: Int) {
    def u8(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def uvarint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do { b = u8(); v |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      v
    }
    def bytes(n: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; r
    }
    // allocation-free decode of counted bodies in place (the hot path)
    def unsignedAt(n: Int): Long = {
      var u = 0L; var i = pos + n - 1
      while (i >= pos) { u = (u << 8) | (buf(i) & 0xffL); i -= 1 }
      pos += n; u
    }
    def signedAt(n: Int): Long = {
      val u = unsignedAt(n)
      if ((u & 1L) == 0) u >>> 1
      else { val m = u >>> 1; if (m == 0) Long.MinValue else -m }
    }
    def done: Boolean = pos >= buf.length
  }

  /** Unsynchronized growable byte buffer for the wire encoders —
    * ByteArrayOutputStream's per-write monitor is real cost on JDK 17
    * (no biased locking) at tens of millions of field writes.
    */
  private[graft] final class ByteBuf(initial: Int = 1 << 12) {
    private var buf = new Array[Byte](initial)
    private var len = 0
    def size: Int = len
    def reset(): Unit = len = 0
    private def ensure(n: Int): Unit = if (len + n > buf.length) {
      var cap = buf.length * 2
      while (cap < len + n) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
    def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
    def writeBytes(b: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(b, off, buf, len, n); len += n
    }
    def writeBytes(b: Array[Byte]): Unit = writeBytes(b, 0, b.length)
    def writeUvarint(v0: Long): Unit = {
      ensure(10)
      var v = v0
      while ((v & ~0x7fL) != 0) { buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
      buf(len) = v.toByte; len += 1
    }
    /** Counted signed varint with its length tag — same bytes as
      * tagged(signedBytes(n)) without the intermediate array.
      */
    def writeTaggedSigned(n: Long): Unit = {
      var u = if (n >= 0) n << 1 else ((-n) << 1) | 1L // MinValue → reserved 0x01
      val nb = if (u == 0) 0 else (71 - java.lang.Long.numberOfLeadingZeros(u)) / 8
      writeUvarint(nb + 1L)
      ensure(nb)
      var i = 0
      while (i < nb) { buf(len) = (u & 0xff).toByte; u >>>= 8; len += 1; i += 1 }
    }
    /** Counted UNSIGNED minimal little-endian bytes — the wire form for
      * uintN (reference zcode: EncodeUint). No zigzag.
      */
    def writeTaggedUnsigned(n: Long): Unit = {
      var u = n
      val nb = if (u == 0) 0 else (71 - java.lang.Long.numberOfLeadingZeros(u)) / 8
      writeUvarint(nb + 1L)
      ensure(nb)
      var i = 0
      while (i < nb) { buf(len) = (u & 0xff).toByte; u >>>= 8; len += 1; i += 1 }
    }
    def writeTaggedFixedLE(v: Long, n: Int): Unit = {
      writeUvarint(n + 1L)
      ensure(n)
      var i = 0
      while (i < n) { buf(len) = ((v >>> (8 * i)) & 0xff).toByte; len += 1; i += 1 }
    }
    def writeNullTag(): Unit = writeByte(0)
    def writeTo(out: java.io.OutputStream): Unit = out.write(buf, 0, len)
    def writeTo(other: ByteBuf): Unit = other.writeBytes(buf, 0, len)
    def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  private[graft] def signedOf(b: Array[Byte]): Long = {
    var u = 0L
    for (i <- b.indices.reverse) u = (u << 8) | (b(i) & 0xffL)
    if ((u & 1L) == 0) u >>> 1
    else { val m = u >>> 1; if (m == 0) Long.MinValue else -m }
  }
  private[sources] def unsignedOf(b: Array[Byte]): Long = {
    var u = 0L
    for (i <- b.indices.reverse) u = (u << 8) | (b(i) & 0xffL)
    u
  }

  /** IPv4 dotted quad / IPv6 RFC 5952 compressed text from 4/16 raw bytes. */
  private[sources] def ipText(b: Array[Byte]): String =
    if (b.length == 4) b.map(_ & 0xff).mkString(".")
    else {
      val groups = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
      // find longest run of zero groups (length >= 2) for '::'
      var bestStart = -1; var bestLen = 0; var i = 0
      while (i < 8) {
        if (groups(i) == 0) {
          var j = i; while (j < 8 && groups(j) == 0) j += 1
          if (j - i > bestLen) { bestStart = i; bestLen = j - i }
          i = j
        } else i += 1
      }
      if (bestLen < 2) groups.map(Integer.toHexString).mkString(":")
      else {
        val pre = groups.take(bestStart).map(Integer.toHexString).mkString(":")
        val post = groups.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
        pre + "::" + post
      }
    }

  private[sources] def leadingOnes(mask: Array[Byte]): Int = {
    var n = 0; var i = 0; var stop = false
    while (i < mask.length && !stop) {
      val b = mask(i) & 0xff
      if (b == 0xff) n += 8
      else { n += Integer.numberOfLeadingZeros(~(b << 24)); stop = true }
      i += 1
    }
    n
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")

  /** Decode one tag-encoded value of type t to ZSON text. */
  private[sources] def decodeValue(c: Cursor, t: ZT): String = {
    val tag = c.uvarint()
    if (tag == 0) return "null"
    val n = (tag - 1).toInt
    t match {
      case ZNamed(_, inner) => { c.pos -= sizeOfTag(tag); decodeValue(c, inner) }
      case ZPrim(id) =>
        val b = c.bytes(n)
        id match {
          case i if i >= 0 && i <= 5 => unsignedOf(b).toString // uintN
          case i if (i >= 6 && i <= 11) || i == 12 => signedOf(b).toString
          case ID_TIME =>
            val ns = signedOf(b)
            val inst = java.time.Instant.ofEpochSecond(
              Math.floorDiv(ns, 1000000000L), Math.floorMod(ns, 1000000000L))
            java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
              .withZone(java.time.ZoneOffset.UTC).format(inst)
          case ID_FLOAT32 =>
            val v = java.lang.Float.intBitsToFloat(unsignedOf(b).toInt)
            if (v == Math.floor(v) && !v.isInfinite) s"${v.toLong}." else v.toString
          case ID_FLOAT64 =>
            val v = java.lang.Double.longBitsToDouble(unsignedOf(b))
            if (v == Math.floor(v) && !v.isInfinite) s"${v.toLong}." else v.toString
          case ID_BOOL => if (b.nonEmpty && b(0) == 1) "true" else "false"
          case ID_BYTES => "0x" + b.map(x => f"${x & 0xff}%02x").mkString
          case ID_STRING => "\"" + esc(new String(b, "UTF-8")) + "\""
          case ID_NULL => "null"
          case ID_IP => ipText(b)
          case ID_NET =>
            // addr bytes then mask bytes (primitive.go DecodeNet)
            val addr = java.util.Arrays.copyOfRange(b, 0, b.length / 2)
            val mask = java.util.Arrays.copyOfRange(b, b.length / 2, b.length)
            ipText(addr) + "/" + leadingOnes(mask)
          case other =>
            throw new IllegalArgumentException(
              s"zng: primitive type id $other (float16/128/256, decimal, type) not supported")
        }
      case ZRecord(fields) =>
        val inner = new Cursor(c.bytes(n), 0)
        val parts = fields.map { case (name, ft) =>
          val quoted = if (name.matches("[A-Za-z_][A-Za-z0-9_]*")) name else "\"" + esc(name) + "\""
          s"$quoted:${decodeValue(inner, ft)}"
        }
        parts.mkString("{", ",", "}")
      case ZArray(et) =>
        val inner = new Cursor(c.bytes(n), 0)
        val items = Iterator.continually(())
          .takeWhile(_ => !inner.done).map(_ => decodeValue(inner, et)).toSeq
        items.mkString("[", ",", "]")
      case ZSet(et) =>
        val inner = new Cursor(c.bytes(n), 0)
        val items = Iterator.continually(())
          .takeWhile(_ => !inner.done).map(_ => decodeValue(inner, et)).toSeq
        items.mkString("|[", ",", "]|")
      case ZMap(kt, vt) =>
        val inner = new Cursor(c.bytes(n), 0)
        val entries = scala.collection.mutable.ArrayBuffer.empty[String]
        while (!inner.done) {
          val k = decodeValue(inner, kt)
          val v = decodeValue(inner, vt)
          entries += s"$k:$v"
        }
        entries.mkString("|{", ",", "}|")
      case ZUnion(alts) =>
        // selector is a signed counted varint (complex.go BuildUnion/EncodeInt)
        val inner = new Cursor(c.bytes(n), 0)
        val which = {
          val t2 = inner.uvarint(); val m = (t2 - 1).toInt
          signedOf(inner.bytes(m)).toInt
        }
        decodeValue(inner, alts(which))
      case ZEnum(symbols) =>
        val idx = unsignedOf(c.bytes(n)).toInt
        "\"" + esc(symbols(idx)) + "\""
      case ZError(inner) =>
        val ic = new Cursor(c.bytes(n), 0)
        decodeValue(ic, inner)
    }
  }

  private[sources] def sizeOfTag(tag: Long): Int = {
    var v = tag; var n = 1
    while ((v & ~0x7fL) != 0) { v >>>= 7; n += 1 }
    n
  }

  /** Decode a full ZNG byte stream (possibly several concatenated streams)
    * to ZSON text lines.
    */
  def decodeToZson(bytes: Array[Byte]): Iterator[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val c = new Cursor(bytes, 0)
    var types = scala.collection.mutable.ArrayBuffer.empty[ZT] // ids from 30
    def typeOf(id: Int): ZT =
      if (id < 30) ZPrim(id) else types(id - 30)
    def readCounted(cc: Cursor): String = {
      val n = cc.uvarint().toInt
      new String(cc.bytes(n), "UTF-8")
    }
    while (!c.done) {
      val code = c.u8()
      if (code == 0xff) {
        types = scala.collection.mutable.ArrayBuffer.empty[ZT] // new stream
      } else {
        require((code & 0x80) == 0, "zng: unsupported version bit")
        val compressed = (code & 0x40) != 0
        val t = (code >> 4) & 0x3
        val len = ((c.uvarint() << 4) | (code & 0xf).toLong).toInt
        val raw = c.bytes(len)
        val payload =
          if (!compressed) raw
          else {
            val pc = new Cursor(raw, 0)
            val format = pc.u8()
            require(format == 0, s"zng: unknown compression format $format")
            val usize = pc.uvarint().toInt
            val comp = java.util.Arrays.copyOfRange(raw, pc.pos, raw.length)
            val dec = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
            val buf = new Array[Byte](usize)
            dec.decompress(comp, 0, buf, 0, usize)
            buf
          }
        t match {
          case 0 => // types frame
            val tc = new Cursor(payload, 0)
            while (!tc.done) {
              tc.u8() match {
                case 0x00 =>
                  val nf = tc.uvarint().toInt
                  val fields = (0 until nf).map { _ =>
                    val name = readCounted(tc)
                    val tid = tc.uvarint().toInt
                    name -> typeOf(tid)
                  }
                  types += ZRecord(fields)
                case 0x01 => types += ZArray(typeOf(tc.uvarint().toInt))
                case 0x02 => types += ZSet(typeOf(tc.uvarint().toInt))
                case 0x03 =>
                  val k = typeOf(tc.uvarint().toInt)
                  types += ZMap(k, typeOf(tc.uvarint().toInt))
                case 0x04 =>
                  val nt = tc.uvarint().toInt
                  types += ZUnion((0 until nt).map(_ => typeOf(tc.uvarint().toInt)))
                case 0x05 =>
                  val ne = tc.uvarint().toInt
                  types += ZEnum((0 until ne).map(_ => readCounted(tc)))
                case 0x06 => types += ZError(typeOf(tc.uvarint().toInt))
                case 0x07 =>
                  val name = readCounted(tc)
                  types += ZNamed(name, typeOf(tc.uvarint().toInt))
                case other =>
                  throw new IllegalArgumentException(s"zng: unknown typedef code $other")
              }
            }
          case 1 => // values frame
            val vc = new Cursor(payload, 0)
            while (!vc.done) {
              val tid = vc.uvarint().toInt
              out += decodeValue(vc, typeOf(tid))
            }
          case 2 => // control frame: skip (spec allows)
          case _ =>
            throw new IllegalArgumentException("zng: unexpected frame type 3 inside stream")
        }
      }
    }
    out.iterator
  }

  // ---- structural decode + value-level writer (shared with VngIO) ------------

  /** Decode a ZNG stream to (type, value) pairs with Scala-native values:
    * records → ListMap[String, Any], arrays → Seq[Any], ints → Long,
    * floats → Double, strings → String, null → null. Used for metadata
    * streams (VNG reassembly/trailer) where structure, not text, is needed.
    */
  private[sources] def decodeToValues(bytes: Array[Byte]): Seq[(ZT, Any)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(ZT, Any)]
    foreachValue(bytes) { (t, cursor) => out += ((t, decodeValueAny(cursor, t))) }
    out.toSeq
  }

  private[sources] def decodeValueAny(c: Cursor, t: ZT): Any = {
    val tag = c.uvarint()
    if (tag == 0) return null
    val n = (tag - 1).toInt
    t match {
      case ZNamed(_, inner) => c.pos -= sizeOfTag(tag); decodeValueAny(c, inner)
      case ZPrim(id) =>
        val b = c.bytes(n)
        id match {
          case i if i >= 0 && i <= 5 => unsignedOf(b)
          case i if (i >= 6 && i <= 11) || i == 12 || i == ID_TIME => signedOf(b)
          case ID_FLOAT32 => java.lang.Float.intBitsToFloat(unsignedOf(b).toInt).toDouble
          case ID_FLOAT64 => java.lang.Double.longBitsToDouble(unsignedOf(b))
          case ID_BOOL => b.nonEmpty && b(0) == 1
          case ID_STRING => new String(b, "UTF-8")
          case ID_BYTES => b
          case _ => null
        }
      case ZRecord(fields) =>
        val inner = new Cursor(c.bytes(n), 0)
        scala.collection.immutable.ListMap(fields.map { case (name, ft) =>
          name -> decodeValueAny(inner, ft)
        }: _*)
      case ZArray(et) =>
        val inner = new Cursor(c.bytes(n), 0)
        Iterator.continually(())
          .takeWhile(_ => !inner.done).map(_ => decodeValueAny(inner, et)).toSeq
      case other =>
        // sets/maps/unions are not used in metadata streams
        c.bytes(n); null
    }
  }

  /** Walk a ZNG stream calling f(type, cursor) positioned at each value. */
  private def foreachValue(bytes: Array[Byte])(f: (ZT, Cursor) => Unit): Unit = {
    // delegate to the frame walker in decodeToZson's shape
    val c = new Cursor(bytes, 0)
    var types = scala.collection.mutable.ArrayBuffer.empty[ZT]
    def typeOf(id: Int): ZT = if (id < 30) ZPrim(id) else types(id - 30)
    def readCounted(cc: Cursor): String = {
      val n = cc.uvarint().toInt
      new String(cc.bytes(n), "UTF-8")
    }
    while (!c.done) {
      val code = c.u8()
      if (code == 0xff) types = scala.collection.mutable.ArrayBuffer.empty[ZT]
      else {
        val compressed = (code & 0x40) != 0
        val t = (code >> 4) & 0x3
        val len = ((c.uvarint() << 4) | (code & 0xf).toLong).toInt
        val raw = c.bytes(len)
        val payload =
          if (!compressed) raw
          else {
            val pc = new Cursor(raw, 0)
            require(pc.u8() == 0, "zng: unknown compression format")
            val usize = pc.uvarint().toInt
            val comp = java.util.Arrays.copyOfRange(raw, pc.pos, raw.length)
            val buf = new Array[Byte](usize)
            net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
              .decompress(comp, 0, buf, 0, usize)
            buf
          }
        t match {
          case 0 =>
            val tc = new Cursor(payload, 0)
            while (!tc.done) {
              tc.u8() match {
                case 0x00 =>
                  val nf = tc.uvarint().toInt
                  types += ZRecord((0 until nf).map { _ =>
                    val name = readCounted(tc); name -> typeOf(tc.uvarint().toInt)
                  })
                case 0x01 => types += ZArray(typeOf(tc.uvarint().toInt))
                case 0x02 => types += ZSet(typeOf(tc.uvarint().toInt))
                case 0x03 =>
                  val k = typeOf(tc.uvarint().toInt)
                  types += ZMap(k, typeOf(tc.uvarint().toInt))
                case 0x04 =>
                  val nt = tc.uvarint().toInt
                  types += ZUnion((0 until nt).map(_ => typeOf(tc.uvarint().toInt)))
                case 0x05 =>
                  val ne = tc.uvarint().toInt
                  types += ZEnum((0 until ne).map(_ => readCounted(tc)))
                case 0x06 => types += ZError(typeOf(tc.uvarint().toInt))
                case 0x07 =>
                  val name = readCounted(tc)
                  types += ZNamed(name, typeOf(tc.uvarint().toInt))
                case other =>
                  throw new IllegalArgumentException(s"zng: unknown typedef code $other")
              }
            }
          case 1 =>
            val vc = new Cursor(payload, 0)
            while (!vc.done) {
              val tid = vc.uvarint().toInt
              f(typeOf(tid), vc)
            }
          case _ => // control: skip
        }
      }
    }
  }

  // ---- typed decode (ZT → ZType / ZValue) ------------------------------------

  private val primNames: Map[Int, String] = Map(
    0 -> "uint8", 1 -> "uint16", 2 -> "uint32", 3 -> "uint64",
    6 -> "int8", 7 -> "int16", 8 -> "int32", 9 -> "int64",
    12 -> "duration", 13 -> "time", 14 -> "float16", 15 -> "float32",
    16 -> "float64", 23 -> "bool", 24 -> "bytes", 25 -> "string",
    26 -> "ip", 27 -> "net", 28 -> "type", 29 -> "null")

  private[sources] def zTypeOf(t: ZT): ZType = t match {
    case ZPrim(id) => ZType.Prim(primNames.getOrElse(id,
      throw new IllegalArgumentException(s"zng: unsupported primitive id $id")))
    case ZRecord(fields) => ZType.Rec(fields.iterator.map { case (n, ft) => n -> zTypeOf(ft) }.toVector)
    case ZArray(e) => ZType.Arr(zTypeOf(e))
    case ZSet(e) => ZType.SetT(zTypeOf(e))
    case ZMap(k, v) => ZType.MapT(zTypeOf(k), zTypeOf(v))
    case ZUnion(alts) => ZType.Union(alts.iterator.map(zTypeOf).toVector)
    case ZEnum(symbols) => ZType.EnumT(symbols.toVector)
    case ZError(inner) => ZType.ErrT(zTypeOf(inner))
    case ZNamed(name, inner) => ZType.Named(name, zTypeOf(inner))
  }

  private val primIdByName: Map[String, Int] = primNames.map(_.swap)

  /** Inverse of zTypeOf: the wire type of a value-model type. */
  private[sources] def toZT(t: ZType): ZT = t match {
    case ZType.Prim(name) => ZPrim(primIdByName.getOrElse(name,
      if (name == "decimal") ID_FLOAT64
      else throw new IllegalArgumentException(s"zng: unsupported primitive $name")))
    case ZType.Rec(fs) => ZRecord(fs.map { case (n, ft) => n -> toZT(ft) })
    case ZType.Arr(e) => ZArray(toZT(e))
    case ZType.SetT(e) => ZSet(toZT(e))
    case ZType.MapT(k, v) => ZMap(toZT(k), toZT(v))
    case ZType.Union(alts) => ZUnion(alts.map(toZT))
    case ZType.EnumT(symbols) => ZEnum(symbols)
    case ZType.ErrT(inner) => ZError(toZT(inner))
    case ZType.Named(n, inner) => ZNamed(n, toZT(inner))
  }

  // ---- type VALUES (reference type.go AppendTypeValue; opcodes 30-38) ------

  private[sources] def appendTypeValue(out: ByteArrayOutputStream, t: ZType,
      defs: scala.collection.mutable.Map[String, ZType]): Unit = {
    def counted(s: String): Unit = {
      val b = s.getBytes("UTF-8"); uvarint(out, b.length.toLong); out.write(b, 0, b.length)
    }
    t match {
      case ZType.Named(name, inner) =>
        val isRef = defs.get(name).contains(inner)
        out.write(if (isRef) 38 else 37)
        counted(name)
        if (!isRef) { appendTypeValue(out, inner, defs); defs(name) = inner }
      case ZType.Rec(fs) =>
        out.write(30); uvarint(out, fs.length.toLong)
        fs.foreach { case (n, ft) => counted(n); appendTypeValue(out, ft, defs) }
      case ZType.Arr(e) => out.write(31); appendTypeValue(out, e, defs)
      case ZType.SetT(e) => out.write(32); appendTypeValue(out, e, defs)
      case ZType.MapT(k, v) =>
        out.write(33); appendTypeValue(out, k, defs); appendTypeValue(out, v, defs)
      case ZType.Union(alts) =>
        out.write(34); uvarint(out, alts.length.toLong)
        alts.foreach(appendTypeValue(out, _, defs))
      case ZType.EnumT(symbols) =>
        out.write(35); uvarint(out, symbols.length.toLong); symbols.foreach(counted)
      case ZType.ErrT(inner) => out.write(36); appendTypeValue(out, inner, defs)
      case ZType.Prim(name) =>
        out.write(primIdByName.getOrElse(name, 29))
    }
  }

  private[sources] def decodeTypeValue(c: Cursor,
      defs: scala.collection.mutable.Map[String, ZType]): ZType = {
    def counted(): String = { val n = c.uvarint().toInt; new String(c.bytes(n), "UTF-8") }
    c.u8() match {
      case 30 =>
        val nf = c.uvarint().toInt
        ZType.Rec((0 until nf).iterator.map(_ => counted() -> decodeTypeValue(c, defs)).toVector)
      case 31 => ZType.Arr(decodeTypeValue(c, defs))
      case 32 => ZType.SetT(decodeTypeValue(c, defs))
      case 33 =>
        val k = decodeTypeValue(c, defs); ZType.MapT(k, decodeTypeValue(c, defs))
      case 34 =>
        val na = c.uvarint().toInt
        ZType.Union((0 until na).iterator.map(_ => decodeTypeValue(c, defs)).toVector)
      case 35 =>
        val ns = c.uvarint().toInt
        ZType.EnumT((0 until ns).iterator.map(_ => counted()).toVector)
      case 36 => ZType.ErrT(decodeTypeValue(c, defs))
      case 37 =>
        val name = counted(); val inner = decodeTypeValue(c, defs)
        defs(name) = inner; ZType.Named(name, inner)
      case 38 =>
        val name = counted()
        ZType.Named(name, defs.getOrElse(name, ZType.nullT))
      case prim => ZType.Prim(primNames.getOrElse(prim, "null"))
    }
  }

  // ---- typed VALUE encoder (full type system; used by VNG metadata) --------

  /** Type table over wire types with every typedef opcode (zng spec §2.1). */
  private[sources] final class ZtTable {
    val defs = new ByteArrayOutputStream()
    private var next = 30
    private val ids = scala.collection.mutable.Map.empty[ZT, Int]
    private def counted(s: String): Unit = {
      val b = s.getBytes("UTF-8"); uvarint(defs, b.length.toLong); defs.write(b, 0, b.length)
    }
    def idOf(t: ZT): Int = t match {
      case ZPrim(id) => id
      case _ => ids.getOrElseUpdate(t, define(t))
    }
    private def define(t: ZT): Int = {
      val body: () => Unit = t match {
        case ZRecord(fs) =>
          val fids = fs.map(f => idOf(f._2))
          () => {
            defs.write(0x00); uvarint(defs, fs.length.toLong)
            fs.zip(fids).foreach { case ((n, _), id) => counted(n); uvarint(defs, id.toLong) }
          }
        case ZArray(e) => val i = idOf(e); () => { defs.write(0x01); uvarint(defs, i.toLong) }
        case ZSet(e) => val i = idOf(e); () => { defs.write(0x02); uvarint(defs, i.toLong) }
        case ZMap(k, v) =>
          val ki = idOf(k); val vi = idOf(v)
          () => { defs.write(0x03); uvarint(defs, ki.toLong); uvarint(defs, vi.toLong) }
        case ZUnion(alts) =>
          val ais = alts.map(idOf)
          () => { defs.write(0x04); uvarint(defs, alts.length.toLong); ais.foreach(i => uvarint(defs, i.toLong)) }
        case ZEnum(symbols) =>
          () => { defs.write(0x05); uvarint(defs, symbols.length.toLong); symbols.foreach(counted) }
        case ZError(inner) => val i = idOf(inner); () => { defs.write(0x06); uvarint(defs, i.toLong) }
        case ZNamed(name, inner) =>
          val i = idOf(inner); () => { defs.write(0x07); counted(name); uvarint(defs, i.toLong) }
        case ZPrim(id) => () => ()
      }
      body()
      val id = next; next += 1; id
    }
  }

  /** Encode one typed value's BODY (no outer tag) per its wire type. */
  private[sources] def encodeZBody(out: ByteArrayOutputStream, v0: ZValue, t: ZT): Unit = {
    import ZValue._
    val v = v0 match { case VTyped(i, _) => i; case other => other }
    (v, t) match {
      case (_, ZNamed(_, inner)) => encodeZBody(out, v0, inner)
      // union slots FIRST: every member kind needs its selector, so the
      // generic primitive cases below must not swallow them
      case (_, ZUnion(alts)) =>
        // member tag + tagged member value (§2.2.5); the member type is
        // the ORIGINAL value's type unless that is the union itself
        // (possibly under a name)
        val declared = toZT(ZValue.typeOf(v0))
        val isSelf = declared == t ||
          (declared match { case ZNamed(_, i) => i == t; case _ => false })
        val memberT = if (isSelf) toZT(ZValue.typeOf(v)) else declared
        val which = {
          val exact = alts.indexWhere(_ == memberT)
          if (exact >= 0) exact
          else {
            // inexact member (empty container / unwidened literal): match
            // by container kind, and for primitives by VALUE CLASS so an
            // int never lands on a bool member
            def primClass(z: ZT): Int = zTypeOf(z) match {
              case ZType.Prim(p)
                  if p.startsWith("int") || p.startsWith("uint") ||
                    p.startsWith("float") || p == "decimal" => 1
              case ZType.Prim("bool") => 2
              case ZType.Prim("string") => 3
              case ZType.Prim("time") | ZType.Prim("duration") => 4
              case _ => 5
            }
            val byKind = alts.indexWhere(a => a.getClass == memberT.getClass &&
              (!memberT.isInstanceOf[ZPrim] || primClass(a) == primClass(memberT)))
            // no silent tag-0 default: encoding under a wrong member
            // produces undetectable wire corruption (VngIO's twin throws)
            if (byKind < 0)
              throw new IllegalStateException(
                s"zng union encode: no member of $t fits value type $memberT")
            byKind
          }
        }
        encodeZTagged(out, VInt(which.toLong, "int64"), ZPrim(9))
        encodeZTagged(out, v, alts(which))
      case (VInt(n, _), ZPrim(id)) =>
        if (id <= 3) { // unsigned: little-endian minimal bytes
          var x = n
          while (x != 0) { out.write((x & 0xff).toInt); x >>>= 8 }
        } else { val sb = signedBytes(n); out.write(sb, 0, sb.length) }
      case (VUint64(n), _) =>
        var x = n.toBigInt
        while (x != 0) { out.write((x & 0xff).toInt); x >>= 8 }
      case (VDur(ns), _) => out.write(signedBytes(ns), 0, signedBytes(ns).length)
      case (VTime(ns), _) => out.write(signedBytes(ns), 0, signedBytes(ns).length)
      case (VFloat(d, _), ZPrim(14)) => // float16: 2-byte IEEE half
        out.write(leBytes(ZFormat.toHalfBits(d).toLong & 0xffffL, 2), 0, 2)
      case (VFloat(d, _), ZPrim(ID_FLOAT32)) =>
        out.write(leBytes(java.lang.Float.floatToIntBits(d.toFloat).toLong & 0xffffffffL, 4), 0, 4)
      case (VFloat(d, _), _) =>
        out.write(leBytes(java.lang.Double.doubleToLongBits(d), 8), 0, 8)
      case (VBool(b), _) => out.write(if (b) 1 else 0)
      case (VStr(s), _) =>
        val b = s.getBytes("UTF-8"); out.write(b, 0, b.length)
      case (VBytes(b), _) => out.write(b, 0, b.length)
      case (VIp(s), _) =>
        val b = java.net.InetAddress.getByName(s).getAddress; out.write(b, 0, b.length)
      case (VNet(s), _) =>
        val slash = s.lastIndexOf('/')
        val addr = java.net.InetAddress.getByName(s.substring(0, slash)).getAddress
        val bits = s.substring(slash + 1).toInt
        out.write(addr, 0, addr.length)
        for (i <- addr.indices) {
          val keep = math.max(0, math.min(8, bits - i * 8))
          out.write(if (keep == 0) 0 else ((0xff << (8 - keep)) & 0xff))
        }
      case (VTypeVal(text), _) =>
        val t2 = try new ZsonParser(text).parseTypeText() catch { case _: Exception => ZType.nullT }
        appendTypeValue(out, t2, scala.collection.mutable.Map.empty)
      case (VEnum(sym), ZEnum(symbols)) =>
        val idx = math.max(0, symbols.indexOf(sym)).toLong
        var x = idx; if (x == 0) () else { while (x != 0) { out.write((x & 0xff).toInt); x >>>= 8 } }
      case (VRec(fs), ZRecord(fts)) =>
        fts.foreach { case (n, ft) =>
          encodeZTagged(out, fs.find(_._1 == n).map(_._2).getOrElse(VNull(ZType.nullT)), ft)
        }
      case (VArr(items, _), ZArray(et)) => items.foreach(encodeZTagged(out, _, et))
      case (VArr(items, _), ZSet(et)) => items.foreach(encodeZTagged(out, _, et))
      case (VMap(es), ZMap(kt, vt)) =>
        es.foreach { case (k, x) => encodeZTagged(out, k, kt); encodeZTagged(out, x, vt) }
      case (VErr(inner), ZError(it)) => encodeZTagged(out, inner, it)
      case (other, _) =>
        val b = ZValue.zsonText(other).getBytes("UTF-8"); out.write(b, 0, b.length)
    }
  }

  private[sources] def encodeZTagged(out: ByteArrayOutputStream, v: ZValue, t: ZT): Unit = {
    import ZValue._
    v match {
      case VNull(_) => out.write(0)
      case VTyped(VNull(_), _) => out.write(0)
      case _ =>
        val body = new ByteArrayOutputStream()
        encodeZBody(body, v, t)
        uvarint(out, body.size() + 1L)
        body.writeTo(out)
    }
  }

  /** One self-contained ZNG stream of typed values (types frame, values
    * frame, end-of-stream) — the encoder twin of decodeToZValues.
    */
  def encodeTypedStream(values: Seq[ZValue]): Array[Byte] = {
    val table = new ZtTable
    val body = new ByteArrayOutputStream()
    values.foreach { v =>
      val t = toZT(ZValue.typeOf(v))
      val id = table.idOf(t)
      uvarint(body, id.toLong)
      encodeZTagged(body, v, t)
    }
    val out = new ByteArrayOutputStream()
    if (table.defs.size() > 0) out.write(frame(0, table.defs.toByteArray))
    out.write(frame(1, body.toByteArray))
    out.write(0xff)
    out.toByteArray
  }

  /** IEEE 754 half-precision bits → double (primitive.go DecodeFloat16). */
  private[sources] def halfToDouble(bits: Int): Double = {
    val s = (bits >> 15) & 1; val e = (bits >> 10) & 0x1f; val m = bits & 0x3ff
    val v =
      if (e == 0) m * math.pow(2, -24)
      else if (e == 0x1f) { if (m == 0) Double.PositiveInfinity else Double.NaN }
      else (m + 1024) * math.pow(2, e - 25)
    if (s == 1) -v else v
  }

  /** Decode one tag-encoded value of type t into the typed value model —
    * wrapping (named/union/enum/empty-container) matches what ZsonParser
    * produces for the same value, so zng file reads fuse into identical
    * frames as harness text reads.
    */
  private[sources] def decodeZValue(c: Cursor, t: ZT): ZValue =
    decodeZValue(c, t, unionKeepsMember = false)

  /** With `unionKeepsMember`, a union value decodes to its MEMBER's typed
    * value (named types intact) instead of re-tagging with the union —
    * what an unmarshaler of interface-valued fields needs (VNG metadata).
    */
  private[sources] def decodeZValue(c: Cursor, t: ZT, unionKeepsMember: Boolean): ZValue = {
    import ZValue._
    val tag = c.uvarint()
    if (tag == 0) return VNull(zTypeOf(t))
    val n = (tag - 1).toInt
    t match {
      case ZNamed(name, inner) =>
        c.pos -= sizeOfTag(tag)
        val nt = ZType.Named(name, zTypeOf(inner))
        decodeZValue(c, inner, unionKeepsMember) match {
          case VTyped(i, _) => VTyped(i, nt)
          case other => VTyped(other, nt)
        }
      case ZPrim(id) =>
        val b = c.bytes(n)
        id match {
          case 0 | 1 | 2 => VInt(unsignedOf(b), primNames(id))
          case 3 => VUint64(BigDecimal(java.lang.Long.toUnsignedString(unsignedOf(b))))
          case 6 | 7 | 8 | 9 => VInt(signedOf(b), primNames(id))
          case 12 => VDur(signedOf(b))
          case ID_TIME => VTime(signedOf(b))
          case 14 => VFloat(halfToDouble(unsignedOf(b).toInt), "float16")
          case ID_FLOAT32 => VFloat(java.lang.Float.intBitsToFloat(unsignedOf(b).toInt).toDouble, "float32")
          case ID_FLOAT64 => VFloat(java.lang.Double.longBitsToDouble(unsignedOf(b)), "float64")
          case ID_BOOL => VBool(b.nonEmpty && b(0) == 1)
          case ID_BYTES => VBytes(b)
          case ID_STRING => VStr(new String(b, "UTF-8"))
          case ID_IP => VIp(ipText(b))
          case ID_NET =>
            val addr = java.util.Arrays.copyOfRange(b, 0, b.length / 2)
            val mask = java.util.Arrays.copyOfRange(b, b.length / 2, b.length)
            VNet(ipText(addr) + "/" + leadingOnes(mask))
          case ID_NULL => VNull(ZType.Prim("null"))
          case 28 => // type VALUE (type.go AppendTypeValue encoding)
            val tv = decodeTypeValue(new Cursor(b, 0), scala.collection.mutable.Map.empty)
            VTypeVal(ZType.fullText(tv))
          case other =>
            throw new IllegalArgumentException(
              s"zng: primitive type id $other (decimal) not supported")
        }
      case ZRecord(fields) =>
        val inner = new Cursor(c.bytes(n), 0)
        VRec(fields.iterator.map { case (name, ft) => name -> decodeZValue(inner, ft, unionKeepsMember) }.toVector)
      case ZArray(et) =>
        val inner = new Cursor(c.bytes(n), 0)
        val items = Iterator.continually(())
          .takeWhile(_ => !inner.done).map(_ => decodeZValue(inner, et, unionKeepsMember)).toVector
        if (items.isEmpty) VTyped(VArr(items, isSet = false), ZType.Arr(zTypeOf(et)))
        else VArr(items, isSet = false)
      case ZSet(et) =>
        val inner = new Cursor(c.bytes(n), 0)
        val items = Iterator.continually(())
          .takeWhile(_ => !inner.done).map(_ => decodeZValue(inner, et, unionKeepsMember)).toVector
        if (items.isEmpty) VTyped(VArr(items, isSet = true), ZType.SetT(zTypeOf(et)))
        else VArr(ZValue.normSet(items), isSet = true)
      case ZMap(kt, vt) =>
        val inner = new Cursor(c.bytes(n), 0)
        val entries = Vector.newBuilder[(ZValue, ZValue)]
        while (!inner.done) {
          val k = decodeZValue(inner, kt, unionKeepsMember)
          val v = decodeZValue(inner, vt, unionKeepsMember)
          entries += (k -> v)
        }
        val es = entries.result()
        if (es.isEmpty) VTyped(VMap(es), ZType.MapT(zTypeOf(kt), zTypeOf(vt)))
        else VMap(ZValue.normMap(es))
      case ZUnion(alts) =>
        val inner = new Cursor(c.bytes(n), 0)
        val which = {
          val t2 = inner.uvarint(); val m = (t2 - 1).toInt
          signedOf(inner.bytes(m)).toInt
        }
        val member = decodeZValue(inner, alts(which), unionKeepsMember)
        if (unionKeepsMember) member
        // keep the member VALUE intact under the union wrapper: unwrap
        // here would strip a named/nested-union member's identity, which
        // the k/n/s payload slots cannot re-derive (container/union fuzz)
        else VTyped(member, ZType.Union(alts.iterator.map(zTypeOf).toVector))
      case ZEnum(symbols) =>
        val idx = unsignedOf(c.bytes(n)).toInt
        VTyped(VEnum(symbols(idx)), ZType.EnumT(symbols.toVector))
      case ZError(inner) =>
        VErr(decodeZValue(new Cursor(c.bytes(n), 0), inner, unionKeepsMember))
    }
  }

  /** Parse one types frame's typedefs into the stream's type table. */
  private def parseTypedefs(payload: Array[Byte], types: scala.collection.mutable.ArrayBuffer[ZT]): Unit = {
    def typeOfId(id: Int): ZT = if (id < 30) ZPrim(id) else types(id - 30)
    val tc = new Cursor(payload, 0)
    def readCounted(): String = {
      val n = tc.uvarint().toInt
      new String(tc.bytes(n), "UTF-8")
    }
    while (!tc.done) {
      tc.u8() match {
        case 0x00 =>
          val nf = tc.uvarint().toInt
          types += ZRecord((0 until nf).map { _ =>
            val name = readCounted(); name -> typeOfId(tc.uvarint().toInt)
          })
        case 0x01 => types += ZArray(typeOfId(tc.uvarint().toInt))
        case 0x02 => types += ZSet(typeOfId(tc.uvarint().toInt))
        case 0x03 =>
          val k = typeOfId(tc.uvarint().toInt)
          types += ZMap(k, typeOfId(tc.uvarint().toInt))
        case 0x04 =>
          val nt = tc.uvarint().toInt
          types += ZUnion((0 until nt).map(_ => typeOfId(tc.uvarint().toInt)))
        case 0x05 =>
          val ne = tc.uvarint().toInt
          types += ZEnum((0 until ne).map(_ => readCounted()))
        case 0x06 => types += ZError(typeOfId(tc.uvarint().toInt))
        case 0x07 =>
          val name = readCounted()
          types += ZNamed(name, typeOfId(tc.uvarint().toInt))
        case other =>
          throw new IllegalArgumentException(s"zng: unknown typedef code $other")
      }
    }
  }

  /** Read the next frame's (type, decompressed payload) at the cursor. */
  private def readFrame(c: Cursor, code: Int): (Int, Array[Byte]) = {
    val (t, raw, compressed) = readFrameRaw(c, code)
    (t, inflateFrame(raw, compressed))
  }

  /** Frame header + raw (possibly still-compressed) body — lets the scan
    * DROP a frame before paying LZ4 decompression (stream-level field
    // pruning, fieldnamefinder.go analog).
    */
  private def readFrameRaw(c: Cursor, code: Int): (Int, Array[Byte], Boolean) = {
    require((code & 0x80) == 0, "zng: unsupported version bit")
    val compressed = (code & 0x40) != 0
    val t = (code >> 4) & 0x3
    val len = ((c.uvarint() << 4) | (code & 0xf).toLong).toInt
    (t, c.bytes(len), compressed)
  }

  private def inflateFrame(raw: Array[Byte], compressed: Boolean): Array[Byte] =
    if (!compressed) raw
    else {
      val pc = new Cursor(raw, 0)
      val format = pc.u8()
      require(format == 0, s"zng: unknown compression format $format")
      val usize = pc.uvarint().toInt
      val comp = java.util.Arrays.copyOfRange(raw, pc.pos, raw.length)
      val dec = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
      val buf = new Array[Byte](usize)
      dec.decompress(comp, 0, buf, 0, usize)
      buf
    }

  /** Lazily decode a ZNG byte stream (possibly several concatenated
    * streams) to typed values — one values frame buffered at a time
    * (frames are ~1 MiB), never the whole file's rows.
    */
  def decodeToZValues(bytes: Array[Byte]): Iterator[ZValue] =
    decodeToZValues(bytes, unionKeepsMember = false)

  private[sources] def decodeToZValues(bytes: Array[Byte], unionKeepsMember: Boolean): Iterator[ZValue] = new Iterator[ZValue] {
    private val c = new Cursor(bytes, 0)
    private var types = scala.collection.mutable.ArrayBuffer.empty[ZT]
    private var queue: Iterator[ZValue] = Iterator.empty
    private def typeOfId(id: Int): ZT = if (id < 30) ZPrim(id) else types(id - 30)
    private def fill(): Unit = {
      while (!queue.hasNext && !c.done) {
        val code = c.u8()
        if (code == 0xff) types = scala.collection.mutable.ArrayBuffer.empty[ZT]
        else readFrame(c, code) match {
          case (0, payload) => parseTypedefs(payload, types)
          case (1, payload) =>
            val vc = new Cursor(payload, 0)
            val out = Vector.newBuilder[ZValue]
            while (!vc.done) {
              val tid = vc.uvarint().toInt
              out += decodeZValue(vc, typeOfId(tid), unionKeepsMember)
            }
            queue = out.result().iterator
          case (2, _) => // control frame: skip (spec allows)
          case _ =>
            throw new IllegalArgumentException("zng: unexpected frame type 3 inside stream")
        }
      }
    }
    def hasNext: Boolean = { if (!queue.hasNext) fill(); queue.hasNext }
    def next(): ZValue = { if (!hasNext) throw new NoSuchElementException; queue.next() }
  }

  /** Incremental ZNG stream writer with a shared type context — used for
    * the VNG reassembly/trailer streams where values of several types
    * interleave in one stream.
    */
  private[sources] final class StreamWriter {
    private val table = new TypeTable
    private val values = new ByteArrayOutputStream()

    def write(schema: DataType, v: Any): Unit = {
      val id = table.idOf(schema)
      uvarint(values, id.toLong)
      encodeValue(values, v, schema)
    }

    /** Write an explicitly-null value of the given (complex) type. */
    def writeNull(schema: DataType): Unit = {
      val id = table.idOf(schema)
      uvarint(values, id.toLong)
      values.write(0)
    }

    def finish(): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(frame(0, table.defs.toByteArray))
      out.write(frame(1, values.toByteArray))
      out.write(0xff)
      out.toByteArray
    }
  }

  /** Pass-1 metadata scan of a ZNG stream: shape texts in first-appearance
    * order (with per-file first-row index) plus the sub-µs-time probe and
    * the row count — WITHOUT materializing values. ZNG is typed, so shapes
    * come from the type table; value bodies are skipped via their length
    * tags, except time leaves, whose varint is decoded for the ns probe.
    * This is what makes the two-pass distributed ingest cheap: pass 1 is
    * I/O + tag arithmetic, only pass 2 builds rows.
    */
  private[sources] def scanMeta(bytes: Array[Byte], startIdx: Long)
      : (Seq[(String, Long)], Long, Boolean) = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val textMemo = scala.collection.mutable.HashMap.empty[ZT, String]
    val timeMemo = scala.collection.mutable.HashMap.empty[ZT, Boolean]
    var ns = false
    var i = startIdx
    def hasTimeM(t: ZT): Boolean = timeMemo.getOrElseUpdate(t, t match {
      case ZPrim(id) => id == ID_TIME
      case ZRecord(fs) => fs.exists(f => hasTimeM(f._2))
      case ZArray(e) => hasTimeM(e)
      case ZSet(e) => hasTimeM(e)
      case ZMap(k, v) => hasTimeM(k) || hasTimeM(v)
      case ZUnion(alts) => alts.exists(hasTimeM)
      case ZError(inner) => hasTimeM(inner)
      case ZNamed(_, inner) => hasTimeM(inner)
      case ZEnum(_) => false
    })
    // consume exactly one value, decoding only time leaves
    def probe(c: Cursor, t: ZT): Unit = t match {
      case ZNamed(_, inner) => probe(c, inner) // named shares the inner tag
      case _ if ns || !hasTimeM(t) =>
        val tag = c.uvarint(); if (tag != 0) c.pos += (tag - 1).toInt
      case ZPrim(_) => // time (the only time-bearing prim here)
        val tag = c.uvarint()
        if (tag != 0) {
          val v = signedOf(c.bytes((tag - 1).toInt))
          if (v % 1000L != 0) ns = true
        }
      case ZRecord(fields) =>
        val tag = c.uvarint()
        if (tag != 0) {
          val inner = new Cursor(c.bytes((tag - 1).toInt), 0)
          fields.foreach { case (_, ft) => probe(inner, ft) }
        }
      case ZArray(e) => probeElems(c, Seq(e))
      case ZSet(e) => probeElems(c, Seq(e))
      case ZMap(k, v) => probeElems(c, Seq(k, v))
      case ZUnion(alts) =>
        val tag = c.uvarint()
        if (tag != 0) {
          val inner = new Cursor(c.bytes((tag - 1).toInt), 0)
          val wTag = inner.uvarint()
          val which = signedOf(inner.bytes((wTag - 1).toInt)).toInt
          probe(inner, alts(which))
        }
      case ZError(innerT) =>
        val tag = c.uvarint()
        if (tag != 0) probe(new Cursor(c.bytes((tag - 1).toInt), 0), innerT)
      case _ =>
        val tag = c.uvarint(); if (tag != 0) c.pos += (tag - 1).toInt
    }
    def probeElems(c: Cursor, ts: Seq[ZT]): Unit = {
      val tag = c.uvarint()
      if (tag != 0) {
        val inner = new Cursor(c.bytes((tag - 1).toInt), 0)
        while (!inner.done) ts.foreach(t => probe(inner, t))
      }
    }
    def isRecT(t: ZT): Boolean = t match {
      case ZNamed(_, inner) => isRecT(inner)
      case _: ZRecord => true
      case _ => false
    }
    foreachValue(bytes) { (t, c) =>
      val base = textMemo.getOrElseUpdate(t, ZType.fullText(zTypeOf(t)))
      // a top-level NULL record value (tag byte 0) registers under the
      // null(<rec>) wrapped shape, matching recordify on the decode pass
      val text =
        if (isRecT(t) && c.pos < c.buf.length && c.buf(c.pos) == 0) ZType.nullWrap(base)
        else base
      if (!seen.contains(text)) seen(text) = i
      probe(c, t)
      i += 1
    }
    (seen.toSeq, i - startIdx, ns)
  }

  /** Build a direct wire→Spark-external decoder for one field: reads the
    * tag and body off the cursor, returns the external value for `target`
    * (the same result toExternal(decodeZValue(…)) produces). None when the
    * type needs the general value-model path (unions, errors, maps, sets —
    * set normalization reorders elements — uint64, decimals).
    */
  private def directFieldDecoder(t: ZT, target: DataType, nsTime: Boolean)
      : Option[Cursor => Any] = t match {
    case ZNamed(_, inner) => directFieldDecoder(inner, target, nsTime) // no own tag
    case ZPrim(id) => id match {
      case 0 | 1 | 2 => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null else java.lang.Long.valueOf(unsignedOf(c.bytes((tag - 1).toInt)))
      }
      case 6 | 7 | 8 | 9 | ID_DURATION => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null else java.lang.Long.valueOf(signedOf(c.bytes((tag - 1).toInt)))
      }
      case ID_TIME => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null
        else {
          val ns = signedOf(c.bytes((tag - 1).toInt))
          if (nsTime) java.lang.Long.valueOf(ns)
          else {
            val ts = new java.sql.Timestamp(Math.floorDiv(ns, 1000000L))
            ts.setNanos(Math.floorMod(ns, 1000000000L).toInt)
            ts
          }
        }
      }
      case 14 => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null
        else java.lang.Double.valueOf(halfToDouble(unsignedOf(c.bytes((tag - 1).toInt)).toInt))
      }
      case ID_FLOAT32 => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null
        else java.lang.Double.valueOf(
          java.lang.Float.intBitsToFloat(unsignedOf(c.bytes((tag - 1).toInt)).toInt).toDouble)
      }
      case ID_FLOAT64 => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null
        else java.lang.Double.valueOf(
          java.lang.Double.longBitsToDouble(unsignedOf(c.bytes((tag - 1).toInt))))
      }
      case ID_BOOL => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null
        else { val b = c.bytes((tag - 1).toInt); java.lang.Boolean.valueOf(b.nonEmpty && b(0) == 1) }
      }
      case ID_STRING => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null else new String(c.bytes((tag - 1).toInt), "UTF-8")
      }
      case ID_BYTES => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null else c.bytes((tag - 1).toInt)
      }
      case ID_IP => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null else ipText(c.bytes((tag - 1).toInt))
      }
      case ID_NET => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) null
        else {
          val b = c.bytes((tag - 1).toInt)
          val addr = java.util.Arrays.copyOfRange(b, 0, b.length / 2)
          val mask = java.util.Arrays.copyOfRange(b, b.length / 2, b.length)
          ipText(addr) + "/" + leadingOnes(mask)
        }
      }
      case ID_NULL => Some { c =>
        val tag = c.uvarint(); if (tag != 0) c.pos += (tag - 1).toInt; null
      }
      case _ => None // uint64 (Decimal carrier), type values, decimals
    }
    case ZRecord(fields) => target match {
      case st: StructType if st.fields.length == fields.length &&
          st.fields.iterator.map(_.name).sameElements(fields.iterator.map(_._1)) =>
        val subs = fields.zip(st.fields.toIndexedSeq)
          .map { case ((_, ft), sf) => directFieldDecoder(ft, sf.dataType, nsTime) }
        if (subs.exists(_.isEmpty)) None
        else {
          val ds = subs.map(_.get).toArray
          Some { c =>
            val tag = c.uvarint()
            if (tag == 0) null
            else {
              val inner = new Cursor(c.buf, c.pos)
              val end = c.pos + (tag - 1).toInt
              c.pos = end
              val arr = new Array[Any](ds.length)
              var i = 0
              while (i < ds.length) { arr(i) = ds(i)(inner); i += 1 }
              Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
            }
          }
        }
      case _ => None
    }
    case ZArray(e) => target match {
      case ArrayType(et, _) => directFieldDecoder(e, et, nsTime).map { d => c =>
        val tag = c.uvarint()
        if (tag == 0) null
        else {
          val n = (tag - 1).toInt
          val inner = new Cursor(c.bytes(n), 0)
          val b = Vector.newBuilder[Any]
          while (!inner.done) b += d(inner)
          b.result()
        }
      }
      case _ => None
    }
    case ZEnum(symbols) => Some { c =>
      val tag = c.uvarint()
      if (tag == 0) null else symbols(unsignedOf(c.bytes((tag - 1).toInt)).toInt)
    }
    case _ => None // sets (normalization reorders), maps, unions, errors
  }

  /** Top-level decoder for a single-shape stream: a record value straight
    * to the tagged external Row, matching rowOf(decodeZValue(…)) exactly.
    */
  private def directTopDecoder(t: ZT, cleaned: StructType, shapeText: String,
      nsTime: Boolean): Option[Cursor => Row] = {
    if (ZType.fullText(zTypeOf(t)) != shapeText) return None
    def stripNamed(x: ZT): ZT = x match { case ZNamed(_, i) => stripNamed(i); case o => o }
    stripNamed(t) match {
      case rec: ZRecord if rec.fields.nonEmpty =>
        directFieldDecoder(rec, StructType(cleaned.fields), nsTime).map { d => c =>
          d(c) match {
            case r: Row => Row.fromSeq(r.toSeq :+ shapeText)
            case _ => // null record value → all-null row (general-path parity)
              Row.fromSeq(Vector.fill[Any](cleaned.fields.length)(null) :+ shapeText)
          }
        }
      case _ => None
    }
  }

  /** Decode a stream to tagged external Rows for a single-shape frame —
    * the vectorized pass-2: no ZValue tree for eligible types; per-TYPE
    * granular fallback through the value model otherwise.
    */
  private[sources] def decodeToRows(bytes: Array[Byte], shapeText: String,
      cleaned: StructType, nsTime: Boolean): Iterator[Row] = new Iterator[Row] {
    private val c = new Cursor(bytes, 0)
    private var types = scala.collection.mutable.ArrayBuffer.empty[ZT]
    private var queue: Iterator[Row] = Iterator.empty
    private val memo = scala.collection.mutable.HashMap.empty[ZT, Option[Cursor => Row]]
    private def typeOfId(id: Int): ZT = if (id < 30) ZPrim(id) else types(id - 30)
    // id-indexed front cache over `memo` (tree hashing per row otherwise);
    // ids append-only within a stream, cleared with `types` at EOS
    private var decodersById = new Array[Option[Cursor => Row]](64)
    private def decoderOfId(id: Int): (ZT, Option[Cursor => Row]) = {
      if (id >= decodersById.length)
        decodersById = java.util.Arrays.copyOf(decodersById, math.max(id + 1, decodersById.length << 1))
      val t = typeOfId(id)
      var d = decodersById(id)
      if (d == null) {
        d = memo.getOrElseUpdate(t, directTopDecoder(t, cleaned, shapeText, nsTime))
        decodersById(id) = d
      }
      (t, d)
    }
    private def fill(): Unit = {
      while (!queue.hasNext && !c.done) {
        val code = c.u8()
        if (code == 0xff) {
          types = scala.collection.mutable.ArrayBuffer.empty[ZT]
          decodersById = new Array[Option[Cursor => Row]](64)
        }
        else readFrame(c, code) match {
          case (0, payload) => parseTypedefs(payload, types)
          case (1, payload) =>
            val vc = new Cursor(payload, 0)
            val out = Vector.newBuilder[Row]
            while (!vc.done) {
              val tid = vc.uvarint().toInt
              decoderOfId(tid) match {
                case (_, Some(d)) => out += d(vc)
                case (t, None) =>
                  out += ZsonReader.rowOf(decodeZValue(vc, t, unionKeepsMember = false),
                    cleaned, tag = true)
              }
            }
            queue = out.result().iterator
          case (2, _) => // control frame: skip
          case _ =>
            throw new IllegalArgumentException("zng: unexpected frame type 3 inside stream")
        }
      }
    }
    def hasNext: Boolean = { if (!queue.hasNext) fill(); queue.hasNext }
    def next(): Row = { if (!hasNext) throw new NoSuchElementException; queue.next() }
  }

  // ---- InternalRow-native decoding (the DSv2 scan path) ---------------------

  /** External→Catalyst-internal converter for the value-model fallback
    * leaves (maps, sets, variants, type values): mirrors what Spark's own
    * Row→InternalRow conversion does over the frame's types.
    */
  private[sources] def extToInternal(dt: DataType): Any => Any = dt match {
    case StringType => v => UTF8String.fromString(v.toString)
    case TimestampType => { v =>
      val inst = v.asInstanceOf[java.sql.Timestamp].toInstant
      java.lang.Long.valueOf(Math.addExact(
        Math.multiplyExact(inst.getEpochSecond, 1000000L), (inst.getNano / 1000).toLong))
    }
    case DateType => v =>
      java.lang.Integer.valueOf(v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
    case d: DecimalType => v => Decimal(v.asInstanceOf[java.math.BigDecimal])
    case st: StructType =>
      val subs = st.fields.map(f => extToInternal(f.dataType))
      v => {
        val r = v.asInstanceOf[Row]
        val arr = new Array[Any](subs.length)
        var i = 0
        while (i < subs.length) {
          val x = r.get(i)
          arr(i) = if (x == null) null else subs(i)(x)
          i += 1
        }
        new GenericInternalRow(arr)
      }
    case ArrayType(et, _) =>
      val sub = extToInternal(et)
      v => new GenericArrayData(v.asInstanceOf[scala.collection.Seq[Any]].iterator
        .map(x => if (x == null) null else sub(x)).toArray)
    case MapType(kt, vt, _) =>
      val ks = extToInternal(kt); val vs = extToInternal(vt)
      v => {
        val es = v.asInstanceOf[scala.collection.Map[Any, Any]].toSeq
        new ArrayBasedMapData(
          new GenericArrayData(es.map(e => ks(e._1)).toArray),
          new GenericArrayData(es.map(e => if (e._2 == null) null else vs(e._2)).toArray))
      }
    // narrow numerics: the value tree carries Longs/Doubles — convert to
    // the slot's exact width (GenericInternalRow.getInt casts, not coerces)
    case IntegerType => {
      case n: java.lang.Number => java.lang.Integer.valueOf(n.intValue)
      case v => v
    }
    case ShortType => {
      case n: java.lang.Number => java.lang.Short.valueOf(n.shortValue)
      case v => v
    }
    case ByteType => {
      case n: java.lang.Number => java.lang.Byte.valueOf(n.byteValue)
      case v => v
    }
    case FloatType => {
      case n: java.lang.Number => java.lang.Float.valueOf(n.floatValue)
      case v => v
    }
    case _ => identity // Long, Double, Boolean, Array[Byte] ride unchanged
  }

  /** Wire→internal decoder for one field — the DSv2 twin of
    * directFieldDecoder, total over all types: exotic leaves (sets, maps,
    * unions/errors, type values, decimals) route through the value model
    * inline and convert, everything else decodes straight off the cursor.
    */
  private def internalFieldDecoder(t0: ZT, target: DataType, nsTime: Boolean): Cursor => Any = {
    def fallback: Cursor => Any = {
      val conv = extToInternal(target)
      c => {
        val ext = ZValue.toExternal(decodeZValue(c, t0, unionKeepsMember = false), target)
        if (ext == null) null else conv(ext)
      }
    }
    t0 match {
      case ZNamed(_, inner) => internalFieldDecoder(inner, target, nsTime) // no own tag
      case ZPrim(id) => (id, target) match {
        case (0 | 1 | 2, LongType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null else java.lang.Long.valueOf(c.unsignedAt((tag - 1).toInt))
        }
        case (6 | 7 | 8 | 9 | ID_DURATION, LongType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null else java.lang.Long.valueOf(c.signedAt((tag - 1).toInt))
        }
        // guarded on target: under heterogeneous streams a cross-shape
        // type conflict forces the merged column to a variant StructType,
        // where a raw boxed Long would corrupt the InternalRow slot —
        // those route through the variant-boxing fallback below
        case (ID_TIME, LongType | TimestampType | TimestampNTZType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null
          else {
            val ns = c.signedAt((tag - 1).toInt)
            java.lang.Long.valueOf(if (nsTime) ns else Math.floorDiv(ns, 1000L))
          }
        }
        case (14, DoubleType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null
          else java.lang.Double.valueOf(halfToDouble(c.unsignedAt((tag - 1).toInt).toInt))
        }
        case (ID_FLOAT32, DoubleType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null
          else java.lang.Double.valueOf(
            java.lang.Float.intBitsToFloat(c.unsignedAt((tag - 1).toInt).toInt).toDouble)
        }
        case (ID_FLOAT64, DoubleType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null
          else java.lang.Double.valueOf(
            java.lang.Double.longBitsToDouble(c.unsignedAt((tag - 1).toInt)))
        }
        case (ID_BOOL, BooleanType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null
          else {
            val n = (tag - 1).toInt
            val b = n > 0 && c.buf(c.pos) == 1
            c.pos += n
            java.lang.Boolean.valueOf(b)
          }
        }
        case (ID_STRING, StringType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null
          else {
            // zero-copy: wraps the frame payload (never mutated)
            val n = (tag - 1).toInt
            val s = UTF8String.fromBytes(c.buf, c.pos, n)
            c.pos += n
            s
          }
        }
        case (ID_BYTES, BinaryType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null else c.bytes((tag - 1).toInt)
        }
        case (ID_IP, StringType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null else UTF8String.fromString(ipText(c.bytes((tag - 1).toInt)))
        }
        case (ID_NET, StringType) => c => {
          val tag = c.uvarint()
          if (tag == 0) null
          else {
            val b = c.bytes((tag - 1).toInt)
            val addr = java.util.Arrays.copyOfRange(b, 0, b.length / 2)
            val mask = java.util.Arrays.copyOfRange(b, b.length / 2, b.length)
            UTF8String.fromString(ipText(addr) + "/" + leadingOnes(mask))
          }
        }
        case (3, _: DecimalType) => c => { // uint64 full-range carrier
          val tag = c.uvarint()
          if (tag == 0) null
          else {
            val b = c.bytes((tag - 1).toInt)
            var x = BigInt(0)
            for (i <- b.indices.reverse) x = (x << 8) | (b(i) & 0xff)
            Decimal(scala.math.BigDecimal(x), 20, 0)
          }
        }
        case (ID_NULL, _) => c => {
          val tag = c.uvarint(); if (tag != 0) c.pos += (tag - 1).toInt; null
        }
        case _ => fallback
      }
      case ZRecord(fields) => target match {
        case st: StructType if st.fields.length == fields.length &&
            st.fields.iterator.map(_.name).sameElements(fields.iterator.map(_._1)) =>
          val ds = fields.zip(st.fields.toIndexedSeq)
            .map { case ((_, ft), sf) => internalFieldDecoder(ft, sf.dataType, nsTime) }.toArray
          c => {
            val tag = c.uvarint()
            if (tag == 0) null
            else {
              val inner = new Cursor(c.buf, c.pos)
              c.pos += (tag - 1).toInt
              val arr = new Array[Any](ds.length)
              var i = 0
              while (i < ds.length) { arr(i) = ds(i)(inner); i += 1 }
              new GenericInternalRow(arr)
            }
          }
        case _ => fallback // variant-boxed record column
      }
      case ZArray(e) => target match {
        case ArrayType(et, _) =>
          val d = internalFieldDecoder(e, et, nsTime)
          c => {
            val tag = c.uvarint()
            if (tag == 0) null
            else {
              val inner = new Cursor(c.bytes((tag - 1).toInt), 0)
              val b = scala.collection.mutable.ArrayBuffer.empty[Any]
              while (!inner.done) b += d(inner)
              new GenericArrayData(b.toArray)
            }
          }
        case _ => fallback
      }
      case ZEnum(symbols) if target == StringType =>
        val syms = symbols.map(UTF8String.fromString).toArray
        c => {
          val tag = c.uvarint()
          if (tag == 0) null else syms(unsignedOf(c.bytes((tag - 1).toInt)).toInt)
        }
      case _ => fallback // sets (normalization reorders), maps, unions, errors,
                         // and any leaf whose target is a conflict variant
    }
  }

  /** Decode a stream to internal rows of `required` (a pruned subset of
    * the cleaned-plus-tag frame) — the DSv2 scan body. Fields outside
    * `required` are skipped via their length tags; when no record field is
    * required at all (count(*), tag-only reads) whole value bodies are
    * skipped, making the scan I/O plus tag arithmetic like pass 1.
    */
  /** Per-partition frame prefilter counters — surfaced as DSv2 custom
    * metrics (Spark UI) and summed JVM-wide for local-mode assertions.
    */
  final class FrameStats {
    @volatile var skipped: Long = 0L
    @volatile var read: Long = 0L
  }
  val totalFramesSkipped = new java.util.concurrent.atomic.LongAdder
  val totalFramesRead = new java.util.concurrent.atomic.LongAdder

  private[sources] def decodeToInternalRows(bytes: Array[Byte],
      cleaned: StructType, required: StructType, nsTime: Boolean,
      prefilter: Option[BufferFilter] = None,
      stats: FrameStats = new FrameStats): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val c = new Cursor(bytes, 0)
      private var types = scala.collection.mutable.ArrayBuffer.empty[ZT]
      private var queue: Iterator[InternalRow] = Iterator.empty
      private val memo = scala.collection.mutable.HashMap.empty[ZT, Cursor => InternalRow]
      private val width = required.fields.length
      private val tagIdx = required.fieldNames.indexOf(graft.operators.Het.typeTag)
      private def typeOfId(id: Int): ZT = if (id < 30) ZPrim(id) else types(id - 30)
      // id-indexed front cache over `memo` (tree hashing per row otherwise);
      // ids append-only within a stream, cleared with `types` at EOS
      private var buildersById = new Array[Cursor => InternalRow](64)
      private def builderOfId(id: Int): Cursor => InternalRow = {
        if (id >= buildersById.length)
          buildersById = java.util.Arrays.copyOf(buildersById, math.max(id + 1, buildersById.length << 1))
        var b = buildersById(id)
        if (b == null) {
          val t = typeOfId(id)
          b = memo.getOrElseUpdate(t, builderOf(t))
          buildersById(id) = b
        }
        b
      }

      private def builderOf(t: ZT): Cursor => InternalRow = {
        def stripNamed(x: ZT): ZT = x match { case ZNamed(_, i) => stripNamed(i); case o => o }
        // direct per-shape builder: fields project BY NAME into the merged
        // frame (unshared fields stay null, conflict columns variant-box
        // through the per-field fallback), so every record shape of a
        // heterogeneous stream decodes wire→InternalRow with no value tree
        val shapeText = ZType.fullText(zTypeOf(t))
        val tagVal = UTF8String.fromString(shapeText)
        // a top-level null record is all-null relationally but its tag
        // must carry the null wrapper (writers re-emit `null`)
        val nullTagVal = UTF8String.fromString(ZType.nullWrap(shapeText))
        val direct: Option[Cursor => InternalRow] =
          stripNamed(t) match {
            case ZRecord(fields) if fields.nonEmpty &&
                fields.forall { case (n, _) => cleaned.fieldNames.contains(n) } =>
              val reqCount = fields.count(f => required.fieldNames.contains(f._1))
              val acts: Array[(Cursor, Array[Any]) => Unit] =
                fields.map { case (name, ft) =>
                  val out = required.fieldNames.indexOf(name)
                  if (out < 0) { (cc: Cursor, _: Array[Any]) =>
                    val tag = cc.uvarint(); if (tag != 0) cc.pos += (tag - 1).toInt
                  } else {
                    val d = internalFieldDecoder(ft, required.fields(out).dataType, nsTime)
                    (cc: Cursor, arr: Array[Any]) => arr(out) = d(cc)
                  }
                }.toArray
              Some { cc =>
                val arr = new Array[Any](width)
                val tag = cc.uvarint()
                if (tagIdx >= 0) arr(tagIdx) = if (tag == 0) nullTagVal else tagVal
                if (tag != 0) {
                  if (reqCount == 0) cc.pos += (tag - 1).toInt
                  else {
                    val inner = new Cursor(cc.buf, cc.pos)
                    cc.pos += (tag - 1).toInt
                    var i = 0
                    while (i < acts.length) { acts(i)(inner, arr); i += 1 }
                  }
                }
                new GenericInternalRow(arr)
              }
            case _ => None
          }
        direct.getOrElse {
          // general path: external row over cleaned+tag, convert the
          // required slots (engages only off the single-shape happy path,
          // e.g. all-null record streams)
          val srcIdx = required.fields.map { f =>
            if (f.name == graft.operators.Het.typeTag) cleaned.fields.length
            else cleaned.fieldIndex(f.name)
          }
          val convs = required.fields.map(f => extToInternal(f.dataType))
          cc => {
            val r = ZsonReader.rowOf(decodeZValue(cc, t, unionKeepsMember = false),
              cleaned, tag = true)
            val arr = new Array[Any](width)
            var i = 0
            while (i < width) {
              val x = r.get(srcIdx(i))
              arr(i) = if (x == null) null else convs(i)(x)
              i += 1
            }
            new GenericInternalRow(arr)
          }
        }
      }

      // memoized id → top-level field-name set for the field-NAME frame
      // finder (BfFieldName); reset with the type context at EOS
      private var fieldMemo = new java.util.HashMap[Int, java.util.Set[String]]()
      private def fieldsOf(id: Int): java.util.Set[String] = {
        val hit = fieldMemo.get(id)
        if (hit != null) return if (hit.isEmpty) null else hit
        val fs: java.util.Set[String] =
          try (typeOfId(id) match {
            case x => {
              def sn(t: ZT): ZT = t match { case ZNamed(_, i) => sn(i); case o => o }
              sn(x)
            }
          }) match {
            case ZRecord(fields) =>
              val set = new java.util.HashSet[String]()
              fields.foreach(f => set.add(f._1): Unit)
              set
            case _ => java.util.Collections.emptySet[String]()
          } catch { case _: Exception => java.util.Collections.emptySet[String]() }
        fieldMemo.put(id, fs)
        if (fs.isEmpty) null else fs
      }

      // stream-level field pruning: when NO type defined so far in this
      // stream carries every required field, values frames drop before
      // LZ4 decompression (typedefs always precede use, so this is sound)
      private val requiredNames: Set[String] =
        prefilter.map(BufferFilter.requiredNamesIn).getOrElse(Set.empty)
      private var fieldCheckLen = -1
      private var streamCanMatch = true
      private def streamHasFields(): Boolean = {
        if (requiredNames.isEmpty) return true
        if (types.length != fieldCheckLen) {
          fieldCheckLen = types.length
          def sn(t: ZT): ZT = t match { case ZNamed(_, i) => sn(i); case o => o }
          streamCanMatch = types.exists(t => sn(t) match {
            case ZRecord(fields) =>
              val names = fields.map(_._1).toSet
              requiredNames.forall(names.contains)
            case _ => false
          })
        }
        streamCanMatch
      }

      private def fill(): Unit = {
        while (!queue.hasNext && !c.done) {
          val code = c.u8()
          if (code == 0xff) {
            types = scala.collection.mutable.ArrayBuffer.empty[ZT]
            buildersById = new Array[Cursor => InternalRow](64)
            fieldMemo = new java.util.HashMap[Int, java.util.Set[String]]()
            fieldCheckLen = -1
          }
          else readFrameRaw(c, code) match {
            case (1, raw, comp) if !streamHasFields() =>
              // drop the whole values frame WITHOUT decompressing
              stats.skipped += 1; totalFramesSkipped.increment()
            case (t0, raw, comp) => (t0, inflateFrame(raw, comp)) match {
            case (0, payload) =>
              parseTypedefs(payload, types)
              fieldMemo = new java.util.HashMap[Int, java.util.Set[String]]()
            case (1, payload) =>
              // BufferFilter prefilter (ref bufferfilter.go +
              // fieldnamefinder.go): when the pushed predicate's literal
              // can't appear in this frame's bytes, OR no type in the
              // frame has the required fields, skip the whole decode
              if (prefilter.exists(!_.matchesTyped(payload, payload.length, fieldsOf))) {
                stats.skipped += 1; totalFramesSkipped.increment()
              } else {
                stats.read += 1; totalFramesRead.increment()
                val vc = new Cursor(payload, 0)
                val out = Vector.newBuilder[InternalRow]
                while (!vc.done) {
                  out += builderOfId(vc.uvarint().toInt)(vc)
                }
                queue = out.result().iterator
              }
            case (2, _) => // control frame: skip
            case _ =>
              throw new IllegalArgumentException("zng: unexpected frame type 3 inside stream")
            }
          }
        }
      }
      def hasNext: Boolean = { if (!queue.hasNext) fill(); queue.hasNext }
      def next(): InternalRow = { if (!hasNext) throw new NoSuchElementException; queue.next() }
    }

  // ---- vectorized (ColumnarBatch) decoding ----------------------------------

  /** Can a field of zed type `t` fill a column vector of `target`
    * directly? (The plan-time eligibility gate for the vectorized scan —
    * must stay in sync with vecAppender.)
    */
  private[sources] def vecSupported(t: graft.sources.ZType, target: DataType): Boolean =
    ZType.strip(t) match {
      case ZType.Prim("uint8") | ZType.Prim("uint16") | ZType.Prim("uint32") |
           ZType.Prim("int8") | ZType.Prim("int16") | ZType.Prim("int32") |
           ZType.Prim("int64") | ZType.Prim("duration") => target == LongType
      case ZType.Prim("time") => target == LongType || target == TimestampType
      case ZType.Prim("float16") | ZType.Prim("float32") | ZType.Prim("float64") =>
        target == DoubleType
      case ZType.Prim("bool") => target == BooleanType
      case ZType.Prim("string") | ZType.Prim("ip") | ZType.Prim("net") =>
        target == StringType
      case ZType.Prim("bytes") => target == BinaryType
      case ZType.Prim("null") => true
      case ZType.EnumT(_) => target == StringType
      // arrays of vectorizable elements (zeek vector columns); SETS keep
      // the row path — their decode normalizes element order
      case ZType.Arr(e) => target match {
        case ArrayType(et, _) => vecSupported(e, et)
        case _ => false
      }
      // nested records fill struct child vectors (zeek's id record);
      // field order is positional on the wire, so names must line up
      case ZType.Rec(fs) => target match {
        case st: StructType => fs.nonEmpty && fs.length == st.fields.length &&
          fs.zip(st.fields.toIndexedSeq).forall { case ((n, ft), sf) =>
            n == sf.name && vecSupported(ft, sf.dataType)
          }
        case _ => false
      }
      case _ => false
    }

  private type WVec = org.apache.spark.sql.execution.vectorized.WritableColumnVector

  /** Null append that respects the vector's type: struct vectors must use
    * appendStruct(true) so child vectors stay aligned — plain appendNull
    * asserts against StructType and, with assertions off, silently skews
    * every subsequent nested value (mirrors VngIO.appendNullFor).
    */
  private def appendNullFor(v: WVec, target: DataType): Unit = target match {
    case _: StructType => v.appendStruct(true): Unit
    case _ => v.appendNull(): Unit
  }

  /** Wire→column-vector appender for one primitive field: reads the tag
    * and body off the cursor and appends ONE slot to `vec` — no boxing,
    * no row object. None when the type needs the row path.
    */
  private def vecAppender(t0: ZT, target: DataType, vec: WVec,
      nsTime: Boolean): Option[Cursor => Unit] = t0 match {
    case ZNamed(_, inner) => vecAppender(inner, target, vec, nsTime)
    case ZEnum(symbols) if target == StringType =>
      val syms = symbols.map(_.getBytes("UTF-8")).toArray
      Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else {
          val s = syms(unsignedOf(c.bytes((tag - 1).toInt)).toInt)
          vec.appendByteArray(s, 0, s.length); ()
        }
      }
    case ZPrim(id) => (id, target) match {
      case (0 | 1 | 2, LongType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else { vec.appendLong(c.unsignedAt((tag - 1).toInt)); () }
      }
      case (6 | 7 | 8 | 9 | ID_DURATION, LongType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else { vec.appendLong(c.signedAt((tag - 1).toInt)); () }
      }
      case (ID_TIME, LongType | TimestampType | TimestampNTZType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else {
          val ns = c.signedAt((tag - 1).toInt)
          vec.appendLong(if (nsTime) ns else Math.floorDiv(ns, 1000L)); ()
        }
      }
      case (14, DoubleType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else { vec.appendDouble(halfToDouble(c.unsignedAt((tag - 1).toInt).toInt)); () }
      }
      case (ID_FLOAT32, DoubleType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else { vec.appendDouble(
          java.lang.Float.intBitsToFloat(c.unsignedAt((tag - 1).toInt).toInt).toDouble); () }
      }
      case (ID_FLOAT64, DoubleType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else { vec.appendDouble(
          java.lang.Double.longBitsToDouble(c.unsignedAt((tag - 1).toInt))); () }
      }
      case (ID_BOOL, BooleanType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else {
          val n = (tag - 1).toInt
          val b = n > 0 && c.buf(c.pos) == 1
          c.pos += n
          vec.appendBoolean(b); ()
        }
      }
      case (ID_STRING, StringType) | (ID_BYTES, BinaryType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else {
          val n = (tag - 1).toInt
          vec.appendByteArray(c.buf, c.pos, n)
          c.pos += n; ()
        }
      }
      case (ID_IP, StringType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else {
          val s = ipText(c.bytes((tag - 1).toInt)).getBytes("UTF-8")
          vec.appendByteArray(s, 0, s.length); ()
        }
      }
      case (ID_NET, StringType) => Some { c =>
        val tag = c.uvarint()
        if (tag == 0) { vec.appendNull(); () }
        else {
          val b = c.bytes((tag - 1).toInt)
          val addr = java.util.Arrays.copyOfRange(b, 0, b.length / 2)
          val mask = java.util.Arrays.copyOfRange(b, b.length / 2, b.length)
          val s = (ipText(addr) + "/" + leadingOnes(mask)).getBytes("UTF-8")
          vec.appendByteArray(s, 0, s.length); ()
        }
      }
      case (ID_NULL, _) => Some { c =>
        val tag = c.uvarint()
        if (tag != 0) c.pos += (tag - 1).toInt
        appendNullFor(vec, target)
      }
      case _ => None
    }
    case ZArray(e) => target match {
      case ArrayType(et, _) =>
        // elements fill the child vector; the wire carries no length, so
        // a tag-skip pre-pass counts elements for appendArray's offsets
        vecAppender(e, et, vec.arrayData(), nsTime).map { elemApp => (c: Cursor) =>
          val tag = c.uvarint()
          if (tag == 0) { vec.appendNull(); () }
          else {
            val body = new Cursor(c.bytes((tag - 1).toInt), 0)
            val probe = new Cursor(body.buf, 0)
            var n = 0
            while (!probe.done) {
              val t2 = probe.uvarint()
              if (t2 != 0) probe.pos += (t2 - 1).toInt
              n += 1
            }
            vec.appendArray(n): Unit
            var i = 0
            while (i < n) { elemApp(body); i += 1 }
          }
        }
      case _ => None
    }
    case ZRecord(fields) => target match {
      case st: StructType if fields.length == st.fields.length &&
          fields.iterator.map(_._1).sameElements(st.fields.iterator.map(_.name)) =>
        val subs = fields.zip(st.fields.toIndexedSeq).zipWithIndex.map {
          case (((_, ft), sf), i) => vecAppender(ft, sf.dataType, vec.getChild(i), nsTime)
        }
        if (subs.exists(_.isEmpty)) None
        else {
          val apps = subs.map(_.get).toArray
          Some { c =>
            val tag = c.uvarint()
            if (tag == 0) { vec.appendStruct(true); () }
            else {
              val inner = new Cursor(c.buf, c.pos)
              c.pos += (tag - 1).toInt
              vec.appendStruct(false): Unit
              var i = 0
              while (i < apps.length) { apps(i)(inner); i += 1 }
            }
          }
        }
      case _ => None
    }
    case _ => None
  }

  /** Decode a stream straight into ColumnarBatches — the vectorized twin
    * of decodeToInternalRows, used when every projected column is a
    * primitive in every shape. Each record shape gets a per-type appender
    * filling the column vectors (missing fields append null, the tag
    * column appends the shape's constant bytes); batches span frames.
    */
  private[sources] def decodeToColumnarBatches(bytes: Array[Byte],
      cleaned: StructType, required: StructType, nsTime: Boolean,
      prefilter: Option[BufferFilter], stats: FrameStats, batchSize: Int = 4096)
      : (Iterator[org.apache.spark.sql.vectorized.ColumnarBatch], () => Unit) = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    val vectors = required.fields.map(f => new OnHeapColumnVector(batchSize, f.dataType))
    val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
      vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector])
    val tagIdx = required.fieldNames.indexOf(graft.operators.Het.typeTag)
    val dataIdxs = required.fields.indices.filter(_ != tagIdx).toArray

    val it = new Iterator[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private val c = new Cursor(bytes, 0)
      private var types = scala.collection.mutable.ArrayBuffer.empty[ZT]
      private var frame: Cursor = null // current values frame (null = need next)
      private val memo = scala.collection.mutable.HashMap.empty[ZT, Cursor => Unit]
      private def typeOfId(id: Int): ZT = if (id < 30) ZPrim(id) else types(id - 30)
      // id-indexed front cache over `memo`: the tree-keyed lookup hashed
      // the whole ZT per ROW. Ids are dense ints, append-only within a
      // stream; cleared with `types` on the 0xff stream reset.
      private var appsById = new Array[Cursor => Unit](64)
      private def appenderOfId(id: Int): Cursor => Unit = {
        if (id >= appsById.length)
          appsById = java.util.Arrays.copyOf(appsById, math.max(id + 1, appsById.length << 1))
        var app = appsById(id)
        if (app == null) {
          val t = typeOfId(id)
          app = memo.getOrElseUpdate(t, appenderOf(t))
          appsById(id) = app
        }
        app
      }

      private def appenderOf(t: ZT): Cursor => Unit = {
        def stripNamed(x: ZT): ZT = x match { case ZNamed(_, i) => stripNamed(i); case o => o }
        val shapeText = ZType.fullText(zTypeOf(t))
        val tagVal = shapeText.getBytes("UTF-8")
        val nullTagVal = ZType.nullWrap(shapeText).getBytes("UTF-8")
        stripNamed(t) match {
          case ZRecord(fields) if fields.nonEmpty &&
              fields.forall { case (n, _) => cleaned.fieldNames.contains(n) } =>
            val acts: Array[Cursor => Unit] = fields.map { case (name, ft) =>
              val out = required.fieldNames.indexOf(name)
              if (out < 0) { (cc: Cursor) =>
                val tag = cc.uvarint(); if (tag != 0) cc.pos += (tag - 1).toInt
              } else vecAppender(ft, required.fields(out).dataType, vectors(out), nsTime)
                .getOrElse(throw new IllegalStateException(
                  s"zng vectorized scan on non-primitive field $name"))
            }.toArray
            val covered = fields.map(_._1).toSet
            val absent = dataIdxs.filter(i => !covered.contains(required.fields(i).name))
            cc => {
              val tag = cc.uvarint()
              if (tagIdx >= 0) {
                val tv = if (tag == 0) nullTagVal else tagVal
                vectors(tagIdx).appendByteArray(tv, 0, tv.length): Unit
              }
              if (tag == 0) {
                var i = 0
                while (i < dataIdxs.length) {
                  val d = dataIdxs(i)
                  appendNullFor(vectors(d), required.fields(d).dataType); i += 1
                }
              } else {
                val inner = new Cursor(cc.buf, cc.pos)
                cc.pos += (tag - 1).toInt
                var i = 0
                while (i < acts.length) { acts(i)(inner); i += 1 }
                i = 0
                while (i < absent.length) {
                  val a = absent(i)
                  appendNullFor(vectors(a), required.fields(a).dataType); i += 1
                }
              }
            }
          case other => throw new IllegalStateException(
            s"zng vectorized scan on non-record shape: ${other.getClass.getSimpleName}")
        }
      }

      private var fieldMemoV = new java.util.HashMap[Int, java.util.Set[String]]()
      private def fieldsOfV(id: Int): java.util.Set[String] = {
        val hit = fieldMemoV.get(id)
        if (hit != null) return if (hit.isEmpty) null else hit
        val fs: java.util.Set[String] =
          try (typeOfId(id) match {
            case x => {
              def sn(t: ZT): ZT = t match { case ZNamed(_, i) => sn(i); case o => o }
              sn(x)
            }
          }) match {
            case ZRecord(fields) =>
              val set = new java.util.HashSet[String]()
              fields.foreach(f => set.add(f._1): Unit)
              set
            case _ => java.util.Collections.emptySet[String]()
          } catch { case _: Exception => java.util.Collections.emptySet[String]() }
        fieldMemoV.put(id, fs)
        if (fs.isEmpty) null else fs
      }

      private val requiredNamesV: Set[String] =
        prefilter.map(BufferFilter.requiredNamesIn).getOrElse(Set.empty)
      private var fieldCheckLenV = -1
      private var streamCanMatchV = true
      private def streamHasFieldsV(): Boolean = {
        if (requiredNamesV.isEmpty) return true
        if (types.length != fieldCheckLenV) {
          fieldCheckLenV = types.length
          def sn(t: ZT): ZT = t match { case ZNamed(_, i) => sn(i); case o => o }
          streamCanMatchV = types.exists(t => sn(t) match {
            case ZRecord(fields) =>
              val names = fields.map(_._1).toSet
              requiredNamesV.forall(names.contains)
            case _ => false
          })
        }
        streamCanMatchV
      }

      private def advanceFrame(): Boolean = {
        while ((frame == null || frame.done) && !c.done) {
          val code = c.u8()
          if (code == 0xff) {
            types = scala.collection.mutable.ArrayBuffer.empty[ZT]
            appsById = new Array[Cursor => Unit](64)
            fieldMemoV = new java.util.HashMap[Int, java.util.Set[String]]()
            fieldCheckLenV = -1
          }
          else readFrameRaw(c, code) match {
            case (1, raw, comp) if !streamHasFieldsV() =>
              stats.skipped += 1; totalFramesSkipped.increment()
            case (t0, raw, comp) => (t0, inflateFrame(raw, comp)) match {
            case (0, payload) =>
              parseTypedefs(payload, types)
              fieldMemoV = new java.util.HashMap[Int, java.util.Set[String]]()
            case (1, payload) =>
              if (prefilter.exists(!_.matchesTyped(payload, payload.length, fieldsOfV))) {
                stats.skipped += 1; totalFramesSkipped.increment()
              } else {
                stats.read += 1; totalFramesRead.increment()
                frame = new Cursor(payload, 0)
              }
            case (2, _) =>
            case _ =>
              throw new IllegalArgumentException("zng: unexpected frame type 3 inside stream")
            }
          }
        }
        frame != null && !frame.done
      }

      def hasNext: Boolean = advanceFrame()

      def next(): org.apache.spark.sql.vectorized.ColumnarBatch = {
        var j = 0
        while (j < vectors.length) { vectors(j).reset(); j += 1 }
        var n = 0
        while (n < batchSize && advanceFrame()) {
          appenderOfId(frame.uvarint().toInt)(frame)
          n += 1
        }
        batch.setNumRows(n)
        batch
      }
    }
    (it, () => batch.close())
  }

  /** Read a ZNG file or directory of part files into a typed DataFrame —
    * per-file typed decode on the executors (streams are self-contained,
    * so files distribute one task each), fused into the same
    * tagged/variant frame the in-memory harness builds. Pass 1 (schema
    * discovery) reads only type frames and value tags via scanMeta; pass 2
    * is the one full decode — straight to Spark rows (no value tree) when
    * the stream is single-shape with directly-decodable types.
    */
  /** Per-file discovery result, cached driver-side keyed by the file's
    * (length, mtime): re-reading a path — interactive sessions, repeated
    * queries over the same objects — skips the pass-1 discovery I/O for
    * unchanged files and scans only new or rewritten ones, like a
    * metastore's file-statistics cache. Without this, every read of
    * 100 TB costs 200 TB of I/O (discovery reads each byte a second
    * time). A rewrite under the same name self-evicts (the key is the
    * path; stale length/mtime mismatches replace the entry).
    */
  private final case class FileMeta(len: Long, mtime: Long,
      shapes: Vector[(String, Long)], count: Long, ns: Boolean,
      streams: Vector[Long], gz: Boolean)
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileMeta]

  /** Byte offsets where an independent stream starts (0, and after each
    * end-of-stream marker with data remaining) — the split points a huge
    * concatenated zng object parallelizes at. Header arithmetic only: no
    * decompression, no type parsing.
    */
  private[sources] def streamOffsets(bytes: Array[Byte]): Vector[Long] = {
    val c = new Cursor(bytes, 0)
    val out = Vector.newBuilder[Long]
    var atStart = true
    while (!c.done) {
      if (atStart) { out += c.pos.toLong; atStart = false }
      val code = c.u8()
      if (code == 0xff) atStart = true
      else {
        val len = ((c.uvarint() << 4) | (code & 0xf).toLong).toInt
        c.pos += len
      }
    }
    out.result()
  }

  /** Structured-Streaming source over a GROWING directory of zng part
    * files ("tail the stream" — the service side of zed's continuous
    * load). The frame schema locks from the files present at start
    * (normal discovery); each new file then decodes executor-side into
    * that frame as it lands (new fields in late shapes would need a
    * restart — the schema is part of the query plan, as with every
    * Structured Streaming file source). Compose with StreamOps
    * (watermarks, windowed `every`, dedup, commit-per-batch load).
    */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val schema = read(spark, path).schema // discovery over current contents
    val cleaned = StructType(schema.fields.filterNot(_.name == graft.operators.Het.typeTag))
    val bin = spark.readStream.format("binaryFile")
      .schema(new StructType()
        .add("path", StringType).add("modificationTime", TimestampType)
        .add("length", LongType).add("content", BinaryType))
      .load(path)
    bin.select("content").as[Array[Byte]]
      .flatMap(bytes => decodeToZValues(Gzip.maybeGunzip(bytes))
        .map(v => ZsonReader.rowOf(v, cleaned, tag = true)))(
        org.apache.spark.sql.Encoders.row(schema))
      .toDF()
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = HadoopFs.dataFiles(spark, path)
    if (dataFiles.isEmpty) // empty directory → empty frame, not a failed load()
      return ZsonReader.fromShapes(spark, spark.sparkContext.emptyRDD[ZValue], Array.empty)
    val statuses = dataFiles.map { p =>
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(p))
      (p, st.getLen, st.getModificationTime)
    }
    val missing = statuses.filter { case (p, len, mt) =>
      Option(metaCache.get(p)).forall(m => m.len != len || m.mtime != mt)
    }
    if (missing.nonEmpty) {
      val conf = HadoopFs.confMap(spark)
      val scanned = spark.sparkContext
        .parallelize(missing, missing.length)
        .map { case (p, len, mt) =>
          val raw = HadoopFs.readAll(conf, p)
          val gz = raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b
          val bytes = Gzip.maybeGunzip(raw)
          checkReadMax(p.substring(p.lastIndexOf('/') + 1), bytes)
          val (shapes, count, fileNs) = scanMeta(bytes, 0L)
          // gzip can't be range-read — such a file stays one split
          val streams = if (gz) Vector(0L) else streamOffsets(bytes)
          (p, FileMeta(len, mt, shapes.toVector, count, fileNs, streams, gz))
        }.collect()
      // bound the cache for long-lived sessions (service): evict only
      // entries outside the current file list — a full clear would drop
      // fresh entries this very call reads back in the merge loop below
      if (metaCache.size > 200000) {
        val keep = statuses.iterator.map(_._1).toSet
        metaCache.keySet.removeIf(k => !keep.contains(k)): Unit
      }
      scanned.foreach { case (p, m) => metaCache.put(p, m) }
    }
    // merge per-file results in file order — exact global
    // first-appearance ordering of shapes across the stream set
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var nsTime = false
    var offset = 0L
    statuses.foreach { case (p, _, _) =>
      val m = metaCache.get(p)
      m.shapes.foreach { case (t, idx) =>
        if (!seen.contains(t)) seen(t) = offset + idx
      }
      nsTime ||= m.ns
      offset += m.count
    }
    val shapeTexts = seen.toArray.sortBy(_._2).map(_._1).toIndexedSeq
    if (shapeTexts.isEmpty) {
      val discovered = (seen.toArray: Array[(String, Long)]) ++
        (if (nsTime) Array(ZsonReader.nsSentinelKey -> Long.MaxValue)
         else Array.empty[(String, Long)])
      val rdd = spark.read.format("binaryFile").load(dataFiles: _*)
        .select("content").as[Array[Byte]].rdd
        .flatMap(bytes => decodeToZValues(Gzip.maybeGunzip(bytes)))
      ZsonReader.fromShapes(spark, rdd, discovered)
    } else {
      // every stream — homogeneous or heterogeneous — scans through the
      // DataSource V2 table: wire→InternalRow decode (no external-Row
      // detour; each record shape gets its own direct builder projecting
      // by name into the merged frame) with column pruning into the
      // decoder (unread fields skip by length tag)
      val (_, full) = ZsonReader.frameSchema(shapeTexts, tag = true, nsTime)
      // group each file's independent streams (EOS boundaries, recorded
      // during discovery) into ~maxPartitionBytes read splits: one huge
      // concatenated zng object parallelizes across executors instead of
      // serializing behind a single task. A chunk always starts at a
      // stream boundary (types reset there); gzip files stay whole.
      val maxPart = {
        val v = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
          .getOrElse((128L << 20).toString)
        try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
        catch { case _: Exception => 128L << 20 }
      }
      val splits = statuses.map { case (p, len, _) =>
        val m = metaCache.get(p)
        if (m.gz) "-1"
        else if (m.streams.length <= 1) "0"
        else {
          val bounds = m.streams :+ len
          val starts = Vector.newBuilder[Long]
          var acc = 0L
          m.streams.zipWithIndex.foreach { case (off, i) =>
            val sz = bounds(i + 1) - off
            if (acc == 0L || acc + sz > maxPart) { starts += off; acc = 0L }
            acc += sz
          }
          starts.result().mkString(";")
        }
      }.mkString("\n")
      spark.read.format(classOf[ZngDataSource].getName)
        .schema(full)
        .option("shapes", shapeTexts.mkString("\n"))
        .option("ns", nsTime.toString)
        .option("files", dataFiles.mkString("\n"))
        .option("splits", splits)
        // per-file row counts from discovery: count(*) answers from these
        // without touching the data again (ZngCountScan), and the scan
        // reports them as statistics so Catalyst sizes joins correctly
        // (small zng dims broadcast instead of defaulting to "huge")
        .option("counts", statuses.map { case (p, _, _) => metaCache.get(p).count }
          .mkString("\n"))
        .option("sizes", statuses.map(_._2).mkString("\n"))
        .load()
    }
  }
}
