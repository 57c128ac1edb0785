package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** VNG columnar format in the REFERENCE's own layout (vng/): a 24-byte
  * header, a metadata section holding ONE ZNG-encoded value — the
  * zson-marshaled encoder metadata tree with simple-style named-type
  * decorators (Record/Array/Set/Map/Union/Primitive/Named/Error/Nulls/
  * Const/Dynamic, vng/metadata.go; zson/marshal.go StyleSimple) — and a
  * data section of per-vector segments.
  *
  * Writer parity (vng/encoder.go tree): every vector wraps in a nulls
  * encoder (run-lengths of alternating value/null runs, values first —
  * nulls.go); records decompose per field; arrays/sets into lengths +
  * values; maps into lengths + keys + values; unions into tags + member
  * vectors; primitives into segments of zcode-tagged values. Segments
  * are LZ4-compressed when that shrinks them, raw otherwise (segment.go
  * compressBuffer); the reader decodes both formats from reference- and
  * self-written files, plus dictionary vectors and Const columns.
  */
object VngIO {

  private val Version = 4

  import ZValue._
  import ZType._

  // ---- metadata model (vng/metadata.go) ------------------------------------

  private final case class Seg(offset: Long, length: Long, memLength: Long, format: Int)
  private sealed trait Meta
  private final case class MRecord(length: Long, fields: Vector[(String, Meta)]) extends Meta
  private final case class MArray(length: Long, lengths: Seg, values: Meta, isSet: Boolean) extends Meta
  private final case class MMap(length: Long, lengths: Seg, keys: Meta, values: Meta) extends Meta
  private final case class MUnion(length: Long, tags: Seg, values: Vector[Meta]) extends Meta
  private final case class MPrim(typ: ZType, loc: Seg, dict: Vector[(ZValue, Long)], count: Long) extends Meta
  private final case class MNamed(name: String, values: Meta) extends Meta
  private final case class MError(values: Meta) extends Meta
  private final case class MNulls(runs: Seg, values: Meta, count: Long) extends Meta
  private final case class MConst(value: ZValue, count: Long) extends Meta
  private final case class MDynamic(tags: Seg, values: Vector[Meta], length: Long) extends Meta

  private def metaType(m: Meta): ZType = m match {
    case MRecord(_, fs) => Rec(fs.map { case (n, f) => n -> metaType(f) })
    case MArray(_, _, v, isSet) => if (isSet) SetT(metaType(v)) else Arr(metaType(v))
    case MMap(_, _, k, v) => MapT(metaType(k), metaType(v))
    case MUnion(_, _, vs) => Union(vs.map(metaType))
    case MPrim(t, _, _, _) => t
    case MNamed(n, v) => Named(n, metaType(v))
    case MError(v) => ErrT(metaType(v))
    case MNulls(_, v, _) => metaType(v)
    case MConst(v, _) => ZValue.typeOf(v)
    case MDynamic(_, _, _) => Prim("null") // no single type
  }

  private def metaLen(m: Meta): Long = m match {
    case MRecord(n, _) => n
    case MArray(n, _, _, _) => n
    case MMap(n, _, _, _) => n
    case MUnion(n, _, _) => n
    case MPrim(_, _, _, n) => n
    case MNamed(_, v) => metaLen(v)
    case MError(v) => metaLen(v)
    case MNulls(_, v, n) => n + metaLen(v)
    case MConst(_, n) => n
    case MDynamic(_, _, n) => n
  }

  // ---- writer (vng/encoder.go tree) -----------------------------------------

  private def isNullV(v: ZValue): Boolean = v match {
    case VNull(_) => true
    case VTyped(i, _) => isNullV(i)
    case _ => false
  }

  private sealed trait Enc {
    def write(v: ZValue): Unit
    /** Allocate segments starting at `off`; append bytes to `data`. */
    def finish(off: Long, data: ByteArrayOutputStream): (Long, Meta)
  }

  private def newEnc(t: ZType): Enc = t match {
    case Named(n, inner) => new NamedEnc(n, newEnc(inner))
    case ErrT(inner) => new ErrorEnc(newEnc(inner))
    case r: Rec => new NullsEnc(new RecordEnc(r))
    case Arr(e) => new NullsEnc(new ArrayEnc(e, isSet = false))
    case SetT(e) => new NullsEnc(new ArrayEnc(e, isSet = true))
    case MapT(k, v) => new NullsEnc(new MapEnc(k, v))
    case u: Union => new NullsEnc(new UnionEnc(u))
    case prim => new NullsEnc(new PrimEnc(prim))
  }

  private final class NamedEnc(name: String, inner: Enc) extends Enc {
    def write(v: ZValue): Unit = inner.write(v)
    def finish(off: Long, data: ByteArrayOutputStream): (Long, Meta) = {
      val (o, m) = inner.finish(off, data); (o, MNamed(name, m))
    }
  }

  private final class ErrorEnc(inner: Enc) extends Enc {
    def write(v: ZValue): Unit = v match {
      case VErr(p) => inner.write(p)
      case VTyped(VErr(p), _) => inner.write(p)
      case other => inner.write(other)
    }
    def finish(off: Long, data: ByteArrayOutputStream): (Long, Meta) = {
      val (o, m) = inner.finish(off, data); (o, MError(m))
    }
  }

  /** Alternating value/null run lengths, VALUES first (nulls.go). */
  private final class NullsEnc(inner: Enc) extends Enc {
    private val runs = new PrimEnc(Prim("int64"))
    private var run = 0L
    private var inNull = false
    private var nulls = 0L
    def write(v: ZValue): Unit =
      if (isNullV(v)) {
        nulls += 1
        if (inNull) run += 1
        else { runs.write(VInt(run, "int64")); run = 1; inNull = true }
      } else {
        if (!inNull) run += 1
        else { runs.write(VInt(run, "int64")); run = 1; inNull = false }
        inner.write(v)
      }
    def finish(off: Long, data: ByteArrayOutputStream): (Long, Meta) = {
      val (o1, values) = inner.finish(off, data)
      if (nulls == 0) (o1, values)
      else {
        if (run > 0) runs.write(VInt(run, "int64"))
        val (o2, runsMeta) = runs.finish(o1, data)
        (o2, MNulls(runsMeta.asInstanceOf[MPrim].loc, values, nulls))
      }
    }
  }

  private final class RecordEnc(t: Rec) extends Enc {
    private val fields = t.fields.map { case (n, ft) => n -> newEnc(ft) }
    private var count = 0L
    def write(v: ZValue): Unit = {
      count += 1
      val fs: Map[String, ZValue] = ZValue.unwrap(v) match {
        case VRec(fv) => fv.toMap
        case _ => Map.empty
      }
      fields.foreach { case (n, e) =>
        e.write(fs.getOrElse(n, VNull(nullT)))
      }
    }
    def finish(off: Long, data: ByteArrayOutputStream): (Long, Meta) = {
      var o = off
      val ms = fields.map { case (n, e) =>
        val (o2, m) = e.finish(o, data); o = o2; n -> m
      }
      (o, MRecord(count, ms))
    }
  }

  private final class ArrayEnc(elemT: ZType, isSet: Boolean) extends Enc {
    private val lengths = new PrimEnc(Prim("int64"))
    private val values = newEnc(elemT)
    private var count = 0L
    def write(v: ZValue): Unit = {
      count += 1
      val items = ZValue.unwrap(v) match {
        case VArr(is, _) => is
        case _ => Vector.empty[ZValue]
      }
      lengths.write(VInt(items.length.toLong, "int64"))
      items.foreach(values.write)
    }
    def finish(off: Long, data: ByteArrayOutputStream): (Long, Meta) = {
      val (o1, lm) = lengths.finish(off, data)
      val (o2, vm) = values.finish(o1, data)
      (o2, MArray(count, lm.asInstanceOf[MPrim].loc, vm, isSet))
    }
  }

  private final class MapEnc(kt: ZType, vt: ZType) extends Enc {
    private val lengths = new PrimEnc(Prim("int64"))
    private val keys = newEnc(kt)
    private val values = newEnc(vt)
    private var count = 0L
    def write(v: ZValue): Unit = {
      count += 1
      val es = ZValue.unwrap(v) match {
        case VMap(e) => e
        case _ => Vector.empty[(ZValue, ZValue)]
      }
      lengths.write(VInt(es.length.toLong, "int64"))
      es.foreach { case (k, x) => keys.write(k); values.write(x) }
    }
    def finish(off: Long, data: ByteArrayOutputStream): (Long, Meta) = {
      val (o1, lm) = lengths.finish(off, data)
      val (o2, km) = keys.finish(o1, data)
      val (o3, vm) = values.finish(o2, data)
      (o3, MMap(count, lm.asInstanceOf[MPrim].loc, km, vm))
    }
  }

  private final class UnionEnc(t: Union) extends Enc {
    private val tags = new PrimEnc(Prim("int64"))
    private val members = t.alts.map(newEnc)
    private var count = 0L
    def write(v: ZValue): Unit = {
      count += 1
      val memberT = ZValue.typeOf(ZValue.unwrap(v))
      // Exact match first so unions of distinct NAMED types over the same
      // base keep their member identity (matches ZngIO.encodeZBody);
      // stripped comparison only as a fallback, and no silent tag-0 default.
      val idx = t.alts.indexWhere(_ == memberT) match {
        case -1 => t.alts.indexWhere(a => ZType.strip(a) == ZType.strip(memberT))
        case i  => i
      }
      require(idx >= 0, s"vng: value of type $memberT matches no member of union $t")
      tags.write(VInt(idx.toLong, "int64"))
      members(idx).write(ZValue.unwrap(v))
    }
    def finish(off: Long, data: ByteArrayOutputStream): (Long, Meta) = {
      val (o1, tm) = tags.finish(off, data)
      var o = o1
      val ms = members.map { e => val (o2, m) = e.finish(o, data); o = o2; m }
      (o, MUnion(count, tm.asInstanceOf[MPrim].loc, ms))
    }
  }

  private final class PrimEnc(t: ZType) extends Enc {
    private val buf = new ByteArrayOutputStream()
    private val zt = ZngIO.toZT(ZType.strip(t))
    private var count = 0L
    def write(v: ZValue): Unit = { count += 1; ZngIO.encodeZTagged(buf, v, zt) }
    def finish(off: Long, data: ByteArrayOutputStream): (Long, Meta) = {
      // LZ4-compress the segment like the reference writer, keeping the
      // compressed form only when it actually shrinks (segment.go
      // compressBuffer: format 1 = LZ4 block, 0 = raw)
      val raw = buf.toByteArray
      val memLen = raw.length.toLong
      val (bytes, format) =
        if (raw.isEmpty) (raw, 0)
        else {
          val comp = net.jpountz.lz4.LZ4Factory.fastestInstance()
            .fastCompressor().compress(raw)
          if (comp.length < raw.length) (comp, 1) else (raw, 0)
        }
      data.write(bytes, 0, bytes.length)
      (off + bytes.length, MPrim(t, Seg(off, bytes.length.toLong, memLen, format),
        Vector.empty, count))
    }
  }

  private final class DynamicEnc {
    private val tags = new PrimEnc(Prim("int64"))
    private val which = mutable.LinkedHashMap.empty[String, Int]
    private val encs = mutable.ArrayBuffer.empty[Enc]
    private var len = 0L
    def write(v: ZValue): Unit = {
      val t = ZValue.typeOf(v)
      val key = ZType.fullText(t)
      val tag = which.getOrElseUpdate(key, { encs += newEnc(t); encs.length - 1 })
      tags.write(VInt(tag.toLong, "int64"))
      len += 1
      encs(tag).write(v)
    }
    /** (metadata, data bytes) — tags vector only with >1 type (dynamic.go). */
    def finish(): (Meta, Array[Byte]) = {
      val data = new ByteArrayOutputStream()
      if (encs.length == 1) {
        val (_, m) = encs(0).finish(0L, data)
        (m, data.toByteArray)
      } else {
        val (o1, tm) = tags.finish(0L, data)
        var o = o1
        val ms = encs.toVector.map { e => val (o2, m) = e.finish(o, data); o = o2; m }
        (MDynamic(tm.asInstanceOf[MPrim].loc, ms, len), data.toByteArray)
      }
    }
  }

  // ---- metadata (un)marshal: the zson-marshaled Go struct tree --------------

  private def u32(n: Long): ZValue = VInt(n, "uint32")
  private def u64(n: Long): ZValue = VUint64(BigDecimal(n))

  private def namedRec(name: String, fs: Vector[(String, ZValue)]): ZValue = {
    val rec = VRec(fs)
    VTyped(rec, Named(name, ZValue.typeOf(rec)))
  }

  /** Array with an EXPLICIT element type (single, or a union preserving
    * the members' named types — typeOf's unify would strip them).
    */
  private def typedArr(items: Vector[ZValue]): ZValue = {
    val ts = items.map(ZValue.typeOf)
    val seen = mutable.LinkedHashMap.empty[String, ZType]
    ts.foreach(t => seen.getOrElseUpdate(ZType.fullText(t), t))
    val elemT =
      if (seen.isEmpty) nullT
      else if (seen.size == 1) seen.values.head
      else Union(seen.values.toVector)
    VTyped(VArr(items, isSet = false), Arr(elemT))
  }

  private def segV(s: Seg): ZValue = namedRec("Segment", Vector(
    "Offset" -> u64(s.offset), "Length" -> u64(s.length),
    "MemLength" -> u64(s.memLength), "CompressionFormat" -> VInt(s.format.toLong, "uint8")))

  private def metaV(m: Meta): ZValue = m match {
    case MRecord(n, fs) => namedRec("Record", Vector(
      "Length" -> u32(n),
      "Fields" -> typedArr(fs.map { case (fn, fm) =>
        namedRec("Field", Vector("Name" -> VStr(fn), "Values" -> metaV(fm)))
      })))
    case MArray(n, lens, v, isSet) => namedRec(if (isSet) "Set" else "Array", Vector(
      "Length" -> u32(n), "Lengths" -> segV(lens), "Values" -> metaV(v)))
    case MMap(n, lens, k, v) => namedRec("Map", Vector(
      "Length" -> u32(n), "Lengths" -> segV(lens),
      "Keys" -> metaV(k), "Values" -> metaV(v)))
    case MUnion(n, tags, vs) => namedRec("Union", Vector(
      "Length" -> u32(n), "Tags" -> segV(tags),
      "Values" -> typedArr(vs.map(metaV))))
    case MPrim(t, loc, _, n) => namedRec("Primitive", Vector(
      "Type" -> VTypeVal(ZType.fullText(t)),
      "Location" -> segV(loc),
      "Dict" -> VNull(nullT), "Min" -> VNull(nullT), "Max" -> VNull(nullT),
      "Count" -> u32(n)))
    case MNamed(n, v) => namedRec("Named", Vector(
      "Name" -> VStr(n), "Values" -> metaV(v)))
    case MError(v) => namedRec("Error", Vector("Values" -> metaV(v)))
    case MNulls(runs, v, n) => namedRec("Nulls", Vector(
      "Runs" -> segV(runs), "Values" -> metaV(v), "Count" -> u32(n)))
    case MConst(v, n) => namedRec("Const", Vector("Value" -> v, "Count" -> u32(n)))
    case MDynamic(tags, vs, n) => namedRec("Dynamic", Vector(
      "Tags" -> segV(tags),
      "Values" -> typedArr(vs.map(metaV)),
      "Length" -> u32(n)))
  }

  private def longOf(v: ZValue): Long = ZValue.unwrap(v) match {
    case VInt(n, _) => n
    case VUint64(n) => n.toLong
    case VFloat(d, _) => d.toLong
    case _ => 0L
  }

  private def segOf(v: ZValue): Seg = ZValue.unwrap(v) match {
    case VRec(fs) =>
      val m = fs.toMap
      Seg(m.get("Offset").map(longOf).getOrElse(0L),
        m.get("Length").map(longOf).getOrElse(0L),
        m.get("MemLength").map(longOf).getOrElse(0L),
        m.get("CompressionFormat").map(longOf).getOrElse(0L).toInt)
    case _ => Seg(0, 0, 0, 0)
  }

  private def parseMeta(v: ZValue): Meta = {
    val name = ZValue.typeOf(v) match {
      case Named(n, _) => n
      case _ => throw new IllegalArgumentException(
        "vng: unsupported metadata layout (expected zson-marshaled Metadata " +
          "with simple-style type names — vng/metadata.go)")
    }
    val fs: Map[String, ZValue] = ZValue.unwrap(v) match {
      case VRec(fv) => fv.toMap
      case _ => Map.empty
    }
    def meta(field: String): Meta = parseMeta(fs(field))
    def metas(field: String): Vector[Meta] = ZValue.unwrap(fs(field)) match {
      case VArr(items, _) => items.map(parseMeta)
      case _ => Vector.empty
    }
    name match {
      case "Record" =>
        val fields = ZValue.unwrap(fs("Fields")) match {
          case VArr(items, _) => items.map { f =>
            val ffs = ZValue.unwrap(f) match { case VRec(x) => x.toMap; case _ => Map.empty[String, ZValue] }
            val fname = ZValue.unwrap(ffs("Name")) match { case VStr(s) => s; case _ => "" }
            fname -> parseMeta(ffs("Values"))
          }
          case _ => Vector.empty
        }
        MRecord(longOf(fs("Length")), fields)
      case "Array" => MArray(longOf(fs("Length")), segOf(fs("Lengths")), meta("Values"), isSet = false)
      case "Set" => MArray(longOf(fs("Length")), segOf(fs("Lengths")), meta("Values"), isSet = true)
      case "Map" => MMap(longOf(fs("Length")), segOf(fs("Lengths")), meta("Keys"), meta("Values"))
      case "Union" => MUnion(longOf(fs("Length")), segOf(fs("Tags")), metas("Values"))
      case "Primitive" =>
        val t = ZValue.unwrap(fs("Type")) match {
          case VTypeVal(txt) =>
            try ZsonParser.parseType(txt) catch { case _: Exception => Prim("string") }
          case _ => Prim("string")
        }
        val dict = fs.get("Dict").map(ZValue.unwrap) match {
          case Some(VArr(entries, _)) => entries.map { e =>
            val efs = ZValue.unwrap(e) match { case VRec(x) => x.toMap; case _ => Map.empty[String, ZValue] }
            efs.getOrElse("Value", VNull(nullT)) -> efs.get("Count").map(longOf).getOrElse(0L)
          }
          case _ => Vector.empty
        }
        MPrim(t, segOf(fs("Location")), dict, longOf(fs("Count")))
      case "Named" =>
        val n = ZValue.unwrap(fs("Name")) match { case VStr(s) => s; case _ => "" }
        MNamed(n, meta("Values"))
      case "Error" => MError(meta("Values"))
      case "Nulls" => MNulls(segOf(fs("Runs")), meta("Values"), longOf(fs("Count")))
      case "Const" => MConst(fs("Value"), longOf(fs("Count")))
      case "Dynamic" => MDynamic(segOf(fs("Tags")), metas("Values"), longOf(fs("Length")))
      case other => throw new IllegalArgumentException(s"vng: unknown metadata type $other")
    }
  }

  // ---- readers --------------------------------------------------------------

  private def segBytes(data: Array[Byte], s: Seg): Array[Byte] = {
    val raw = java.util.Arrays.copyOfRange(data, s.offset.toInt, (s.offset + s.length).toInt)
    s.format match {
      case 0 => raw
      case 1 =>
        val out = new Array[Byte](s.memLength.toInt)
        net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
          .decompress(raw, 0, out, 0, s.memLength.toInt)
        out
      case other => throw new IllegalArgumentException(s"vng: unknown compression format $other")
    }
  }

  private sealed trait Rd { def next(): ZValue }

  private final class PrimRd(t: ZType, bytes: Array[Byte], dict: Vector[(ZValue, Long)]) extends Rd {
    private val c = new ZngIO.Cursor(bytes, 0)
    private val zt = ZngIO.toZT(ZType.strip(t))
    def next(): ZValue =
      if (dict.nonEmpty) {
        val idx = c.u8()
        if (idx < dict.length) dict(idx)._1 else VNull(t)
      } else ZngIO.decodeZValue(c, zt)
  }

  private final class Int64Rd(bytes: Array[Byte]) {
    private val c = new ZngIO.Cursor(bytes, 0)
    def next(): Long = ZValue.unwrap(ZngIO.decodeZValue(c, ZngIO.ZPrim(9))) match {
      case VInt(n, _) => n
      case _ => 0L
    }
  }

  private final class ConstRd(v: ZValue) extends Rd { def next(): ZValue = v }

  private final class NullsRd(runs: Int64Rd, innerT: ZType, child: Rd) extends Rd {
    private var left = runs.next() // first run counts VALUES (nulls.go)
    private var inNull = false
    def next(): ZValue = {
      while (left == 0) { left = runs.next(); inNull = !inNull }
      left -= 1
      if (inNull) VNull(innerT) else child.next()
    }
  }

  private final class RecordRd(fields: Vector[(String, Rd)]) extends Rd {
    def next(): ZValue = VRec(fields.map { case (n, r) => n -> r.next() })
  }

  private final class ArrayRd(lengths: Int64Rd, child: Rd, isSet: Boolean) extends Rd {
    def next(): ZValue = {
      val n = lengths.next().toInt
      val items = Vector.fill(n)(child.next())
      VArr(if (isSet) ZValue.normSet(items) else items, isSet)
    }
  }

  private final class MapRd(lengths: Int64Rd, keys: Rd, values: Rd) extends Rd {
    def next(): ZValue = {
      val n = lengths.next().toInt
      VMap(ZValue.normMap(Vector.fill(n)(keys.next() -> values.next())))
    }
  }

  private final class UnionRd(t: Union, tags: Int64Rd, members: Vector[Rd]) extends Rd {
    def next(): ZValue = {
      val which = tags.next().toInt
      VTyped(ZValue.unwrap(members(which).next()), t)
    }
  }

  private final class NamedRd(name: String, innerT: ZType, child: Rd) extends Rd {
    def next(): ZValue = child.next() match {
      case VTyped(i, _) => VTyped(i, Named(name, innerT))
      case VNull(_) => VNull(Named(name, innerT))
      case other => VTyped(other, Named(name, innerT))
    }
  }

  private final class ErrorRd(child: Rd) extends Rd {
    def next(): ZValue = child.next() match {
      case VNull(t) => VNull(ErrT(t))
      case other => VErr(other)
    }
  }

  private def newRd(m: Meta, data: Array[Byte]): Rd = m match {
    case MPrim(t, loc, dict, _) => new PrimRd(t, segBytes(data, loc), dict)
    case MConst(v, _) => new ConstRd(v)
    case MNulls(runs, values, _) =>
      new NullsRd(new Int64Rd(segBytes(data, runs)), metaType(values), newRd(values, data))
    case MRecord(_, fs) => new RecordRd(fs.map { case (n, f) => n -> newRd(f, data) })
    case MArray(_, lens, v, isSet) =>
      new ArrayRd(new Int64Rd(segBytes(data, lens)), newRd(v, data), isSet)
    case MMap(_, lens, k, v) =>
      new MapRd(new Int64Rd(segBytes(data, lens)), newRd(k, data), newRd(v, data))
    case MUnion(_, tags, vs) =>
      new UnionRd(Union(vs.map(metaType)), new Int64Rd(segBytes(data, tags)), vs.map(newRd(_, data)))
    case MNamed(n, v) => new NamedRd(n, metaType(v), newRd(v, data))
    case MError(v) => new ErrorRd(newRd(v, data))
    case MDynamic(_, _, _) => throw new IllegalArgumentException("vng: nested Dynamic")
  }

  // ---- public API -----------------------------------------------------------

  /** Encode one VNG object from typed values. */
  def encodeObject(values: Iterator[ZValue]): Array[Byte] = {
    val dyn = new DynamicEnc
    values.foreach(dyn.write)
    val (meta, data) = dyn.finish()
    val metaBytes = ZngIO.encodeTypedStream(Seq(metaV(meta)))
    val out = new ByteArrayOutputStream()
    // header.go: 'V','N','G',0, version u32 LE, metaSize u64 LE, dataSize u64 LE
    out.write('V'); out.write('N'); out.write('G'); out.write(0)
    out.write(ZngIO.leBytes(Version.toLong, 4), 0, 4)
    out.write(ZngIO.leBytes(metaBytes.length.toLong, 8), 0, 8)
    out.write(ZngIO.leBytes(data.length.toLong, 8), 0, 8)
    out.write(metaBytes, 0, metaBytes.length)
    out.write(data, 0, data.length)
    out.toByteArray
  }

  /** Decode one VNG object to its typed values. */
  def decodeToZValues(bytes: Array[Byte]): Iterator[ZValue] = {
    require(bytes.length >= 24 && bytes(0) == 'V' && bytes(1) == 'N' &&
      bytes(2) == 'G' && bytes(3) == 0, "not a VNG file")
    def leLong(off: Int, n: Int): Long =
      (0 until n).map(i => (bytes(off + i) & 0xffL) << (8 * i)).sum
    val metaSize = leLong(8, 8).toInt
    val metaBytes = java.util.Arrays.copyOfRange(bytes, 24, 24 + metaSize)
    val data = java.util.Arrays.copyOfRange(bytes, 24 + metaSize, bytes.length)
    val metaVal = ZngIO.decodeToZValues(metaBytes, unionKeepsMember = true).toSeq.headOption.getOrElse(
      throw new IllegalArgumentException("vng: empty metadata section"))
    parseMeta(metaVal) match {
      case MDynamic(tags, values, length) =>
        val tagRd = new Int64Rd(segBytes(data, tags))
        val rds = values.map(newRd(_, data))
        Iterator.range(0L, length).map(_ => rds(tagRd.next().toInt).next())
      case single =>
        val rd = newRd(single, data)
        Iterator.range(0L, metaLen(single)).map(_ => rd.next())
    }
  }

  /** Distributed write: one VNG object file per partition through the
    * Hadoop FileSystem API (shared filesystem on a cluster). Columnar
    * layout requires buffering one partition's vectors before the header
    * is known — the same memory profile as the reference writer.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    HadoopFs.prepareDir(df.sparkSession, path)
    val confMap = HadoopFs.confMap(df.sparkSession)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val toV = ZFormat.rowValueFn(schema)
      val bytes = encodeObject(rows.map(toV))
      val out = HadoopFs.create(confMap, path, f"part-$pid%05d.vng")
      try out.write(bytes) finally out.close()
      Iterator.empty
    }.count(): Unit
  }

  /** Read a VNG file or directory of part files into the typed frame —
    * per-file decode on the executors (VNG objects are self-contained),
    * fused by the same two-pass shape discovery as the other typed
    * readers (no JSON inference, no driver materialization).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rdd = HadoopFs.binaryFiles(spark, path)
      .select("content").as[Array[Byte]].rdd
      .flatMap(bytes => decodeToZValues(Gzip.maybeGunzip(bytes)))
    ZsonReader.fromRDD(spark, rdd)
  }
}
