package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Het
import graft.sources.{ZValue, ZsonParser, ZType}

/** Row-level operations on variant (union-typed / error) values.
  *
  * A variant column is Het's tagged struct; for structural operations the
  * value's ZSON text (`Het.render`) is the interchange form — the same
  * boxing zed's own runtime pays for union values (complex.go Under).
  * These UDFs engage ONLY on variant columns, i.e. only on genuinely
  * heterogeneous data; homogeneous columns never leave native Catalyst.
  */
object ZvOps {

  /** Spark-facing mirror of the variant struct (field names must match
    * Het.variantType exactly so the UDF return type lines up).
    */
  case class ZV(k: Option[Int], n: Option[Double], s: Option[String],
                b: Option[Boolean], t: Option[String], z: Option[String])

  def zvOf(v: ZValue): Option[ZV] = {
    val row = ZValue.variantRow(v)
    if (row == null) None
    else Some(ZV(
      Option(row.get(0)).map(_.asInstanceOf[Int]),
      Option(row.get(1)).map(_.asInstanceOf[Double]),
      Option(row.get(2)).map(_.asInstanceOf[String]),
      Option(row.get(3)).map(_.asInstanceOf[Boolean]),
      Option(row.get(4)).map(_.asInstanceOf[String]),
      Option(row.get(5)).map(_.asInstanceOf[String])))
  }

  val errMissing: Option[ZV] = zvOf(ZValue.errMissing)

  private def parse(text: String): Option[ZValue] =
    try Some(new ZsonParser(text).parseOne()) catch { case _: Exception => None }

  /** Field access into a boxed value: a.b where a is a variant. Missing
    * field / non-record → error("missing") (reference expr/eval.go
    * DotExpr).
    */
  private val getU = udf((text: String, field: String) => {
    if (text == null) errMissing
    else parse(text).flatMap(v => ZValue.unwrap(v) match {
      case ZValue.VRec(fs) => fs.find(_._1 == field) match {
        case Some((_, fv)) => zvOf(fv)
        case None => errMissing
      }
      case _ => errMissing
    }).orElse(errMissing)
  })

  def get(v: Column, field: String): Column = getU(Het.render(v), lit(field))

  /** Element access into a boxed array/map value. */
  private val indexU = udf((text: String, idx: Int) => {
    if (text == null) errMissing
    else parse(text).flatMap(v => ZValue.unwrap(v) match {
      case ZValue.VArr(items, _) =>
        val i = if (idx < 0) items.length + idx else idx
        if (i >= 0 && i < items.length) zvOf(items(i)) else errMissing
      case _ => errMissing
    }).orElse(errMissing)
  })

  def index(v: Column, idx: Column): Column = indexU(Het.render(v), idx)

  /** zed len() over a boxed value (function/len.go): arrays/sets/maps/
    * records by entry count, strings by bytes, bytes by size; else error.
    */
  private val lenU = udf((text: String) => {
    if (text == null) None
    else parse(text).flatMap(v => ZValue.unwrap(v) match {
      case ZValue.VArr(items, _) => zvOf(ZValue.VInt(items.length.toLong, "int64"))
      case ZValue.VMap(es) => zvOf(ZValue.VInt(es.length.toLong, "int64"))
      case ZValue.VRec(fs) => zvOf(ZValue.VInt(fs.length.toLong, "int64"))
      case ZValue.VStr(s) => zvOf(ZValue.VInt(s.getBytes("UTF-8").length.toLong, "int64"))
      case ZValue.VBytes(b) => zvOf(ZValue.VInt(b.length.toLong, "int64"))
      case ZValue.VNull(_) => zvOf(ZValue.VInt(0L, "int64"))
      case ZValue.VIp(_) | ZValue.VNet(_) =>
        zvOf(ZValue.VErr(ZValue.VStr("len: bad type")))
      case other => zvOf(ZValue.VErr(ZValue.VStr("len: bad type")))
    })
  })

  def len(v: Column): Column = lenU(Het.render(v))

  /** Full zed len() over a variant value (function/len.go): strings by
    * UTF-8 bytes, bytes by size, ip 4/16, net 8/32, containers by entry
    * count, types recursively (union → alternatives, record → fields),
    * errors → error({message:"len()",on:…}).
    */
  private val lenZedU = udf((k: java.lang.Integer, s: String, t: String, z: String) => {
    def typeLen(ty: ZType): Long = ZType.strip(ty) match {
      case ZType.Rec(fs) => fs.length.toLong
      case ZType.Union(alts) => alts.length.toLong
      case ZType.Arr(e) => typeLen(e)
      case ZType.SetT(e) => typeLen(e)
      case ZType.MapT(_, _) => 2L
      case _ => 1L
    }
    def int(n: Long) = zvOf(ZValue.VInt(n, "int64"))
    if (k == null) int(0L)
    else if (k == 5) {
      val on: ZValue =
        if (z == null) ZValue.VNull(ZType.ErrT(ZType.Prim("null")))
        else ZValue.VErr(parse(z).getOrElse(ZValue.VStr(z)))
      zvOf(ZValue.VErr(ZValue.VRec(Vector(
        "message" -> ZValue.VStr("len()"), "on" -> on))))
    } else if (t == "string") int(if (s == null) 0L else s.getBytes("UTF-8").length.toLong)
    else if (t == "bytes") int(if (s == null) 0L else (s.length - 2L) / 2L)
    else if (t == "ip") int(if (s == null) 0L else if (s.contains(":")) 16L else 4L)
    else if (t == "net") int(if (s == null) 0L else if (s.contains(":")) 32L else 8L)
    else if (t == "type") {
      if (s == null) int(0L)
      else int(try typeLen(ZsonParser.parseType(s)) catch { case _: Exception => 1L })
    } else if (z != null) parse(z).flatMap(v => ZValue.unwrap(v) match {
      case ZValue.VArr(items, _) => int(items.length.toLong)
      case ZValue.VMap(es) => int(es.length.toLong)
      case ZValue.VRec(fs) => int(fs.length.toLong)
      case _ => int(0L)
    }).orElse(int(0L))
    else if (k == 0 || k == 1 || k == 3) zvOf(ZValue.VErr(ZValue.VRec(Vector(
      "message" -> ZValue.VStr("len()"),
      "on" -> ZValue.VStr(Option(s).getOrElse(""))))))
    else int(0L) // typed null container
  })

  def lenZed(v: Column): Column =
    lenZedU(v.getField("k"), v.getField("s"), v.getField("t"), v.getField("z"))

  /** fields(<type-text>) — the leaf paths of a record type as ZSON text
    * ([["r","a"],["s"]]); null for non-record types (→ error("missing")).
    */
  private val typePathsU = udf((typeText: String) => {
    if (typeText == null) Option.empty[String]
    else try {
      def paths(ty: ZType, prefix: Vector[String]): Vector[Vector[String]] =
        ZType.strip(ty) match {
          case ZType.Rec(fs) => fs.toVector.flatMap { case (n, ft) =>
            ZType.strip(ft) match {
              case _: ZType.Rec => paths(ft, prefix :+ n)
              case _ => Vector(prefix :+ n)
            }
          }
          case _ => Vector.empty
        }
      ZType.strip(ZsonParser.parseType(typeText)) match {
        case r: ZType.Rec =>
          val ps = paths(r, Vector.empty)
          Some(ps.map(_.map(x => "\"" + x + "\"").mkString("[", ",", "]"))
            .mkString("[", ",", "]"))
        case _ => None
      }
    } catch { case _: Exception => None }
  })

  def typePaths(typeText: Column): Column = typePathsU(typeText)

  /** Unary minus over a boxed number (expr/eval.go unary '-'). */
  private val negU = udf((text: String) => {
    if (text == null) None
    else parse(text).flatMap(v => ZValue.unwrap(v) match {
      case ZValue.VInt(n, t) => zvOf(ZValue.VInt(-n, if (t.startsWith("uint")) "int64" else t))
      case ZValue.VFloat(d, t) => zvOf(ZValue.VFloat(-d, t))
      case ZValue.VDur(ns) => zvOf(ZValue.VDur(-ns))
      case ZValue.VNull(t) => None
      case other => zvOf(ZValue.VErr(ZValue.VRec(Vector(
        "message" -> ZValue.VStr("incompatible type"),
        "on" -> other))))
    })
  })

  def neg(v: Column): Column = negU(Het.render(v))

  /** Elements of a boxed container (for `over` on union-typed values):
    * arrays/sets → members, maps → {key,value}-ish pairs flattened to
    * text, non-containers → null (caller falls back to the value itself).
    */
  private val elemsU = udf((text: String) => {
    if (text == null) Option.empty[Seq[Option[ZV]]]
    else parse(text).flatMap(v => ZValue.unwrap(v) match {
      case ZValue.VArr(items, _) => Some(items.map(zvOf))
      case _ => Option.empty[Seq[Option[ZV]]]
    })
  })

  def elems(v: Column): Column = elemsU(Het.render(v))

  /** zed join(s, sep) over boxed values (function/string.go Join): s must
    * be an array (null string elements join as ""), sep must be a string.
    */
  private val joinZedU = udf((sZ: String, sepZ: String) => {
    import ZValue._
    def err(msg: String, on: ZValue) = zvOf(VErr(VRec(Vector(
      "message" -> VStr(msg), "on" -> on))))
    val sV = Option(sZ).flatMap(parse).map(unwrap)
    val sepV = Option(sepZ).flatMap(parse).map(unwrap)
    sepV match {
      case Some(v) if !v.isInstanceOf[VStr] && !v.isInstanceOf[VNull] =>
        err("join: separator must be string", v)
      case _ => sV match {
        case Some(VArr(items, _)) =>
          val sep = sepV match { case Some(VStr(x)) => x; case _ => "" }
          val parts = items.map(e => unwrap(e) match {
            case VStr(x) => x
            case VNull(_) => ""
            case other => zsonText(other)
          })
          zvOf(VStr(parts.mkString(sep)))
        case Some(other) => err("join: array of string arg required", other)
        case None => err("join: array of string arg required",
          VNull(ZType.Prim("null")))
      }
    }
  })

  def joinZed(s: Column, sep: Column): Column =
    joinZedU(Het.render(s), Het.render(sep))

  /** Variant → native string (zed string() cast semantics for scalars). */
  def asText(v: Column): Column =
    when(v.isNull, lit(null).cast(StringType))
      .when(v.getField("k") === 2, v.getField("s"))
      .otherwise(Het.render(v))

  /** Wrap any typed column as a variant (idempotent). */
  def box(c: Column, dt: DataType): Column = Het.variant(c, dt)
}
