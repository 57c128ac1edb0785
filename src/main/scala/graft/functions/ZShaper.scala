package graft.functions

import graft.sources.{ZType, ZValue, ZsonParser}

/** Typed shaper over the ZValue model — the engine's equivalent of the
  * reference's shaper machinery (runtime/sam/expr/shaper.go): `cast`,
  * `crop`, `fill`, `fit`, `order`, `shape` compose as bit-flags; the
  * output TYPE is computed per input type (shaperType/shaperFields,
  * shaper.go:179-314) and the VALUE is converted per the computed type
  * (newStep/build, shaper.go:369-551). Primitive casts mirror
  * runtime/sam/expr/cast.go, including the error({message,on}) wrapping
  * for failed casts.
  *
  * This path engages only on tagged (super-structured) streams where the
  * per-row zed type is a runtime value — the same per-value cost profile
  * as the reference's own shaper. Relational (untagged/columnar) frames
  * keep the codegen'd Column-level Shaper.reshape path.
  */
object ZShaper {

  /** zed primitive type names (zson spec §2.5.1) — a cast target that is
    * NOT one of these but looks like an identifier names the subject.
    */
  val primTypeNames: Set[String] = Set(
    "uint8", "uint16", "uint32", "uint64", "int8", "int16", "int32", "int64",
    "float16", "float32", "float64", "bool", "string", "bytes", "time",
    "duration", "ip", "net", "type", "null", "decimal")
  import ZType._
  import ZValue._

  val CastF = 1; val CropF = 2; val FillF = 4; val OrderF = 8

  /** shaper.go NewShaperTransform. */
  def flagsOf(name: String): Int = name match {
    case "cast" => CastF
    case "crop" => CropF
    case "fill" => FillF
    case "fit" => CropF | FillF
    case "order" => OrderF
    case "shape" => CastF | FillF | OrderF
    case _ => 0
  }

  private def under(t: ZType): ZType = strip(t)

  private def isPrimT(t: ZType): Boolean = under(t) match {
    case Prim(_) => true
    case _ => false
  }
  private def isArrT(t: ZType): Boolean = under(t).isInstanceOf[Arr]
  private def isSetT(t: ZType): Boolean = under(t).isInstanceOf[SetT]
  private def innerOf(t: ZType): Option[ZType] = under(t) match {
    case Arr(e) => Some(e)
    case SetT(e) => Some(e)
    case _ => None
  }

  private def hasCaster(p: String): Boolean = p match {
    case "bool" | "int8" | "int16" | "int32" | "int64" | "uint8" | "uint16" |
        "uint32" | "uint64" | "float16" | "float32" | "float64" | "ip" |
        "net" | "duration" | "time" | "string" | "bytes" | "type" => true
    case _ => false
  }

  private def wrapErr(msg: String, on: ZValue): ZValue =
    VErr(VRec(Vector("message" -> VStr(msg), "on" -> on)))

  private def isNullV(v: ZValue): Boolean = v match {
    case VNull(_) => true
    case VTyped(i, _) => isNullV(i)
    case _ => false
  }
  private def isErrV(v: ZValue): Boolean = v match {
    case VErr(_) => true
    case VTyped(i, _) => isErrV(i)
    case _ => false
  }

  /** Claim type `out` for a structurally-equal value (zed's "prefer
    * toType in case it's a named type").
    */
  private def retype(v: ZValue, out: ZType): ZValue =
    if (typeOf(v) == out) v
    else out match {
      case n: Named => VTyped(unwrap(v), n)
      case _ if typeOf(unwrap(v)) == out => unwrap(v)
      case _ => VTyped(unwrap(v), out)
    }

  /** shaper.go bestUnionTag: exact member, then the underlying type, then
    * the first compatible (same-underlying) member.
    */
  def bestUnionTag(in: ZType, out: ZType): Int = under(out) match {
    case Union(alts) =>
      val tin = under(in)
      val exact = alts.indexOf(in)
      if (exact >= 0) exact
      else {
        val uidx = alts.indexOf(tin)
        if (uidx >= 0) uidx else alts.indexWhere(a => under(a) == tin)
      }
    case _ => -1
  }

  /** shaper.go shaperType: the output type for shaping `in` toward `out`. */
  def shaperType(tf: Int, in: ZType, out: ZType): Either[String, ZType] = {
    val inU = under(in); val outU = under(out)
    if ((tf & CastF) != 0) {
      if (inU == outU || inU == Prim("null")) return Right(out)
      if (outU.isInstanceOf[MapT])
        return Left("cannot yet use maps in shaping functions")
      (inU, outU) match {
        case (Prim(_), Prim(p)) =>
          return if (hasCaster(p)) Right(out)
                 else Left(s"cast to ${text(out)} not implemented")
        case _ =>
      }
      inU match {
        case Union(alts) =>
          alts.foreach { t =>
            if (shaperType(tf, t, out).isLeft)
              return Left(s"cannot cast union ${text(inU)} to ${text(out)}")
          }
          return Right(out)
        case _ =>
      }
      if (bestUnionTag(in, outU) > -1) return Right(out)
    } else if (inU == outU) return Right(in)
    (inU, outU) match {
      case (Rec(inFs), Rec(outFs)) =>
        return shaperFields(tf, inFs, outFs).map { fields =>
          if ((tf & CastF) != 0) { if (fields == outFs) out else Rec(fields) }
          else { if (fields == inFs) in else Rec(fields) }
        }
      case _ =>
    }
    (innerOf(inU), innerOf(outU)) match {
      case (Some(inI), Some(outI))
          if (tf & CastF) != 0 || isArrT(inU) == isArrT(outU) =>
        shaperType(tf, inI, outI).map { t =>
          if ((tf & CastF) != 0 && t == outI) out
          else if ((tf & CastF) == 0 && t == inI) in
          else if (isArrT(outU)) Arr(t)
          else SetT(t)
        }
      case _ => Right(in)
    }
  }

  /** shaper.go shaperFields, including the in/out swap for non-Order
    * transforms and lexicographic extras under Order.
    */
  def shaperFields(
      tf: Int,
      inFs0: Vector[(String, ZType)],
      outFs0: Vector[(String, ZType)]): Either[String, Vector[(String, ZType)]] = {
    var crop = (tf & CropF) != 0; var fill = (tf & FillF) != 0
    var inFs = inFs0; var outFs = outFs0
    if ((tf & OrderF) == 0) {
      val c = crop; crop = !fill; fill = !c
      val t = inFs; inFs = outFs; outFs = t
    }
    val buf = Vector.newBuilder[(String, ZType)]
    for ((name, outT0) <- outFs) {
      inFs.find(_._1 == name) match {
        case Some((_, inT0)) =>
          val (inT, outT) =
            if ((tf & OrderF) == 0) (outT0, inT0) else (inT0, outT0)
          shaperType(tf, inT, outT) match {
            case Left(e) => return Left(e)
            case Right(t) => buf += name -> t
          }
        case None => if (fill) buf += name -> outT0
      }
    }
    if (!crop) {
      var rest = inFs.filterNot(f => outFs.exists(_._1 == f._1))
      if ((tf & OrderF) != 0) rest = rest.sortBy(_._1)
      buf ++= rest
    }
    Right(buf.result())
  }

  /** Top-level shape/cast of one value (ConstShaper.Eval, shaper.go:169). */
  def reshape(tf: Int, v: ZValue, target: ZType): ZValue = {
    if (isErrV(v)) return v
    if (isNullV(v)) return VNull(target) // nulls shape to any type
    val vt = typeOf(v)
    if (vt == target) return v
    if (under(vt) == under(target)) return retype(v, target)
    if (tf == CastF && isPrimT(target) && !under(vt).isInstanceOf[Union]) {
      val r = castPrim(v, target)
      return if (!isErrV(r) && under(typeOf(r)) == under(target)) retype(r, target)
             else r
    }
    shaperType(tf, vt, target) match {
      case Left(msg) => VErr(VStr(msg))
      case Right(st) => conv(vt, st, v)
    }
  }

  /** Cast to a named type by name (casterNamedType, cast.go:280): the
    * value keeps its underlying type, renamed.
    */
  def castNamed(v: ZValue, name: String): ZValue =
    if (isErrV(v)) v
    else VTyped(unwrap(v), Named(name, under(typeOf(v))))

  /** Full cast of a (possibly union-typed) value to a target type, with
    * the reference shaper's createStep union compatibility: a union
    * SOURCE type against a DIFFERENT union target errors; union-to-
    * primitive casts the current member (keeping a member's named type,
    * renamed over the cast result). shape-cast-from-union ztest.
    */
  def castValue(v: ZValue, target: ZType): ZValue = {
    def check(s: ZType, t: ZType): Option[String] = (under(s), under(t)) match {
      case (u1: Union, u2: Union) =>
        if (text(u1) == text(u2)) None
        else Some(s"createStep: incompatible types ${text(u1)} and ${text(u2)}")
      case (Arr(a2), Arr(b)) => check(a2, b)
      case (SetT(a2), SetT(b)) => check(a2, b)
      case (Arr(a2), SetT(b)) => check(a2, b)
      case (SetT(a2), Arr(b)) => check(a2, b)
      case (Rec(fa), Rec(fb)) =>
        fa.flatMap { case (n, ft) =>
          fb.find(_._1 == n).flatMap(g => check(ft, g._2))
        }.headOption
      case _ => None
    }
    check(typeOf(v), target) match {
      case Some(msg) => VErr(VStr(msg))
      case None => castDeep(v, target)
    }
  }

  private def castDeep(v: ZValue, target: ZType): ZValue = v match {
    case _ if isNullV(v) => VNull(target)
    case VTyped(inner, t0) if strip(t0).isInstanceOf[Union] =>
      // union value: cast the current member; when the matching union
      // alternative is NAMED, the name survives the cast (cast.go keeps
      // named member types — "1(=int64_named)" in shape-cast-from-union)
      val memberU = under(typeOf(inner))
      strip(t0) match {
        case Union(alts) => alts.find(a => under(a) == memberU) match {
          case Some(Named(n, _)) if under(target) == Prim("string") && !isNullV(inner) =>
            // string-casting a NAMED member formats the value WITH its
            // decorator ("1(=int64_named)" — zson.FormatValue semantics)
            VStr(s"${ZValue.zsonText(unwrap(inner))}(=$n)")
          case _ => castDeep(inner, target)
        }
        case _ => castDeep(inner, target)
      }
    case VTyped(inner, Named(n, _)) if isPrimT(target) =>
      val r = reshape(CastF, inner, target)
      if (isErrV(r) || isNullV(r)) r
      else VTyped(unwrap(r), Named(n, under(typeOf(r))))
    case VArr(items, isSet) => under(target) match {
      case Arr(et) => VArr(items.map(castDeep(_, et)), isSet = false)
      case SetT(et) => VArr(ZValue.normSet(items.map(castDeep(_, et))), isSet = true)
      case _ => reshape(CastF, v, target)
    }
    case VRec(fs) => under(target) match {
      case Rec(tfs) =>
        VRec(tfs.map { case (n, ft) =>
          n -> fs.find(_._1 == n).map(f => castDeep(f._2, ft)).getOrElse(VNull(ft))
        })
      case _ => reshape(CastF, v, target)
    }
    case _ => reshape(CastF, v, target)
  }

  /** Value conversion toward the SHAPED type (newStep/build). `out` comes
    * from shaperType so the pair is structurally compatible.
    */
  private def conv(in: ZType, out: ZType, v: ZValue): ZValue = {
    if (isNullV(v)) return VNull(out)
    val inU = under(in); val outU = under(out)
    if (inU == Prim("null")) return VNull(out)
    if (inU == outU) return retype(v, out)
    (inU, outU) match {
      case (Rec(inFs), Rec(outFs)) =>
        val inVals: Map[String, ZValue] = unwrap(v) match {
          case VRec(fs) => fs.toMap
          case _ => Map.empty
        }
        val rec = VRec(outFs.map { case (n, ot) =>
          inFs.find(_._1 == n) match {
            case Some((_, it)) => n -> (inVals.get(n) match {
              case Some(fv) => conv(it, ot, fv)
              case None => VNull(ot)
            })
            case None => n -> VNull(ot)
          }
        })
        // needNewRecordType: claim `out` only when field types landed
        if (typeOf(rec) == under(out)) retype(rec, out) else rec
      case (Prim(_), Prim(_)) =>
        val r = castPrim(v, outU)
        if (!isErrV(r) && under(typeOf(r)) == outU) retype(r, out) else r
      case _ if innerOf(inU).isDefined && (isArrT(outU) || isSetT(outU)) =>
        val it = innerOf(inU).get; val ot = innerOf(outU).get
        val items0 = unwrap(v) match {
          case VArr(items, _) => items
          case _ => Vector.empty[ZValue]
        }
        var items = items0.map(x => conv(it, ot, x))
        if (isSetT(outU)) items = ZValue.normSet(items)
        val arr = VArr(items, isSetT(outU))
        // an EMPTY container adopts the target type outright — its own
        // inferred type ([null]) can't witness the element type
        if (typeOf(arr) == under(out) || items.isEmpty) retype(arr, out)
        else arr
      case (Union(_), _) =>
        conv(typeOf(unwrap(v)), out, unwrap(v))
      case _ =>
        if (bestUnionTag(in, outU) >= 0) VTyped(unwrap(v), out) // castToUnion
        else wrapErr(s"incompatible types ${text(in)} and ${text(out)}", v)
    }
  }

  // ---- primitive casters (runtime/sam/expr/cast.go) -------------------------

  private def toFloatOpt(v: ZValue): Option[Double] = unwrap(v) match {
    case VInt(n, _) => Some(n.toDouble)
    case VUint64(n) => Some(n.toDouble)
    case VFloat(d, _) => Some(d)
    case VTime(ns) => Some(ns.toDouble)
    case VDur(ns) => Some(ns.toDouble)
    case VStr(s) => try Some(s.toDouble) catch { case _: Exception => None }
    case _ => None
  }

  private def toIntOpt(v: ZValue): Option[Long] = unwrap(v) match {
    case VInt(n, _) => Some(n)
    case VUint64(n) => Some(n.toLong)
    case VFloat(d, _) => Some(d.toLong)
    case VTime(ns) => Some(ns)
    case VDur(ns) => Some(ns)
    case VStr(s) => try Some(s.toLong) catch { case _: Exception => None }
    case _ => None
  }

  private def toUintOpt(v: ZValue): Option[BigDecimal] = unwrap(v) match {
    case VInt(n, _) => if (n < 0) None else Some(BigDecimal(n))
    case VUint64(n) => Some(n)
    case VFloat(d, _) => Some(BigDecimal(d.toLong))
    case VTime(ns) => if (ns < 0) None else Some(BigDecimal(ns))
    case VDur(ns) => if (ns < 0) None else Some(BigDecimal(ns))
    case VStr(s) =>
      try { val b = BigDecimal(s); if (b < 0 || b.scale > 0) None else Some(b) }
      catch { case _: Exception => None }
    case _ => None
  }

  private def toBoolOpt(v: ZValue): Option[Boolean] = unwrap(v) match {
    case VStr(s) => s match {
      case "1" | "t" | "T" | "TRUE" | "true" | "True" => Some(true)
      case "0" | "f" | "F" | "FALSE" | "false" | "False" => Some(false)
      case _ => None
    }
    case VBool(b) => Some(b)
    case other => toIntOpt(other).map(_ != 0)
  }

  /** float64 → float16 quantization (no Java 17 intrinsic). */
  private def toF16(d: Double): Double = {
    val f = d.toFloat
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    var value = (bits & 0x7fffffff) + 0x1000
    val h: Int =
      if (value >= 0x47800000) {
        if ((bits & 0x7fffffff) >= 0x47800000) {
          if ((bits & 0x7fffffff) < 0x7f800000) sign | 0x7c00
          else sign | 0x7c00 | ((bits & 0x007fffff) >> 13)
        } else sign | 0x7bff
      } else if (value >= 0x38800000) sign | ((value - 0x38000000) >> 13)
      else if ((bits & 0x7fffffff) < 0x33000000) sign
      else {
        val exp = (bits & 0x7fffffff) >> 23
        sign | (((bits & 0x7fffff) | 0x800000) + (0x800000 >>> (exp - 102)) >> (126 - exp))
      }
    // back to float
    val hexp = (h >> 10) & 0x1f
    val hsig = h & 0x3ff
    val neg = (h & 0x8000) != 0
    val mag: Double =
      if (hexp == 0) hsig * math.pow(2, -24)
      else if (hexp != 31) (hsig + 1024) * math.pow(2, hexp - 25)
      else if (hsig == 0) Double.PositiveInfinity
      else Double.NaN
    if (neg) -mag else mag
  }

  def parseDurNs(s0: String): Option[Long] = {
    var s = s0; var negative = false
    if (s.startsWith("-")) { negative = true; s = s.substring(1) }
    val re = """(\d+(?:\.\d+)?)(ns|us|ms|s|m|h|d|w|y)""".r
    val all = re.findAllMatchIn(s).toVector
    if (all.isEmpty || all.map(_.matched).mkString != s) return None
    val scale = Map("ns" -> 1L, "us" -> 1000L, "ms" -> 1000000L, "s" -> 1000000000L,
      "m" -> 60000000000L, "h" -> 3600000000000L, "d" -> 86400000000000L,
      "w" -> 604800000000000L, "y" -> 31536000000000000L)
    var total = 0L
    for (m <- all) {
      val unit = scale(m.group(2))
      val num = m.group(1)
      if (num.contains('.')) total += math.round(num.toDouble * unit)
      else total += num.toLong * unit
    }
    Some(if (negative) -total else total)
  }

  /** Flexible date parse (the reference uses araddon/dateparse.ParseAny). */
  private[functions] def parseTimeNs(s: String): Option[Long] = {
    import java.time._
    import java.time.format.DateTimeFormatter
    def ok(ns: => Long): Option[Long] = try Some(ns) catch { case _: Exception => None }
    // ISO instant / offset forms ("+0100" normalized to "+01:00")
    val norm = s.replaceAll("([+-]\\d{2})(\\d{2})$", "$1:$2")
    ok {
      val i = Instant.parse(norm)
      i.getEpochSecond * 1000000000L + i.getNano
    }.orElse(ok {
      val o = OffsetDateTime.parse(norm, DateTimeFormatter.ISO_OFFSET_DATE_TIME)
      o.toEpochSecond * 1000000000L + o.getNano
    }).orElse(ok {
      val l = LocalDateTime.parse(s, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
      l.toEpochSecond(ZoneOffset.UTC) * 1000000000L + l.getNano
    }).orElse(ok {
      LocalDate.parse(s, DateTimeFormatter.ISO_LOCAL_DATE)
        .atStartOfDay(ZoneOffset.UTC).toEpochSecond * 1000000000L
    }).orElse {
      // loose formats, CASE-INSENSITIVE ("oct 7, 1970", "3:27pm") — the
      // reference uses a fuzzy parser (dateparse.ParseAny, cast.go:219)
      def fmt(p: String) = new java.time.format.DateTimeFormatterBuilder()
        .parseCaseInsensitive().appendPattern(p)
        .toFormatter(java.util.Locale.US)
      val dates = Seq("M/d/yyyy", "M-d-yyyy", "MMM d, yyyy", "d MMM yyyy",
        "MMMM d, yyyy")
      dates.view.flatMap { f =>
        ok(LocalDate.parse(s, fmt(f))
          .atStartOfDay(ZoneOffset.UTC).toEpochSecond * 1000000000L).toSeq
      }.headOption.orElse {
        val dateTimes = Seq("d MMM yyyy HH:mm", "d MMM yyyy HH:mm:ss",
          "M/d/yyyy HH:mm:ss", "M/d/yyyy HH:mm",
          "M/d/yyyy h:mma", "M/d/yyyy h:mm:ssa",
          "MMM d, yyyy h:mm:ss a", "MMM d, yyyy h:mm a",
          "MMMM d, yyyy h:mm:ss a", "MMMM d, yyyy h:mm a",
          "EEE, d MMM yyyy HH:mm:ss zzz", "EEE MMM d HH:mm:ss yyyy",
          "yyyy-MM-dd HH:mm:ss")
        dateTimes.view.flatMap { f =>
          ok(LocalDateTime.parse(s, fmt(f))
            .toEpochSecond(ZoneOffset.UTC) * 1000000000L).toSeq
        }.headOption
      }
    }
  }

  /** Re-claim the declared zed type over a value parsed from UNDECORATED
    * zson text (the Column-level render drops decorators): restores int
    * widths, named wrappers, durations, sets — without changing values.
    */
  def adopt(v: ZValue, t: ZType): ZValue = t match {
    case n @ Named(_, inner) => VTyped(unwrap(adopt(v, inner)), n)
    case Rec(fs) => unwrap(v) match {
      case VRec(vfs) =>
        VRec(vfs.flatMap { case (name, fv) =>
          fs.find(_._1 == name) match {
            case Some((_, ft)) => Some(name -> adopt(fv, ft))
            // fields not in the declared shape are fused-frame artifacts
            // when null; keep them when they carry a value (operator-added)
            case None => if (isNullV(fv)) None else Some(name -> fv)
          }
        })
      case other => other
    }
    case Arr(e) => unwrap(v) match {
      case VArr(items, _) => VArr(items.map(adopt(_, e)), false)
      case other => other
    }
    case SetT(e) => unwrap(v) match {
      case VArr(items, _) => VArr(normSet(items.map(adopt(_, e))), true)
      case other => other
    }
    case MapT(k, x) => unwrap(v) match {
      case VMap(es) => VMap(es.map { case (ek, ev) => (adopt(ek, k), adopt(ev, x)) })
      case other => other
    }
    case Prim(p) => unwrap(v) match {
      case VNull(_) => VNull(t)
      case VInt(n, _) => p match {
        case "uint64" => VUint64(BigDecimal(n))
        case "duration" => VDur(n)
        case "time" => VTime(n)
        case x if x.startsWith("int") || x.startsWith("uint") => VInt(n, x)
        case x if x.startsWith("float") => VFloat(n.toDouble, x)
        case _ => VInt(n, "int64")
      }
      case VFloat(d, _) => p match {
        case x if x.startsWith("float") => VFloat(d, x)
        case _ => VFloat(d, "float64")
      }
      case VStr(s) => p match {
        case "ip" => VIp(s)
        case "net" => ZValue.netOf(s)
        case "type" => VTypeVal(s)
        case _ => VStr(s)
      }
      case other => other
    }
    case e: EnumT => unwrap(v) match {
      case VEnum(s) => VTyped(VEnum(s), e)
      case VStr(s) => VTyped(VEnum(s), e)
      case other => other
    }
    case _ => v
  }

  /** The shaper as a Spark UDF over zson-text interchange (the ZvOps
    * pattern): subject text + per-row input type text + target type text
    * → variant. Target "=name" means a named-type cast (cast.go
    * casterNamedType); otherwise the target parses as a type.
    */
  def shaperUdf(tf: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(
      (text: String, inT: String, outT: String) => shapeText(tf, text, inT, outT))

  def shapeText(
      tf: Int, text: String, inT: String, outT: String): Option[ZvOps.ZV] = {
    if (text == null) return None
    val parsed: ZValue =
      try new ZsonParser(text).parseOne()
      catch { case _: Exception => return ZvOps.zvOf(wrapErr("shaper: unparseable value", VStr(text))) }
    val inType: Option[ZType] =
      if (inT == null) None
      else try Some(new ZsonParser(inT).parseTypeText()) catch { case _: Exception => None }
    // bare-value streams carry the value in a `this` field (other fields
    // in the parsed record are fused-frame artifacts of sibling shapes)
    val subject0 = (inType.map(strip), unwrap(parsed)) match {
      case (Some(t), VRec(fs)) if !t.isInstanceOf[Rec] && fs.exists(_._1 == "this") =>
        fs.find(_._1 == "this").get._2
      case _ => parsed
    }
    val subject = inType.map(adopt(subject0, _)).getOrElse(subject0)
    if (outT == null)
      return ZvOps.zvOf(wrapErr("shaper type argument is not a type", subject))
    val result: ZValue =
      if (outT.startsWith("=")) {
        if (tf == CastF) castNamed(subject, outT.substring(1))
        else wrapErr("shaper type argument is not a type", subject)
      } else if (tf == CastF && outT.matches("[A-Za-z_][A-Za-z0-9_]*") &&
          !ZShaper.primTypeNames(outT)) {
        // a bare NON-primitive name NAMES the subject's own type
        // (cast.md: cast(this, "foo") -> {a:1,b:2}(=foo)); the zson
        // parser would otherwise read it as an unknown primitive
        castNamed(subject, outT)
      } else {
        try reshape(tf, subject, new ZsonParser(outT).parseTypeText())
        catch {
          case _: Exception =>
            if (tf == CastF && outT.matches("[A-Za-z_][A-Za-z0-9_]*"))
              castNamed(subject, outT)
            else wrapErr("shaper type argument is not a type", subject)
        }
      }
    ZvOps.zvOf(result)
  }

  def castPrim(v0: ZValue, out: ZType): ZValue = {
    val v = unwrap(v0)
    val p = under(out) match {
      case Prim(n) => n
      case other => return wrapErr(s"cannot cast to ${text(other)}", v0)
    }
    def fail: ZValue = wrapErr(s"cannot cast to $p", v0)
    val intBounds = Map(
      "int8" -> (Byte.MinValue.toLong, Byte.MaxValue.toLong),
      "int16" -> (Short.MinValue.toLong, Short.MaxValue.toLong),
      "int32" -> (Int.MinValue.toLong, Int.MaxValue.toLong))
    val uintBounds = Map(
      "uint8" -> 255L, "uint16" -> 65535L, "uint32" -> 4294967295L)
    p match {
      case "bool" => toBoolOpt(v).map(VBool(_)).getOrElse(fail)
      case "int8" | "int16" | "int32" | "int64" =>
        toIntOpt(v) match {
          case Some(n) =>
            intBounds.get(p) match {
              case Some((lo, hi)) if n < lo || n > hi => fail
              case _ => VInt(n, p)
            }
          case None => fail
        }
      case "uint8" | "uint16" | "uint32" =>
        toUintOpt(v) match {
          case Some(n) if n <= uintBounds(p) => VInt(n.toLong, p)
          case _ => fail
        }
      case "uint64" => toUintOpt(v).map(VUint64(_)).getOrElse(fail)
      case "float16" => toFloatOpt(v).map(d => VFloat(toF16(d), "float16")).getOrElse(fail)
      case "float32" => toFloatOpt(v).map(d => VFloat(d.toFloat.toDouble, "float32")).getOrElse(fail)
      case "float64" => toFloatOpt(v).map(VFloat(_, "float64")).getOrElse(fail)
      case "ip" => v match {
        case VIp(_) => v
        case VStr(s) =>
          if (graft.functions.ZedFunctions.isIpText(s)) VIp(s) else fail
        case _ => fail
      }
      case "net" => v match {
        case VNet(_) => v
        case VStr(s) =>
          val i = s.lastIndexOf('/')
          if (i > 0 && graft.functions.ZedFunctions.isIpText(s.substring(0, i)) &&
              s.substring(i + 1).forall(_.isDigit)) ZValue.netOf(s)
          else fail
        case _ => fail
      }
      case "duration" => v match {
        case VDur(_) => v
        case VStr(s) =>
          parseDurNs(s) match {
            case Some(ns) => VDur(ns)
            case None =>
              try VDur(math.round(s.toDouble)) catch { case _: Exception => fail }
          }
        case VFloat(d, _) => VDur(math.round(d))
        case _ => toIntOpt(v).map(VDur(_)).getOrElse(fail)
      }
      case "time" => v match {
        case VTime(_) => v
        case VStr(s) =>
          parseTimeNs(s) match {
            case Some(ns) => VTime(ns)
            case None =>
              try VTime(math.round(s.toDouble)) catch { case _: Exception => fail }
          }
        case _ if toFloatOpt(v).isDefined || toIntOpt(v).isDefined =>
          v match {
            case VFloat(d, _) => VTime(math.round(d))
            case _ => toIntOpt(v).map(VTime(_)).getOrElse(fail)
          }
        case _ => fail
      }
      case "string" => v match {
        case VBytes(b) =>
          val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
          // validity check: re-encoding must reproduce the bytes
          if (java.util.Arrays.equals(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), b))
            VStr(s)
          else wrapErr("cannot cast to string: invalid UTF-8", v0)
        case VEnum(sym) => VStr(sym)
        case VStr(s) => VStr(s)
        case VIp(s) => VStr(s)
        case VNet(s) => VStr(s)
        case VTypeVal(t) => VStr(t)
        case other => VStr(zsonText(other))
      }
      case "bytes" => v match {
        case VBytes(_) => v
        case VStr(s) => VBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case _ => fail
      }
      case "type" => v match {
        case VTypeVal(_) => v
        case VStr(s) =>
          // casterType: the string must parse as a zson TYPE VALUE
          (try Some(new ZsonParser(s).parseOne()) catch { case _: Exception => None }) match {
            case Some(tv @ VTypeVal(_)) => tv
            case _ => fail
          }
        case _ => fail
      }
      case _ => fail
    }
  }
}
