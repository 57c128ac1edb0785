package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type introspection + record/structural functions + the shaper
  * (reference: runtime/sam/expr/function/types.go, fields.go, flatten.go,
  * unflatten.go, nestdotted.go; shaper core runtime/sam/expr/shaper.go:19-44
  * — Cast/Crop/Fill/Order compose as a bitmask, mirrored by ShapeFlags).
  *
  * In a relational frame types live in the schema, so the typeof family is
  * COMPILE-TIME: each function inspects the DataFrame's StructType and
  * emits literals/projections — zero runtime cost, exactly how zed's
  * semantic pass folds typeof over known types.
  */
object Shaper {

  /** Spark DataType → zed type syntax (docs/formats/zson.md type decorators). */
  def zedTypeOf(dt: DataType): String = dt match {
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case _: DecimalType => "decimal"
    case StringType => "string"
    case BooleanType => "bool"
    case BinaryType => "bytes"
    case TimestampType | TimestampNTZType | DateType => "time"
    case _: DayTimeIntervalType => "duration"
    case NullType => "null"
    case ArrayType(e, _) => s"[${zedTypeOf(e)}]"
    case MapType(k, v, _) => s"|{${zedTypeOf(k)}:${zedTypeOf(v)}}|"
    case StructType(fields) =>
      // a field-level zed-type marker (set-ness, uint64, type values)
      // overrides the relational carrier's type
      fields.map { f =>
        val t =
          if (f.metadata.contains("graft.zedType")) f.metadata.getString("graft.zedType")
          else zedTypeOf(f.dataType)
        s"${f.name}:$t"
      }.mkString("{", ",", "}")
    case other => other.simpleString
  }

  /** zed `typeof(this)` for a whole frame — a type-value literal. */
  def typeofRow(df: DataFrame): Column = lit(zedTypeOf(df.schema))

  /** zed `typeof(field)` — plan-time lookup. */
  def typeof(df: DataFrame, field: String): Column =
    lit(zedTypeOf(fieldType(df.schema, field)))

  /** zed `kind(e)` — "record" | "array" | "set" | "map" | "union" |
    * "enum" | "error" | "primitive".
    */
  def kind(df: DataFrame, field: String): Column = lit(fieldType(df.schema, field) match {
    case _: StructType => "record"
    case _: ArrayType => "array"
    case _: MapType => "map"
    case _ => "primitive"
  })

  /** zed `has(field)` / `missing(field)` — plan-time schema membership. */
  def has(df: DataFrame, field: String): Column =
    lit(resolve(df.schema, field).isDefined)
  def missing(df: DataFrame, field: String): Column =
    lit(resolve(df.schema, field).isEmpty)

  /** zed `fields(r)` — array of field-name paths of a record type. */
  def fieldsOf(df: DataFrame): Column = {
    val paths = leafPaths(df.schema, Nil)
    array(paths.map(p => array(p.map(lit): _*)): _*)
  }

  private def resolve(schema: StructType, path: String): Option[StructField] = {
    val parts = path.split("\\.").toList
    def go(st: StructType, ps: List[String]): Option[StructField] = ps match {
      case Nil => None
      case p :: Nil => st.fields.find(_.name == p)
      case p :: rest => st.fields.find(_.name == p).flatMap(_.dataType match {
        case s: StructType => go(s, rest)
        case _ => None
      })
    }
    go(schema, parts).orElse {
      // a bare-value frame carries the row as a single `this` struct —
      // paths address its fields implicitly (over-a-record output)
      schema.fields.find(_.name == "this").map(_.dataType) match {
        case Some(st: StructType) if !parts.headOption.contains("this") =>
          go(st, parts)
        case _ => None
      }
    }
  }

  private def fieldType(schema: StructType, path: String): DataType =
    resolve(schema, path)
      .getOrElse(throw new IllegalArgumentException(s"no such field: $path"))
      .dataType

  private def leafPaths(st: StructType, prefix: Seq[String]): Seq[Seq[String]] =
    st.fields.toSeq
      .filterNot(f => prefix.isEmpty &&
        (f.name == "__type" || f.metadata.contains("graft.scopeVar")))
      .flatMap { f =>
        f.dataType match {
          // a variant struct is a LEAF value, not a record to walk into
          case s: StructType if graft.sources.ZsonIO.isVariantType(s) =>
            Seq(prefix :+ f.name)
          case s: StructType => leafPaths(s, prefix :+ f.name)
          case _ => Seq(prefix :+ f.name)
        }
      }

  // ---- flatten / unflatten / nest_dotted ------------------------------------

  /** zed `flatten(r)` — [{key:[path…],value:…}] over the record's leaves.
    * Uniformly-typed leaves keep their native type; mixed leaves box into
    * the variant encoding (zed uses a union type — function/flatten.go).
    */
  def flattenCol(df: DataFrame): Column = flattenCol(df, None)

  def flattenCol(df: DataFrame, base: Option[Seq[String]]): Column = {
    import org.apache.spark.sql.types.{StructType, DataType}
    val het = graft.operators.Het
    def subSchema(st: StructType, path: Seq[String]): StructType =
      path.foldLeft(st)((s, p) => s(p).dataType.asInstanceOf[StructType])
    val rootSchema = subSchema(
      StructType(df.schema.fields.filterNot(f =>
        f.name == het.typeTag || f.metadata.contains("graft.scopeVar"))),
      base.getOrElse(Nil))
    val prefix = base.map(_.mkString(".") + ".").getOrElse("")
    val leaves: Seq[(Seq[String], DataType)] =
      leafPaths(rootSchema, Nil).map { p =>
        val dt = p.foldLeft(rootSchema: DataType)((s, n) =>
          s.asInstanceOf[StructType](n).dataType)
        (p, dt)
      }
    val uniform = leaves.map(_._2).distinct.length <= 1
    val entries = leaves.map { case (p, dt) =>
      val c = col(prefix + p.mkString("."))
      struct(
        array(p.map(lit): _*).as("key"),
        (if (uniform) c
         else if (graft.sources.ZsonIO.isVariantType(dt)) c
         else het.variant(c, dt)).as("value"))
    }
    array(entries: _*)
  }

  /** DataFrame-level flatten: nested structs → dotted top-level columns
    * (the practical unnesting form; pairs with nestDotted as its inverse).
    */
  def flattenDotted(df: DataFrame): DataFrame = {
    val cols = leafPaths(df.schema, Nil).map { p =>
      col(p.mkString(".")).as(p.mkString("."))
    }
    df.select(cols: _*)
  }

  /** zed `nest_dotted(r)` — group dotted column names into structs:
    * {"a.b": 1, "a.c": 2, "d": 3} → {a: {b: 1, c: 2}, d: 3}.
    */
  def nestDotted(df: DataFrame): DataFrame = {
    // backtick-quote so a literal dotted column name is not parsed as a path
    def raw(name: String): Column = col(s"`$name`")
    def build(names: Seq[(List[String], String)]): Seq[Column] = {
      // preserve first-appearance order of heads
      val heads = names.map(_._1.head).distinct
      heads.map { h =>
        val group = names.filter(_._1.head == h)
        if (group.length == 1 && group.head._1.tail.isEmpty)
          raw(group.head._2).as(h)
        else {
          val inner = build(group.map { case (ps, orig) =>
            (if (ps.tail.isEmpty) List(ps.head) else ps.tail, orig)
          }.filter(_._1.nonEmpty))
          struct(inner: _*).as(h)
        }
      }
    }
    val named = df.columns.toSeq.map(c => (c.split("\\.").toList, c))
    df.select(build(named): _*)
  }

  // ---- the shaper: cast / crop / fill / order --------------------------------

  /** Shaper primitive bitmask (reference shaper.go:19-44). */
  final case class ShapeFlags(
      cast: Boolean = false,
      crop: Boolean = false,
      fill: Boolean = false,
      order: Boolean = false)

  object ShapeFlags {
    // shape = cast + fill + order, NOT crop (shaper.go NewShaperTransform:40
    // — extra input fields are kept, appended after the target's)
    val shape: ShapeFlags = ShapeFlags(cast = true, fill = true, order = true)
  }

  /** Reshape a frame toward a target record type:
    *  - crop:  drop source fields absent from target
    *  - fill:  add target fields absent from source as typed nulls
    *  - order: arrange common fields in target order (extras last)
    *  - cast:  convert primitive leaf types to the target's
    * Composable exactly like zed's shaper ops; `shapeTo` = all four.
    */
  def reshape(df: DataFrame, target: StructType, flags: ShapeFlags): DataFrame =
    df.select(reshapeStruct(None, df.schema, target, flags): _*)

  def castTo(df: DataFrame, t: StructType): DataFrame = reshape(df, t, ShapeFlags(cast = true))
  def cropTo(df: DataFrame, t: StructType): DataFrame = reshape(df, t, ShapeFlags(crop = true))
  def fillTo(df: DataFrame, t: StructType): DataFrame = reshape(df, t, ShapeFlags(fill = true))
  def orderTo(df: DataFrame, t: StructType): DataFrame = reshape(df, t, ShapeFlags(order = true))
  def shapeTo(df: DataFrame, t: StructType): DataFrame = reshape(df, t, ShapeFlags.shape)

  /** Expression-level access for the language compiler (yield shape(<t>)…). */
  private[graft] def reshapeCols(
      parent: Option[Column],
      src: StructType,
      target: StructType,
      flags: ShapeFlags
  ): Seq[Column] = reshapeStruct(parent, src, target, flags)

  /** Parse zed type syntax to a Spark DataType: records {a:t,…}, arrays
    * [t], sets |[t]|, maps |{k:v}|, primitive names. Unions and other
    * forms return None.
    */
  def parseZedType(text: String): Option[DataType] = {
    // a top-level `name=` named-type wrapper doesn't change the Spark
    // type — strip it so the width-exact legacy scanner still engages
    // (typedefs now carry their name, e.g. "money=decimal(18,2)")
    var bare = text
    while (bare.matches("^[A-Za-z_][A-Za-z0-9_.]*=[^=].*"))
      bare = bare.substring(bare.indexOf('=') + 1)
    // legacy scanner first (width-exact int types); the full ZSON type
    // grammar (named types, unions, enums, errors) catches the rest
    parseZedTypeLegacy(bare).orElse {
      try Some(graft.sources.ZValue.sparkTypeOf(
        graft.sources.ZsonParser.parseType(text)))
      catch { case _: Exception => None }
    }
  }

  private def parseZedTypeLegacy(text: String): Option[DataType] = {
    val prims = Map(
      "int8" -> ByteType, "int16" -> ShortType, "int32" -> IntegerType,
      "int64" -> LongType, "uint8" -> ShortType, "uint16" -> IntegerType,
      "uint32" -> LongType, "uint64" -> DecimalType(20, 0),
      "float16" -> FloatType, "float32" -> FloatType, "float64" -> DoubleType,
      "string" -> StringType, "bool" -> BooleanType, "bytes" -> BinaryType,
      "time" -> TimestampType, "duration" -> LongType,
      "ip" -> StringType, "net" -> StringType, "null" -> NullType)
    var i = 0
    val s = text.replaceAll("\\s+", "")
    def peekCh: Char = if (i < s.length) s.charAt(i) else '\u0000'
    def ident(): String = {
      val st = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      s.substring(st, i)
    }
    def typ(): Option[DataType] = peekCh match {
      case '{' =>
        i += 1
        val fields = Vector.newBuilder[StructField]
        var ok = true
        while (ok && peekCh != '}') {
          val name = ident()
          if (peekCh != ':') ok = false
          else {
            i += 1
            typ() match {
              case Some(dt) => fields += StructField(name, dt)
              case None => ok = false
            }
            if (peekCh == ',') i += 1
          }
        }
        if (ok && peekCh == '}') { i += 1; Some(StructType(fields.result())) } else None
      case '[' =>
        i += 1
        val inner = typ()
        if (peekCh == ']') { i += 1; inner.map(ArrayType(_)) } else None
      case '|' =>
        if (s.startsWith("|[", i)) {
          i += 2
          val inner = typ()
          if (s.startsWith("]|", i)) { i += 2; inner.map(ArrayType(_)) } else None
        } else if (s.startsWith("|{", i)) {
          i += 2
          val k = typ()
          if (peekCh != ':') None
          else {
            i += 1
            val v = typ()
            if (s.startsWith("}|", i)) {
              i += 2
              for (kt <- k; vt <- v) yield MapType(kt, vt)
            } else None
          }
        } else None
      case c if c.isLetter =>
        val name = ident()
        if (s.startsWith("(", i) && name == "decimal") {
          // decimal(p,s)
          val close = s.indexOf(')', i)
          val ps = s.substring(i + 1, close).split(",").map(_.trim.toInt)
          i = close + 1
          Some(DecimalType(ps(0), ps(1)))
        } else prims.get(name)
      case _ => None
    }
    val r = typ()
    if (i == s.length) r else None
  }

  /** Reshape a lambda element (arrays of records inside shapes). */
  private def reshapeElem(
      x: Column, src: StructType, target: StructType, flags: ShapeFlags): Seq[Column] = {
    val targetIdx = target.fields.zipWithIndex.map { case (f, i) => f.name -> i }.toMap
    val common = src.fields.toSeq.flatMap { sf =>
      targetIdx.get(sf.name).map { i =>
        val tf = target.fields(i)
        val c = (sf.dataType, tf.dataType) match {
          case (s: StructType, t: StructType) =>
            struct(reshapeElem(x.getField(sf.name), s, t, flags): _*)
          case (s, t) if flags.cast && s != t => x.getField(sf.name).cast(t)
          case _ => x.getField(sf.name)
        }
        (i, c.as(sf.name))
      }
    }
    val extras = src.fields.toSeq.filterNot(f => targetIdx.contains(f.name))
      .map(f => x.getField(f.name).as(f.name))
    val srcNames = src.fieldNames.toSet
    val filled =
      if (flags.fill)
        target.fields.toSeq.filterNot(f => srcNames(f.name))
          .map(f => (targetIdx(f.name), lit(null).cast(f.dataType).as(f.name)))
      else Nil
    val keptExtras = if (flags.crop) Nil else extras
    if (flags.order) (common ++ filled).sortBy(_._1).map(_._2) ++ keptExtras
    else common.map(_._2) ++ keptExtras ++ filled.map(_._2)
  }

  private def reshapeStruct(
      parent: Option[Column],
      src: StructType,
      target: StructType,
      flags: ShapeFlags
  ): Seq[Column] = {
    def colOf(name: String): Column =
      parent.map(_.getField(name)).getOrElse(col(name))
    def one(sf: StructField, tf: StructField): Column = (sf.dataType, tf.dataType) match {
      case (s: StructType, t: StructType) =>
        struct(reshapeStruct(Some(colOf(sf.name)), s, t, flags): _*).as(sf.name)
      case (ArrayType(s: StructType, _), ArrayType(t: StructType, _)) =>
        // shaping applies to ELEMENTS of arrays/sets (shaper.go steps)
        transform(colOf(sf.name), x =>
          struct(reshapeElem(x, s, t, flags): _*)).as(sf.name)
      case (s, t) if flags.cast && s != t => colOf(sf.name).cast(t).as(sf.name)
      case _ => colOf(sf.name).as(sf.name)
    }
    val targetIdx = target.fields.zipWithIndex.map { case (f, i) => f.name -> i }.toMap
    val common = src.fields.toSeq.flatMap { sf =>
      targetIdx.get(sf.name).map(i => (i, one(sf, target.fields(i))))
    }
    val extras = src.fields.toSeq
      .filterNot(f => targetIdx.contains(f.name))
      .map(f => colOf(f.name).as(f.name))
    val srcNames = src.fieldNames.toSet
    val filled =
      if (flags.fill)
        target.fields.toSeq.filterNot(f => srcNames(f.name))
          .map(f => (targetIdx(f.name), lit(null).cast(f.dataType).as(f.name)))
      else Nil
    val keptExtras = if (flags.crop) Nil else extras
    if (flags.order)
      (common ++ filled).sortBy(_._1).map(_._2) ++ keptExtras
    else
      common.map(_._2) ++ keptExtras ++ filled.map(_._2)
  }
}
