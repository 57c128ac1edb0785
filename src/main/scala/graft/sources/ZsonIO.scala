package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ZSON text format read/write (reference: docs/formats/zson.md, zio/zsonio/).
  *
  * Writer: a schema-driven Catalyst Column — every value formats via
  * built-in string expressions (whole-stage codegen, fully distributed; no
  * UDFs, no driver formatting). Implied types (zson.md §2.3.1) keep output
  * minimal: int64/float64/string/bool/time/null carry no decorator; narrower
  * numerics get `(int32)`-style decorators.
  *
  * Reader: per-line ZSON → JSON text conversion in mapPartitions (text
  * parsing is inherently row-wise — same cost class as any text source),
  * then Spark's distributed JSON reader does schema inference/parse. Type
  * decorators are consumed and dropped; sets and maps land as arrays and
  * records.
  */
object ZsonIO {

  // ---- writer ----------------------------------------------------------------

  private def escape(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")

  /** True when a struct type is the Het variant encoding (compare by
    * field names — nullability may drift through operators).
    */
  def isVariantType(dt: DataType): Boolean = dt match {
    case st: StructType =>
      st.fieldNames.sameElements(graft.operators.Het.variantType.fieldNames)
    case _ => false
  }

  /** Format one column as ZSON text (recursive over the data type). */
  def zsonOf(c: Column, dt: DataType): Column = {
    val formatted: Column = dt match {
      case st: StructType if isVariantType(st) => graft.operators.Het.render(c)
      case StringType => concat(lit("\""), escape(c), lit("\""))
      case LongType => c.cast(StringType)
      case IntegerType => concat(c.cast(StringType), lit(" (int32)"))
      case ShortType => concat(c.cast(StringType), lit(" (int16)"))
      case ByteType => concat(c.cast(StringType), lit(" (int8)"))
      case DoubleType =>
        // float64 is implied by a decimal point (zson.md §2.3.1): integral
        // doubles print with a trailing dot; non-finite as zed's
        // NaN/+Inf/-Inf spellings; the rest in Go strconv 'g' form
        // (1.52e+09, not Java's 1.52E9)
        when(isnan(c), lit("NaN"))
          .when(c === lit(Double.PositiveInfinity), lit("+Inf"))
          .when(c === lit(Double.NegativeInfinity), lit("-Inf"))
          .when(c === floor(c) && abs(c) < 1e15,
            concat(c.cast(LongType).cast(StringType), lit(".")))
          .otherwise(graft.functions.Bridge.column(graft.functions.GoFloatText(graft.functions.Bridge.expression(c))))
      case FloatType =>
        concat(when(isnan(c), lit("NaN"))
          .when(c === lit(Float.PositiveInfinity), lit("+Inf"))
          .when(c === lit(Float.NegativeInfinity), lit("-Inf"))
          .when(c.cast(DoubleType) === floor(c.cast(DoubleType)) && abs(c) < 1e7,
            concat(c.cast(LongType).cast(StringType), lit(".")))
          .otherwise(graft.functions.Bridge.column(graft.functions.GoFloatText(graft.functions.Bridge.expression(c)))), lit(" (float32)"))
      case dt: DecimalType if dt.precision == 20 && dt.scale == 0 =>
        // the full-range uint64 carrier: exact digits + its zed decorator
        concat(c.cast(StringType), lit("(uint64)"))
      case _: DecimalType => concat(c.cast(StringType), lit(" (float64)"))
      case BooleanType => c.cast(StringType)
      case TimestampType | TimestampNTZType =>
        // zed trims trailing fraction zeros (and the dot when zero) —
        // 00:00:00.000000Z renders 00:00:00Z (zson time format)
        regexp_replace(
          date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"), "\\.?0*Z$", "Z")
      case DateType => date_format(c, "yyyy-MM-dd'T'00:00:00'Z'")
      case BinaryType => concat(lit("0x"), lower(hex(c)))
      case ArrayType(et, _) =>
        concat(lit("["),
          array_join(transform(c, x => zsonOf(x, et)), ","),
          lit("]"))
      case MapType(kt, vt, _) =>
        concat(lit("|{"),
          array_join(transform(map_entries(c), e =>
            concat(zsonOf(e.getField("key"), kt), lit(":"),
              zsonOf(e.getField("value"), vt))), ","),
          lit("}|"))
      case st: StructType =>
        concat(lit("{"),
          concat_ws(",", st.fields.toIndexedSeq.map { f =>
            concat(lit(zsonName(f.name) + ":"), zsonOf(c.getField(f.name), f.dataType))
          }: _*),
          lit("}"))
      case NullType => lit("null")
      case other => concat(lit("\""), escape(c.cast(StringType)), lit("\""))
    }
    when(c.isNull, lit("null")).otherwise(formatted)
  }

  private val identRe = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private val timeLitRe =
    """\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?)?""".r
  // IPv6 literals contain ':' — must lex greedily before the scalar stop
  // set. Shape: hex groups separated by ':' (empty group = '::'), needing
  // either a '::' or a full 8-group form to qualify.
  private val ip6Re =
    """[0-9a-fA-F]{0,4}(:[0-9a-fA-F]{0,4}){2,7}(/\d{1,3})?""".r
  private def zsonName(n: String): String =
    if (identRe.matches(n)) n else "\"" + n.replace("\"", "\\\"") + "\""

  /** zed-type-aware zson rendering: the optional ZType refines the
    * Spark carrier (sets vs arrays, durations/time on longs, type
    * values, decorators). Public: boxing and writers reuse it.
    */
  /** Does a type need the per-value ZsonFormatter at the output boundary?
    * Unions (member resolution) and named types (per-value typedef state)
    * can't decorate through the codegen'd column renderer.
    */
  private[sources] def needsFormatter(t: ZType): Boolean = t match {
    case ZType.Named(_, _) => true
    case ZType.Union(_) => true
    case ZType.EnumT(_) => true // %sym never implies the symbol list
    case ZType.Rec(fs) => fs.exists { case (_, ft) => needsFormatter(ft) }
    case ZType.Arr(e) => needsFormatter(e)
    case ZType.SetT(e) => needsFormatter(e)
    case ZType.MapT(k, v) => needsFormatter(k) || needsFormatter(v)
    case ZType.ErrT(i) => needsFormatter(i)
    case _ => false
  }

  def zsonOfTyped(c: Column, dt: DataType, zt: Option[ZType]): Column =
    zsonOfTyped(c, dt, zt, top = false)

  /** `top`: a TOP-LEVEL value decorates like formatter.go FormatValue —
    * empty containers of an implied type stay bare (`[]`), while nested
    * fields decorate them like nulls (formatVector's nullish rule).
    */
  def zsonOfTyped(c: Column, dt: DataType, zt: Option[ZType], top: Boolean): Column = {
    val base = zsonOfTyped0(c, dt, zt)
    zt match {
      // a typed NULL riding a variant carrier still decorates (null(int64));
      // non-null variant values render canonically (decorWrap re-formats
      // union/named shapes at the output boundary)
      case Some(t) if isVariantType(dt) =>
        val stripped = ZType.strip(t)
        if (stripped == ZType.Prim("null")) base
        else {
          // a non-implied primitive keeps its width decorator even on the
          // variant carrier (glob-mul: {s:7(int32)} after a variant
          // filter); null variants decorate with the full type
          val primDecor = stripped match {
            case ZType.Prim(p) => Set("uint8", "uint16", "uint32", "uint64",
              "int8", "int16", "int32", "float16", "float32")(p)
            case _ => false
          }
          // a null variant may be a present carrier with empty slots —
          // test the rendered text, not just column nullness
          val nullCase = when(c.isNull || base.isNull || base === lit("null"),
            lit(s"null(${ZType.fullText(t)})"))
          if (primDecor)
            nullCase.otherwise(concat(base, lit(s"(${ZType.fullText(t)})")))
          else nullCase.otherwise(base)
        }
      case Some(t) =>
        val stripped = ZType.strip(t)
        val txt = ZType.fullText(t)
        // non-implied primitives carry their decorator (zson spec:
        // 371(uint16)); every typed null is decorated (null(string))
        val nonImplied = stripped match {
          // uint64 on the exact decimal carrier self-decorates in zsonOf
          case ZType.Prim("uint64") => !dt.isInstanceOf[DecimalType]
          case ZType.Prim(p) => Set("uint8", "uint16", "uint32",
            "int8", "int16", "int32", "float16", "float32")(p)
          case _ => false
        }
        val named = txt.contains('=') && (stripped match {
          case ZType.Prim(_) => true
          case _ => false
        })
        // a named type over a self-describing value uses the abbreviated
        // `(=name)` typedef (zson/formatter.go decorate / SelfDescribing)
        val namedSelf = t match {
          case ZType.Named(n, _) if ZType.selfDescribing(t) => Some(n)
          case _ => None
        }
        namedSelf match {
          case Some(n) =>
            when(c.isNull, lit(s"null($txt)"))
              .otherwise(concat(base, lit(s"(=$n)")))
          case None =>
            if (nonImplied || named)
              when(c.isNull, lit(s"null($txt)")).otherwise(concat(base, lit(s"($txt)")))
            else stripped match {
              case ZType.Prim("null") => base
              case _: ZType.EnumT => base // %sym form carries no null deco
              // an EMPTY container cannot imply its type — it decorates
              // like a null (zson/formatter.go formatVector null return)
              case (ZType.Arr(_) | ZType.SetT(_)) if dt.isInstanceOf[ArrayType] =>
                if (top && ZType.implied(stripped))
                  when(c.isNull, lit(s"null($txt)")).otherwise(base)
                else when(c.isNull, lit(s"null($txt)"))
                  .when(size(c) === 0, concat(base, lit(s"($txt)")))
                  .otherwise(base)
              case ZType.MapT(_, _) if dt.isInstanceOf[MapType] =>
                if (top && ZType.implied(stripped))
                  when(c.isNull, lit(s"null($txt)")).otherwise(base)
                else when(c.isNull, lit(s"null($txt)"))
                  .when(size(map_keys(c)) === 0, concat(base, lit(s"($txt)")))
                  .otherwise(base)
              case _ => when(c.isNull, lit(s"null($txt)")).otherwise(base)
            }
        }
      case _ => base
    }
  }

  private def zsonOfTyped0(c: Column, dt: DataType, zt: Option[ZType]): Column =
    (dt, zt.map(ZType.strip)) match {
      case (LongType, Some(ZType.Prim("duration"))) =>
        when(c.isNull, lit("null")).otherwise(concat(c.cast(StringType), lit("ns")))
      case (LongType, Some(ZType.Prim("time"))) =>
        // ns-domain long carrier → ISO with trailing zeros trimmed
        val secs = graft.functions.Bridge.intDiv(c, lit(1000000000L))
        val frac = regexp_replace(
          lpad((c % 1000000000L).cast(StringType), 9, "0"), "0+$", "")
        when(c.isNull, lit("null")).otherwise(concat(
          date_format(timestamp_seconds(secs), "yyyy-MM-dd'T'HH:mm:ss"),
          when(frac === "", lit("")).otherwise(concat(lit("."), frac)),
          lit("Z")))
      case (StringType, Some(ZType.Prim("ip" | "net" | "time"))) =>
        // ip/net (and ISO-text time carriers, e.g. lake :objects
        // ranges) are bare in zson (no quotes)
        when(c.isNull, lit("null")).otherwise(c)
      case (StringType, Some(ZType.Prim("type"))) =>
        when(c.isNull, lit("null")).otherwise(concat(lit("<"), c, lit(">")))
      case (StringType, Some(ZType.EnumT(_))) =>
        when(c.isNull, lit("null")).otherwise(concat(lit("%"), c))
      case (st: StructType, Some(ZType.Rec(zfs))) if !isVariantType(st) =>
        // render the SHAPE's fields (in shape order): the Spark struct
        // may be a union of several nested shapes' fields, and fields
        // outside this row's shape must not surface as nulls. Fields an
        // operator added under this record (absent from the shape tag)
        // append when NON-null — concat_ws drops null legs
        val shapeNames = zfs.map(_._1).toSet
        val legs: Seq[Column] =
          zfs.collect { case (n, ft) if st.fieldNames.contains(n) =>
            concat(lit(zsonName(n) + ":"),
              zsonOfTyped(c.getField(n), st(n).dataType, Some(ft)))
          } ++ st.fields.toIndexedSeq.collect {
            case f if !shapeNames.contains(f.name) =>
              when(c.getField(f.name).isNotNull,
                concat(lit(zsonName(f.name) + ":"),
                  zsonOfTyped(c.getField(f.name), f.dataType, None)))
          }
        val inner = concat_ws(",", legs: _*)
        when(c.isNull, lit("null")).otherwise(concat(lit("{"), inner, lit("}")))
      case (ArrayType(et, _), Some(ZType.Arr(zet))) =>
        when(c.isNull, lit("null")).otherwise(concat(lit("["),
          array_join(transform(c, x => zsonOfTyped(x, et, Some(zet))), ","), lit("]")))
      case (ArrayType(et, _), Some(ZType.SetT(zet))) =>
        when(c.isNull, lit("null")).otherwise(concat(lit("|["),
          array_join(transform(c, x => zsonOfTyped(x, et, Some(zet))), ","), lit("]|")))
      case (MapType(kt, vt, _), Some(ZType.MapT(zk, zv))) =>
        // a key ending in ':' (e.g. the ip ::) needs a space before the
        // map separator (zsonio writer)
        when(c.isNull, lit("null")).otherwise(concat(lit("|{"),
          array_join(transform(map_entries(c), e => {
            val k = zsonOfTyped(e.getField("key"), kt, Some(zk))
            concat(k, when(k.endsWith(":"), lit(" ")).otherwise(lit("")),
              lit(":"), zsonOfTyped(e.getField("value"), vt, Some(zv)))
          }), ","),
          lit("}|")))
      case _ => zsonOf(c, dt)
    }

  /** Whole row → one ZSON record line (the `__type` shape tag is engine
    * metadata, not data — excluded; a bare `this` column unwraps to the
    * top-level value, zed's non-record stream form).
    *
    * On a tagged heterogeneous frame each row is re-emitted in ITS OWN
    * shape (zed output preserves per-value types): the shape decides which
    * fields exist and their order; columns added by operators after
    * ingestion (absent from every shape) are appended when non-null. The
    * dispatch is a static CASE over the distinct shapes — fully codegen'd,
    * no row-level type machinery.
    */
  def toZson(df: DataFrame): Dataset[String] = {
    val het = graft.operators.Het
    val st = df.schema
    val fields = st.fields.toIndexedSeq
      .filterNot(f => f.name == het.typeTag || f.metadata.contains("graft.scopeVar"))
    import df.sparkSession.implicits._
    // zed-type-aware formatting: durations travel as ns longs — the
    // shape tag says which longs are durations (emitted as `<ns>ns`)
    def zsonOfZ(c: Column, dt: DataType, zt: Option[ZType],
        top: Boolean = false): Column =
      ZsonIO.zsonOfTyped(c, dt, zt, top)
    def fieldFmt(f: StructField, zt: Option[ZType] = None): Column = {
      // zed types relational columns can't express (uint64 counts, sets,
      // type values) ride as field metadata from the compiler
      val zt2 = zt.orElse(
        if (f.metadata.contains("graft.zedType"))
          try Some(ZsonParser.parseType(f.metadata.getString("graft.zedType")))
          catch { case _: Exception => None }
        else None)
      val base = concat(lit(zsonName(f.name) + ":"),
        zsonOfZ(col(s"`${f.name}`"), f.dataType, zt2))
      // error("quiet") fields are OMITTED from output (cut.md quiet)
      if (isVariantType(f.dataType)) {
        val c = col(s"`${f.name}`")
        when(graft.operators.Het.isError(c) &&
          c.getField("z") === lit("\"quiet\""), lit(null).cast(StringType))
          .otherwise(base)
      } else base
    }
    def recordFmt(fs: Seq[StructField]): Column =
      concat(lit("{"), concat_ws(",", fs.map(f => fieldFmt(f)): _*), lit("}"))

    // output-boundary decorated re-format: shapes containing unions or
    // named types can't decorate through the codegen'd per-field renderer
    // (member resolution + per-value typedef state, zson/formatter.go) —
    // those rows re-format their canonical text against the shape's type
    val decorU = udf((text: String, t: String) => ZsonFormatter.formatText(text, t))
    def decorWrap(rowCol: Column, shapeText: String): Column =
      (try Some(ZsonParser.parseType(ZType.stripNullWrap(shapeText)))
       catch { case _: Exception => None }) match {
        case Some(zt) if ZsonIO.needsFormatter(zt) => decorU(rowCol, lit(shapeText))
        case _ => rowCol
      }

    val tagF = st.fields.find(_.name == het.typeTag)
    val shapes: Seq[String] = tagF
      .filter(_.metadata.contains("shapes"))
      .map(_.metadata.getStringArray("shapes").toSeq)
      .getOrElse(Seq.empty)

    // a this-only VARIANT frame renders each row from the boxed value —
    // its per-row type is runtime data (e.g. a spread over unflatten),
    // not a static shape list
    if (fields.map(_.name) == Seq("this") && isVariantType(fields.head.dataType)) {
      // writers DROP top-level error("quiet") values (function/quiet.go;
      // data-types.md: `yield quiet(x)` emits nothing for missing x)
      val v = col("this")
      val quiet = coalesce(graft.operators.Het.isError(v) &&
        v.getField("z") === lit("\"quiet\""), lit(false))
      // output boundary: re-render DECORATED from the boxed value's own
      // type (zson/formatter.go — named typedefs at first use, non-implied
      // primitives, typed nulls); canonical render is the fallback
      val decor = udf((text: String, t: String) => ZsonFormatter.formatText(text, t))
      return df.filter(v.isNull || !quiet)
        .select(when(v.isNull, lit("null"))
          .otherwise(decor(graft.operators.Het.render(v), v.getField("t")))
          .as("value")).as[String]
    }
    if (fields.map(_.name) == Seq("this") && shapes.forall(!_.startsWith("{"))) {
      // bare (non-record) value stream: the shape tag carries each row's
      // zed type — render type-aware (sets as |[…]|, ips bare, …)
      val dt = fields.head.dataType
      val metaZt =
        if (fields.head.metadata.contains("graft.zedType"))
          try Some(ZsonParser.parseType(fields.head.metadata.getString("graft.zedType")))
          catch { case _: Exception => None }
        else None
      val base = metaZt match {
        case Some(z) => zsonOfZ(col("this"), dt, Some(z), top = true)
        case None => zsonOf(col("this"), dt)
      }
      val line = shapes.foldLeft(base) { (acc, t) =>
        if (ZType.isNullWrap(t))
          // typed top-level null: the tag text IS zed's output (null(int64))
          when(col(het.typeTag) === t, lit(t)).otherwise(acc)
        else (try Some(ZsonParser.parseType(t)) catch { case _: Exception => None }) match {
          case Some(z) =>
            when(col(het.typeTag) === t,
              decorWrap(zsonOfZ(col("this"), dt, Some(z), top = true), t)).otherwise(acc)
          case None => acc
        }
      }
      return df.select(line.as("value")).as[String]
    }

    // mixed static/boxed frames (branch combines): a row whose value
    // lives in a variant `this` carrier renders FROM the carrier — but
    // ONLY when every sibling column is null on that row (carrier rows'
    // statics are union artifacts; a record FIELD named "this" always
    // has live siblings and keeps the record form)
    val carrier: Option[Column] = fields.find(f =>
      f.name == "this" && isVariantType(f.dataType) && fields.length > 1)
      .map(_ => col("this"))
    def carrierWins(c: Column): Column = carrier match {
      case Some(th) =>
        val othersNull = fields.filter(_.name != "this")
          .map(f => col(s"`${f.name}`").isNull).reduce(_ && _)
        when(th.isNotNull && othersNull, graft.operators.Het.render(th))
          .otherwise(c)
      case None => c
    }

    val default = carrierWins(recordFmt(fields))
    if (shapes.isEmpty)
      return df.select(default.as("value")).as[String]

    val inAnyShape: Set[String] = shapes.flatMap { t =>
      try ZType.strip(ZsonParser.parseType(ZType.stripNullWrap(t))) match {
        case ZType.Rec(fs) => fs.map(_._1)
        case _ => Seq("this")
      } catch { case _: Exception => fields.map(_.name) }
    }.toSet

    val line = shapes.foldLeft(default) { (acc, t) =>
      val zt =
        if (ZType.isNullWrap(t)) None // handled below: renders as tag text
        else try Some(ZType.strip(ZsonParser.parseType(t))) catch { case _: Exception => None }
      val fmt: Option[Column] =
        if (ZType.isNullWrap(t))
          // top-level typed-null record: the whole row IS null(<rec>) —
          // the tag text is exactly zed's output form
          Some(lit(t))
        else zt match {
        case Some(ZType.Rec(shapeFields)) =>
          // shape fields (in shape order, zed-typed) that survived …
          val own = shapeFields.flatMap { case (n, ft) =>
            fields.find(_.name == n).map(f => fieldFmt(f, Some(ft)))
          }
          // … plus operator-added columns, emitted when non-null (`this`
          // is the empty-record carrier on record shapes, never data)
          val added = fields.filterNot(f => inAnyShape(f.name) || f.name == "this")
            .map { f => when(col(s"`${f.name}`").isNotNull, fieldFmt(f)) }
          val row = concat(lit("{"), concat_ws(",", own ++ added: _*), lit("}"))
          // STALE shape tags (an operator renamed/dropped columns without
          // rewriting tags) must not reach the formatter — its positional
          // fallback would mislabel fields; engage only when the shape's
          // fields all exist physically and nothing was added beside them
          val shapeMatches =
            own.length == shapeFields.length && added.isEmpty
          Some(carrierWins(
            if (shapeMatches) decorWrap(row, t) else row))
        case Some(z) if fields.exists(_.name == "this") =>
          // bare (non-record) value stream row; operator-added columns
          // (e.g. a sibling branch's put) wrap into a record ONLY when
          // one is non-null on this row — else the value stays bare
          val thisF = fields.find(_.name == "this").get
          val bare = decorWrap(zsonOfZ(col("this"), thisF.dataType, Some(z), top = true), t)
          val extras = fields.filterNot(f => f.name == "this" || inAnyShape(f.name))
          if (extras.isEmpty) Some(bare)
          else {
            val anyExtra = extras.map(f => col(s"`${f.name}`").isNotNull).reduce(_ || _)
            val withExtras = concat(lit("{"), concat_ws(",",
              fieldFmt(thisF) +: extras.map(f =>
                when(col(s"`${f.name}`").isNotNull, fieldFmt(f))): _*), lit("}"))
            Some(when(anyExtra, withExtras).otherwise(bare))
          }
        case _ => None
      }
      fmt.map(c => when(col(het.typeTag) === t, c).otherwise(acc)).getOrElse(acc)
    }
    df.select(line.as("value")).as[String]
  }

  def write(df: DataFrame, path: String): Unit =
    toZson(df).write.mode("overwrite").text(path)

  // ---- reader ----------------------------------------------------------------

  /** Convert one ZSON value text to JSON (decorators dropped, field names
    * quoted, sets→arrays, maps→objects, time literals→strings). Throws on
    * malformed input with position context.
    */
  private[graft] def zsonLineToJson(line: String): String = {
    val sb = new StringBuilder
    val s = line
    var i = 0
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"zson parse at $i: $msg in: $line")
    def ws(): Unit = {
      var go = true
      while (go && i < s.length) {
        val c = s.charAt(i)
        if (c == ' ' || c == '\t') i += 1
        else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '/') i = s.length
        else go = false
      }
    }
    // skip a type decorator: balanced ( ... ), possibly repeated
    def skipDecorators(): Unit = {
      ws()
      while (i < s.length && s.charAt(i) == '(') {
        var depth = 0
        var stop = false
        while (!stop && i < s.length) {
          val c = s.charAt(i)
          if (c == '(') depth += 1
          else if (c == ')') { depth -= 1; if (depth == 0) stop = true }
          i += 1
        }
        ws()
      }
    }
    def str(): Unit = {
      sb.append('"'); i += 1
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) { sb.append(c).append(s.charAt(i + 1)); i += 2 }
        else { sb.append(c); i += 1 }
      }
      if (i >= s.length) err("unterminated string")
      sb.append('"'); i += 1
    }
    def name(): Unit = {
      ws()
      if (s.charAt(i) == '"') str()
      else {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        if (i == start) err("empty field name")
        sb.append('"').append(s.substring(start, i)).append('"')
      }
    }
    def scalar(): Unit = {
      // time and IPv6 literals contain ':' — match them greedily first
      val rest = s.substring(i)
      val timeM = timeLitRe.findPrefixOf(rest)
      val ip6M = ip6Re.findPrefixOf(rest).filter(m => m.contains("::") ||
        m.count(_ == ':') == 7)
      val tok = (timeM, ip6M) match {
        case (Some(t), _) if t.length >= 10 => i += t.length; t
        case (_, Some(a)) => i += a.length; a
        case _ =>
          val start = i
          while (i < s.length && !",:]}() \t".contains(s.charAt(i))) i += 1
          s.substring(start, i)
      }
      if (tok.isEmpty) err("empty value")
      if (tok == "null" || tok == "true" || tok == "false") sb.append(tok)
      else if (tok.matches("""[+-]?\d+""")) sb.append(tok)
      else if (tok.matches("""[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?""")) {
        // float with possible trailing dot (ZSON implied float64)
        if (tok.endsWith(".")) sb.append(tok).append('0') else sb.append(tok)
      } else if (tok.startsWith("0x")) sb.append('"').append(tok).append('"')
      else sb.append('"').append(tok).append('"') // time literal, ip, enum…
    }
    def value(): Unit = {
      ws()
      if (i >= s.length) err("missing value")
      s.charAt(i) match {
        case '"' => str()
        case '{' => record()
        case '[' => arr("[", "]")
        case '|' =>
          if (s.startsWith("|[", i)) { i += 1; arr("[", "]"); expect('|') }
          else if (s.startsWith("|{", i)) { i += 1; mapv() }
          else err("bad |")
        case _ => scalar()
      }
      skipDecorators()
    }
    def expect(c: Char): Unit = {
      if (i < s.length && s.charAt(i) == c) i += 1 else err(s"expected '$c'")
    }
    def record(): Unit = {
      sb.append('{'); i += 1; ws()
      var first = true
      while (i < s.length && s.charAt(i) != '}') {
        if (!first) { expect(','); sb.append(','); ws() }
        first = false
        name(); ws(); expect(':'); sb.append(':')
        value(); ws()
      }
      expect('}'); sb.append('}')
    }
    def arr(open: String, close: String): Unit = {
      sb.append('['); i += 1; ws()
      var first = true
      while (i < s.length && s.charAt(i) != close.charAt(0)) {
        if (!first) { expect(','); sb.append(','); ws() }
        first = false
        value(); ws()
      }
      expect(close.charAt(0)); sb.append(']')
    }
    def mapv(): Unit = {
      // |{k:v,...}| → JSON object (keys coerced to strings)
      sb.append('{'); i += 1; ws()
      var first = true
      while (i < s.length && s.charAt(i) != '}') {
        if (!first) { expect(','); sb.append(','); ws() }
        first = false
        ws()
        if (s.charAt(i) == '"') str()
        else {
          val start = i
          while (i < s.length && !":".contains(s.charAt(i))) i += 1
          sb.append('"').append(s.substring(start, i).trim).append('"')
        }
        ws(); expect(':'); sb.append(':')
        value(); ws()
      }
      expect('}'); expect('|'); sb.append('}')
    }
    ws()
    value()
    sb.toString
  }

  /** Read a ZSON text file/directory into a typed DataFrame — the same
    * tagged/variant frame the in-memory harness builds, produced fully
    * distributed (reference: zson/parser.go streams typed values).
    *
    * Machine-written ZSON (zq's `-z` and this engine's writer) is one
    * value per line, so the default path is Spark's splittable text scan
    * with per-partition typed parsing; a short driver-side probe detects
    * pretty-printed multi-line ZSON (`-Z`) and falls back to whole-file
    * decode distributed one task per file.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    // typedef-bearing files ((=name) definitions referenced by later
    // values) must decode as ONE stream per file — a text split could
    // separate a reference from its definition. Parallelism across FILES
    // is kept; only within-file splitting is given up.
    lazy val hasTypedefs =
      try spark.read.textFile(path).filter((l: String) => l.contains("(="))
        .head(1).nonEmpty
      catch { case _: Exception => false }
    val rdd =
      if (probeLineOriented(spark, path) && !hasTypedefs)
        spark.read.textFile(path).rdd.mapPartitions(parseLineIter)
      else {
        // not line-oriented: confirm the head actually parses as (multi-
        // line) zson before shipping a whole-file decode to executors —
        // an undetectable file fails fast with the reference's message
        // (stop-on-error ztest: "bad.zson: format detection error")
        val head = try spark.read.textFile(path).head(512).mkString("\n")
                   catch { case _: Exception => "" }
        // a pretty value can legitimately span more lines than the probe
        // window, so a failed FULL parse only means "not zson" when the
        // text doesn't even START like a zson value — otherwise assume a
        // truncated pretty value and let the executor-side decode surface
        // any real error
        val headParses =
          try { ZsonParser.parseAll(head); true }
          catch { case _: Exception => false }
        val firstCh = head.linesIterator
          .map(_.trim).filterNot(l => l.isEmpty || l.startsWith("//"))
          .flatMap(_.headOption).nextOption()
        // container/quote/number starts can be truncated pretty values;
        // bare prose cannot (only true/false/null/NaN keywords open with
        // a letter, and those parse fully above)
        val plausibleStart = firstCh.exists(c =>
          c == '{' || c == '[' || c == '|' || c == '<' || c == '"' ||
          c == '-' || c == '+' || c == '(' || c.isDigit)
        if (head.trim.nonEmpty && !headParses && !plausibleStart)
          throw new IllegalArgumentException(
            new java.io.File(path).getName + ": format detection error")
        perFileValues(spark, path)
      }
    ZsonReader.fromRDD(spark, rdd)
  }

  /** Parse a partition's lines into values, accumulating continuation
    * lines so multi-line values inside a partition still decode (text
    * splits are line-aligned, so only a value spanning >1 split breaks —
    * the probe routes those files to whole-file decode instead).
    */
  private[sources] def parseLineIter(lines: Iterator[String]): Iterator[ZValue] = new Iterator[ZValue] {
    private var queue: Iterator[ZValue] = Iterator.empty
    // typedef context carried ACROSS values in this partition: `(=name)`
    // on one line binds `(name)` references on later lines (zson.md)
    private val ctx = scala.collection.mutable.Map.empty[String, graft.sources.ZType]
    private def parseCtx(text: String): Vector[ZValue] =
      new ZsonParser(text, ctx).parseAll()
    private def fill(): Unit = {
      val buf = new StringBuilder
      while (!queue.hasNext && lines.hasNext) {
        val l = lines.next()
        val t = l.trim
        if (buf.isEmpty && (t.isEmpty || t.startsWith("//"))) () // skip blanks/comments
        else {
          if (buf.nonEmpty) buf.append('\n')
          buf.append(l)
          try queue = parseCtx(buf.toString).iterator
          catch { case _: Exception => } // incomplete — keep accumulating
        }
      }
      if (!queue.hasNext && buf.nonEmpty)
        queue = parseCtx(buf.toString).iterator // surface the real error
    }
    def hasNext: Boolean = { if (!queue.hasNext) fill(); queue.hasNext }
    def next(): ZValue = { if (!hasNext) throw new NoSuchElementException; queue.next() }
  }

  /** Probe the head of the input: line-oriented iff the first non-blank,
    * non-comment line is one-or-more complete values on its own.
    */
  private def probeLineOriented(spark: SparkSession, path: String): Boolean = {
    try {
      val head = spark.read.textFile(path).filter(
        (l: String) => l.trim.nonEmpty && !l.trim.startsWith("//")).head(1)
      head.isEmpty || (try { ZsonParser.parseAll(head(0)); true } catch { case _: Exception => false })
    } catch { case _: Exception => true }
  }

  /** Whole-file typed decode, one task per file (for pretty-printed
    * multi-line ZSON where values may span line splits).
    */
  private def perFileValues(spark: SparkSession, path: String): org.apache.spark.rdd.RDD[ZValue] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(if (HadoopFs.isDirectory(spark, path)) s"$path/*" else path)
      .select("content").as[Array[Byte]].rdd
      .flatMap(bytes => ZsonParser.parseAll(new String(Gzip.maybeGunzip(bytes), "UTF-8")))
  }
}
