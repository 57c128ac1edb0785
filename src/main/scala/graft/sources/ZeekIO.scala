package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zeek TSV log format (reference: zio/zeekio/ — parser.go header
  * directives, format.go value syntax; the reference performance baseline
  * runs over exactly this data).
  *
  * Reader: the directive header (#separator/#fields/#types/#path/…) is
  * parsed once from the file head on the driver; data lines decode
  * DISTRIBUTED with plain split/cast expressions — `-` (unset) → null,
  * `(empty)` → empty, `time` as epoch seconds with µs fraction, sets and
  * vectors split on the set_separator. `_path` materializes as the leading
  * column like the reference.
  *
  * Writer: emits a single header block from the schema then tab-separated
  * rows (flat schemas; nested data should be flattened first, matching
  * zeekio's own restriction).
  */
object ZeekIO {

  private final case class Header(
      separator: String,
      setSeparator: String,
      unset: String,
      empty: String,
      path: Option[String],
      fields: Seq[String],
      types: Seq[String])

  private def unescapeSep(s: String): String =
    if (s.startsWith("\\x")) Integer.parseInt(s.drop(2), 16).toChar.toString else s

  /** Cumulative directive state (zeekio parser.go): the separator starts
    * as a SPACE until `#separator` declares one; `#fields`/`#types`
    * replace the schema; `#path -` clears the path; directives may appear
    * anywhere in the stream and persist until overridden.
    */
  private final class DirectiveState {
    var sep = " "; var setSep = ","; var unset = "-"; var empty = "(empty)"
    var path: Option[String] = None
    var fields = Seq.empty[String]; var types = Seq.empty[String]
    def update(l: String): Unit = {
      if (l.startsWith("#separator")) { sep = unescapeSep(l.drop(10).trim); return }
      val t = l.drop(1).split(java.util.regex.Pattern.quote(sep))
      t.head match {
        case "set_separator" => setSep = t(1)
        case "unset_field" => unset = t(1)
        case "empty_field" => empty = t(1)
        case "path" => path = if (t(1) == "-") None else Some(t(1))
        case "fields" =>
          fields = t.tail.toSeq
          if (types.length != fields.length) types = fields.map(_ => "string")
        case "types" =>
          types = t.tail.toSeq
          if (fields.length != types.length) fields = types.indices.map(i => s"c$i")
        case _ => // open/close dates etc.
      }
    }
    def header: Header = {
      require(fields.nonEmpty && fields.length == types.length,
        "zeek: missing or mismatched #fields/#types")
      Header(sep, setSep, unset, empty, path, fields, types)
    }
  }

  private def parseHeader(lines: Seq[String]): Header = {
    val st = new DirectiveState
    lines.takeWhile(_.startsWith("#")).foreach(st.update)
    st.header
  }

  private def elemCast(c: Column, inner: String): Column = inner match {
    case "count" | "int" | "port" => c.cast(LongType)
    case "double" => c.cast(DoubleType)
    case _ => c
  }

  private def decodeCol(raw: Column, zeekType: String, h: Header): Column = {
    val cleaned = when(raw === h.unset, lit(null)).otherwise(raw)
    zeekType match {
      case "time" => // epoch seconds with fractional µs → µs timestamp
        timestamp_micros((cleaned.cast(DoubleType) * 1e6).cast(LongType))
      case "interval" => // seconds → ns (zed duration domain)
        (cleaned.cast(DoubleType) * 1e9).cast(LongType)
      case "count" | "int" | "port" => cleaned.cast(LongType)
      case "double" => cleaned.cast(DoubleType)
      case "bool" => when(cleaned === "T", true).when(cleaned === "F", false)
        .otherwise(lit(null).cast(BooleanType))
      case t if t.startsWith("set[") || t.startsWith("vector[") =>
        val inner = t.dropWhile(_ != '[').drop(1).takeWhile(_ != ']')
        val items0 = transform(
          split(cleaned, java.util.regex.Pattern.quote(h.setSeparator)),
          e => elemCast(when(e === h.unset, lit(null)).otherwise(e), inner))
        // zed set values are deduped + ordered (zson.md §2.5.2)
        val items = if (t.startsWith("set[")) array_sort(array_distinct(items0)) else items0
        when(cleaned === h.empty, array().cast(ArrayType(
          if (Set("count", "int", "port")(inner)) LongType
          else if (inner == "double") DoubleType else StringType)))
          .otherwise(items)
      case _ => // string/addr/enum…
        val unesc = udf((s: String) => if (s == null) null else unescapeZeek(s))
        when(cleaned === h.empty, lit(""))
          .otherwise(when(cleaned.contains("\\"), unesc(cleaned)).otherwise(cleaned))
    }
  }

  /** zeek string unescaping (zio/zeekio/escape.go): `\xNN` hex bytes and
    * the named escapes; the result must stay valid UTF-8, else the
    * original escaped text is kept (zed strings are unicode).
    */
  private[sources] def unescapeZeek(s: String): String = {
    if (!s.contains("\\")) return s
    val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    def unhex(b: Byte): Int = {
      val c = b.toChar
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else 255
    }
    while (i < in.length) {
      val c = in(i)
      if (c == '\\' && i + 1 < in.length) {
        if (in(i + 1) == 'x' && i + 3 < in.length && unhex(in(i + 2)) < 16 && unhex(in(i + 3)) < 16) {
          out.write((unhex(in(i + 2)) << 4) | unhex(in(i + 3))); i += 4
        } else {
          val named: Int = in(i + 1).toChar match {
            case '\\' => '\\'; case '"' => '"'; case 'b' => '\b'; case 'f' => '\f'
            case 'n' => '\n'; case 'r' => '\r'; case 't' => '\t'; case _ => -1
          }
          if (named >= 0) { out.write(named); i += 2 }
          else { out.write(c.toInt); i += 1 }
        }
      } else { out.write(c.toInt); i += 1 }
    }
    val bytes = out.toByteArray
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    val text =
      try {
        dec.onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      } catch { case _: Exception =>
        // invalid UTF-8: per Zeek's JSON convention only the INVALID or
        // unprintable bytes re-escape as literal \xNN text; printable
        // runes stay (zio/zeekio/escape.go EscapeZeekHex + builder.go)
        escapeZeekHex(bytes)
      }
    // the reference NFC-normalizes every zeek string (builder.go norm.NFC)
    java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFC)
  }

  /** EscapeZeekHex (zio/zeekio/escape.go): decode runes; a malformed byte
    * or unprintable rune renders as literal backslash-x-hh text, valid
    * printable runes pass through.
    */
  private def escapeZeekHex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val len =
        if (b < 0x80) 1
        else if ((b & 0xe0) == 0xc0) 2
        else if ((b & 0xf0) == 0xe0) 3
        else if ((b & 0xf8) == 0xf0) 4
        else 0
      val valid = len > 0 && i + len <= bytes.length && {
        val slice = java.util.Arrays.copyOfRange(bytes, i, i + len)
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        dec.onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        try { dec.decode(java.nio.ByteBuffer.wrap(slice)); true }
        catch { case _: Exception => false }
      }
      val printable = valid && {
        val cp = new String(bytes, i, len, java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
        !Character.isISOControl(cp) && Character.isDefined(cp)
      }
      if (printable) { sb.append(new String(bytes, i, len, java.nio.charset.StandardCharsets.UTF_8)); i += len }
      else { sb.append(f"\\x$b%02x"); i += 1 }
    }
    sb.toString
  }

  /** zeek → zed type text (for the shape tag of a decoded frame). */
  private def zedTypeText(zeekType: String): String = zeekType match {
    case "time" => "time"
    case "interval" => "duration"
    case "addr" => "ip"
    case "subnet" => "net"
    case "count" => "uint64"
    case "int" => "int64"
    case "port" => "port=uint16"
    case "double" => "float64"
    case "bool" => "bool"
    case t if t.startsWith("set[") =>
      s"|[${zedTypeText(t.dropWhile(_ != '[').drop(1).takeWhile(_ != ']'))}]|"
    case t if t.startsWith("vector[") =>
      s"[${zedTypeText(t.dropWhile(_ != '[').drop(1).takeWhile(_ != ']'))}]"
    case _ => "string"
  }

  /** Shape tag text from a header: nested record per the dotted #fields. */
  private def shapeText(h: Header, withPath: Boolean): String = {
    // fold dotted names into a nested structure preserving field order
    sealed trait N
    final case class Leaf(t: String) extends N
    final case class Node(fs: scala.collection.mutable.LinkedHashMap[String, N]) extends N
    val root = Node(scala.collection.mutable.LinkedHashMap.empty)
    def insert(node: Node, parts: List[String], t: String): Unit = parts match {
      case last :: Nil => node.fs(last) = Leaf(t)
      case head :: rest =>
        val child = node.fs.getOrElseUpdate(head,
          Node(scala.collection.mutable.LinkedHashMap.empty)) match {
          case n: Node => n
          case _ => val n = Node(scala.collection.mutable.LinkedHashMap.empty); node.fs(head) = n; n
        }
        insert(child, rest, t)
      case Nil =>
    }
    if (withPath) root.fs("_path") = Leaf("string")
    h.fields.zip(h.types).foreach { case (f, t) =>
      insert(root, f.split('.').toList, zedTypeText(t))
    }
    def text(n: N): String = n match {
      case Leaf(t) => t
      case Node(fs) => fs.map { case (k, v) => s"$k:${text(v)}" }.mkString("{", ",", "}")
    }
    text(root)
  }

  // ---- row-level typed decode (the interleaved-directive path) -------------

  /** One zeek cell → typed value (format.go value syntax, executor-side). */
  private def cellValue(raw0: String, zeekType: String, h: Header): ZValue = {
    import ZValue._
    val zt = try ZsonParser.parseType(zedTypeText(zeekType))
             catch { case _: Exception => ZType.Prim("string") }
    if (raw0 == h.unset) return VNull(zt)
    def epochNs(s: String): Long = {
      val neg = s.startsWith("-")
      val body = if (neg) s.drop(1) else s
      val dot = body.indexOf('.')
      val (sec, frac) = if (dot < 0) (body, "") else (body.substring(0, dot), body.substring(dot + 1))
      val ns = BigInt(if (sec.isEmpty) "0" else sec) * 1000000000L +
        BigInt((frac + "000000000").take(9))
      val v = if (neg) -ns else ns
      v.toLong
    }
    zeekType match {
      case "time" => VTime(epochNs(raw0))
      case "interval" => VDur(epochNs(raw0))
      case "count" => VUint64(BigDecimal(raw0))
      case "int" => VInt(raw0.toLong, "int64")
      case "port" => VTyped(VInt(raw0.toLong, "uint16"), ZType.Named("port", ZType.Prim("uint16")))
      case "double" => VFloat(raw0.toDouble, "float64")
      case "bool" => VBool(raw0 == "T")
      case "addr" => VIp(raw0)
      case "subnet" => ZValue.netOf(raw0)
      case t if t.startsWith("set[") || t.startsWith("vector[") =>
        val inner = t.dropWhile(_ != '[').drop(1).takeWhile(_ != ']')
        val isSet = t.startsWith("set[")
        if (raw0 == h.empty) VTyped(VArr(Vector.empty, isSet), zt)
        else {
          val items = raw0.split(java.util.regex.Pattern.quote(h.setSeparator), -1)
            .toVector.map(c => cellValue(c, inner, h))
          VArr(if (isSet) ZValue.normSet(items) else items, isSet)
        }
      case _ => VStr(unescapeZeek(raw0))
    }
  }

  /** One data line → typed record (dotted #fields nest — reader.go). */
  private def lineValue(line: String, h: Header): ZValue = {
    import ZValue._
    val cells = line.split(java.util.regex.Pattern.quote(h.separator), -1)
    sealed trait N
    final case class Leaf(v: ZValue) extends N
    final case class Node(fs: scala.collection.mutable.LinkedHashMap[String, N]) extends N
    val root = Node(scala.collection.mutable.LinkedHashMap.empty)
    def insert(node: Node, parts: List[String], v: ZValue): Unit = parts match {
      case last :: Nil => node.fs(last) = Leaf(v)
      case head :: rest =>
        val child = node.fs.getOrElseUpdate(head,
          Node(scala.collection.mutable.LinkedHashMap.empty)) match {
          case n: Node => n
          case _ => val n = Node(scala.collection.mutable.LinkedHashMap.empty); node.fs(head) = n; n
        }
        insert(child, rest, v)
      case Nil =>
    }
    if (h.path.isDefined && !h.fields.contains("_path"))
      root.fs("_path") = Leaf(VStr(h.path.get))
    h.fields.zip(h.types).zipWithIndex.foreach { case ((f, t), i) =>
      val raw = if (i < cells.length) cells(i) else h.unset
      insert(root, f.split('.').toList, cellValue(raw, t, h))
    }
    def build(n: N): ZValue = n match {
      case Leaf(v) => v
      case Node(fs) => VRec(fs.toVector.map { case (k, v) => k -> build(v) })
    }
    build(root)
  }

  /** Segment an interleaved-directive zeek TEXT into typed values —
    * cumulative directive state is per-FILE (parser.go), so a file is the
    * parallelism unit; runs on the executor that holds the file bytes.
    */
  private[sources] def interleavedValues(text: String): Iterator[ZValue] = {
    val st = new DirectiveState
    text.linesIterator.flatMap { l =>
      if (l.startsWith("#")) { st.update(l); Iterator.empty }
      else if (l.isEmpty) Iterator.empty
      else Iterator.single(lineValue(l, st.header))
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    // Per-FILE directive stats (one cheap text scan, no value building):
    // when every file is a single leading directive block and all files
    // share the SAME header — the normal shape of a written log set —
    // decode runs fully native in codegen (split + typed casts), one
    // pass, no value-model detour. Only genuinely interleaved or
    // mixed-header inputs take the two-pass typed route.
    val statsRdd = spark.read.format("binaryFile").load(
        if (HadoopFs.isDirectory(spark, path)) s"$path/*" else path)
      .select("content").as[Array[Byte]].rdd
      .map { bytes0 =>
        // byte-level scan — no whole-file String, no per-line allocation
        val bytes = Gzip.maybeGunzip(bytes0)
        var leading = true
        val lead = Vector.newBuilder[String]
        var total = 0
        var i = 0
        while (i < bytes.length) {
          var j = i
          while (j < bytes.length && bytes(j) != '\n') j += 1
          if (i < j) {
            if (bytes(i) == '#') {
              total += 1
              if (leading) {
                val e = if (j > i && bytes(j - 1) == '\r') j - 1 else j
                lead += new String(bytes, i, e - i,
                  java.nio.charset.StandardCharsets.UTF_8)
              }
            } else if (bytes(i) != '\r') leading = false
          }
          i = j + 1
        }
        (lead.result(), total)
      }
    val stats = statsRdd.collect()
    val uniform = stats.nonEmpty &&
      stats.forall { case (lead, total) => total == lead.length } &&
      stats.map(_._1).distinct.length == 1
    if (uniform) {
      val h = parseHeader(stats.head._1)
      val data = lines.filter(l => !l.startsWith("#") && l.nonEmpty)
      decodeBlock(spark, h, data)
    } else {
      // directives interleave with data (schema/path changes mid-stream —
      // zeekio parser.go keeps cumulative state). A file is the
      // parallelism unit: rows decode EXECUTOR-side through the value
      // model, one task per file, fused by the two-pass shape discovery —
      // no driver materialization (concatenated multi-schema zeek streams
      // are common in the wild).
      val rdd = spark.read.format("binaryFile").load(
          if (HadoopFs.isDirectory(spark, path)) s"$path/*" else path)
        .select("content").as[Array[Byte]].rdd
        .flatMap(bytes => interleavedValues(
          new String(Gzip.maybeGunzip(bytes), java.nio.charset.StandardCharsets.UTF_8)))
      ZsonReader.fromRDD(spark, rdd)
    }
  }

  private def decodeBlock(
      spark: SparkSession,
      h: Header,
      data: org.apache.spark.sql.Dataset[String]): DataFrame = {
    val sepLit = java.util.regex.Pattern.quote(h.separator)
    // materialize the split ONCE: decodeCol wraps each field in when()
    // chains, and codegen does not eliminate common subexpressions across
    // conditional branches — element_at over a projected array keeps one
    // split per row instead of one per branch occurrence
    val withParts = data.toDF().select(split(col("value"), sepLit).as("__parts"))
    val parts = col("__parts")
    val cols = h.fields.zip(h.types).zipWithIndex.map { case ((f, t), i) =>
      decodeCol(element_at(parts, i + 1), t, h).as(f)
    }
    val withPath = h.path.isDefined && !h.fields.contains("_path")
    val pathCol = if (withPath) Seq(lit(h.path.get).as("_path")) else Seq.empty
    // the zeek types become the frame's shape tag, so typeof/len/zeek
    // re-emission see ip/duration/port instead of the relational widths
    val tagText = shapeText(h, withPath)
    val md = new MetadataBuilder().putStringArray("shapes", Array(tagText)).build()
    val tag = Seq(lit(tagText).as(graft.operators.Het.typeTag, md))
    val flat = withParts.select(pathCol ++ cols ++ tag: _*)
    // dotted #fields names are nested records in zed (zeekio reader.go
    // "shared context": id.orig_h → {id:{orig_h:…}})
    if (h.fields.exists(_.contains("."))) graft.functions.Shaper.nestDotted(flat)
    else flat
  }

  // ---- writer ----------------------------------------------------------------

  private def zeekTypeOf(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "int"
    case DoubleType | FloatType => "double"
    case BooleanType => "bool"
    case TimestampType | TimestampNTZType => "time"
    case ArrayType(_, _) => "vector[string]"
    case _ => "string"
  }

  /** zed → zeek type names (zeekio writer.go zeekTypeOfZed). */
  private def zeekTypeOfZ(t: ZType): String = t match {
    case ZType.Named("port", _) => "port"
    case ZType.Named(_, inner) => zeekTypeOfZ(inner)
    case ZType.Prim("ip") => "addr"
    case ZType.Prim("net") => "subnet"
    case ZType.Prim("time") => "time"
    case ZType.Prim("duration") => "interval"
    case ZType.Prim("bool") => "bool"
    case ZType.Prim(p) if p.startsWith("uint") => "count"
    case ZType.Prim(p) if p.startsWith("int") => "int"
    case ZType.Prim(p) if p.startsWith("float") || p == "decimal" => "double"
    case ZType.SetT(e) => s"set[${zeekTypeOfZ(e)}]"
    case ZType.Arr(e) => s"vector[${zeekTypeOfZ(e)}]"
    case ZType.EnumT(_) => "enum"
    case _ => "string"
  }

  private def encodeCol(c: Column, dt: DataType): Column = {
    val enc = dt match {
      case TimestampType | TimestampNTZType =>
        format_string("%.6f", unix_micros(c).cast(DoubleType) / 1e6)
      case BooleanType => when(c, "T").otherwise("F")
      case ArrayType(_, _) =>
        when(size(c) === 0, lit("(empty)")).otherwise(array_join(c.cast(ArrayType(StringType)), ","))
      case st: StructType if ZsonIO.isVariantType(st) => graft.operators.Het.render(c)
      case _ => c.cast(StringType)
    }
    coalesce(enc, lit("-"))
  }

  /** Leaf (column, dotted name, type) triples — nested records flatten to
    * dotted #fields names (zeekio writer.go).
    */
  private def leaves(prefix: String, c: Column, dt: DataType): Seq[(String, Column, DataType)] =
    dt match {
      case st: StructType if !ZsonIO.isVariantType(st) =>
        st.fields.toIndexedSeq.flatMap(f =>
          leaves(s"$prefix.${f.name}", c.getField(f.name), f.dataType))
      case _ => Seq((prefix, c, dt))
    }

  def write(df: DataFrame, path: String): Unit = {
    import df.sparkSession.implicits._
    val het = graft.operators.Het
    val hasPath = df.columns.contains("_path")
    val fields = df.schema.fields.toIndexedSeq
      .filterNot(f => f.name == het.typeTag || f.name == "_path")
    val cols = fields.flatMap(f => leaves(f.name, col(s"`${f.name}`"), f.dataType))
    // zed types from the shape tag (first shape) give faithful zeek
    // #types (addr/port/interval); fall back to the Spark type mapping
    val zedTypes: Map[String, ZType] = df.schema.fields.find(_.name == het.typeTag)
      .filter(_.metadata.contains("shapes"))
      .flatMap(f => f.metadata.getStringArray("shapes").headOption)
      .flatMap { t =>
        try ZType.strip(ZsonParser.parseType(ZType.stripNullWrap(t))) match {
          case r: ZType.Rec =>
            def walk(prefix: String, zt: ZType): Seq[(String, ZType)] =
              ZType.strip(zt) match {
                case ZType.Rec(fs) => fs.flatMap { case (n, ft) =>
                  walk(if (prefix.isEmpty) n else s"$prefix.$n", ft)
                }
                case other => Seq(prefix -> zt)
              }
            Some(walk("", r).toMap)
          case _ => None
        } catch { case _: Exception => None }
      }.getOrElse(Map.empty)
    def typeName(name: String, dt: DataType): String =
      zedTypes.get(name).map(zeekTypeOfZ).getOrElse(zeekTypeOf(dt))
    def encode(name: String, c: Column, dt: DataType): Column =
      if (zedTypes.get(name).map(ZType.strip).contains(ZType.Prim("duration")) && dt == LongType)
        coalesce(format_string("%.6f", c.cast(DoubleType) / 1e9), lit("-")) // ns → interval secs
      else encodeCol(c, dt)
    val pathVal: Option[String] =
      if (hasPath)
        try Option(df.select(col("_path")).limit(1).collect()).flatMap(_.headOption)
          .map(_.getString(0))
        catch { case _: Exception => None }
      else None
    val header = Seq(
      "#separator \\x09",
      "#set_separator\t,",
      "#empty_field\t(empty)",
      "#unset_field\t-") ++
      pathVal.map(p => s"#path\t$p").toSeq ++ Seq(
      "#fields\t" + cols.map(_._1).mkString("\t"),
      "#types\t" + cols.map(c => typeName(c._1, c._3)).mkString("\t"))
    val body = df.select(concat_ws("\t",
      cols.map(c => encode(c._1, c._2, c._3)): _*).as("value")).as[String]
    // prepend the directive header INSIDE partition 0 — a Dataset union
    // does not guarantee partition order
    val rdd = body.coalesce(1).rdd.mapPartitionsWithIndex { case (i, it) =>
      if (i == 0) header.iterator ++ it else it
    }
    df.sparkSession.createDataset(rdd)(org.apache.spark.sql.Encoders.STRING)
      .write.mode("overwrite").text(path)
  }
}
