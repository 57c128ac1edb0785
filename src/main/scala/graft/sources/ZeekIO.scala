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
      val t = l.drop(1).split(sepPattern(sep))
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

  /** Literal separator → split pattern that keeps java.util.regex's
    * single-char fast path: Pattern.quote's \\Q…\\E wrapper forces a full
    * Pattern.compile PER ROW inside String.split (and the codegen'd
    * split expression), which dominates the decode of tab-separated logs.
    */
  private def sepPattern(sep: String): String =
    if (sep.length == 1 && ".$|()[{^?*+\\".indexOf(sep.charAt(0)) < 0) sep
    else java.util.regex.Pattern.quote(sep)

  private def parseHeader(lines: Seq[String]): Header = {
    val st = new DirectiveState
    lines.takeWhile(_.startsWith("#")).foreach(st.update)
    st.header
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
    case "enum" => "zenum=string" // zeekio named-type convention
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
          val items = raw0.split(sepPattern(h.setSeparator), -1)
            .toVector.map(c => cellValue(c, inner, h))
          VArr(if (isSet) ZValue.normSet(items) else items, isSet)
        }
      case _ => VStr(unescapeZeek(raw0))
    }
  }

  /** One data line → typed record (dotted #fields nest — reader.go). */
  private def lineValue(line: String, h: Header): ZValue = {
    import ZValue._
    val cells = line.split(sepPattern(h.separator), -1)
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
  private[sources] def interleavedValues(text: String): Iterator[ZValue] =
    interleavedValues(text.linesIterator)

  private[sources] def interleavedValues(lines: Iterator[String]): Iterator[ZValue] = {
    val st = new DirectiveState
    lines.flatMap { l =>
      if (l.startsWith("#")) { st.update(l); Iterator.empty }
      else if (l.isEmpty) Iterator.empty
      else Iterator.single(lineValue(l, st.header))
    }
  }

  /** Executor-side buffered line reader with gzip auto-detection —
    * streaming, never a whole-file buffer.
    */
  private def lineReader(conf: Map[String, String],
      file: String): java.io.BufferedReader = {
    val raw = new java.io.BufferedInputStream(HadoopFs.open(conf, file), 1 << 16)
    raw.mark(2)
    val m0 = raw.read(); val m1 = raw.read()
    raw.reset()
    val in =
      if (m0 == 0x1f && m1 == 0x8b) new java.util.zip.GZIPInputStream(raw, 1 << 16)
      else raw
    new java.io.BufferedReader(new java.io.InputStreamReader(in,
      java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
  }

  /** One buffered BYTE scan of a file for (leading directive block, total
    * directive-line count) — the uniform-header check's input. Data lines
    * are skipped byte-by-byte without materializing a String per line;
    * only directive lines in the leading block build text. Semantics match
    * the readLine form exactly: empty lines are ignored (they neither end
    * the leading block nor count), a line "is a directive" iff its first
    * byte is '#', and \r, \n, \r\n all terminate a line.
    */
  private def directiveStats(conf: Map[String, String],
      file: String): (Vector[String], Int) = {
    val raw = new java.io.BufferedInputStream(HadoopFs.open(conf, file), 1 << 16)
    raw.mark(2)
    val m0 = raw.read(); val m1 = raw.read()
    raw.reset()
    val in: java.io.InputStream =
      if (m0 == 0x1f && m1 == 0x8b) new java.util.zip.GZIPInputStream(raw, 1 << 16)
      else raw
    val lead = Vector.newBuilder[String]
    var total = 0
    var leading = true
    var started = false    // current line has seen its first byte
    var collecting = false // current line is a leading directive
    val line = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    def endLine(): Unit = {
      if (collecting)
        lead += new String(line.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      started = false; collecting = false; line.reset()
    }
    try {
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) {
          val b = buf(i)
          if (b == '\n' || b == '\r') { if (started) endLine() }
          else {
            if (!started) {
              started = true
              if (b == '#') { total += 1; collecting = leading }
              else leading = false
            }
            if (collecting) line.write(b.toInt)
          }
          i += 1
        }
        n = in.read(buf)
      }
      if (started) endLine()
    } finally in.close()
    (lead.result(), total)
  }

  /** Structured-Streaming source tailing a growing directory of zeek
    * logs — the canonical zeek deployment (a live zeek writes and
    * rotates log files into one directory). Schema locks from the files
    * present at start; each newly-landed file decodes executor-side
    * through the same per-file directive-state parser.
    */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val schema = read(spark, path).schema
    val cleaned = StructType(schema.fields.filterNot(_.name == graft.operators.Het.typeTag))
    spark.readStream.format("binaryFile")
      .schema(new StructType()
        .add("path", StringType).add("modificationTime", TimestampType)
        .add("length", LongType).add("content", BinaryType))
      .load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val text = new String(Gzip.maybeGunzip(bytes),
          java.nio.charset.StandardCharsets.UTF_8)
        interleavedValues(text).map(v => ZsonReader.rowOf(v, cleaned, tag = true))
      }(org.apache.spark.sql.Encoders.row(schema))
      .toDF()
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
    val statFiles = HadoopFs.listDataFiles(spark, path)
    val statsConf = HadoopFs.confMap(spark)
    // one STREAMING pass per file — constant memory per task (never a
    // whole-file byte array: multi-GB rotated logs are normal), and
    // byte-level: only directive lines materialize as Strings (a
    // readLine-per-row pass built 2M throwaway Strings at sf0.1 and was
    // ~40% of a uniform read's cost)
    val statsRdd = spark.sparkContext
      .parallelize(statFiles, math.max(1, statFiles.length))
      .map(f => directiveStats(statsConf, f))
    // distributive uniformity fold: the driver receives ONE
    // (header, flag) pair — O(header size) regardless of file count
    // (a collect of every file's leading block scales with the lake)
    val (headLead, uniform) =
      if (statFiles.isEmpty) (Vector.empty[String], false)
      else statsRdd
        .map { case (lead, total) => (lead, total == lead.length) }
        .reduce { case ((la, ua), (lb, ub)) => (la, ua && ub && la == lb) }
    if (uniform) {
      val h = parseHeader(headLead)
      decodeBlockNative(spark, h, lines)
    } else {
      // directives interleave with data (schema/path changes mid-stream —
      // zeekio parser.go keeps cumulative state). A file is the
      // parallelism unit: rows decode EXECUTOR-side through the value
      // model, one task per file, fused by the two-pass shape discovery —
      // no driver materialization (concatenated multi-schema zeek streams
      // are common in the wild).
      val rdd = spark.sparkContext
        .parallelize(statFiles, math.max(1, statFiles.length))
        .flatMap { f =>
          // streamed per line; close on drain AND on task completion so an
          // early-terminating consumer (limit/take) or a decode exception
          // can't leak the Hadoop stream + GZIP buffer
          val rdr = lineReader(statsConf, f)
          var closed = false
          def closeOnce(): Unit = if (!closed) { closed = true; rdr.close() }
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeOnce()))
          val lines = Iterator.continually(rdr.readLine()).takeWhile { l =>
            if (l == null) closeOnce(); l != null
          }
          interleavedValues(lines)
        }
      ZsonReader.fromRDD(spark, rdd)
    }
  }

  /** Uniform-header decode: one imperative pass per line straight into
    * InternalRows. The expression form of this decode (split + per-field
    * when/cast chains) re-evaluated `element_at`/`when` subtrees per
    * branch — codegen does no cross-branch subexpression elimination — and
    * cost ~3.5 s for 2M conn rows; a hand-rolled splitter writing
    * UTF8String/primitive cells directly costs a fraction of that and
    * feeds downstream operators with zero conversion (same contract as the
    * zng DataSource V2 scan).
    *
    * Semantics mirror the zeek value syntax (zio/zeekio/format.go) with
    * Spark's non-ANSI cast edges: unset (`-`) → null anywhere, `(empty)`
    * → ""/empty container, `T`/`F` bools, time as epoch-seconds to µs
    * timestamps, intervals to ns longs, sets deduped + sorted, malformed
    * numerics → null (UTF8String.toLong / parseDouble — the exact
    * utilities Spark's cast uses).
    */
  private def decodeBlockNative(
      spark: SparkSession,
      h: Header,
      lines: org.apache.spark.sql.Dataset[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String

    val withPath = h.path.isDefined && !h.fields.contains("_path")
    def innerOf(t: String): String = t.dropWhile(_ != '[').drop(1).takeWhile(_ != ']')
    def elemType(inner: String): DataType =
      if (Set("count", "int", "port")(inner)) LongType
      else if (inner == "double") DoubleType else StringType
    def sqlTypeOf(t: String): DataType = t match {
      case "time" => TimestampType // µs carrier, like the expression path
      case "interval" => LongType // seconds → ns (zed duration domain)
      case "count" | "int" | "port" => LongType
      case "double" => DoubleType
      case "bool" => BooleanType
      case c if c.startsWith("set[") || c.startsWith("vector[") =>
        ArrayType(elemType(innerOf(c)))
      case _ => StringType // string/addr/enum…
    }
    // the zeek types become the frame's shape tag, so typeof/len/zeek
    // re-emission see ip/duration/port instead of the relational widths
    val tagText = shapeText(h, withPath)
    val md = new MetadataBuilder().putStringArray("shapes", Array(tagText)).build()
    val fieldsArr = h.fields.toArray
    val typesArr = h.types.toArray
    val schema = StructType(
      (if (withPath) Seq(StructField("_path", StringType, nullable = false)) else Nil) ++
        fieldsArr.indices.map(i => StructField(fieldsArr(i), sqlTypeOf(typesArr(i)))) ++
        Seq(StructField(graft.operators.Het.typeTag, StringType, nullable = false, md)))

    val sep = h.separator
    val setSep = h.setSeparator
    val unset = h.unset
    val emptyMark = h.empty
    val pathStr = if (withPath) h.path.get else null
    val nFields = fieldsArr.length

    // Byte-level decode (the normal case: single-ASCII separators): lines
    // stay UTF8String end-to-end — no whole-line UTF-16 decode, no String
    // substring per cell, no fromString re-encode for string columns. Cells
    // are zero-copy VIEWS into the scan buffer; only stored strings clone
    // their bytes (the scan's UnsafeRow buffer is reused across rows).
    val fastBytes = sep.length == 1 && sep.charAt(0) < 0x80 &&
      setSep.length == 1 && setSep.charAt(0) < 0x80
    val rdd = if (fastBytes) lines.queryExecution.toRdd.mapPartitions { iter =>
      val tagU = UTF8String.fromString(tagText)
      val pathU = if (pathStr != null) UTF8String.fromString(pathStr) else null
      val base = if (pathU != null) 1 else 0
      val width = base + nFields + 1
      val longWrap = new UTF8String.LongWrapper
      val unsetU = UTF8String.fromString(unset)
      val emptyU = UTF8String.fromString(emptyMark)
      val tU = UTF8String.fromString("T")
      val fU = UTF8String.fromString("F")
      val sepB = sep.charAt(0).toByte
      val setSepB = setSep.charAt(0).toByte

      def view(u: UTF8String, s: Int, e: Int): UTF8String =
        UTF8String.fromAddress(u.getBaseObject, u.getBaseOffset + s, e - s)

      def toLongOrNull(cu: UTF8String): Any =
        if (cu.toLong(longWrap)) java.lang.Long.valueOf(longWrap.value) else null
      // Spark's castToDouble: scala toDouble, then the special literals
      def toDoubleOrNull(s: String): Any =
        try java.lang.Double.valueOf(s.trim.toDouble)
        catch {
          case _: NumberFormatException =>
            s.trim.toLowerCase match {
              case "inf" | "+inf" | "infinity" | "+infinity" =>
                java.lang.Double.valueOf(Double.PositiveInfinity)
              case "-inf" | "-infinity" => java.lang.Double.valueOf(Double.NegativeInfinity)
              case "nan" => java.lang.Double.valueOf(Double.NaN)
              case _ => null
            }
        }
      def toEpoch(s: String, unitPerSec: Double): Any = toDoubleOrNull(s) match {
        case d: java.lang.Double => java.lang.Long.valueOf((d.doubleValue() * unitPerSec).toLong)
        case _ => null
      }
      def stringCell(cu: UTF8String): UTF8String =
        if (cu.equals(emptyU)) UTF8String.EMPTY_UTF8
        else {
          var i = 0; val nb = cu.numBytes; var esc = false
          while (i < nb && !esc) { if (cu.getByte(i) == '\\') esc = true; i += 1 }
          if (esc) UTF8String.fromString(unescapeZeek(cu.toString)) else cu.clone()
        }
      def containerDecoder(inner: String, isSet: Boolean): UTF8String => Any = {
        val elem: UTF8String => Any =
          if (inner == "count" || inner == "int" || inner == "port") toLongOrNull
          else if (inner == "double") cu => toDoubleOrNull(cu.toString)
          else cu => cu.clone() // raw: elements don't unescape
        cu => {
          if (cu.equals(emptyU)) new GenericArrayData(Array.empty[Any])
          else {
            val nb = cu.numBytes
            var n = 1; var i = 0
            while (i < nb) { if (cu.getByte(i) == setSepB) n += 1; i += 1 }
            val items = new Array[Any](n)
            var start = 0; var k = 0; i = 0
            while (k < n) {
              var e = start
              while (e < nb && cu.getByte(e) != setSepB) e += 1
              val p = view(cu, start, e)
              items(k) = if (p.equals(unsetU)) null else elem(p)
              k += 1; start = e + 1
            }
            if (isSet) {
              // zed set values are deduped + ordered (zson.md §2.5.2):
              // array_distinct keeps one null, array_sort puts it last
              val seen = new java.util.LinkedHashSet[Any]
              var hasNull = false
              items.foreach(v => if (v == null) hasNull = true else seen.add(v))
              val sorted = seen.toArray.sortWith { (a, b) =>
                a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
              }
              new GenericArrayData(if (hasNull) sorted :+ (null: Any) else sorted)
            } else new GenericArrayData(items)
          }
        }
      }
      // per-column decoders compiled once — no per-cell type-string match
      val decoders: Array[UTF8String => Any] = typesArr.map {
        case "time" => cu => toEpoch(cu.toString, 1e6)
        case "interval" => cu => toEpoch(cu.toString, 1e9)
        case "count" | "int" | "port" => toLongOrNull _
        case "double" => cu => toDoubleOrNull(cu.toString)
        case "bool" => cu =>
          if (cu.equals(tU)) java.lang.Boolean.TRUE
          else if (cu.equals(fU)) java.lang.Boolean.FALSE else null
        case c if c.startsWith("set[") => containerDecoder(innerOf(c), isSet = true)
        case c if c.startsWith("vector[") => containerDecoder(innerOf(c), isSet = false)
        case _ => stringCell _
      }

      iter.flatMap { row =>
        val u = row.getUTF8String(0)
        val nb = u.numBytes
        if (nb == 0 || u.getByte(0) == '#') None
        else {
          val values = new Array[Any](width)
          if (pathU != null) values(0) = pathU
          var start = 0; var ci = 0
          // split-with-trailing-empties semantics: cells = separators + 1;
          // columns past the line's last cell stay null (as before)
          while (ci < nFields && start <= nb) {
            var e = start
            while (e < nb && u.getByte(e) != sepB) e += 1
            val cu = view(u, start, e)
            values(base + ci) = if (cu.equals(unsetU)) null else decoders(ci)(cu)
            ci += 1; start = e + 1
          }
          values(width - 1) = tagU
          Some(new GenericInternalRow(values): InternalRow)
        }
      }
    } else lines.rdd.mapPartitions { iter =>
      val tagU = UTF8String.fromString(tagText)
      val pathU = if (pathStr != null) UTF8String.fromString(pathStr) else null
      val base = if (pathU != null) 1 else 0
      val width = base + nFields + 1
      val longWrap = new UTF8String.LongWrapper

      def splitOn(s: String, d: String): Array[String] =
        if (d.length == 1) { // manual split keeping trailing empties
          val c = d.charAt(0)
          var n = 1; var i = 0
          while (i < s.length) { if (s.charAt(i) == c) n += 1; i += 1 }
          val out = new Array[String](n)
          var start = 0; var k = 0; i = 0
          while (i < s.length) {
            if (s.charAt(i) == c) { out(k) = s.substring(start, i); k += 1; start = i + 1 }
            i += 1
          }
          out(k) = s.substring(start)
          out
        } else s.split(java.util.regex.Pattern.quote(d), -1)

      // Spark's own non-ANSI string→long ("12.9" truncates, junk → null)
      def toLongOrNull(s: String): Any =
        if (UTF8String.fromString(s).toLong(longWrap)) java.lang.Long.valueOf(longWrap.value)
        else null
      // Spark's castToDouble: scala toDouble, then the special literals
      def toDoubleOrNull(s: String): Any =
        try java.lang.Double.valueOf(s.trim.toDouble)
        catch {
          case _: NumberFormatException =>
            s.trim.toLowerCase match {
              case "inf" | "+inf" | "infinity" | "+infinity" =>
                java.lang.Double.valueOf(Double.PositiveInfinity)
              case "-inf" | "-infinity" => java.lang.Double.valueOf(Double.NegativeInfinity)
              case "nan" => java.lang.Double.valueOf(Double.NaN)
              case _ => null
            }
        }
      def toEpoch(s: String, unitPerSec: Double): Any = toDoubleOrNull(s) match {
        case d: java.lang.Double => java.lang.Long.valueOf((d.doubleValue() * unitPerSec).toLong)
        case _ => null
      }
      def stringCell(s: String): UTF8String =
        if (s == emptyMark) UTF8String.EMPTY_UTF8
        else if (s.indexOf('\\') >= 0) UTF8String.fromString(unescapeZeek(s))
        else UTF8String.fromString(s)

      def cell(raw: String, t: String): Any = {
        if (raw == null || raw == unset) return null
        t match {
          case "time" => toEpoch(raw, 1e6)
          case "interval" => toEpoch(raw, 1e9)
          case "count" | "int" | "port" => toLongOrNull(raw)
          case "double" => toDoubleOrNull(raw)
          case "bool" =>
            if (raw == "T") java.lang.Boolean.TRUE
            else if (raw == "F") java.lang.Boolean.FALSE else null
          case c if c.startsWith("set[") || c.startsWith("vector[") =>
            if (raw == emptyMark) return new GenericArrayData(Array.empty[Any])
            val inner = innerOf(c)
            val parts = splitOn(raw, setSep)
            val items = new Array[Any](parts.length)
            var i = 0
            while (i < parts.length) {
              val p = parts(i)
              items(i) =
                if (p == unset) null
                else if (inner == "count" || inner == "int" || inner == "port") toLongOrNull(p)
                else if (inner == "double") toDoubleOrNull(p)
                else UTF8String.fromString(p) // raw: elements don't unescape
              i += 1
            }
            if (c.startsWith("set[")) {
              // zed set values are deduped + ordered (zson.md §2.5.2):
              // array_distinct keeps one null, array_sort puts it last
              val seen = new java.util.LinkedHashSet[Any]
              var hasNull = false
              items.foreach(v => if (v == null) hasNull = true else seen.add(v))
              val sorted = seen.toArray.sortWith { (a, b) =>
                a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
              }
              new GenericArrayData(if (hasNull) sorted :+ (null: Any) else sorted)
            } else new GenericArrayData(items)
          case _ => stringCell(raw)
        }
      }

      iter.flatMap { line =>
        if (line.isEmpty || line.charAt(0) == '#') None
        else {
          val cells = splitOn(line, sep)
          val values = new Array[Any](width)
          if (pathU != null) values(0) = pathU
          var i = 0
          while (i < nFields) {
            values(base + i) = cell(if (i < cells.length) cells(i) else null, typesArr(i))
            i += 1
          }
          values(width - 1) = tagU
          Some(new GenericInternalRow(values): InternalRow)
        }
      }
    }
    val flat = org.apache.spark.sql.graftshim.RowBridge.toDF(spark, rdd, schema)
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

  /** "%.6f" of `us` microseconds as seconds, integer-rendered: sign,
    * seconds, '.', zero-padded 6-digit µs — no java.util.Formatter in the
    * per-row path (it was ~40% of write_zeek's samples). Byte-equal to
    * `format_string("%.6f", us/1e6)` while |us| < 4e15: the exact value
    * sits ON the 1e-6 grid and the double's representation error there is
    * under half a grid step, so the Formatter's rounded rendering IS the
    * grid point. Beyond the guard the Formatter fallback keeps parity.
    */
  private def micros6(us: Column): Column = {
    def pos(u: Column): Column = {
      val frac = pmod(u, lit(1000000L))
      // u - frac is an exact multiple of 1e6 within the guard, so the
      // double division is exact and the long cast loses nothing
      concat(((u - frac) / lit(1e6)).cast(LongType).cast(StringType),
        lit("."), lpad(frac.cast(StringType), 6, "0"))
    }
    val safe = abs(us) < lit(4000000000000000L)
    when(safe && us >= 0, pos(us))
      .when(safe, concat(lit("-"), pos(-us)))
      .otherwise(format_string("%.6f", us.cast(DoubleType) / 1e6))
  }

  private def encodeCol(c: Column, dt: DataType): Column = {
    val enc = dt match {
      case TimestampType | TimestampNTZType =>
        micros6(unix_micros(c))
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

  /** Gzip-compressed twin of [[write]] — the reader auto-detects gzip
    * per file (lineReader), so a compressed log set reads back through
    * the same path. Used where the text form would exceed disk (the
    * sf10 scale smoke's 30 GB fixture).
    */
  def writeGzip(df: DataFrame, path: String): Unit = write(df, path, gzip = true)

  def write(df: DataFrame, path: String): Unit = write(df, path, gzip = false)

  private def write(df: DataFrame, path: String, gzip: Boolean): Unit = {
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
      if (zedTypes.get(name).map(ZType.strip).contains(ZType.Prim("duration")) && dt == LongType) {
        // ns → interval seconds. µs-aligned ns (the common case) render on
        // the exact integer path; sub-µs ns keep the Formatter so its
        // double-rounding of the 7th-9th decimals stays byte-identical
        val sub = pmod(c, lit(1000L))
        // 9e15 < 2^53: ns values beyond that lose integer exactness in the
        // double division, so they stay on the Formatter path
        val intOk = sub === 0 && abs(c) < lit(9000000000000000L)
        coalesce(
          when(intOk, micros6(((c - sub) / lit(1e3)).cast(LongType)))
            .otherwise(format_string("%.6f", c.cast(DoubleType) / 1e9)),
          lit("-"))
      } else encodeCol(c, dt)
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
    // each PART carries its own directive header — zeek tooling (and this
    // engine's reader, whose interleaved-directive path handles repeated
    // headers) accepts multi-file logs, so the write stays fully
    // parallel instead of serializing behind one task
    val rdd = body.rdd.mapPartitions { it =>
      if (it.hasNext) header.iterator ++ it else it
    }
    val writer = df.sparkSession
      .createDataset(rdd)(org.apache.spark.sql.Encoders.STRING)
      .write.mode("overwrite")
    (if (gzip) writer.option("compression", "gzip") else writer).text(path)
  }
}
