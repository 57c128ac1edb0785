package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** The zed scalar-function surface (reference dispatch:
  * runtime/sam/expr/function/function.go:28-169; per-family files cited on
  * each group) re-expressed over Spark built-ins — every function here
  * compiles to Catalyst expressions (whole-stage codegen), no UDFs.
  *
  * Functions whose zed result is `error("missing")` return SQL NULL here —
  * the engine's error-value convention (SURVEY.md §1.4).
  */
object ZedFunctions {

  // ---- math (reference function/math.go) ----------------------------------
  // abs/ceil/floor/round/sqrt/pow/log are Spark built-ins used directly.
  // zed min/max are SCALAR n-ary functions (not aggregates):
  def minScalar(cols: Column*): Column = least(cols: _*)
  def maxScalar(cols: Column*): Column = greatest(cols: _*)

  // ---- string (reference function/string.go) ------------------------------
  // lower/upper/trim/replace/split/levenshtein are built-ins.
  /** zed `join(arr [, sep])` — array of strings to string. */
  def joinStr(arr: Column, sep: String = ""): Column = array_join(arr, sep)

  /** zed `rune_len(s)` — count of unicode code points (Spark's length on
    * strings is already character-based, not bytes).
    */
  def runeLen(s: Column): Column = length(s)

  // ---- regexp (reference function/regexp.go) -------------------------------

  /** Count capture groups in a Java regex (unescaped `(` not followed by
    * `?`) — lets `regexp` build its submatch array at plan time.
    */
  private[graft] def groupCount(re: String): Int = {
    var n = 0; var i = 0; var inClass = false
    while (i < re.length) {
      re.charAt(i) match {
        case '\\' => i += 1
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          // `(?` is non-capturing — except named groups `(?<name>…`, which
          // capture (but lookbehind `(?<=` / `(?<!` does not)
          if (i + 1 >= re.length || re.charAt(i + 1) != '?') n += 1
          else if (i + 2 < re.length && re.charAt(i + 2) == '<' &&
                   i + 3 < re.length && re.charAt(i + 3) != '=' && re.charAt(i + 3) != '!')
            n += 1
        case _ =>
      }
      i += 1
    }
    n
  }

  /** zed `regexp(re, s)` — array of [match, group1, …] of the FIRST match
    * (Go FindStringSubmatch); NULL (zed: error("missing")) when no match.
    */
  def regexpMatch(re: String, s: Column): Column = {
    val groups = (0 to groupCount(re)).map(i => regexp_extract(s, re, i))
    when(s.rlike(re), array(groups: _*)).otherwise(lit(null))
  }
  // regexp_replace is the built-in (zed semantics match: replace all)

  // ---- grep (reference function/grep.go) -----------------------------------

  /** zed `grep(pattern, e…)` — substring match over the string form of the
    * given values (zed matches over the whole nested value; pass the
    * columns to search, or a single to_json(struct(...)) for whole-record).
    */
  def grep(pattern: String, in: Column*): Column =
    // zed keyword/grep matching is case-insensitive substring search
    // (docs/language ztests: "WiDgEt" matches widget)
    in.map(c => coalesce(
      lower(c.cast("string")).contains(lit(pattern.toLowerCase)), lit(false)))
      .reduce(_ || _)

  // ---- time (reference function/time.go) -----------------------------------
  // now() = current_timestamp(); bucket/every live in ZedOps.timeBucket*.

  /** C-strftime → Java DateTimeFormatter pattern (the zed strftime surface;
    * reference function/time.go strftime). Unsupported codes throw at plan
    * time rather than silently mis-formatting.
    */
  private[graft] def strftimeToJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    def quote(s: String): String = if (s.isEmpty) "" else "'" + s.replace("'", "''") + "'"
    var literal = new StringBuilder
    def flush(): Unit = { sb.append(quote(literal.toString)); literal = new StringBuilder }
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        flush()
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy"); case 'y' => sb.append("yy")
          case 'm' => sb.append("MM");   case 'd' => sb.append("dd")
          case 'e' => sb.append("d")
          case 'H' => sb.append("HH");   case 'I' => sb.append("hh")
          case 'M' => sb.append("mm");   case 'S' => sb.append("ss")
          case 'j' => sb.append("DDD")
          case 'b' => sb.append("MMM");  case 'B' => sb.append("MMMM")
          case 'a' => sb.append("EEE");  case 'A' => sb.append("EEEE")
          case 'p' => sb.append("a")
          case 'Z' => sb.append("zz");   case 'z' => sb.append("xx")
          case 'T' => sb.append("HH:mm:ss")
          case 'D' => sb.append("MM/dd/yy")
          case 'F' => sb.append("yyyy-MM-dd")
          case '%' => literal.append('%')
          case c => throw new IllegalArgumentException(s"strftime: unsupported %$c")
        }
        i += 2
      } else { literal.append(fmt.charAt(i)); i += 1 }
    }
    flush()
    sb.toString
  }

  /** zed `strftime(fmt, t)` over a Spark timestamp column. The cast makes
    * TIMESTAMP_NTZ carriers (parquet `timestamp[us]` without the UTC flag —
    * what pandas writes) work too: session TZ is pinned UTC
    * (GraftSession), so NTZ→TIMESTAMP is exact; on TIMESTAMP it's a no-op.
    */
  def strftime(fmt: String, t: Column): Column =
    date_format(t.cast(TimestampType), strftimeToJava(fmt))

  /** Same over the engine's ns-since-epoch long time columns. */
  def strftimeNs(fmt: String, tsNs: Column): Column =
    strftime(fmt, timestamp_micros(Bridge.intDiv(tsNs, lit(1000L))))

  // ---- time carriers (reference nano.Ts — value.go:84) ---------------------
  // The engine meets three Spark time carriers: LongType ns (parquet
  // TIMESTAMP(NANOS) under nanosAsLong), TIMESTAMP, and TIMESTAMP_NTZ
  // (any parquet timestamp[us/ms] lacking isAdjustedToUTC). Session TZ is
  // pinned UTC, so NTZ↔TIMESTAMP casts are exact wall-clock moves.

  /** Any time carrier → ns-since-epoch long (exact under the UTC session). */
  def toNs(c: Column, dt: DataType): Column = dt match {
    case LongType => c
    case TimestampNTZType => unix_micros(c.cast(TimestampType)) * 1000L
    case _ => unix_micros(c) * 1000L
  }

  /** Any time carrier → a session-TZ TIMESTAMP column. */
  def asTs(c: Column, dt: DataType): Column = dt match {
    case LongType => timestamp_micros(Bridge.intDiv(c, lit(1000L)))
    case TimestampType => c
    case _ => c.cast(TimestampType)
  }

  /** True for the timestamp-typed carriers (ns-long is LongType, not this). */
  def isTimeDt(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  // ---- parsing (reference function/parse.go, function/grok.go) -------------

  /** Result of the Go-semantics URL parse: every component optional,
    * query a key→values multimap in first-appearance order.
    */
  final case class GoUrl(scheme: Option[String], opaque: Option[String],
                         user: Option[String], password: Option[String],
                         host: Option[String], port: Option[String],
                         path: Option[String],
                         query: Vector[(String, Vector[String])],
                         fragment: Option[String])

  /** net/url.Parse semantics (the subset parse_uri exercises): scheme
    * validation with Go's error text, authority with userinfo/host/port,
    * opaque form, query multimap, fragment. Left = Go's error message.
    */
  def goUrlParse(raw: String): Either[String, GoUrl] = {
    def opt(s: String): Option[String] = Option(s).filter(_.nonEmpty)
    // fragment splits first (url.Parse → parse(u, false) after Cut on '#')
    val hashIdx = raw.indexOf('#')
    val (noFrag, fragment) =
      if (hashIdx < 0) (raw, None) else (raw.substring(0, hashIdx), opt(raw.substring(hashIdx + 1)))
    // getScheme (net/url/url.go): letters then alnum+.-, terminated by ':'
    var scheme: Option[String] = None
    var rest = noFrag
    var i = 0
    var done = false
    while (!done && i < noFrag.length) {
      val c = noFrag.charAt(i)
      if (c.isLetter) i += 1
      else if ((c.isDigit || c == '+' || c == '-' || c == '.') && i > 0) i += 1
      else if (c == ':') {
        if (i == 0) return Left(s"""parse "$raw": missing protocol scheme""")
        scheme = Some(noFrag.substring(0, i).toLowerCase)
        rest = noFrag.substring(i + 1)
        done = true
      } else done = true
    }
    // query splits at the FIRST '?' (strings.Cut)
    val qIdx = rest.indexOf('?')
    val (restNoQ, rawQuery) =
      if (qIdx < 0) (rest, "") else (rest.substring(0, qIdx), rest.substring(qIdx + 1))
    var opaque: Option[String] = None
    var user: Option[String] = None
    var password: Option[String] = None
    var host: Option[String] = None
    var port: Option[String] = None
    var path: Option[String] = None
    if (restNoQ.startsWith("//")) {
      val afterSlashes = restNoQ.substring(2)
      val slash = afterSlashes.indexOf('/')
      val (auth, p) =
        if (slash < 0) (afterSlashes, "") else (afterSlashes.substring(0, slash), afterSlashes.substring(slash))
      path = opt(p)
      val at = auth.lastIndexOf('@')
      val (userinfo, hostport) =
        if (at < 0) ("", auth) else (auth.substring(0, at), auth.substring(at + 1))
      if (userinfo.nonEmpty) {
        val colon = userinfo.indexOf(':')
        if (colon < 0) user = opt(userinfo)
        else { user = opt(userinfo.substring(0, colon)); password = Some(userinfo.substring(colon + 1)) }
      }
      // validOptionalPort: ':' + one-or-more digits after the LAST ':'
      // outside any [v6] bracket
      val bracketEnd = hostport.lastIndexOf(']')
      val colon = hostport.lastIndexOf(':')
      if (colon > bracketEnd && hostport.substring(colon + 1).nonEmpty &&
          hostport.substring(colon + 1).forall(_.isDigit)) {
        host = opt(hostport.substring(0, colon).stripPrefix("[").stripSuffix("]"))
        port = Some(hostport.substring(colon + 1))
      } else host = opt(hostport.stripPrefix("[").stripSuffix("]"))
    } else if (scheme.nonEmpty && restNoQ.nonEmpty && !restNoQ.startsWith("/")) {
      opaque = Some(restNoQ)
    } else {
      path = opt(restNoQ)
    }
    // ParseQuery: '&'-separated k=v, '+' → space; %-escapes via URLDecoder
    val query = Vector.newBuilder[(String, Vector[String])]
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    if (rawQuery.nonEmpty) {
      def unesc(s: String): String =
        try java.net.URLDecoder.decode(s, "UTF-8") catch { case _: Exception => s }
      for (part <- rawQuery.split("&", -1) if part.nonEmpty) {
        val eq = part.indexOf('=')
        val (k, v) = if (eq < 0) (unesc(part), "") else (unesc(part.substring(0, eq)), unesc(part.substring(eq + 1)))
        seen(k) = seen.getOrElse(k, Vector.empty) :+ v
      }
    }
    seen.foreach { case (k, vs) => query += (k -> vs) }
    Right(GoUrl(scheme, opaque, user, password, host, port, path, query.result(), fragment))
  }

  /** Relational parse_uri: the reference record shape (parse.go ParseURI)
    * as a typed struct; rows that the reference maps to error values come
    * back NULL here (error values need the typed/variant stream — the
    * query-language frontend routes there).
    */
  def parseUri(s: Column): Column = {
    val u = udf((raw: String) => {
      if (raw == null) None
      else goUrlParse(raw) match {
        case Left(_) => None
        case Right(g) =>
          val portNum = g.port.flatMap(p =>
            try { val n = p.toLong; if (n <= 65535) Some(n.toInt) else None }
            catch { case _: Exception => None })
          if (g.port.nonEmpty && portNum.isEmpty) None // invalid port → error in zed
          else Some((g.scheme.orNull, g.opaque.orNull, g.user.orNull,
            g.password.orNull, g.host.orNull, portNum,
            g.path.orNull,
            if (g.query.isEmpty) None else Some(g.query.map { case (k, v) => k -> v }.toMap),
            g.fragment.orNull))
      }
    })
    u(s).cast(
      "struct<scheme:string,opaque:string,user:string,password:string," +
        "host:string,port:int,path:string,query:map<string,array<string>>,fragment:string>")
  }

  // grok: the classic base-pattern dictionary, enough for the common
  // log-parsing cases (reference function/grok.go uses a full grok lib;
  // the pattern language subset here is %{PATTERN:field} / %{PATTERN}).
  private val grokBase: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "BASE16NUM" -> "(?:0[xX])?[0-9a-fA-F]+",
    "IP" -> "(?:\\d{1,3}\\.){3}\\d{1,3}",
    "IPORHOST" -> "(?:(?:\\d{1,3}\\.){3}\\d{1,3}|[A-Za-z0-9._-]+)",
    "HOSTNAME" -> "[A-Za-z0-9._-]+",
    "URIPATH" -> "(?:/[A-Za-z0-9_.~%!$&'()*+,;=:@-]*)+",
    "LOGLEVEL" -> "(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERR(?:OR)?|CRIT(?:ICAL)?|FATAL)",
    "TIMESTAMP_ISO8601" ->
      "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?"
  )

  /** Compile a grok pattern to (java regex, captured field names). */
  private[graft] def grokCompile(pattern: String): (String, Seq[String]) = {
    val ref = "%\\{(\\w+)(?::(\\w+))?\\}".r
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val regex = ref.replaceAllIn(pattern, m => {
      val base = grokBase.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"grok: unknown pattern %{${m.group(1)}}"))
      val quoted = java.util.regex.Matcher.quoteReplacement(base)
      Option(m.group(2)) match {
        case Some(field) => names += field; s"($quoted)"
        case None => s"(?:$quoted)"
      }
    })
    (regex, names.toSeq)
  }

  /** zed `grok(pattern, s)` → record of captured fields (strings); NULL
    * when the pattern does not match.
    */
  def grok(pattern: String, s: Column): Column = {
    val (re, names) = grokCompile(pattern)
    require(names.nonEmpty, "grok pattern captures no fields")
    val rec = struct(names.zipWithIndex.map { case (n, i) =>
      regexp_extract(s, re, i + 1).as(n)
    }: _*)
    when(s.rlike(re), rec).otherwise(lit(null))
  }

  // ---- bytes / encoding (reference function/bytes.go) -----------------------
  // base64/unbase64/hex/unhex are built-ins used directly.

  // ---- network (reference function/ip.go) -----------------------------------
  // IPv4 only; ip/net travel as strings (SURVEY.md §1.4 mapping).

  /** Dotted-quad string → uint32-as-long. NULL for malformed input. */
  def ip4ToLong(ip: Column): Column = {
    val p = split(ip, "\\.")
    when(size(p) === 4,
      element_at(p, 1).cast("long") * 16777216L +
        element_at(p, 2).cast("long") * 65536L +
        element_at(p, 3).cast("long") * 256L +
        element_at(p, 4).cast("long"))
      .otherwise(lit(null))
  }

  private def long4ToIp(v: Column): Column =
    concat_ws(".",
      shiftright(v, 24).bitwiseAND(lit(255L)).cast("string"),
      shiftright(v, 16).bitwiseAND(lit(255L)).cast("string"),
      shiftright(v, 8).bitwiseAND(lit(255L)).cast("string"),
      v.bitwiseAND(lit(255L)).cast("string"))

  /** Network mask for a prefix length column (2^32 − 2^(32−p)). */
  private def maskOf(prefix: Column): Column =
    lit(4294967296L) - pow(lit(2.0), lit(32) - prefix).cast("long")

  /** zed `cidr_match(net, ip)` — is ip within the CIDR block? Both sides
    * may be columns; net is "a.b.c.d/p".
    */
  def cidrMatch(net: Column, ip: Column): Column = {
    val base = ip4ToLong(split(net, "/").getItem(0))
    val prefix = split(net, "/").getItem(1).cast("int")
    val m = maskOf(prefix)
    (ip4ToLong(ip).bitwiseAND(m)) === (base.bitwiseAND(m))
  }

  /** zed `network_of(ip [, prefixlen])` → "a.b.c.0/p" network string.
    * One-arg form uses classful defaults (A/B/C), like the reference.
    */
  def networkOf(ip: Column, prefix: Column): Column =
    concat(long4ToIp(ip4ToLong(ip).bitwiseAND(maskOf(prefix))), lit("/"),
      prefix.cast("string"))

  def networkOf(ip: Column): Column = {
    val first = element_at(split(ip, "\\."), 1).cast("int")
    val classful = when(first < 128, 8).when(first < 192, 16).otherwise(24)
    networkOf(ip, classful)
  }

  // ---- full network_of with reference error payloads (function/ip.go) -------

  /** Is the text a valid v4/v6 address? (shared by the typed ip caster) */
  def isIpText(s: String): Boolean = parseIpBytes(s) != null

  private def parseIpBytes(s: String): Array[Byte] = {
    if (s == null) return null
    val v4 = s.matches("""\d{1,3}(\.\d{1,3}){3}""")
    val v6 = s.contains(":") && s.matches("""[0-9a-fA-F:]+""")
    if (!v4 && !v6) return null
    try java.net.InetAddress.getByName(s).getAddress
    catch { case _: Exception => null }
  }

  private def leadingOnes(b: Array[Byte]): Int = {
    var n = 0
    var i = 0
    while (i < b.length) {
      var bit = 7
      while (bit >= 0) {
        if (((b(i) >> bit) & 1) == 1) n += 1 else return n
        bit -= 1
      }
      i += 1
    }
    n
  }

  private def maskBytes(len: Int, bits: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    for (i <- out.indices) {
      val keep = math.max(0, math.min(8, bits - i * 8))
      out(i) = (if (keep == 0) 0 else (0xff << (8 - keep)) & 0xff).toByte
    }
    out
  }

  /** Canonical text of an address (compressed ipv6, like the reference). */
  private def ipText(b: Array[Byte]): String =
    if (b.length == 4) b.map(_ & 0xff).mkString(".")
    else {
      val groups = b.grouped(2).map(p => ((p(0) & 0xff) << 8) | (p(1) & 0xff)).toArray
      // longest zero run → "::" (RFC 5952)
      var best = -1; var bestLen = 0; var i = 0
      while (i < 8) {
        if (groups(i) == 0) {
          var j = i; while (j < 8 && groups(j) == 0) j += 1
          if (j - i > bestLen) { best = i; bestLen = j - i }; i = j
        } else i += 1
      }
      if (bestLen < 2) groups.map(g => Integer.toHexString(g)).mkString(":")
      else {
        val l = groups.take(best).map(g => Integer.toHexString(g)).mkString(":")
        val r = groups.drop(best + bestLen).map(g => Integer.toHexString(g)).mkString(":")
        l + "::" + r
      }
    }

  /** Canonical text of a CIDR net: the address is masked to the prefix
    * (zed renders `1::/8` as `::/8` — netip.Prefix.Masked semantics).
    */
  def canonNetText(s: String): String = {
    val slash = s.lastIndexOf('/')
    if (slash < 0) return s
    val addr = parseIpBytes(s.substring(0, slash))
    val bits = try s.substring(slash + 1).toInt catch { case _: Exception => -1 }
    if (addr == null || bits < 0 || bits > addr.length * 8) return s
    val m = maskBytes(addr.length, bits)
    val net = addr.zip(m).map { case (a, b) => (a & b).toByte }
    s"${ipText(net)}/$bits"
  }

  /** zed network_of with mask-arg dispatch and the reference's error
    * payloads (function/ip.go NetworkOf). `kind` is "none" | "int" |
    * "ip" | "string"; returns (net, errZson) — exactly one non-null.
    */
  private[graft] def networkOfZed(ipS: String, mask: String, kind: String): (String, String) = {
    def err(msg: String, on: String) = (null: String, s"""{message:"$msg",on:$on}""")
    val addr = parseIpBytes(ipS)
    if (addr == null)
      return err("network_of: not an IP", if (ipS == null) "null" else "\"" + ipS + "\"")
    def prefix(bits: Int): (String, String) = {
      val m = maskBytes(addr.length, bits)
      val net = addr.zip(m).map { case (a, b) => (a & b).toByte }
      (ipText(net) + "/" + bits, null)
    }
    kind match {
      case "none" =>
        if (addr.length != 4) err("network_of: not an IPv4 address", ipS)
        else {
          val b0 = addr(0) & 0xff
          prefix(if (b0 < 0x80) 8 else if (b0 < 0xc0) 16 else 24)
        }
      case "int" =>
        val bits = try mask.toDouble.toInt catch { case _: Exception => -1 }
        if (bits < 0 || bits > 128 || (bits > 32 && addr.length == 4))
          err("network_of: CIDR bit count out of range", s"{address:$ipS,mask:$mask}")
        else prefix(bits)
      case "ip" =>
        val mb = parseIpBytes(mask)
        if (mb == null) err("network_of: bad arg for CIDR mask", "\"" + mask + "\"")
        else if (mb.length != addr.length)
          err("network_of: address and mask have different lengths",
            s"{address:$ipS,mask:$mask}")
        else {
          val bits = leadingOnes(mb)
          if (!maskBytes(mb.length, bits).sameElements(mb))
            err("network_of: mask is non-contiguous", mask)
          else prefix(bits)
        }
      case _ => err("network_of: bad arg for CIDR mask",
        if (mask == null) "null" else "\"" + mask + "\"")
    }
  }

  // ---- misc (reference coalesce.go, len.go, compare.go) ----------------------
  // coalesce is the built-in; len: use size() for arrays/maps and length()
  // for strings (dispatch at plan time by the column's type).

  /** zed `compare(a, b[, nullsMax])` → -1/0/1 (nullsMax defaults true). */
  def compareVals(a: Column, b: Column, nullsMax: Boolean = true): Column =
    when(a.isNull && b.isNull, 0)
      .when(a.isNull, if (nullsMax) 1 else -1)
      .when(b.isNull, if (nullsMax) -1 else 1)
      .when(a < b, -1).when(a > b, 1).otherwise(0)
}
