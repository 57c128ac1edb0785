package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._
import scala.collection.mutable

import graft.lang.Graft
import graft.sources.{Formats, ZsonIO, ZsonReader}

/** Harness for the reference's doc-example corpus: every
  * ```mdtest-command``` / ```mdtest-output``` pair in the reference's
  * docs markdown tree is an executable example (reference runner:
  * mdtest/mdtest.go). Commands are a narrow shell dialect — echo/printf/
  * cat pipelines into `super query`/`super db` plus `export` — which this
  * harness interprets directly against the engine's public API instead of
  * spawning processes. Blocks in one .md file share a working directory
  * (and therefore lake state), exactly like the reference runner.
  */
object MdtestHarness {

  final case class MdCase(file: String, ord: Int, cmdInfo: String,
                          command: String, outInfo: String, output: String)
  final case class MdFile(path: String, inputs: Map[String, String],
                          cases: Seq[MdCase])

  // ---- extraction -----------------------------------------------------------

  def extractFiles(root: String = "/root/reference/docs"): Seq[MdFile] = {
    val mds = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .iterator().asScala.filter(_.toString.endsWith(".md")).toSeq.sortBy(_.toString)
    mds.flatMap { p =>
      val lines = java.nio.file.Files.readAllLines(p).asScala.toVector
      val inputs = mutable.Map.empty[String, String]
      val cases = Vector.newBuilder[MdCase]
      var pendingCmd: Option[(String, String)] = None // (info, body)
      var ord = 0
      var i = 0
      while (i < lines.length) {
        val l = lines(i).trim
        if (l.startsWith("```mdtest-")) {
          val info = l.stripPrefix("```")
          val body = new StringBuilder
          i += 1
          while (i < lines.length && lines(i).trim != "```") {
            body.append(lines(i)).append('\n'); i += 1
          }
          val kind = info.split("\\s+").head
          val rest = info.drop(kind.length).trim
          kind match {
            case "mdtest-input" =>
              if (rest.nonEmpty) inputs(rest) = body.toString
            case "mdtest-command" =>
              pendingCmd = Some((rest, body.toString))
            case "mdtest-output" =>
              pendingCmd.foreach { case (ci, cb) =>
                cases += MdCase(p.toString, ord, ci, cb, rest, body.toString)
                ord += 1
              }
              pendingCmd = None
            case _ => // -skip, go-example: ignored
              pendingCmd = None
          }
        }
        i += 1
      }
      val cs = cases.result()
      if (cs.nonEmpty) Some(MdFile(p.toString, inputs.toMap, cs)) else None
    }
  }

  // ---- shell lexing ---------------------------------------------------------

  /** Lex a command block into commands of tokens. Newlines separate
    * commands unless inside quotes, after a trailing `|`, or escaped.
    */
  private[graft] def lexCommands(body: String): Seq[Seq[String]] = {
    val commands = Vector.newBuilder[Seq[String]]
    var tokens = Vector.newBuilder[String]
    var nTokens = 0
    val cur = new StringBuilder
    var started = false
    var lastWasPipe = false
    def endToken(): Unit = if (started) {
      tokens += cur.toString; nTokens += 1
      lastWasPipe = cur.toString == "|"
      cur.clear(); started = false
    }
    def endCommand(): Unit = {
      endToken()
      if (nTokens > 0) { commands += tokens.result(); tokens = Vector.newBuilder[String]; nTokens = 0 }
    }
    var i = 0
    val n = body.length
    while (i < n) {
      body.charAt(i) match {
        case '\'' =>
          started = true
          i += 1
          while (i < n && body.charAt(i) != '\'') { cur.append(body.charAt(i)); i += 1 }
          i += 1
        case '"' =>
          started = true
          i += 1
          while (i < n && body.charAt(i) != '"') {
            if (body.charAt(i) == '\\' && i + 1 < n &&
                "\"\\$`".indexOf(body.charAt(i + 1)) >= 0) {
              cur.append(body.charAt(i + 1)); i += 2
            } else { cur.append(body.charAt(i)); i += 1 }
          }
          i += 1
        case '\\' if i + 1 < n && body.charAt(i + 1) == '\n' =>
          endToken(); i += 2 // line continuation
        case '\n' =>
          endToken()
          if (!lastWasPipe) endCommand()
          i += 1
        case c if c == ' ' || c == '\t' =>
          endToken(); i += 1
        case '|' if !started || cur.isEmpty =>
          endToken(); tokens += "|"; nTokens += 1; lastWasPipe = true; i += 1
        case '>' if !started =>
          endToken(); tokens += ">"; nTokens += 1; lastWasPipe = false; i += 1
        case c =>
          started = true; cur.append(c); i += 1
      }
    }
    endCommand()
    commands.result()
  }

  // ---- shell ----------------------------------------------------------------

  final class Unsupported(what: String) extends RuntimeException(s"unsupported: $what")

  /** One markdown file's shell: a shared working directory holding the
    * file's mdtest-input files (or a read-only reference dir for dir=
    * blocks) plus any lake state earlier blocks created.
    */
  final class Shell(spark: SparkSession, val workDir: java.nio.file.Path) {
    private val env = mutable.Map.empty[String, String]

    // script-style ztests: the whole script's stdin (an input named
    // `stdin`) — a command reading `-` without a pipe sees it
    private var defaultStdin: Option[String] = None
    def setDefaultStdin(text: String): Unit = defaultStdin = Some(text)

    // `tee /dev/stderr` and friends write here; the script harness reads
    // it back as the script's stderr
    val stderrSink = new StringBuilder

    private def filePath(name: String): String =
      if (name.startsWith("/")) name else workDir.resolve(name).toString

    /** Binary content (zng artifacts piped through cat / redirects) rides
      * Strings as ISO-8859-1, which is byte-preserving; text stays UTF-8.
      */
    private[graft] def isBinaryText(s: String): Boolean =
      s.exists(c => c < 0x09 || (c > 0x0d && c < 0x20) || c == 0x7f)

    private def readFile(name: String): String = {
      val p = java.nio.file.Paths.get(filePath(name))
      val bytes = java.nio.file.Files.readAllBytes(p)
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      catch { case _: java.nio.charset.CharacterCodingException =>
        new String(bytes, "ISO-8859-1") }
    }

    private def encodeOut(s: String): Array[Byte] =
      if (isBinaryText(s) && s.forall(_ <= 0xff)) s.getBytes("ISO-8859-1")
      else s.getBytes("UTF-8")

    /** Run a whole block; returns combined stdout. Throws on error. */
    def runBlock(body: String): String = {
      val out = new StringBuilder
      for (cmd <- lexCommands(body)) out.append(runCommand(cmd))
      out.toString
    }

    private def runCommand(tokens0: Seq[String]): String = {
      // strip a trailing `> file` redirect
      var tokens = tokens0
      var redirect: Option[String] = None
      val gt = tokens.indexOf(">")
      if (gt >= 0 && gt == tokens.length - 2) {
        redirect = Some(tokens.last); tokens = tokens.take(gt)
      }
      // split into pipeline segments
      val segs = {
        val b = Vector.newBuilder[Seq[String]]
        var cur = Vector.newBuilder[String]
        var k = 0
        for (t <- tokens) {
          if (t == "|") { b += cur.result(); cur = Vector.newBuilder[String]; k += 1 }
          else cur += t
        }
        b += cur.result()
        b.result().filter(_.nonEmpty)
      }
      var stdin: Option[String] = defaultStdin
      var outText = ""
      for (seg <- segs) {
        outText = runSimple(seg, stdin)
        stdin = Some(outText)
      }
      redirect match {
        case Some("/dev/null") => ""
        case Some(f) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(filePath(f)),
            encodeOut(outText))
          ""
        case None => outText
      }
    }

    private def runSimple(seg: Seq[String], stdin: Option[String]): String =
      seg.head match {
        case "echo" =>
          seg.tail.filterNot(_ == "-n").mkString(" ") +
            (if (seg.contains("-n")) "" else "\n")
        case "printf" =>
          val fmt = seg(1)
          // escapes only (the docs' printf usage carries no % formats)
          fmt.replace("\\n", "\n").replace("\\t", "\t")
        case "cat" =>
          seg.tail.map {
            case "-" => stdin.getOrElse("")
            case f => readFile(f)
          }.mkString
        case "export" =>
          seg.tail.foreach { kv =>
            val ix = kv.indexOf('=')
            if (ix > 0) env(kv.take(ix)) = kv.drop(ix + 1)
          }
          ""
        case "head" | "tail" =>
          var n = 10
          var files = Vector.empty[String]
          var i2 = 1
          while (i2 < seg.length) {
            seg(i2) match {
              case "-n" => n = seg(i2 + 1).toInt; i2 += 2
              case f if f.startsWith("-") && f.drop(1).forall(_.isDigit) =>
                n = f.drop(1).toInt; i2 += 1
              case f => files = files :+ f; i2 += 1
            }
            ()
          }
          val text = if (files.nonEmpty) files.map(readFile).mkString
                     else stdin.getOrElse("")
          val ls = text.linesIterator.toSeq
          (if (seg.head == "head") ls.take(n) else ls.takeRight(n))
            .map(_ + "\n").mkString
        case "mkdir" =>
          seg.tail.filterNot(_.startsWith("-")).foreach { d =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(filePath(d)))
          }
          ""
        case "mv" =>
          val paths = seg.tail.filterNot(_.startsWith("-"))
          java.nio.file.Files.move(
            java.nio.file.Paths.get(filePath(paths(0))),
            java.nio.file.Paths.get(filePath(paths(1))))
          ""
        case "awk" =>
          // minimal awk: '{print $N}' over stdin (ztest scripts capture
          // single fields of command output)
          val prog = seg.tail.mkString(" ")
          val m = """\{\s*print\s+\$(\d+)\s*\}""".r.findFirstMatchIn(prog)
            .getOrElse(throw new Unsupported(s"awk $prog"))
          val n = m.group(1).toInt
          stdin.getOrElse("").linesIterator.map { l =>
            val fs = l.trim.split("\\s+")
            (if (n >= 1 && n <= fs.length) fs(n - 1) else "") + "\n"
          }.mkString
        case "sort" =>
          stdin.getOrElse("").linesIterator.toSeq.sorted.map(_ + "\n").mkString
        case "tee" =>
          val text = stdin.getOrElse("")
          seg.tail.filter(_ == "/dev/stderr").foreach(_ => stderrSink.append(text))
          seg.tail.filterNot(f => f.startsWith("-") || f == "/dev/stderr").foreach { f =>
            java.nio.file.Files.write(java.nio.file.Paths.get(filePath(f)),
              encodeOut(text))
          }
          text
        case "hexdump" =>
          // `hexdump -C <file>` over a (binary) artifact
          val fn = seg.tail.filterNot(_.startsWith("-")).headOption
          val bytes = fn match {
            case Some(f2) => java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(filePath(f2)))
            case None => stdin.getOrElse("").getBytes("ISO-8859-1")
          }
          val sb = new StringBuilder
          var off = 0
          while (off < bytes.length) {
            val row = bytes.slice(off, math.min(off + 16, bytes.length))
            val hex = row.map(b => f"${b & 0xff}%02x")
            val hexCols = (0 until 16).map { j =>
              (if (j < hex.length) hex(j) else "  ") +
                (if (j == 7) "  " else " ")
            }.mkString.stripSuffix(" ")
            val ascii = row.map(b =>
              if (b >= 0x20 && b < 0x7f) b.toChar else '.').mkString
            sb.append(f"$off%08x  $hexCols%-49s |$ascii|\n")
            off += 16
          }
          sb.append(f"${bytes.length}%08x\n")
          sb.toString
        case "seq" =>
          val ns = seg.tail.map(_.toLong)
          val (from, to) = ns match {
            case Seq(n) => (1L, n)
            case Seq(a, b) => (a, b)
            case _ => (1L, 0L)
          }
          (from to to).map(_.toString + "\n").mkString
        case "super" =>
          seg(1) match {
            case "query" => superQuery(seg.drop(2), stdin)
            case "db" => superDb(seg.drop(2), stdin)
            case _ => superQuery(seg.drop(1), stdin) // bare `super -c …`
          }
        case other => throw new Unsupported(s"command $other")
      }

    // ---- super query --------------------------------------------------------

    private final case class QFlags(
      format: String, inFmt: Option[String], query: Option[String],
      includes: Seq[String], files: Seq[String], useStdin: Boolean,
      outFile: Option[String], quiet: Boolean,
      split: Option[String] = None, splitSize: Option[Long] = None,
      canonical: Boolean = false)

    private def parseQueryFlags(args: Seq[String]): QFlags = {
      var format = "zson"
      var inFmt: Option[String] = None
      var query: Option[String] = None
      var includes = Vector.empty[String]
      var files = Vector.empty[String]
      var useStdin = false
      var outFile: Option[String] = None
      var quiet = false
      var split: Option[String] = None
      var splitSize: Option[Long] = None
      var explicitFmt = false
      var jFlag = false
      var canonical = false
      var i = 0
      def sizeOf(v: String): Long =
        """(\d+)([KMG]?)B?""".r.findFirstMatchIn(v).map { m =>
          m.group(1).toLong * (m.group(2) match {
            case "K" => 1024L; case "M" => 1024L * 1024; case "G" => 1024L * 1024 * 1024
            case _ => 1L
          })
        }.getOrElse(0L)
      while (i < args.length) {
        args(i) match {
          case "-z" => format = "zson"; explicitFmt = true; i += 1
          case "-Z" => format = "zson-pretty"; explicitFmt = true; i += 1
          case "-f" => format = args(i + 1); explicitFmt = true; i += 2
          case "-j" | "-J" => format = "json"; jFlag = true; i += 1
          case "-i" => inFmt = Some(args(i + 1)); i += 2
          case "-c" => query = Some(args(i + 1)); i += 2
          case "-I" => includes :+= args(i + 1); i += 2
          case "-o" => outFile = Some(args(i + 1)); i += 2
          case "-q" => quiet = true; i += 1
          case "-s" => i += 1
          case "-split" => split = Some(args(i + 1)); i += 2
          case "-splitsize" => splitSize = Some(sizeOf(args(i + 1))); i += 2
          case f @ ("-aggmem" | "-sortmem") =>
            // memory caps: validated, then ignored — Spark spills on its
            // own (the reference's spill machinery analog)
            if (sizeOf(args(i + 1)) <= 0)
              throw new RuntimeException(
                s"${f.stripPrefix("-")} value must be greater than zero")
            i += 2
          case "-e=false" | "-e" => i += 1
          case "-pretty" => format = "zson-pretty"; explicitFmt = true; i += 2
          case "-C" => canonical = true; i += 1
          case "-" => useStdin = true; i += 1
          case f if f.startsWith("-") => throw new Unsupported(s"flag $f")
          case word =>
            // first bare word: query text if none yet AND it's not an
            // existing file (or file glob); later words are input files
            val globMatches: Seq[String] =
              if (word.exists("*?[".contains(_))) {
                val dir = java.nio.file.Paths.get(filePath(".")).normalize
                val m = java.nio.file.FileSystems.getDefault
                  .getPathMatcher("glob:" + word)
                if (java.nio.file.Files.isDirectory(dir))
                  java.nio.file.Files.list(dir).iterator.asScala
                    .filter(p => m.matches(p.getFileName)).map(_.getFileName.toString)
                    .toSeq.sorted
                else Seq.empty
              } else Seq.empty
            val isFile = java.nio.file.Files.exists(
              java.nio.file.Paths.get(filePath(word)))
            if (globMatches.nonEmpty) files ++= globMatches
            else if (query.isEmpty && includes.isEmpty && !isFile) query = Some(word)
            else files :+= word
            i += 1
        }
      }
      if (jFlag && explicitFmt)
        throw new RuntimeException("cannot use -j or -J with -f, -z, or -Z")
      QFlags(format, inFmt, query, includes, files, useStdin, outFile, quiet,
        split, splitSize, canonical)
    }

    private def buildStdinFrame(text: String, inFmt: Option[String]): DataFrame =
      try buildStdinFrame0(text, inFmt)
      catch {
        case e: Exception if inFmt.isEmpty =>
          throw new RuntimeException(
            s"stdin: format detection error: ${e.getMessage}")
      }

    private def buildStdinFrame0(text: String, inFmt: Option[String]): DataFrame = {
      // binary zng on stdin (cat a.zng | …): bytes ride the string as
      // ISO-8859-1 — round-trip to a temp file and scan it as zng
      if (inFmt.contains("zng") ||
          (inFmt.isEmpty && isBinaryText(text) && text.forall(_ <= 0xff))) {
        val d = java.nio.file.Files.createTempDirectory("mdstdin")
        val p = d.resolve("stdin.zng")
        java.nio.file.Files.write(p, text.getBytes("ISO-8859-1"))
        return Formats.read(spark, p.toString)
      }
      val flags = inFmt.map(f => s"-i $f").getOrElse {
        if (text.startsWith("#separator") || text.startsWith("#fields") ||
            text.startsWith("#path")) "-i zeek"
        else if (looksLikeCsv(text)) "-i csv"
        else ""
      }
      ZtestHarness.buildInput(spark,
        ZtestHarness.ZCase("<stdin>", "", text, flags, "", ""))
    }

    /** anyio-style stdin sniff: a comma-regular header plus rows that do
      * NOT parse as zson (bare `a,b` words aren't zson values).
      */
    private def looksLikeCsv(text: String): Boolean = {
      val lines = text.linesIterator.filter(_.nonEmpty).toSeq
      if (lines.length < 2 || !lines.head.contains(',')) return false
      val n = lines.head.count(_ == ',')
      if (!lines.forall(l => l.count(_ == ',') == n)) return false
      try { graft.sources.ZsonParser.parseAll(text); false }
      catch { case _: Exception => true }
    }

    private def combineFrames(dfs: Seq[DataFrame]): DataFrame =
      if (dfs.length == 1) dfs.head
      else graft.operators.ZedOps.combine(dfs: _*)

    private def superQuery(args: Seq[String], stdin: Option[String]): String = {
      val f = parseQueryFlags(args)
      val inc = f.includes.map(readFile)
      val queryText = (inc ++ f.query.toSeq).mkString("\n").trim
      if (f.canonical)
        return graft.lang.Canon.format(queryText) + "\n"
      val frames =
        f.files.map(p => Formats.read(spark, filePath(p))) ++
          (if (f.useStdin || (f.files.isEmpty && stdin.isDefined))
             stdin.map(buildStdinFrame(_, f.inFmt)).toSeq
           else Seq.empty)
      withCwd {
        val res =
          if (frames.nonEmpty) {
            val in = combineFrames(frames)
            if (queryText.isEmpty) in else Graft.queryOn(in, queryText)
          } else if (queryText.startsWith("from") || queryText.contains("| from")) {
            Graft.query(spark, workDir.toString, queryText)
          } else {
            // no input at all: an expression query evaluates over a
            // single null value (`super query -z -c '1+1'` → 2), but an
            // implied SEARCH has nothing to search (no-files ztest)
            require(queryText.nonEmpty, "super query: no query and no input")
            val searchFirst =
              try graft.lang.Parser.parse(queryText).stages.headOption.exists {
                case graft.lang.Stage.Where(_) => true
                case _ => false
              } catch { case _: Exception => false }
            if (searchFirst)
              throw new RuntimeException("super query: no data source found")
            Graft.queryOn(ZsonReader.fromText(spark, "null"), queryText)
          }
        renderOut(res, f)
      }
    }

    private def renderOut(res: DataFrame, f: QFlags): String = {
      f.split.foreach { dir => return renderSplit(res, f, dir) }
      val lines: Seq[String] = f.format match {
        case "zson" | "zson-pretty" => ZsonIO.toZson(res).collect().toSeq
        case "csv" => graft.sources.ZFormat.csvLines(res)
        case "zeek" => graft.sources.ZFormat.zeekLines(res).collect().toSeq
        case "zjson" => graft.sources.ZjsonIO.typedLines(res)
        case "json" => graft.sources.ZFormat.jsonLines(res)
        case "table" => Formats.tableLines(res).collect().toSeq
        case "text" => Formats.textLines(res).collect().toSeq
        case "parquet" | "zng" | "vng" | "zst" =>
          f.outFile match {
            case Some(out) =>
              Formats.write(res, filePath(out), f.format)
              return ""
            case None =>
              // binary to (non-tty) stdout: bytes ride back as ISO-8859-1
              // so a shell `>` redirect or pipe stays byte-exact. Writers
              // emit a DIRECTORY of parts; concatenated parts are a valid
              // stream for these formats
              val d = java.nio.file.Files.createTempDirectory("mdbin")
              val p = d.resolve("out." + f.format)
              Formats.write(res.coalesce(1), p.toString, f.format)
              val parts = java.nio.file.Files.list(p).iterator.asScala
                .filter(_.getFileName.toString.startsWith("part-"))
                .toSeq.sortBy(_.getFileName.toString)
              val bos = new java.io.ByteArrayOutputStream()
              parts.foreach(pp => bos.write(java.nio.file.Files.readAllBytes(pp)))
              return new String(bos.toByteArray, "ISO-8859-1")
          }
        case "lake" =>
          // lakeio text rendering of pools.Config values:
          // `NAME <ksuid> key <k> order <o>` (zio/lakeio/writer.go)
          import org.apache.spark.sql.functions.{col, expr => sexpr}
          val need = Seq("name", "id", "layout")
          if (!need.forall(res.columns.contains))
            throw new Unsupported("format lake on non-pool values")
          return res.select(col("name"), col("id"),
              sexpr("layout.keys[0]"), col("layout.order"))
            .collect().map { r =>
              val idTxt = r.get(1) match {
                case b: Array[Byte] => graft.functions.Ksuid.base62(b)
                case s: String =>
                  val hex = s.stripPrefix("0x")
                  graft.functions.Ksuid.encodeHex(hex)
                case other => String.valueOf(other)
              }
              val keyTxt = r.get(2) match {
                case a: scala.collection.Seq[_] => a.mkString(".")
                case other => String.valueOf(other)
              }
              s"${r.getString(0)} $idTxt key $keyTxt order ${r.get(3)}\n"
            }.mkString
        case other => throw new Unsupported(s"format $other")
      }
      val text = lines.map(_ + "\n").mkString
      f.outFile match {
        case Some(o) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(filePath(o)),
            text.getBytes("UTF-8"))
          ""
        case None => if (f.quiet) "" else text
      }
    }

    /** `-split <dir>`: one output file per _path value, per input shape,
      * or per -splitsize byte chunk (cmd/super/query -split).
      */
    private def renderSplit(res: DataFrame, f: QFlags, dir: String): String = {
      import org.apache.spark.sql.functions.col
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(filePath(dir)))
      val prefix = f.outFile.map(_ + "-").getOrElse("")
      val ext = f.format match {
        case "zeek" => "log"
        case "parquet" | "zng" | "vng" => f.format
        case _ => "zson"
      }
      def writeGroup(name: String, lines: Seq[String]): Unit =
        java.nio.file.Files.write(
          java.nio.file.Paths.get(filePath(s"$dir/$prefix$name.$ext")),
          lines.map(_ + "\n").mkString.getBytes("UTF-8"))
      def writeGroupDf(name: String, part: DataFrame): Boolean =
        f.format match {
          case "parquet" | "zng" | "vng" =>
            Formats.write(part, filePath(s"$dir/$prefix$name.$ext"), f.format)
            true
          case _ => false
        }
      if (f.splitSize.isDefined) {
        val lines = ZsonIO.toZson(res).collect().toSeq
        var idx = 0
        var cur = Vector.empty[String]
        var bytes = 0L
        def flush(): Unit = if (cur.nonEmpty) { writeGroup(idx.toString, cur); idx += 1; cur = Vector.empty; bytes = 0 }
        for (l <- lines) {
          cur = cur :+ l; bytes += l.length + 1
          if (bytes >= f.splitSize.get) flush()
        }
        flush()
      } else if (res.columns.contains("_path")) {
        val paths = res.select("_path").distinct().collect().map(_.getString(0)).sorted
        for (p <- paths) {
          val part = res.filter(col("_path") === p)
          val lines =
            if (f.format == "zeek") graft.sources.ZFormat.zeekLines(part).collect().toSeq
            else ZsonIO.toZson(part).collect().toSeq
          writeGroup(p, lines)
        }
      } else if (res.columns.contains(graft.operators.Het.typeTag)) {
        // one file per SHAPE, first-appearance order (split ztest)
        val tagF = res.schema(graft.operators.Het.typeTag)
        val order: Seq[String] =
          if (tagF.metadata.contains("shapes")) tagF.metadata.getStringArray("shapes").toSeq
          else res.select(graft.operators.Het.typeTag).distinct().collect().map(_.getString(0)).toSeq
        order.zipWithIndex.foreach { case (t, i2) =>
          val part = res.filter(col(graft.operators.Het.typeTag) === t)
          if (!part.isEmpty) {
            // per-shape binary outputs narrow to the shape's own columns
            // (parquet split: each file is ONE record type)
            if (!writeGroupDf(i2.toString,
                graft.operators.Het.narrowToShape(part, t)))
              writeGroup(i2.toString, ZsonIO.toZson(part).collect().toSeq)
          }
        }
      } else if (!writeGroupDf("0", res))
        writeGroup("0", ZsonIO.toZson(res).collect().toSeq)
      ""
    }

    /** Point relative `from <file>` resolution at this shell's cwd. */
    private def withCwd[A](body: => A): A = {
      spark.conf.set("graft.cwd", workDir.toString)
      try body finally spark.conf.unset("graft.cwd")
    }

    // ---- super db -----------------------------------------------------------

    private def lakeRoot(explicit: Option[String]): String = {
      val raw = explicit.filter(_.nonEmpty)
        .orElse(env.get("SUPER_DB_LAKE").filter(_.nonEmpty)).getOrElse(
          throw new RuntimeException("lake location must be set (either with " +
            "the -lake flag or SUPER_DB_LAKE environment variable)"))
      filePath(raw)
    }

    // `super db use` state: the default pool@branch (HEAD) for load/query
    private var useHead: Option[(String, String)] = None

    private def headTarget(explicit: String): (String, String) =
      if (explicit.nonEmpty) explicit.indexOf('@') match {
        case -1 => (explicit, "main")
        case ix => (explicit.take(ix), explicit.drop(ix + 1))
      } else useHead.getOrElse(
        throw new RuntimeException("default pool and branch unset"))

    private def superDb(args0: Seq[String], stdin: Option[String]): String = {
      var args = args0
      var lake: Option[String] = None
      var quiet = false
      // global flags may precede the subcommand
      var parsing = true
      while (parsing && args.nonEmpty) args.head match {
        case "-lake" => lake = Some(args(1)); args = args.drop(2)
        case f if f.startsWith("-lake=") =>
          lake = Some(f.stripPrefix("-lake=")); args = args.drop(1)
        case "-q" => quiet = true; args = args.drop(1)
        case _ => parsing = false
      }
      val root = lakeRoot(lake)
      val lk = graft.sources.Lake
      if (args.head != "init" && !java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(root)))
        throw new RuntimeException(s"$root: lake does not exist\n" +
          "(hint: run 'zed init' to initialize lake at this location)")
      def requirePool(p: String): Unit =
        if (!lk.exists(root, p)) throw new RuntimeException(s"$p: pool not found")
      args.head match {
        case "init" =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
          if (quiet || args.contains("-q")) "" else s"lake created: $root\n"
        case "create" =>
          var rest = args.tail
          var key: Option[String] = None
          var order = "desc"
          var explicitOrder = false
          var use = false
          while (rest.head.startsWith("-")) rest.head match {
            case "-q" => quiet = true; rest = rest.tail
            case "-use" => use = true; rest = rest.tail
            case "-seekstride" | "-S" => rest = rest.drop(2)
            case "-orderby" =>
              key = Some(rest(1).split(':').head)
              order = rest(1).split(':').lift(1).getOrElse("asc")
              explicitOrder = true
              rest = rest.drop(2)
            case f => throw new Unsupported(s"db create flag $f")
          }
          // the reference's default pool layout is ts:desc
          val poolId = lk.create(root, rest.head, key.orElse(Some("ts")), order,
            explicitOrder)
          if (use) useHead = Some((rest.head, "main"))
          if (quiet) "" else s"pool created: ${rest.head} $poolId\n"
        case "use" =>
          val useQuiet = quiet || args.tail.contains("-q")
          def emit(sOut: String): String = if (useQuiet) "" else sOut
          args.tail.filterNot(_ == "-q") match {
            case Seq() =>
              useHead match {
                case Some((p, b)) => s"HEAD at $p@$b\nLake at file://$root\n"
                case None => throw new RuntimeException("default pool and branch unset")
              }
            case Seq(t) if t.startsWith("@") =>
              val p = useHead.map(_._1).getOrElse(
                throw new RuntimeException("default pool unset"))
              val b = t.drop(1)
              if (!lk.branches(root, p).contains(b) && b != "main")
                throw new RuntimeException("\"" + b + "\": branch not found")
              useHead = Some((p, b))
              emit(s"Switched to branch \"$b\" on pool \"$p\"\n")
            case Seq(t) =>
              val (p, b) = t.indexOf('@') match {
                case -1 => (t, "main")
                case ix => (t.take(ix), t.drop(ix + 1))
              }
              requirePool(p)
              if (b != "main" && !lk.branches(root, p).contains(b))
                throw new RuntimeException("\"" + b + "\": branch not found")
              useHead = Some((p, b))
              emit(s"Switched to branch \"$b\" on pool \"$p\"\n")
            case _ => throw new Unsupported("db use args")
          }
        case "branch" =>
          var rest = args.tail
          var pool = ""
          while (rest.nonEmpty && rest.head.startsWith("-")) rest.head match {
            case "-q" => quiet = true; rest = rest.tail
            case "-use" => pool = rest(1); rest = rest.drop(2)
            case f => throw new Unsupported(s"db branch flag $f")
          }
          val poolName =
            if (pool.nonEmpty) pool
            else useHead.map(_._1).getOrElse(
              throw new RuntimeException("default pool and branch unset"))
          rest match {
            case Seq() => // list branches
              lk.branches(root, poolName).map(b => s"$b\n").mkString
            case Seq(name) =>
              lk.branch(root, poolName, name)
              if (quiet) "" else s"branch created: $name\n"
            case _ => throw new Unsupported("db branch args")
          }
        case "drop" =>
          var rest = args.tail
          while (rest.head.startsWith("-")) rest.head match {
            case "-f" | "-q" =>
              if (rest.head == "-q") quiet = true
              rest = rest.tail
            case f => throw new Unsupported(s"db drop flag $f")
          }
          requirePool(rest.head)
          lk.drop(root, rest.head)
          if (useHead.exists(_._1 == rest.head)) useHead = None
          if (quiet) "" else s"pool deleted: ${rest.head}\n"
        case "ls" =>
          // `NAME <id> key <k> order <o>` per pool (cmd/super/db/ls)
          val pools = Option(new java.io.File(root).listFiles())
            .getOrElse(Array.empty).toSeq
            .filter(f => f.isDirectory && lk.exists(root, f.getName))
            .map(_.getName).sorted
          pools.map { pn =>
            val k = lk.poolKey(root, pn).getOrElse("ts")
            s"$pn ${lk.poolId(root, pn)} key $k order ${lk.poolOrder(root, pn)}\n"
          }.mkString
        case "log" =>
          var rest = args.tail
          var target = ""
          while (rest.nonEmpty && rest.head.startsWith("-")) rest.head match {
            case "-q" => quiet = true; rest = rest.tail
            case "-use" => target = rest(1); rest = rest.drop(2)
            case f => throw new Unsupported(s"db log flag $f")
          }
          val (pool, branch) = headTarget(target)
          requirePool(pool)
          val cs = lk.commitsOn(root, pool, branch)
            .filter(_.kind == "commit").reverse
          val sb = new StringBuilder
          cs.zipWithIndex.foreach { case (c, i) =>
            val head = if (i == 0) s" (HEAD -> $branch)" else ""
            sb.append(s"commit ${c.id}$head\n")
            sb.append(s"Author: ${c.author}\n")
            sb.append("Date:   " + java.time.Instant.ofEpochMilli(c.ts)
              .toString.replaceAll("\\.\\d+Z$", "Z") + "\n\n")
            sb.append("    loaded 1 data object\n\n")
            val rows = if (c.rows >= 0) c.rows else 0L
            val rec = if (rows == 1) "record" else "records"
            sb.append(s"    ${c.id} $rows $rec in ${math.max(c.bytes, 0)} data bytes\n\n")
          }
          sb.toString.stripSuffix("\n")
        case "delete" =>
          var rest = args.tail
          var target = ""
          var whereExpr: Option[String] = None
          while (rest.nonEmpty && rest.head.startsWith("-")) rest.head match {
            case "-q" => quiet = true; rest = rest.tail
            case "-use" => target = rest(1); rest = rest.drop(2)
            case "-where" => whereExpr = Some(rest(1)); rest = rest.drop(2)
            case f => throw new Unsupported(s"db delete flag $f")
          }
          val (pool, branch) = headTarget(target)
          requirePool(pool)
          whereExpr match {
            case Some(w) =>
              // must be a SINGLE filter expression (cmd/super/db/delete)
              val singleFilter =
                try graft.lang.Parser.parse(w).stages match {
                  case Seq(graft.lang.Stage.Where(_)) => true
                  case _ => false
                } catch { case _: Exception => false }
              if (!singleFilter)
                throw new RuntimeException(
                  "invalid delete where query: must be a single filter operation")
              // delete-where: rewrite the branch's live rows minus the
              // matches as ONE new object, then delete the old objects
              // (queries see the same result as the reference's
              // tombstone commits)
              spark.conf.set("graft.lake.root", root)
              try {
                val scanDf = lk.scan(spark, root, pool, Some(branch))
                if (Graft.queryOn(scanDf, s"where $w").isEmpty)
                  throw new RuntimeException("empty transaction")
                val kept = Graft.queryOn(scanDf, s"where !($w)")
                val old = lk.commitsOn(root, pool, branch)
                  .filter(_.kind == "commit").map(_.id)
                lk.load(kept.drop(graft.operators.Het.typeTag), root, pool,
                  branch = branch, message = s"delete where $w"): Unit
                old.foreach(id => lk.delete(root, pool, id, branch))
                ""
              } finally spark.conf.unset("graft.lake.root")
            case None =>
              rest.foreach(id => lk.delete(root, pool, id, branch))
              if (quiet) "" else rest.map(id => s"$id deleted\n").mkString
          }
        case "revert" =>
          var rest = args.tail
          var target = ""
          while (rest.nonEmpty && rest.head.startsWith("-")) rest.head match {
            case "-q" => quiet = true; rest = rest.tail
            case "-use" => target = rest(1); rest = rest.drop(2)
            case f => throw new Unsupported(s"db revert flag $f")
          }
          val (pool, branch) = headTarget(target)
          requirePool(pool)
          val newId = lk.revert(root, pool, rest.head, branch)
          if (quiet) "" else s"${rest.head} reverted in commit $newId\n"
        case "merge" =>
          var rest = args.tail
          var target = ""
          while (rest.nonEmpty && rest.head.startsWith("-")) rest.head match {
            case "-q" => quiet = true; rest = rest.tail
            case "-use" => target = rest(1); rest = rest.drop(2)
            case f => throw new Unsupported(s"db merge flag $f")
          }
          // `db merge <into>` merges HEAD's branch into <into>
          val (pool, cur) = headTarget(target)
          requirePool(pool)
          val into = rest.headOption.getOrElse("main")
          lk.merge(root, pool, cur, parent = into)
          if (quiet) "" else "merged\n"
        case "compact" =>
          val (pool, branch) = headTarget(
            args.tail.sliding(2).collectFirst { case Seq("-use", t) => t }.getOrElse(""))
          requirePool(pool)
          lk.compact(spark, root, pool, branch = branch)
          ""
        case "vacuum" =>
          var rest = args.tail
          var target = ""
          while (rest.nonEmpty && rest.head.startsWith("-")) rest.head match {
            case "-f" | "-q" => quiet = rest.head == "-q" || quiet; rest = rest.tail
            case "-use" => target = rest(1); rest = rest.drop(2)
            case f => throw new Unsupported(s"db vacuum flag $f")
          }
          val (pool, _) = headTarget(target)
          requirePool(pool)
          val removed = lk.vacuum(root, pool)
          if (quiet) "" else s"vacuumed ${removed.length} objects\n"
        case "rename" =>
          val rest = args.tail.filterNot(_ == "-q")
          requirePool(rest.head)
          val pid = lk.poolId(root, rest.head)
          lk.rename(root, rest.head, rest(1))
          if (useHead.exists(_._1 == rest.head))
            useHead = useHead.map(h => (rest(1), h._2))
          if (quiet) "" else s"pool $pid renamed from ${rest.head} to ${rest(1)}\n"
        case "load" =>
          var rest = args.tail
          var target = ""
          var author = "graft"
          var message = ""
          var meta = ""
          while (rest.nonEmpty && rest.head.startsWith("-") && rest.head != "-") {
            rest.head match {
              case "-q" => quiet = true; rest = rest.tail
              case "-use" => target = rest(1); rest = rest.drop(2)
              case "-user" => author = rest(1); rest = rest.drop(2)
              case "-message" => message = rest(1); rest = rest.drop(2)
              case "-meta" => meta = rest(1); rest = rest.drop(2)
              case f => throw new Unsupported(s"db load flag $f")
            }
          }
          val (pool, branch) = headTarget(target)
          requirePool(pool)
          val frames = rest.map {
            case "-" => buildStdinFrame(stdin.getOrElse(""), None)
            case fn => Formats.read(spark, filePath(fn))
          }
          val df = combineFrames(frames)
          val id = lk.load(df, root, pool,
            author = author, message = message, branch = branch, meta = meta)
          if (quiet) "" else s"$id committed\n"
        case "query" =>
          val f = parseQueryFlags(args.tail)
          var q = (f.includes.map(readFile) ++ f.query.toSeq).mkString("\n").trim
          // a query without a source reads HEAD (`super db use` state);
          // the source may hide behind a statement prologue or a user-op
          // call (CountPool("example")), so check the PARSED first stage
          def startsWithFrom(p: graft.lang.Pipeline): Boolean =
            p.stages.headOption.exists {
              case graft.lang.Stage.From(_, _) => true
              case graft.lang.Stage.Block(inner) => startsWithFrom(inner)
              case _ => false
            }
          val hasSource =
            try startsWithFrom(graft.lang.Parser.parse(q))
            catch { case _: Exception => q.startsWith("from") }
          if (!hasSource && useHead.isDefined) {
            val (p, b) = useHead.get
            q = s"from $p@$b | $q"
          }
          spark.conf.set("graft.lake.root", root)
          try withCwd {
            renderOut(Graft.query(spark, workDir.toString, q), f)
          } finally spark.conf.unset("graft.lake.root")
        case other => throw new Unsupported(s"db $other")
      }
    }
  }

  // ---- running + comparison -------------------------------------------------

  /** Prepare the per-file working dir: a temp dir with the file's inputs,
    * or the dir= path under the reference root (read-only data is fine —
    * lake-mutating blocks never use dir=).
    */
  def workDirFor(f: MdFile, dirOpt: Option[String]): java.nio.file.Path =
    dirOpt match {
      case Some(d) => java.nio.file.Paths.get("/root/reference").resolve(d)
      case None =>
        val d = java.nio.file.Files.createTempDirectory("mdtest")
        d.toFile.deleteOnExit()
        f.inputs.foreach { case (name, text) =>
          java.nio.file.Files.write(d.resolve(name), text.getBytes("UTF-8"))
        }
        d
    }

  def dirOf(info: String): Option[String] =
    info.split("\\s+").find(_.startsWith("dir=")).map(_.stripPrefix("dir="))

  def expectsFailure(info: String): Boolean = info.split("\\s+").contains("fails")

  /** Compare combined stdout against the expected block. Pass levels:
    * 2 = exact text, 1 = canonical value match, 0 = fail.
    */
  def compare(c: MdCase, got: String): Int = {
    def cleanLines(s: String): Seq[String] =
      s.linesIterator.map(_.replaceAll("\\s+$", "")).toSeq
        .reverse.dropWhile(_.isEmpty).reverse
    val head = c.outInfo.split("\\s+").contains("head")
    val want = cleanLines(c.output)
    val g = cleanLines(got)
    if (head) {
      val w = if (want.lastOption.contains("...")) want.dropRight(1) else want
      if (g.startsWith(w)) return 2
      // canonical prefix: same leading VALUES, layout/decorators washed
      return (ZtestHarness.canonAll(w.mkString("\n")),
              ZtestHarness.canonAll(got)) match {
        case (Some(cw), Some(cg)) if cw.nonEmpty && cg.take(cw.length) == cw => 1
        case _ => 0
      }
    }
    if (want == g) return 2
    // canonical zson value comparison (decorator/layout differences wash
    // out; -Z pretty layout parses the same as compact)
    (ZtestHarness.canonAll(c.output), ZtestHarness.canonAll(got)) match {
      case (Some(w), Some(have)) if w.nonEmpty =>
        if (w == have) 1
        else if (w.sorted == have.sorted) 1
        else 0
      case _ => 0
    }
  }
}
