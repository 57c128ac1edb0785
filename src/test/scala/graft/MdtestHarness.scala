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

    private def filePath(name: String): String =
      if (name.startsWith("/")) name else workDir.resolve(name).toString

    private def readFile(name: String): String = {
      val p = java.nio.file.Paths.get(filePath(name))
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    }

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
      var stdin: Option[String] = None
      var outText = ""
      for (seg <- segs) {
        outText = runSimple(seg, stdin)
        stdin = Some(outText)
      }
      redirect match {
        case Some("/dev/null") => ""
        case Some(f) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(filePath(f)),
            outText.getBytes("UTF-8"))
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
        case "tee" =>
          val text = stdin.getOrElse("")
          seg.tail.filterNot(_.startsWith("-")).foreach { f =>
            java.nio.file.Files.write(java.nio.file.Paths.get(filePath(f)),
              text.getBytes("UTF-8"))
          }
          text
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
      outFile: Option[String], quiet: Boolean)

    private def parseQueryFlags(args: Seq[String]): QFlags = {
      var format = "zson"
      var inFmt: Option[String] = None
      var query: Option[String] = None
      var includes = Vector.empty[String]
      var files = Vector.empty[String]
      var useStdin = false
      var outFile: Option[String] = None
      var quiet = false
      var i = 0
      while (i < args.length) {
        args(i) match {
          case "-z" => format = "zson"; i += 1
          case "-Z" => format = "zson-pretty"; i += 1
          case "-f" => format = args(i + 1); i += 2
          case "-i" => inFmt = Some(args(i + 1)); i += 2
          case "-c" => query = Some(args(i + 1)); i += 2
          case "-I" => includes :+= args(i + 1); i += 2
          case "-o" => outFile = Some(args(i + 1)); i += 2
          case "-q" => quiet = true; i += 1
          case "-s" => i += 1
          case "-" => useStdin = true; i += 1
          case f if f.startsWith("-") => throw new Unsupported(s"flag $f")
          case word =>
            // first bare word: query text if none yet AND it's not an
            // existing file; later words are input files
            val isFile = java.nio.file.Files.exists(
              java.nio.file.Paths.get(filePath(word)))
            if (query.isEmpty && includes.isEmpty && !isFile) query = Some(word)
            else files :+= word
            i += 1
        }
      }
      QFlags(format, inFmt, query, includes, files, useStdin, outFile, quiet)
    }

    private def buildStdinFrame(text: String, inFmt: Option[String]): DataFrame = {
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
            // no input at all: the reference evaluates the query over a
            // single null value (`super query -z -c '1+1'` → 2)
            require(queryText.nonEmpty, "super query: no query and no input")
            Graft.queryOn(ZsonReader.fromText(spark, "null"), queryText)
          }
        renderOut(res, f)
      }
    }

    private def renderOut(res: DataFrame, f: QFlags): String = {
      val lines: Seq[String] = f.format match {
        case "zson" | "zson-pretty" => ZsonIO.toZson(res).collect().toSeq
        case "csv" => graft.sources.ZFormat.csvLines(res)
        case "zeek" => graft.sources.ZFormat.zeekLines(res).collect().toSeq
        case "zjson" => graft.sources.ZjsonIO.typedLines(res)
        case "json" => graft.sources.ZFormat.jsonLines(res)
        case "table" => Formats.tableLines(res).collect().toSeq
        case "text" => Formats.textLines(res).collect().toSeq
        case "parquet" | "zng" | "vng" | "zst" =>
          val out = f.outFile.getOrElse(throw new Unsupported("binary to stdout"))
          Formats.write(res, filePath(out), f.format)
          return ""
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

    /** Point relative `from <file>` resolution at this shell's cwd. */
    private def withCwd[A](body: => A): A = {
      spark.conf.set("graft.cwd", workDir.toString)
      try body finally spark.conf.unset("graft.cwd")
    }

    // ---- super db -----------------------------------------------------------

    private def lakeRoot(explicit: Option[String]): String = {
      val raw = explicit.orElse(env.get("SUPER_DB_LAKE")).getOrElse(
        throw new Unsupported("db without a lake (-lake or SUPER_DB_LAKE)"))
      filePath(raw)
    }

    private def superDb(args0: Seq[String], stdin: Option[String]): String = {
      var args = args0
      var lake: Option[String] = None
      var quiet = false
      // global flags may precede the subcommand
      var parsing = true
      while (parsing && args.nonEmpty) args.head match {
        case "-lake" => lake = Some(args(1)); args = args.drop(2)
        case "-q" => quiet = true; args = args.drop(1)
        case _ => parsing = false
      }
      val root = lakeRoot(lake)
      val lk = graft.sources.Lake
      args.head match {
        case "init" =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
          if (quiet || args.contains("-q")) "" else s"lake created: $root\n"
        case "create" =>
          var rest = args.tail
          var key: Option[String] = None
          while (rest.head.startsWith("-")) rest.head match {
            case "-q" => quiet = true; rest = rest.tail
            case "-orderby" =>
              key = Some(rest(1).split(':').head); rest = rest.drop(2)
            case f => throw new Unsupported(s"db create flag $f")
          }
          lk.create(root, rest.head, key)
          if (quiet) "" else s"pool created: ${rest.head}\n"
        case "branch" =>
          var rest = args.tail
          var pool = ""
          while (rest.head.startsWith("-")) rest.head match {
            case "-q" => quiet = true; rest = rest.tail
            case "-use" => pool = rest(1); rest = rest.drop(2)
            case f => throw new Unsupported(s"db branch flag $f")
          }
          lk.branch(root, pool, rest.head)
          if (quiet) "" else s"branch created: ${rest.head}\n"
        case "load" =>
          var rest = args.tail
          var target = ""
          while (rest.nonEmpty && rest.head.startsWith("-") && rest.head != "-") {
            rest.head match {
              case "-q" => quiet = true; rest = rest.tail
              case "-use" => target = rest(1); rest = rest.drop(2)
              case f => throw new Unsupported(s"db load flag $f")
            }
          }
          val (pool, branch) = target.indexOf('@') match {
            case -1 => (target, "main")
            case ix => (target.take(ix), target.drop(ix + 1))
          }
          val frames = rest.map {
            case "-" => buildStdinFrame(stdin.getOrElse(""), None)
            case fn => Formats.read(spark, filePath(fn))
          }
          val df = combineFrames(frames)
          val id = lk.load(df.drop(graft.operators.Het.typeTag), root, pool,
            branch = branch)
          if (quiet) "" else s"$id committed\n"
        case "query" =>
          val f = parseQueryFlags(args.tail)
          val q = (f.includes.map(readFile) ++ f.query.toSeq).mkString("\n").trim
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
