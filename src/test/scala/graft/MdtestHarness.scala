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

  // shared across shells: connection pooling; sends restricted headers
  // (Origin) that HttpURLConnection drops
  lazy val httpClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .version(java.net.http.HttpClient.Version.HTTP_1_1).build()

  final case class MdCase(file: String, ord: Int, cmdInfo: String,
                          command: String, outInfo: String, output: String)
  final case class MdFile(path: String, inputs: Map[String, String],
                          cases: Seq[MdCase],
                          downloads: Seq[String] = Seq.empty)

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
      // files the doc tells readers to DOWNLOAD before running (plain
      // ``` blocks with `curl <url> > <file>`) — when absent from the
      // checkout the examples' data prerequisites are unmet
      val downloads = lines.collect {
        case l if l.trim.matches("curl\\s+https?://\\S+\\s*>\\s*\\S+") =>
          l.trim.split(">").last.trim
      }
      if (cs.nonEmpty) Some(MdFile(p.toString, inputs.toMap, cs, downloads))
      else None
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
        case '|' =>
          // an unquoted | is always a pipe control operator (quoted spans
          // never reach this case — the quote handlers consume them)
          endToken(); tokens += "|"; nTokens += 1; lastWasPipe = true; i += 1
        case '>' if !started && i + 1 < n && body.charAt(i + 1) == '>' =>
          endToken(); tokens += ">>"; nTokens += 1; lastWasPipe = false; i += 2
        case '>' if !started &&
            !(i + 1 < n && body.charAt(i + 1) == '=') =>
          // `>=` inside an unquoted word is a comparison, not a redirect
          endToken(); tokens += ">"; nTokens += 1; lastWasPipe = false; i += 1
        case c =>
          started = true; cur.append(c); i += 1
      }
    }
    endCommand()
    commands.result()
  }

  // ---- shell ----------------------------------------------------------------

  // the super-command exception types now ship in graft.cli.SuperCmd;
  // aliases keep the harness specs' catch clauses working unchanged
  type Unsupported = graft.cli.SuperCmd.Unsupported
  type PartialOutput = graft.cli.SuperCmd.PartialOutput
  private val versionLine = graft.cli.SuperCmd.versionLine

  /** One markdown file's shell: a shared working directory holding the
    * file's mdtest-input files (or a read-only reference dir for dir=
    * blocks) plus any lake state earlier blocks created.
    */
  final class Shell(spark: SparkSession, val workDir: java.nio.file.Path) {
    private val env = mutable.Map.empty[String, String]
    // `cd` support: relative paths resolve against this (starts at workDir)
    private var cwd: java.nio.file.Path = workDir

    // script-style ztests: the whole script's stdin (an input named
    // `stdin`) — a command reading `-` without a pipe sees it
    private var defaultStdin: Option[String] = None
    def setDefaultStdin(text: String): Unit = defaultStdin = Some(text)

    /** Default `super query` output format when no -f/-z/... flag is
      * given. The reference's outputflags default to binary zng (bsup)
      * whenever stdout is NOT a terminal — which is always true in
      * ztest scripts (ztest/ztest.go runs via exec pipes), so the
      * script harness sets "zng"; the doc-example harness keeps "zson"
      * (docs show terminal sessions).
      */
    // (defaultOutFormat now lives on the shipped SuperCmd — see below)

    /** Run one command line with an explicit stdin (brace-group pipes:
      * `{ cmd; cmd; } | tail` feeds the group's concatenated output).
      */
    def runPiped(line: String, stdinText: String): String = {
      val saved = defaultStdin
      defaultStdin = Some(stdinText)
      try runBlock(line) finally defaultStdin = saved
    }

    // `source service.sh` (service/ztests): an in-process graft.Service
    // bound to a scratch lake; SUPER_DB_LAKE becomes its http URL and db
    // commands resolve the URL back to the backing root
    private var service: Option[graft.Service] = None
    private var serviceRoot: Option[String] = None
    // in-process minio twin (`source minio.sh`)
    private var s3Server: Option[com.sun.net.httpserver.HttpServer] = None
    def stopService(): Unit = {
      service.foreach(_.stop()); service = None
      s3Server.foreach(_.stop(0)); s3Server = None
      System.clearProperty("graft.s3.endpoint")
    }

    // per-configdir bearer tokens (`super db auth store -configdir X`);
    // the reference keeps these in <configdir>/credentials.json
    private val authTokens = scala.collection.mutable.Map.empty[String, String]

    /** In-memory named pipes (`mkfifo`): writers append under the
      * monitor; a backgrounded reader drains complete lines as they
      * arrive. The reference uses a fifo to prove `-unbuffered` emits
      * values before the input reaches EOF
      * (cmd/super/query/ztests/unbuffered.yaml).
      */
    private final class Fifo {
      val buf = new StringBuilder
      var readPos = 0
      var closed = false
    }
    private val fifos = mutable.Map.empty[String, Fifo]
    private val bgReaders = mutable.ArrayBuffer.empty[Thread]
    def fifoNames: Set[String] = fifos.keySet.toSet

    /** Close every pipe (EOF for readers) and join background readers. */
    def closeFifos(): Unit = {
      fifos.values.foreach { f =>
        f.synchronized { f.closed = true; f.notifyAll() }
      }
      bgReaders.foreach(_.join(2000))
      bgReaders.clear()
      fifos.clear()
    }

    /** `python <<EOF … EOF`: run the script's embedded python (the
      * reference's own client, mv'ed into the workdir) against the
      * in-process service with a REAL interpreter. The preceding
      * venv/pip lines are no-ops — every workdir subdirectory rides
      * PYTHONPATH instead, plus a minimal durationpy stand-in (the one
      * client dependency absent from the offline container: Go-style
      * duration strings → timedelta).
      */
    def runHeredoc(cmd: String, body: String): String = {
      val word = cmd.split("\\s+").head
      if (word != "python" && word != "python3")
        throw new Unsupported(s"heredoc command $word")
      val exe = Seq("python3", "python").find { p =>
        try new ProcessBuilder(p, "--version").start().waitFor() == 0
        catch { case _: Exception => false }
      }.getOrElse(throw new Unsupported("python3 not on PATH"))
      val script = java.nio.file.Files.createTempFile("heredoc", ".py")
      java.nio.file.Files.writeString(script, body)
      val shims = java.nio.file.Files.createTempDirectory("pyshims")
      java.nio.file.Files.writeString(shims.resolve("durationpy.py"),
        """import re
          |from datetime import timedelta
          |
          |_UNITS = {'ns': 1e-9, 'us': 1e-6, 'µs': 1e-6, 'ms': 1e-3,
          |          's': 1.0, 'm': 60.0, 'h': 3600.0}
          |
          |def from_str(s):
          |    neg = s.startswith('-')
          |    if s and s[0] in '+-':
          |        s = s[1:]
          |    if s == '0':
          |        return timedelta()
          |    total = 0.0
          |    for num, unit in re.findall(
          |            r'(\d+(?:\.\d*)?)(ns|us|µs|ms|s|m|h)', s):
          |        total += float(num) * _UNITS[unit]
          |    return timedelta(seconds=-total if neg else total)
          |
          |def to_str(td):
          |    secs = td.total_seconds()
          |    if secs == 0:
          |        return '0s'
          |    sign = '-' if secs < 0 else ''
          |    secs = abs(secs)
          |    out = []
          |    for unit, size in (('h', 3600), ('m', 60)):
          |        n = int(secs // size)
          |        if n:
          |            out.append('%d%s' % (n, unit))
          |            secs -= n * size
          |    if secs:
          |        out.append(('%f' % secs).rstrip('0').rstrip('.') + 's')
          |    return sign + ''.join(out)
          |""".stripMargin)
      val errFile = java.nio.file.Files.createTempFile("heredoc", ".err")
      val pb = new ProcessBuilder(exe, script.toString)
      pb.directory(cwd.toFile)
      pb.redirectError(errFile.toFile)
      val pe = pb.environment()
      pe.put("HOME", workDir.toString) // ~/.zed = the workdir's credentials
      env.foreach { case (k, v) => pe.put(k, v) }
      val pkgDirs = java.nio.file.Files.list(cwd).iterator.asScala
        .filter(java.nio.file.Files.isDirectory(_)).map(_.toString).toSeq.sorted
      pe.put("PYTHONPATH",
        (pkgDirs :+ shims.toString).mkString(java.io.File.pathSeparator))
      val pr = pb.start()
      val out = new String(pr.getInputStream.readAllBytes(), "UTF-8")
      val code = pr.waitFor()
      val err = new String(java.nio.file.Files.readAllBytes(errFile), "UTF-8")
      if (err.nonEmpty) stderrSink.append(err)
      if (code != 0)
        throw new RuntimeException(s"python exited $code: " +
          err.linesIterator.mkString(" | ").take(800))
      out
    }

    /** `cmd … fifo > out &`: run a super command reading a named pipe on
      * a background thread. Each complete line that lands in the pipe is
      * processed immediately and APPENDED to the redirect target — the
      * `-unbuffered` contract (values appear in the output file before
      * the pipe sees EOF).
      */
    def runBackground(line: String): Unit = {
      val cmds = lexCommands(line)
      if (cmds.length != 1)
        throw new Unsupported(s"background pipeline: $line")
      var tokens = cmds.head
      var redirect: Option[String] = None
      val gt = tokens.indexOf(">")
      if (gt >= 0 && gt == tokens.length - 2) {
        redirect = Some(tokens.last); tokens = tokens.take(gt)
      }
      val fifoName = tokens.find(fifos.contains).getOrElse(
        throw new Unsupported(s"background command without a fifo: $line"))
      val fifo = fifos(fifoName)
      // the reader consumes the pipe as stdin (`-`), chunk by chunk
      val args = tokens.map(t => if (t == fifoName) "-" else t)
      val target = redirect.map(f => java.nio.file.Paths.get(filePath(f)))
      target.foreach(java.nio.file.Files.deleteIfExists)
      val t = new Thread(() => {
        var done = false
        while (!done) {
          val chunk = fifo.synchronized {
            while (!fifo.closed && fifo.buf.lastIndexOf("\n") < fifo.readPos)
              fifo.wait(100)
            val nl = fifo.buf.lastIndexOf("\n")
            val end = if (nl >= fifo.readPos) nl + 1
                      else if (fifo.closed) fifo.buf.length // trailing partial
                      else fifo.readPos
            if (end > fifo.readPos) {
              val c = fifo.buf.substring(fifo.readPos, end)
              fifo.readPos = end
              if (fifo.closed && fifo.readPos == fifo.buf.length) done = true
              c
            } else { done = true; "" }
          }
          if (chunk.nonEmpty) {
            val out =
              try runSimple(args, Some(chunk))
              catch { case e: Exception =>
                stderrSink.append(e.getMessage).append('\n'); "" }
            target match {
              case Some(p) => java.nio.file.Files.write(p, encodeOut(out),
                java.nio.file.StandardOpenOption.CREATE,
                java.nio.file.StandardOpenOption.APPEND)
              case None => () // background stdout is dropped
            }
          }
        }
      })
      t.setDaemon(true)
      t.start()
      bgReaders += t
    }

    // ---- super command surface (shipped in graft.cli.SuperCmd) ---------------
    // The dispatch below is the SHIPPED implementation — the harness just
    // injects its shell environment (env vars, cwd, the in-process
    // service) through SuperCmd.Host, so every script flow exercises the
    // same code path as `runMain graft.Cli db/dev/query`.
    private val sup = new graft.cli.SuperCmd(spark, new graft.cli.SuperCmd.Host {
      def env(name: String): Option[String] = Shell.this.env.get(name)
      def cwd: java.nio.file.Path = Shell.this.cwd
      def workDir: java.nio.file.Path = Shell.this.workDir
      def serviceRoot: Option[String] = Shell.this.serviceRoot
      def serviceAuthEnabled: Boolean = service.exists(_.authEnabled)
      def stderr(text: String): Unit = { stderrSink.append(text); () }
    })
    def defaultOutFormat: String = sup.defaultOutFormat
    def defaultOutFormat_=(v: String): Unit = sup.defaultOutFormat = v
    private def superQuery(args: Seq[String], stdin: Option[String]): String =
      sup.query(args, stdin)
    private def superDb(args: Seq[String], stdin: Option[String]): String =
      sup.db(args, stdin)
    private def superDev(args: Seq[String], stdin: Option[String]): String =
      sup.dev(args, stdin)

    // `tee /dev/stderr` and friends write here; the script harness reads
    // it back as the script's stderr
    val stderrSink = new StringBuilder

    /** Shell env (export …) for the script harness's $VAR substitution. */
    def envSnapshot: Map[String, String] = env.toMap
    def exportVar(k: String, v: String): Unit = env(k) = v

    private def filePath(name: String): String =
      if (name.startsWith("/") || name.startsWith("http://") ||
          name.startsWith("https://") || name.startsWith("s3://")) name
      else cwd.resolve(name).normalize().toString

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
      // `tee >(cat >&2)` process substitution = duplicate to stderr; the
      // lexer can't carry the nested form, so normalize before lexing
      val norm = body.replace("tee >(cat >&2)", "tee /dev/stderr")
      for (cmd <- lexCommands(norm)) out.append(runCommand(cmd))
      out.toString
    }

    private def runCommand(tokens0: Seq[String]): String = {
      // strip a trailing `> file` / `>> file` redirect
      var tokens = tokens0
      var redirect: Option[String] = None
      var append = false
      val gt = tokens.indexOf(">")
      val gtgt = tokens.indexOf(">>")
      if (gt >= 0 && gt == tokens.length - 2) {
        redirect = Some(tokens.last); tokens = tokens.take(gt)
      } else if (gtgt >= 0 && gtgt == tokens.length - 2) {
        redirect = Some(tokens.last); append = true; tokens = tokens.take(gtgt)
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
      // drain the `debug` operator's channel to this shell's stderr
      graft.lang.Compiler.drainDebug().foreach(l => stderrSink.append(l).append('\n'))
      redirect match {
        case Some("/dev/null") => ""
        // `… >&2` / `… > /dev/stderr`: route to the shell's stderr sink
        case Some("&2") | Some("/dev/stderr") =>
          stderrSink.append(outText); ""
        case Some("&1") => outText
        case Some(f) if fifos.contains(f) =>
          val fifo = fifos(f)
          fifo.synchronized { fifo.buf.append(outText); fifo.notifyAll() }
          ""
        case Some(f) =>
          val tgt = java.nio.file.Paths.get(filePath(f))
          if (append && java.nio.file.Files.exists(tgt))
            java.nio.file.Files.write(tgt, encodeOut(outText),
              java.nio.file.StandardOpenOption.APPEND)
          else
            java.nio.file.Files.write(tgt, encodeOut(outText))
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
        // `python3 -m venv v` / `pip install ./pkg`: the heredoc runner
        // provides the package via PYTHONPATH instead of a real venv
        case "python3" | "python" if seg.contains("venv") => ""
        case "pip" => ""
        case "mkfifo" =>
          seg.tail.foreach(n => fifos(n) = new Fifo)
          ""
        case "mkdir" =>
          seg.tail.filterNot(_.startsWith("-")).foreach { d =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(filePath(d)))
          }
          ""
        case "cd" =>
          cwd = java.nio.file.Paths.get(filePath(seg(1))).normalize()
          ""
        case "mv" =>
          // supports glob sources and a directory target (mv *.zson dir)
          val paths = seg.tail.filterNot(_.startsWith("-"))
          val dst = java.nio.file.Paths.get(filePath(paths.last))
          val srcs = paths.init.flatMap { s =>
            if (s.exists("*?[".contains(_))) {
              val m = java.nio.file.FileSystems.getDefault
                .getPathMatcher("glob:" + s)
              java.nio.file.Files.list(cwd).iterator.asScala
                .filter(p => m.matches(p.getFileName)).toSeq.sortBy(_.toString)
            } else Seq(java.nio.file.Paths.get(filePath(s)))
          }
          for (src <- srcs) {
            val d = if (java.nio.file.Files.isDirectory(dst))
              dst.resolve(src.getFileName) else dst
            java.nio.file.Files.move(src, d,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
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
        case "sed" =>
          // minimal `sed [-n] [-e] 's<d>pat<d>rep<d>[gp]' [file]` over
          // stdin or a file (scripts mask run-dependent ids/timestamps);
          // BRE groups \(...\) \{n\} convert to Java regex
          val quiet = seg.contains("-n")
          val rest = seg.tail.filterNot(f => f == "-e" || f == "-n")
          // a trailing arg that is not an s/// program is the input file
          val (progs, fileArg) =
            if (rest.length > 1 && !rest.last.matches("(?s)^(/.*?/)?[sy].*") &&
                java.nio.file.Files.exists(java.nio.file.Paths.get(filePath(rest.last))))
              (rest.init, Some(rest.last))
            else (rest, None)
          var text = fileArg match {
            case Some(f) => readFile(f)
            case None => stdin.getOrElse("")
          }
          var anyP = false
          val pLines = Vector.newBuilder[String]
          for (prog1 <- progs) {
            // BRE -> Java: swap escaped/literal parens and braces
            val prog0 = prog1
              .replace("\\(", "\u0001").replace("\\)", "\u0002")
              .replace("\\{", "\u0003").replace("\\}", "\u0004")
              .replace("(", "\\(").replace(")", "\\)")
              .replace("\u0001", "(").replace("\u0002", ")")
              .replace("\u0003", "{").replace("\u0004", "}")
            // optional line address: /regex/s<d>pat<d>rep<d>[g]
            val (addr, prog) =
              if (prog0.startsWith("/")) {
                val close = prog0.indexOf('/', 1)
                if (close > 0) (Some(prog0.substring(1, close)), prog0.drop(close + 1))
                else (None, prog0)
              } else (None, prog0)
            if (prog.startsWith("s") && prog.length > 2) {
              val d = prog.charAt(1)
              val parts = prog.drop(2).split(java.util.regex.Pattern.quote(d.toString), -1)
              if (parts.length >= 2) {
                val (pat, rep0) = (parts(0), parts(1))
                val flags = parts.lift(2).getOrElse("")
                val global = flags.contains("g")
                val pFlag = flags.contains("p")
                if (pFlag) anyP = true
                // escape literal $, then turn \1..\9 backrefs into $1..$9
                val rep = rep0.replace("$", "\\$")
                  .replaceAll("\\\\([0-9])", "\\$$1")
                val re = java.util.regex.Pattern.compile(pat)
                val addrRe = addr.map(java.util.regex.Pattern.compile(_))
                text = text.linesIterator.map { l =>
                  if (addrRe.exists(r => !r.matcher(l).find())) l
                  else {
                    val m = re.matcher(l)
                    val changed = m.find()
                    val out =
                      if (!changed) l
                      else if (global) m.replaceAll(rep)
                      else m.replaceFirst(rep)
                    if (changed && pFlag) pLines += out
                    out
                  }
                }.mkString("", "\n", if (text.endsWith("\n")) "\n" else "")
              }
            }
          }
          if (quiet) {
            val ls = pLines.result()
            if (ls.isEmpty) "" else ls.mkString("", "\n", "\n")
          } else text
        case "jq" =>
          // minimal jq: `.` identity (stream pretty-print, jq's 2-space
          // style) and `-Rsa .` (raw slurp → one JSON string)
          val text = stdin.getOrElse("")
          val flags = seg.tail.filter(_.startsWith("-")).mkString
          if (flags.contains("R") && flags.contains("s") && flags.contains("a")) {
            val sb = new StringBuilder("\"")
            text.foreach {
              case '"' => sb.append("\\\"")
              case '\\' => sb.append("\\\\")
              case '\n' => sb.append("\\n")
              case '\t' => sb.append("\\t")
              case '\r' => sb.append("\\r")
              case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
              case c => sb.append(c)
            }
            sb.append("\"\n").toString
          } else {
            val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
            def pp(n: com.fasterxml.jackson.databind.JsonNode, ind: String): String = {
              import scala.jdk.CollectionConverters._
              if (n.isObject) {
                val fs = n.properties().asScala.toSeq
                if (fs.isEmpty) "{}"
                else fs.map { e =>
                  s"""$ind  "${e.getKey}": ${pp(e.getValue, ind + "  ")}"""
                }.mkString("{\n", ",\n", s"\n$ind}")
              } else if (n.isArray) {
                val es = n.elements().asScala.toSeq
                if (es.isEmpty) "[]"
                else es.map(e => s"$ind  ${pp(e, ind + "  ")}")
                  .mkString("[\n", ",\n", s"\n$ind]")
              } else n.toString
            }
            val out = new StringBuilder
            val parser = mapper.createParser(text)
            val it = mapper.readValues(parser,
              classOf[com.fasterxml.jackson.databind.JsonNode])
            while (it.hasNext) { out.append(pp(it.next(), "")).append('\n') }
            out.toString
          }
        case "grep" =>
          // minimal grep: regex filter over stdin lines; -v inverts;
          // no match → nonzero exit (drives `! … | grep …` negations)
          val inv = seg.contains("-v")
          val pat = seg.tail.filterNot(_.startsWith("-")).headOption.getOrElse("")
          val re = try java.util.regex.Pattern.compile(pat)
                   catch { case _: Exception =>
                     java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(pat)) }
          val hits = stdin.getOrElse("").linesIterator
            .filter(l => re.matcher(l).find() != inv).toSeq
          if (hits.isEmpty) throw new RuntimeException("grep: no match")
          hits.mkString("", "\n", "\n")
        case "tr" =>
          // `tr -d SET` (delete) and `tr A B` (translate) over stdin
          val text = stdin.getOrElse("")
          def setOf(s: String): Set[Char] =
            s.replace("\\015", "\r").replace("\\r", "\r").replace("\\n", "\n")
              .replace("\\t", "\t").toSet
          if (seg.lift(1).contains("-d")) {
            val del = setOf(seg.lift(2).getOrElse(""))
            text.filterNot(del)
          } else {
            val from = seg.lift(1).getOrElse("")
            val to = seg.lift(2).getOrElse("")
            text.map(c => { val i = from.indexOf(c)
              if (i >= 0 && to.nonEmpty) to(math.min(i, to.length - 1)) else c })
          }
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
          // supports `seq [-f FORMAT] [first] last` with C-printf %g /
          // %.Nf / %d conversions (the manage/vam ztests build typed rows
          // with it)
          var fmt: Option[String] = None
          var nums = Vector.empty[String]
          var i2 = 1
          while (i2 < seg.length) seg(i2) match {
            case "-f" => fmt = Some(seg(i2 + 1)); i2 += 2
            case n => nums :+= n; i2 += 1
          }
          val ns = nums.map(_.toLong)
          val (from, to) = ns match {
            case Seq(n) => (1L, n)
            case Seq(a, b) => (a, b)
            case _ => (1L, 0L)
          }
          def render(n: Long): String = fmt match {
            case None => n.toString
            case Some(f) =>
              val spec = """%(\.\d+)?([gdf])""".r
              spec.replaceAllIn(f, m => m.group(2) match {
                case "g" | "d" => n.toString // C %g prints integers bare
                case "f" =>
                  val prec = Option(m.group(1)).map(_.tail.toInt).getOrElse(6)
                  String.format(s"%.${prec}f", Double.box(n.toDouble))
              })
          }
          (from to to).map(render(_) + "\n").mkString
        case "source" if seg.lift(1).exists(_.endsWith("minio.sh")) =>
          // testdata/minio.sh boots MinIO over ./data and exports AWS_*
          // vars; in-process twin: a path-style S3 GET server over the
          // workdir's data/ directory, plus the same env exports. The
          // engine resolves s3:// through AWS_S3_ENDPOINT (Formats).
          val root = cwd.resolve("data")
          java.nio.file.Files.createDirectories(root.resolve("bucket"))
          val srv = com.sun.net.httpserver.HttpServer.create(
            new java.net.InetSocketAddress("127.0.0.1", 0), 0)
          srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
            val rel = ex.getRequestURI.getPath.stripPrefix("/")
            val p = root.resolve(rel)
            if (rel.nonEmpty && java.nio.file.Files.isRegularFile(p)) {
              val b = java.nio.file.Files.readAllBytes(p)
              ex.sendResponseHeaders(200, b.length)
              ex.getResponseBody.write(b)
            } else ex.sendResponseHeaders(404, -1)
            ex.getResponseBody.close()
          })
          srv.start()
          s3Server = Some(srv)
          val url = s"http://localhost:${srv.getAddress.getPort}"
          env("AWS_REGION") = "does-not-matter"
          env("AWS_ACCESS_KEY_ID") = "minioadmin"
          env("AWS_SECRET_ACCESS_KEY") = "minioadmin"
          env("AWS_S3_ENDPOINT") = url
          System.setProperty("graft.s3.endpoint", url)
          ""
        case "source" if seg.lift(1).exists(_.endsWith("service.sh")) =>
          // service/ztests prologue: start an in-process REST service
          // backed by a scratch lake; SUPER_DB_LAKE becomes its URL.
          // LAKE_EXTRA_FLAGS (env prefix form) carries service options.
          val rootDir = filePath(seg.lift(2).getOrElse("lakeroot"))
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(rootDir))
          val extraFlags = env.getOrElse("LAKE_EXTRA_FLAGS", "")
            .split("\\s+").filter(_.nonEmpty).toSeq
          val corsOrigins = extraFlags.collect {
            case f if f.startsWith("-cors.origin=") => f.stripPrefix("-cors.origin=")
          }
          val rootContent = extraFlags.collectFirst {
            case f if f.startsWith("-rootcontentfile=") =>
              filePath(f.stripPrefix("-rootcontentfile="))
          }
          val defFmt = extraFlags.collectFirst {
            case f if f.startsWith("-defaultfmt=") => f.stripPrefix("-defaultfmt=")
          }.getOrElse("zson")
          // -auth.* flags (service/auth.go AuthConfig.SetFlags); values may
          // be bare ("-auth.enabled=true" / "=t") and paths are workdir-relative
          def flagVal(name: String): Option[String] = extraFlags.collectFirst {
            case f if f.startsWith(s"-$name=") => f.stripPrefix(s"-$name=")
          }
          val authCfg =
            if (flagVal("auth.enabled").exists(v => v == "true" || v == "t" || v == "1"))
              Some(graft.Auth.Config(
                flagVal("auth.audience").getOrElse(""),
                flagVal("auth.clientid").getOrElse(""),
                flagVal("auth.domain").getOrElse(""),
                filePath(flagVal("auth.jwkspath").getOrElse(""))))
            else None
          val logPath = flagVal("log.path").map(filePath)
          val svc = new graft.Service(spark, workDir.toString, 0, Some(rootDir),
            corsOrigins, rootContent, defFmt, authCfg, logPath)
          val port = svc.start()
          service = Some(svc)
          serviceRoot = Some(rootDir)
          env("SUPER_DB_LAKE") = s"http://localhost:$port"
          env("LAKE_PATH") = rootDir
          ""
        case "source" if seg.lift(1).exists(_.endsWith("mockzui.sh")) =>
          // service/ztests/mockzui.sh: a desktop-app stand-in forks the
          // lake service and exports its pid; the in-process equivalent
          // starts graft.Service against ./lakeroot and models the pids
          val rootDir = filePath("lakeroot")
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(rootDir))
          val svc = new graft.Service(spark, workDir.toString, 0, Some(rootDir))
          val port = svc.start()
          service = Some(svc)
          serviceRoot = Some(rootDir)
          env("SUPER_DB_LAKE") = s"http://localhost:$port"
          env("LAKE_PATH") = rootDir
          env("LAKE_PID") = "99998"
          env("MOCKZUI_PID") = "99999"
          ""
        case "kill" =>
          // pid checks/signals against the mock service pids: -0 probes
          // liveness (nonzero exit when dead), -9 stops the service
          val args2 = seg.tail.filterNot(_.startsWith("2>"))
          val sig = args2.find(_.startsWith("-")).getOrElse("-15")
          val pids = args2.filterNot(_.startsWith("-"))
          val ours = pids.exists(p =>
            env.get("LAKE_PID").contains(p) || env.get("MOCKZUI_PID").contains(p))
          if (!ours) throw new Unsupported("kill on a real pid")
          if (sig == "-0") {
            if (service.isEmpty) throw new RuntimeException("no such process")
            ""
          } else { stopService(); "" }
        case "awaitdeadservice" =>
          // mockzui.sh helper: poll until the forked service exits — the
          // in-process stop is synchronous, so only assert it happened
          if (service.isDefined)
            throw new RuntimeException("timed out waiting for service to exit")
          ""
        case "gentoken" =>
          // test-harness token generator (reference cmd/gentoken): RS256
          // JWT with audience/issuer/tenant/user claims
          var aud = ""; var dom = ""; var keyFile = ""; var kid = ""
          var tenant = ""; var user = ""; var expSec = 4L * 3600
          var i2 = 1
          while (i2 < seg.length) seg(i2) match {
            case "-audience" => aud = seg(i2 + 1); i2 += 2
            case "-domain" => dom = seg(i2 + 1); i2 += 2
            case "-privatekeyfile" => keyFile = filePath(seg(i2 + 1)); i2 += 2
            case "-keyid" => kid = seg(i2 + 1); i2 += 2
            case "-tenantid" => tenant = seg(i2 + 1); i2 += 2
            case "-userid" => user = seg(i2 + 1); i2 += 2
            case "-expiration" =>
              val v = seg(i2 + 1)
              expSec =
                if (v.endsWith("h")) v.stripSuffix("h").toLong * 3600
                else if (v.endsWith("m")) v.stripSuffix("m").toLong * 60
                else if (v.endsWith("s")) v.stripSuffix("s").toLong
                else v.toLong
              i2 += 2
            case other => throw new Unsupported(s"gentoken flag $other")
          }
          graft.Auth.generateToken(kid, keyFile, expSec, aud, dom, tenant, user) + "\n"
        case "curl" =>
          runCurl(seg.tail, stdin)
        case "super" =>
          seg(1) match {
            case "query" => superQuery(seg.drop(2), stdin)
            case "db" => superDb(seg.drop(2), stdin)
            case "dev" => superDev(seg.drop(2), stdin)
            case _ => superQuery(seg.drop(1), stdin) // bare `super -c …`
          }
        case other => throw new Unsupported(s"command $other")
      }

    /** Minimal curl against the in-process service: -H headers, -d /
      * --data-binary bodies (@file, @- = stdin), -X method, -w
      * 'code %{response_code}', -sD - (dump headers), -o sink.
      */
    private def runCurl(args: Seq[String], stdin: Option[String]): String = {
      var method: Option[String] = None
      var data: Option[Array[Byte]] = None
      var headers = Vector.empty[(String, String)]
      var url = ""
      var writeOut: Option[String] = None
      var dumpHeaders = false
      var headerFile: Option[String] = None
      var outSink: Option[String] = None
      var i = 0
      while (i < args.length) {
        args(i) match {
          case "-X" => method = Some(args(i + 1)); i += 2
          case "-H" =>
            val h = args(i + 1)
            val ix = h.indexOf(':')
            headers :+= (h.take(ix).trim -> h.drop(ix + 1).trim); i += 2
          case d @ ("-d" | "--data-binary" | "--data") =>
            val v = args(i + 1)
            val bytes =
              if (v == "@-") stdin.getOrElse("").getBytes("ISO-8859-1")
              else if (v.startsWith("@"))
                java.nio.file.Files.readAllBytes(
                  java.nio.file.Paths.get(filePath(v.drop(1))))
              else v.getBytes("UTF-8")
            // curl -d/--data strips CR/LF from the input; --data-binary
            // sends it verbatim
            data = Some(
              if (d == "--data-binary") bytes
              else bytes.filter(b => b != '\n' && b != '\r'))
            i += 2
          case "-w" => writeOut = Some(args(i + 1)); i += 2
          case "-o" => outSink = Some(args(i + 1)); i += 2
          case "-sD" => dumpHeaders = args.lift(i + 1).contains("-")
            i += (if (dumpHeaders) 2 else 1)
          case "-D" =>
            if (args.lift(i + 1).contains("-")) dumpHeaders = true
            else headerFile = args.lift(i + 1)
            i += 2
          case "-s" | "-sS" | "--silent" => i += 1
          // the shell's \? escape (url\?a=b) reaches us verbatim
          case u if !u.startsWith("-") => url = u.replace("\\?", "?"); i += 1
          case _ => i += 1
        }
      }
      // java.net.http client: unlike HttpURLConnection it sends
      // "restricted" request headers (Origin — needed for CORS flows)
      import java.net.http.{HttpClient, HttpRequest, HttpResponse}
      val rb = HttpRequest.newBuilder(java.net.URI.create(url))
      headers.foreach { case (k, v) => rb.header(k, v) }
      val bp = data.map(HttpRequest.BodyPublishers.ofByteArray)
        .getOrElse(HttpRequest.BodyPublishers.noBody())
      rb.method(method.getOrElse(if (data.isDefined) "POST" else "GET"), bp)
      val resp = MdtestHarness.httpClient.send(rb.build(),
        HttpResponse.BodyHandlers.ofByteArray())
      val code = resp.statusCode()
      val body = new String(resp.body(), "ISO-8859-1")
      val sb = new StringBuilder
      val headerText = {
        val hb = new StringBuilder
        hb.append(s"HTTP/1.1 $code ${
          if (code == 200) "OK" else if (code == 204) "No Content" else "Error"}\r\n")
        // response headers, name-sorted (curl shows wire order; our
        // in-process server emits sorted — deterministic either way)
        import scala.jdk.CollectionConverters._
        resp.headers().map().asScala.toSeq
          .filter(_._1 != null).sortBy(_._1.toLowerCase)
          .foreach { case (k, vs) =>
            val kk = k.split("-").map(s =>
              if (s.isEmpty) s else s.head.toUpper + s.tail).mkString("-")
            vs.asScala.foreach(v => hb.append(s"$kk: $v\r\n")) }
        hb.append("\r\n")
        hb.toString
      }
      if (dumpHeaders) sb.append(headerText)
      headerFile.foreach(f => java.nio.file.Files.write(
        java.nio.file.Paths.get(filePath(f)), headerText.getBytes("UTF-8")))
      outSink match {
        case Some("/dev/null") =>
        case Some(f) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(filePath(f)),
            body.getBytes("ISO-8859-1"))
        case None => sb.append(body)
      }
      writeOut.foreach { w =>
        // the \n unescape belongs to the -w FORMAT only — response
        // bodies may legitimately contain literal \n escapes (JSON)
        val rendered = w.replace("%{response_code}", code.toString)
          .replace("\\n", "\n")
        sb.append(rendered)
        if (!rendered.endsWith("\n")) sb.append("\n")
      }
      sb.toString
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
