package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Harness for the reference's SCRIPT-style ztests (ztest/ztest.go
  * "script style"): a bash script driving `super db` / `super query`
  * against a lake, with named inputs materialized into a working
  * directory and named outputs (stdout/stderr/files) compared exactly or
  * by regexp. The script runs through MdtestHarness.Shell's interpreter
  * extended here with `!` negation, variable assignment, and `$(...)`
  * command substitution — no processes are spawned.
  */
object ScriptHarness {

  final case class Output(name: String, text: String, isRegex: Boolean)
  final case class ScriptCase(file: String, script: String,
                              inputs: Seq[(String, String)],
                              outputs: Seq[Output])

  // ---- yaml extraction ------------------------------------------------------

  def extract(dirs: Seq[String]): Seq[ScriptCase] = {
    val out = Vector.newBuilder[ScriptCase]
    for {
      dir <- dirs
      p <- java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .iterator().asScala.toSeq.sortBy(_.toString)
      if p.toString.endsWith(".yaml")
      c <- parse(p)
    } out += c
    out.result()
  }

  private def parse(path: java.nio.file.Path): Option[ScriptCase] = {
    val lines = java.nio.file.Files.readAllLines(path).asScala.toVector
    if (!lines.exists(_.startsWith("script:"))) return None
    // ztest.go skips cases carrying a `skip:` reason
    if (lines.exists(_.startsWith("skip:"))) return None
    def blockAt(start: Int, indent: Int): (String, Int) = {
      // YAML block scalars strip the FIRST content line's indentation,
      // which may exceed the mapping level (parquetio writer-errors
      // indents its stderr block two extra spaces)
      val actual = (start until lines.length)
        .find(j => lines(j).trim.nonEmpty)
        .filter(j => lines(j).startsWith(" " * indent))
        .map(j => lines(j).takeWhile(_ == ' ').length)
        .getOrElse(indent)
      val b = new StringBuilder
      var i = start
      while (i < lines.length &&
          (lines(i).trim.isEmpty || lines(i).startsWith(" " * indent))) {
        val own = lines(i).takeWhile(_ == ' ').length
        // whitespace-only lines keep their beyond-indent spaces (zfmt
        // blocks pin a "  " line inside parens — head/tail ztests)
        b.append(lines(i).drop(math.min(actual, own))).append('\n')
        i += 1
      }
      (b.toString.reverse.dropWhile(_ == '\n').reverse + "\n", i)
    }
    var script = ""
    val anchors = scala.collection.mutable.Map.empty[String, String]
    val inputs = Vector.newBuilder[(String, String)]
    val outputs = Vector.newBuilder[Output]
    var i = 0
    var section = "" // inputs / outputs
    var curName: Option[String] = None
    var curSource: Option[String] = None
    var curSection = ""
    def flushItem(): Unit = {
      // an input with no data/source is a file that sits in the ztest
      // directory itself (ztest.go copies it into the work dir)
      for (n <- curName if curSection == "inputs") {
        val f = path.getParent.resolve(n)
        if (java.nio.file.Files.isRegularFile(f)) {
          val bytes = java.nio.file.Files.readAllBytes(f)
          // binary fixtures (parquet/vng/zng) ride as ISO-8859-1 strings
          val text =
            try java.nio.charset.StandardCharsets.UTF_8.newDecoder()
              .decode(java.nio.ByteBuffer.wrap(bytes)).toString
            catch { case _: java.nio.charset.CharacterCodingException =>
              new String(bytes, "ISO-8859-1") }
          inputs += n -> text
        }
      }
      curName = None; curSource = None
    }
    while (i < lines.length) {
      val l = lines(i)
      if (l.startsWith("script: |")) {
        val (b, j) = blockAt(i + 1, 2); script = b; i = j
      } else if (l.startsWith("script:") && l.drop(7).trim.nonEmpty) {
        // inline one-liner form: `script: super query -z -I src.zed`
        var s = l.drop(7).trim
        if (s.length > 1 && (s.head == '"' || s.head == '\'') && s.last == s.head)
          s = s.substring(1, s.length - 1)
        script = s + "\n"
        i += 1
      } else if (l.startsWith("inputs:")) { section = "inputs"; flushItem(); i += 1 }
      else if (l.startsWith("outputs:")) { section = "outputs"; flushItem(); i += 1 }
      else if (l.matches("\\S.*")) { section = ""; i += 1 }
      else if (section.nonEmpty && l.trim.startsWith("- name:")) {
        flushItem()
        curName = Some(l.trim.stripPrefix("- name:").trim)
        curSection = section
        i += 1
      } else if (section.nonEmpty && curName.isDefined &&
          l.trim.startsWith("source:")) {
        val src = l.trim.stripPrefix("source:").trim
        val resolved = path.getParent.resolve(src).normalize()
        // a source the checkout doesn't ship (e.g. the edu dataset built
        // by a network download) makes the whole case unrunnable: skip it
        if (!java.nio.file.Files.isRegularFile(resolved)) return None
        val bytes = java.nio.file.Files.readAllBytes(resolved)
        // binary fixtures (parquet/vng/zng) ride as ISO-8859-1 strings
        val text =
          try java.nio.charset.StandardCharsets.UTF_8.newDecoder()
            .decode(java.nio.ByteBuffer.wrap(bytes)).toString
          catch { case _: java.nio.charset.CharacterCodingException =>
            new String(bytes, "ISO-8859-1") }
        if (section == "inputs") inputs += curName.get -> text
        else outputs += Output(curName.get, text, isRegex = false)
        curName = None
        i += 1
      } else if (section.nonEmpty && curName.isDefined &&
          l.trim.matches("(data|regexp):( &\\S+)?( !!binary)? \\|-?( #.*)?")) {
        val isRe = l.trim.startsWith("regexp:")
        val isBinary = l.trim.contains("!!binary")
        // `|-` chomps the trailing newline (no-trailing-newline ztest);
        // a trailing ` # comment` after the marker is noise
        val chomp = l.trim.replaceAll(" #.*$", "").endsWith("|-")
        // yaml anchor: `data: &name |` registers the block for *name refs
        val anchor = "&(\\S+)".r.findFirstMatchIn(l.trim).map(_.group(1))
        val indent = l.indexOf(l.trim.head) + 2
        val (b00, j) = blockAt(i + 1, indent)
        val b0 = if (chomp) b00.stripSuffix("\n") else b00
        // !!binary: the block is base64 of raw bytes, which ride the
        // harness as an ISO-8859-1 string like other binary fixtures
        val b =
          if (isBinary)
            new String(java.util.Base64.getMimeDecoder.decode(
              b0.replaceAll("\\s", "")), "ISO-8859-1")
          else b0
        anchor.foreach(a => anchors(a) = b)
        if (section == "inputs") inputs += curName.get -> b
        else outputs += Output(curName.get, b, isRe)
        curName = None
        i = j
      } else if (section.nonEmpty && curName.isDefined &&
          l.trim.startsWith("data:")) {
        // inline scalar data (or a *ref to an anchored block)
        var v = l.trim.stripPrefix("data:").trim
        if (v.startsWith("*")) v = anchors.getOrElse(v.drop(1), v)
        else if (v.length > 1 && (v.head == '"' || v.head == '\''))
          v = v.substring(1, v.length - 1)
        if (section == "inputs") inputs += curName.get -> v
        else outputs += Output(curName.get, v, isRegex = false)
        curName = None
        i += 1
      } else i += 1
    }
    if (script.trim.isEmpty) None
    else Some(ScriptCase(path.toString, script, inputs.result(), outputs.result()))
  }

  // ---- execution ------------------------------------------------------------

  final case class Result(stdout: String, stderr: String,
                          workDir: java.nio.file.Path)

  def run(spark: SparkSession, c: ScriptCase): Result = {
    val wd = java.nio.file.Files.createTempDirectory("scriptzt")
    for ((name, text) <- c.inputs) {
      val binary = text.exists(ch =>
        ch < 0x09 || (ch > 0x0d && ch < 0x20) || ch == 0x7f) &&
        text.forall(_ <= 0xff)
      java.nio.file.Files.write(wd.resolve(name),
        text.getBytes(if (binary) "ISO-8859-1" else "UTF-8"))
    }
    val sh = new MdtestHarness.Shell(spark, wd)
    // ztest scripts run with a non-tty stdout: the reference's default
    // output format there is binary zng (cli/outputflags.go)
    sh.defaultOutFormat = "zng"
    // ztest scripts receive an input named `stdin` on their stdin —
    // commands reading `-` without a pipe see it (ztest.go)
    c.inputs.collectFirst { case ("stdin", text) => text }
      .foreach(sh.setDefaultStdin)
    val stdout = new StringBuilder
    val stderr = new StringBuilder
    val vars = scala.collection.mutable.Map.empty[String, String]

    // join continuation lines (trailing backslash or pipe)
    val logical = Vector.newBuilder[String]
    var acc = ""
    var joinWithSpace = false
    for (raw <- c.script.linesIterator) {
      val line = raw
      if (acc.nonEmpty) acc = acc + (if (joinWithSpace) " " else "\n") + line.trim
      else acc = line
      joinWithSpace = false
      val t = acc.trim
      // join backslash continuations with a SPACE — a surviving newline
      // would split the command again at lex time
      if (t.endsWith("\\")) { acc = acc.stripSuffix("\\"); joinWithSpace = true }
      else if (t.endsWith("|") || unbalanced(t)) () // keep accumulating
      else { logical += acc; acc = "" }
    }
    if (acc.trim.nonEmpty) logical += acc

    // `for NAME in ITEMS; do … done` loops expand at DEQUEUE time (below)
    // so item lists may use $(...)/vars and loops nest naturally
    val expanded = logical

    // quote-aware item split ("a b" is ONE item; "" is an EMPTY item) +
    // bash brace expansion: {a,b} lists and {N..M} numeric ranges
    def braceExpand(w: String): Seq[String] = {
      val i = w.indexOf('{')
      val j = if (i < 0) -1 else w.indexOf('}', i)
      if (i < 0 || j < 0) Seq(w)
      else {
        val pre = w.take(i); val post = w.drop(j + 1)
        val body = w.substring(i + 1, j)
        val rangeRe = "^(-?\\d+)\\.\\.(-?\\d+)$".r
        val members = body match {
          case rangeRe(lo, hi) =>
            val (l, h) = (lo.toLong, hi.toLong)
            (if (l <= h) l to h else l to h by -1).map(_.toString)
          case _ => body.split(",", -1).toSeq
        }
        members.flatMap(m => braceExpand(pre + m + post))
      }
    }
    def splitItems(items: String): Seq[String] = {
      val out = Vector.newBuilder[String]
      val cur = new StringBuilder
      var inQ = false
      var sawQ = false
      var qch = ' '
      for (ch <- items) {
        if (inQ) { if (ch == qch) inQ = false else cur.append(ch) }
        else if (ch == '"' || ch == '\'') { inQ = true; sawQ = true; qch = ch }
        else if (ch.isWhitespace) {
          if (cur.nonEmpty || sawQ) { out += cur.toString; cur.clear() }
          sawQ = false
        } else cur.append(ch)
      }
      if (cur.nonEmpty || sawQ) out += cur.toString
      out.result().flatMap(w =>
        if (w.contains('{') && w.contains('}')) braceExpand(w) else Seq(w))
    }

    // splice value for every $key occurrence, escaping `\` and `"` when
    // the occurrence sits inside a double-quoted region: the spliced text
    // is re-LEXED (unlike bash, which never re-reads expansion results),
    // so content quotes would otherwise terminate the surrounding word
    def spliceVar(s0: String, name: String, value: String): String = {
      val sb = new StringBuilder
      var i = 0
      var dq = false
      val braced = "${" + name + "}"
      val bare = "$" + name
      while (i < s0.length) {
        val c = s0.charAt(i)
        val hit =
          if (s0.startsWith(braced, i)) braced.length
          else if (s0.startsWith(bare, i) &&
              (i + bare.length >= s0.length ||
                !(s0.charAt(i + bare.length).isLetterOrDigit ||
                  s0.charAt(i + bare.length) == '_'))) bare.length
          else 0
        if (hit > 0) {
          sb.append(if (dq) value.replace("\\", "\\\\").replace("\"", "\\\"")
                    else value)
          i += hit
        } else {
          if (c == '"' && (i == 0 || s0.charAt(i - 1) != '\\')) dq = !dq
          sb.append(c); i += 1
        }
      }
      sb.toString
    }

    def substitute(line: String): String = {
      // $VAR expansion FIRST (a $(...) body may reference earlier vars),
      // then command substitution; shell env (export …) expands too
      var s = (vars ++ sh.envSnapshot).foldLeft(line) { case (acc2, (k, v)) =>
        spliceVar(acc2, k, v)
      }
      // $((arith)) BEFORE $(...) — the doubled parens would otherwise
      // read as command substitution of a subshell
      val arithRe = """\$\(\(([^()]*)\)\)""".r
      s = arithRe.replaceAllIn(s, m => {
        val expr = m.group(1).replace("RANDOM",
          (scala.util.Random.nextInt(32768)).toString)
        def evalA(t: String): Long = {
          val add = t.split("(?=[+-])").filter(_.nonEmpty)
          if (add.length > 1) add.map(evalA).sum
          else {
            val x = t.trim
            if (x.startsWith("+")) evalA(x.tail)
            else if (x.startsWith("-")) -evalA(x.tail)
            else if (x.contains("*")) x.split("\\*").map(evalA).product
            else x.toLong
          }
        }
        try evalA(expr).toString
        catch { case _: Exception => "0" }
      })
      var idx = s.indexOf("$(")
      while (idx >= 0) {
        var depth = 1
        var j = idx + 2
        while (j < s.length && depth > 0) {
          if (s.charAt(j) == '(') depth += 1
          else if (s.charAt(j) == ')') depth -= 1
          j += 1
        }
        val inner = s.substring(idx + 2, j - 1)
        // bash word-splits UNQUOTED $(...) output (newlines → spaces);
        // inside double quotes the output is preserved verbatim
        val inQuotes = s.take(idx).count(_ == '"') % 2 == 1
        val res0 = sh.runBlock(inner).trim
        // inside quotes: escape for the re-lex (see spliceVar)
        val res =
          if (inQuotes) res0.replace("\\", "\\\\").replace("\"", "\\\"")
          else res0.replace('\n', ' ')
        s = s.substring(0, idx) + res + s.substring(j)
        idx = s.indexOf("$(")
      }
      vars.foldLeft(s) { case (acc2, (k, v)) =>
        acc2.replace("${" + k + "}", v).replace("$" + k, v)
      }
    }


    val queue = scala.collection.mutable.Queue(expanded.result(): _*)
    val httpServers = scala.collection.mutable.ArrayBuffer
      .empty[com.sun.net.httpserver.HttpServer]
    var skippingWhile = false
    try {
    while (queue.nonEmpty) {
      val line0 = queue.dequeue()
      val t0 = line0.trim
      if (skippingWhile) {
        if (t0 == "done") skippingWhile = false
      } else if (t0.matches(
          """^while\s+(IFS=\s*)?read\s+-r\s+[A-Za-z_][A-Za-z0-9_]*\s*;?\s*do\s*$""")) {
        // `while read -r x; do … done < file`: expand the body once per
        // line of the redirected file (jsonio unexpected-input-end)
        val name = """read\s+-r\s+([A-Za-z_][A-Za-z0-9_]*)""".r
          .findFirstMatchIn(t0).get.group(1)
        val body = Vector.newBuilder[String]
        var redirect = ""
        var going = true
        while (going && queue.nonEmpty) {
          val b = queue.dequeue(); val bt = b.trim
          if (bt.startsWith("done")) { redirect = bt.stripPrefix("done").trim; going = false }
          else body += b
        }
        val file = redirect.stripPrefix("<").trim
        val p = wd.resolve(substitute(file))
        val items =
          if (file.nonEmpty && java.nio.file.Files.exists(p))
            new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
              .linesIterator.toSeq
          else Seq.empty
        val bodyLines = body.result()
        queue.prependAll(items.flatMap(item => bodyLines.map { b =>
          // a QUOTED use ("$line") must stay one word even when the line
          // itself contains quotes — re-quote with singles when possible
          val quotedForm =
            if (item.contains("'")) "\"" + item.replace("\"", "\\\"") + "\""
            else "'" + item + "'"
          b.replace("\"${" + name + "}\"", quotedForm)
            .replace("\"$" + name + "\"", quotedForm)
            .replace("${" + name + "}", item)
            .replace("$" + name, item)
        }))
      } else if (t0.startsWith("while ") || t0 == "while :; do") {
        // wait-for-file loops poll a background writer — wait for real
        // (`[ ! -s f … ]` = loop until f is non-empty, capped like the
        // script's own iteration bound); wait-for-server loops are no-ops
        // (in-process servers are up synchronously)
        """!\s+-s\s+(\S+)""".r.findFirstMatchIn(t0).foreach { m =>
          val p = wd.resolve(m.group(1))
          val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
          while (System.nanoTime < deadline &&
              (!java.nio.file.Files.exists(p) ||
                java.nio.file.Files.size(p) == 0L))
            Thread.sleep(20)
        }
        skippingWhile = !t0.contains("done")
      } else if (t0.endsWith("&") &&
          sh.fifoNames.exists(shellWords(t0).contains)) {
        // `cmd … fifo > out &`: background reader over a named pipe
        sh.runBackground(substitute(t0.dropRight(1).trim))
      } else if (t0.matches("^for\\s+[A-Za-z_][A-Za-z0-9_]*\\s+in\\s+.*;?\\s*do\\s*$")) {
        // gather the body up to the MATCHING done (loops nest), resolve
        // the item list (vars + $(...) + brace forms), prepend the
        // expanded body — inner `for` lines re-enter this case later
        val m = "^for\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+in\\s+(.*?);?\\s*do\\s*$"
          .r.findFirstMatchIn(t0).get
        val (name, items) = (m.group(1), m.group(2))
        val body = Vector.newBuilder[String]
        var depth = 1
        while (depth > 0 && queue.nonEmpty) {
          val b = queue.dequeue()
          val bt = b.trim
          if (bt == "done") depth -= 1
          else if (bt.matches("^for\\s+.*\\bdo\\s*$")) depth += 1
          if (depth > 0) body += b
        }
        val bodyLines = body.result()
        val resolved = splitItems(substitute(items))
        queue.prependAll(resolved.flatMap(item => bodyLines.map(b =>
          b.replace("${" + name + "}", item).replace("$" + name, item))))
      } else if (t0 == "{") {
        // brace group: run the body, concatenate outputs, pipe into the
        // trailing `} | cmd` (or emit directly for a bare `}`)
        val body = Vector.newBuilder[String]
        var tail = ""
        var going = true
        while (going && queue.nonEmpty) {
          val b = queue.dequeue().trim
          if (b.startsWith("}")) { tail = b.stripPrefix("}").trim; going = false }
          else body += b
        }
        val combined = body.result().filter(_.nonEmpty)
          .map(l => sh.runBlock(substitute(l))).mkString
        if (tail.startsWith("|"))
          stdout.append(sh.runPiped(substitute(tail.stripPrefix("|").trim), combined))
        else stdout.append(combined)
      } else if (t0.startsWith("trap ") || t0.startsWith("exec ")) {
        () // signal traps / fd redirection: nothing to clean up in-process
      } else if (t0.matches("""(\.|source)\s+\S*/bin/activate\s*""")) {
        () // venv activation: the heredoc runner sets PYTHONPATH instead
      } else if (t0.matches(""".*<<-?\s*['"]?\w+['"]?\s*$""")) {
        // heredoc: gather body lines up to the delimiter; an unquoted
        // delimiter means the body is variable-expanded (bash)
        val m = """^(.*?)<<-?\s*(['"]?)(\w+)['"]?\s*$""".r.findFirstMatchIn(t0).get
        val cmd = m.group(1).trim
        val quoted = m.group(2).nonEmpty
        val delim = m.group(3)
        val body = new StringBuilder
        var going = true
        while (going && queue.nonEmpty) {
          val b = queue.dequeue()
          if (b.trim == delim) going = false
          else body.append(b).append('\n')
        }
        val text = if (quoted) body.toString else substitute(body.toString)
        stdout.append(sh.runHeredoc(cmd, text))
      } else if ((t0.startsWith("source ") || t0.startsWith(". ")) &&
          !t0.contains("service.sh") && !t0.contains("mockzui.sh") &&
          !t0.contains("minio.sh")) {
        // (`source service.sh` stays with the Shell: it boots the
        // in-process graft.Service, not a text inline)
        // `source f [args…]`: inline the file with $1..$n substituted
        val words = shellWords(substitute(
          t0.stripPrefix("source ").stripPrefix(". ")))
        val f = wd.resolve(words.head)
        var body = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        for ((a, ix) <- words.tail.zipWithIndex) {
          val n = ix + 1
          // `"$1"`: the value lands inside double quotes — plain splice.
          // Bare `$1`: bash does NO quote processing on expansion
          // results, but our tokenizer re-lexes the line, so protect
          // literal single quotes from quote removal
          body = body.replace("\"${" + n + "}\"", "\"" + a + "\"")
            .replace("\"$" + n + "\"", "\"" + a + "\"")
          val esc = a.replace("'", "\"'\"")
          body = body.replace("${" + n + "}", esc).replace("$" + n, esc)
        }
        // served scripts may start a static http server (http.bash):
        // python3 -m http.server → an in-JVM file server over the workdir
        val bodyLines = Vector.newBuilder[String]
        var accS = ""
        for (raw <- body.linesIterator) {
          accS = if (accS.isEmpty) raw else accS + " " + raw.trim
          if (accS.trim.endsWith("\\")) accS = accS.trim.stripSuffix("\\")
          else if (accS.trim.endsWith("|")) ()
          else { bodyLines += accS; accS = "" }
        }
        if (accS.trim.nonEmpty) bodyLines += accS
        bodyLines.result().reverse.foreach(l => queue.prepend(l))
      } else if (t0.matches(""".*python3 -m http\.server.*&\s*$""")) {
        val portTxt = substitute(t0).split("\\s+")
          .dropWhile(_ != "http.server").drop(1)
          .filterNot(w => w == "-b" || w.contains(".") && !w.forall(_.isDigit))
          .find(_.forall(_.isDigit)).getOrElse("0")
        val srv = com.sun.net.httpserver.HttpServer.create(
          new java.net.InetSocketAddress("127.0.0.1", portTxt.toInt), 0)
        srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
          val rel = ex.getRequestURI.getPath.stripPrefix("/")
          val p = wd.resolve(rel)
          if (rel.nonEmpty && java.nio.file.Files.isRegularFile(p)) {
            val b = java.nio.file.Files.readAllBytes(p)
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b)
          } else {
            val b = "File not found".getBytes("UTF-8")
            ex.sendResponseHeaders(404, b.length)
            ex.getResponseBody.write(b)
          }
          ex.getResponseBody.close()
        })
        srv.start()
        httpServers += srv
      } else if (t0.nonEmpty && !t0.startsWith("#")) {
        val negated = t0.startsWith("! ")
        val t1 = if (negated) t0.stripPrefix("! ") else t0
        val assignRe = "(?s)^([A-Za-z_][A-Za-z0-9_]*)=(.*)$".r
        // `VAR=value command …`: env prefix scoping the var to one command
        // (bash); split the value (quoted or bare word) from the command
        def prefixSplit(rhs: String): Option[(String, String)] =
          if (rhs.startsWith("$(")) None
          else if (rhs.startsWith("'") || rhs.startsWith("\"")) {
            val q = rhs.head
            val end = rhs.indexOf(q, 1)
            if (end > 0 && rhs.drop(end + 1).trim.nonEmpty)
              Some((rhs.substring(1, end), rhs.drop(end + 1).trim))
            else None
          } else {
            val sp = rhs.indexOf(' ')
            if (sp > 0 && rhs.drop(sp + 1).trim.nonEmpty)
              Some((rhs.take(sp), rhs.drop(sp + 1).trim))
            else None
          }
        t1 match {
          case assignRe(n2, rhs2) if prefixSplit(rhs2).isDefined =>
            val (v, cmd) = prefixSplit(rhs2).get
            sh.exportVar(n2, substitute(v))
            queue.prepend(cmd)
          case assignRe(n2, rhs2) if rhs2.startsWith("\"$(") && rhs2.endsWith("\"") =>
            // VAR="$(cmd …)" — quoted command substitution
            vars(n2) = substitute(rhs2.stripPrefix("\"").stripSuffix("\""))
              .stripLineEnd
          case assignRe(n2, rhs2) if rhs2.startsWith("$(") ||
              !rhs2.takeWhile(_ != '=').contains(' ') =>
            val v =
              if (rhs2.startsWith("$(")) substitute(rhs2).trim
              else substitute(rhs2).stripPrefix("\"").stripSuffix("\"")
            vars(n2) = v
          case _ =>
            val line = substitute(t1)
            if (sys.env.contains("SCRIPT_TRACE")) println(s"+ $line")
            try {
              val out = sh.runBlock(line)
              if (sys.env.contains("SCRIPT_TRACE"))
                println(out.linesIterator.take(6).map("  | " + _).mkString("\n"))
              if (negated)
                throw new AssertionError(s"expected failure: $line")
              stdout.append(out)
            } catch {
              case e: AssertionError => throw e
              case e: MdtestHarness.Unsupported => throw e
              case e: MdtestHarness.PartialOutput =>
                // -e=false: partial stdout + collected errors on stderr;
                // the nonzero exit satisfies a `!` negation
                stdout.append(e.stdout)
                sh.stderrSink.append(e.getMessage).append('\n')
              case e: Exception =>
                val msg = rootMessage(e)
                if (negated) sh.stderrSink.append(msg).append('\n')
                else throw e
            }
        }
      }
    }
    } finally {
      httpServers.foreach(s => try s.stop(0) catch { case _: Exception => () })
      sh.closeFifos()
      sh.stopService()
    }
    Result(stdout.toString, sh.stderrSink.toString + stderr.toString, wd)
  }

  /** Quote-aware word split (bash-style, single level). */
  private def shellWords(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false; var sawQ = false; var qch = ' '
    for (ch <- s) {
      if (inQ) { if (ch == qch) inQ = false else cur.append(ch) }
      else if (ch == '"' || ch == '\'') { inQ = true; sawQ = true; qch = ch }
      else if (ch.isWhitespace) {
        if (cur.nonEmpty || sawQ) { out += cur.toString; cur.clear() }
        sawQ = false
      } else cur.append(ch)
    }
    if (cur.nonEmpty || sawQ) out += cur.toString
    out.result()
  }

  private def unbalanced(t: String): Boolean = {
    var depth = 0
    var inS = false
    var inD = false
    for (ch <- t) ch match {
      case '\'' if !inD => inS = !inS
      case '"' if !inS => inD = !inD
      case '(' if !inS && !inD => depth += 1
      case ')' if !inS && !inD => depth -= 1
      case _ =>
    }
    depth > 0 || inS || inD
  }

  private def rootMessage(e: Throwable): String = {
    var t: Throwable = e
    while (t.getCause != null && t.getCause != t) t = t.getCause
    Option(t.getMessage).orElse(Option(e.getMessage)).getOrElse(e.toString)
  }

  // ---- comparison -----------------------------------------------------------

  def matches(c: ScriptCase, r: Result): Boolean =
    c.outputs.forall { o =>
      val actual = o.name match {
        case "stdout" => r.stdout
        case "stderr" => r.stderr
        case f =>
          val p = r.workDir.resolve(f)
          if (java.nio.file.Files.exists(p))
            new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          else ""
      }
      val ok =
        if (o.isRegex)
          java.util.regex.Pattern.compile(lenientBraces(o.text.trim),
              java.util.regex.Pattern.DOTALL)
            .matcher(actual).find()
        else o.text == actual || o.text.trim == actual.trim
      if (!ok && sys.env.contains("MISCFLOW_DIFF")) {
        System.err.println(s"==== ${c.file} [${o.name}]")
        System.err.println("---- expected:")
        System.err.println(o.text.linesIterator.take(sys.env.get("MISCFLOW_DIFF").flatMap(_.toIntOption).getOrElse(12)).mkString("\n"))
        System.err.println("---- actual:")
        System.err.println(actual.linesIterator.take(sys.env.get("MISCFLOW_DIFF").flatMap(_.toIntOption).getOrElse(12)).mkString("\n"))
      }
      ok
    }

  /** Go's RE2 treats a `{` that does not begin a valid repetition as a
    * literal; Java throws. Escape those so reference patterns compile.
    */
  private def lenientBraces(re: String): String =
    re.replaceAll("""(?<!\\)\{(?!\d+(,\d*)?\})""", """\\{""")
}
