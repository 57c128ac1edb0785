package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Executes the reference's doc-example corpus: every
  * ```mdtest-command```/```mdtest-output``` pair under
  * /root/reference/docs (the examples users copy-paste first; reference
  * runner mdtest/mdtest.go runs the same blocks under bash). Commands run
  * through MdtestHarness's shell interpreter against the engine; outputs
  * compare exactly first, then canonically at the zson value level
  * (pretty layout and type decorators wash out; values do not).
  *
  * Blocks marked `fails` pass when the engine raises an error (message
  * text is not compared). Blocks in one file share a working directory
  * and lake state, in file order, like the reference runner.
  */
class MdtestExecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(8)

  override def afterAll(): Unit = spark.stop()

  test("at least 85% of the reference doc examples pass end-to-end") {
    spark.sparkContext.setLogLevel("ERROR")
    val files = sys.env.get("MDTEST_ONLY") match {
      case Some(sub) => MdtestHarness.extractFiles().filter(_.path.contains(sub))
      case None => MdtestHarness.extractFiles()
    }
    val total = files.map(_.cases.length).sum
    if (sys.env.contains("MDTEST_ONLY"))
      info(s"MDTEST_ONLY filter active: ${files.length} files, $total cases")
    else
      assert(total > 480, s"corpus extraction looks broken: $total")
    var exact = 0
    var canon = 0
    var failOk = 0
    var unrunnable = 0
    val failures = Vector.newBuilder[(String, String)]
    // MDTEST_AUDIT=1: log every unrunnable case with its reason so the
    // environmental-skip list can be adjudicated case by case
    val audit = Vector.newBuilder[(String, String)]
    def skipCase(id: String, reason: String): Unit = {
      unrunnable += 1
      audit += ((id, reason))
    }
    for (f <- files) {
      val sharedDir = MdtestHarness.workDirFor(f, None)
      val shell = new MdtestHarness.Shell(spark, sharedDir)
      val dirShells = scala.collection.mutable.Map.empty[String, MdtestHarness.Shell]
      for (c <- f.cases) {
        // declared-but-missing downloads (the doc's own `curl … > f`
        // pre-step; no network here): a case reading such a file — by
        // name or via a matching glob — has unmet data prerequisites
        val missingData = MdtestHarness.dirOf(c.cmdInfo).exists { d =>
          val dir = java.nio.file.Paths.get("/root/reference").resolve(d)
          f.downloads.exists { name =>
            !java.nio.file.Files.exists(dir.resolve(name)) && (
              c.command.contains(name) ||
              (c.command.contains("*" + name.dropWhile(_ != '.'))))
          }
        }
        val sh = MdtestHarness.dirOf(c.cmdInfo) match {
          case Some(d) => dirShells.getOrElseUpdate(d,
            new MdtestHarness.Shell(spark, MdtestHarness.workDirFor(f, Some(d))))
          case None => shell
        }
        val result: Either[Throwable, String] =
          try Right(sh.runBlock(c.command))
          catch { case e: Throwable => Left(e) }
        if (MdtestHarness.expectsFailure(c.cmdInfo)) {
          if (result.isLeft) failOk += 1
          else if (missingData) skipCase(s"${c.file}#${c.ord}", "missing download (doc's own curl pre-step; no network)")
          else failures += ((s"${c.file}#${c.ord}", "expected failure, got success"))
        } else result match {
          case Right(got) => MdtestHarness.compare(c, got) match {
            case 2 => exact += 1
            case 1 => canon += 1
            // a mismatch while reading a declared-but-missing download
            // (doc's own `curl … > f` pre-step; no network here) is an
            // unmet data prerequisite, not an engine failure
            case _ if missingData => skipCase(s"${c.file}#${c.ord}",
              "missing download (doc's own curl pre-step; no network)")
            case _ => failures += ((s"${c.file}#${c.ord}",
              s"mismatch\n--- got ---\n${got.take(400)}\n--- want ---\n${c.output.take(400)}"))
          }
          case Left(e)
              if Option(e.getMessage).exists(m =>
                m.contains("Path does not exist: file:/root/reference/") ||
                  (m.contains(": file does not exist") &&
                    m.contains("/root/reference/"))) =>
            // dir= case needing data the reference checkout doesn't ship
            // (schools.zson is built by downloading an SQLite db —
            // testdata/edu/README.md — and this environment has no
            // network); environmentally unrunnable, not an engine failure
            skipCase(s"${c.file}#${c.ord}",
              "dir= data the reference checkout doesn't ship (downloaded corpus)")
          case Left(_) if missingData => skipCase(s"${c.file}#${c.ord}",
            "missing download (doc's own curl pre-step; no network)")
          case Left(e) => failures += ((s"${c.file}#${c.ord}",
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}"))
        }
      }
    }
    val runnable = total - unrunnable
    val pass = exact + canon + failOk
    info(s"doc-example passes: $pass / $runnable runnable " +
      s"(exact $exact, canonical $canon, fails-ok $failOk; $unrunnable unrunnable of $total)")
    val fs = failures.result()
    if (sys.env.contains("MDTEST_AUDIT"))
      audit.result().foreach { case (id, why) => info(s"SKIP $id :: $why") }
    if (sys.env.contains("MDTEST_VERBOSE")) {
      fs.foreach { case (id, why) => info(s"FAIL $id :: ${why.linesIterator.mkString(" | ").take(500)}") }
    } else {
      fs.take(15).foreach { case (id, why) =>
        info(s"FAIL $id :: ${why.linesIterator.take(2).mkString(" | ").take(200)}")
      }
    }
    // 85% is the coverage target; the absolute floor pins the measured
    // count (454/478 in round 9) so semantic regressions fail CI
    if (!sys.env.contains("MDTEST_ONLY"))
      assert(pass >= math.max((runnable * 85) / 100, 473),
        s"doc-example pass rate regressed: $pass/$runnable")
  }
}
