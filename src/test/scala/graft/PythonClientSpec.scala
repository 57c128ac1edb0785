package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Exercises the Python client (python/graft/graft.py — the analog of
  * the reference's python/superdb) against the in-process REST service:
  * pool create + branch load + typed zjson query decode.
  */
class PythonClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private var svc: Service = _
  private var port: Int = 0
  private var lakeDir: java.nio.file.Path = _

  private lazy val python: Option[String] =
    Seq("python3", "python").find { p =>
      try {
        val pr = new ProcessBuilder(p, "--version").start()
        pr.waitFor() == 0
      } catch { case _: Exception => false }
    }

  override def beforeAll(): Unit = {
    lakeDir = Files.createTempDirectory("graft-pyclient-lake")
    svc = new Service(spark, "/root/testdata/sf0.001", 0,
      lakeRootOpt = Some(lakeDir.toString))
    port = svc.start()
  }

  override def afterAll(): Unit = {
    if (svc != null) svc.stop()
    spark.stop()
  }

  private def runPy(script: String): String = {
    val f = Files.createTempFile("pyclient", ".py")
    Files.writeString(f, script)
    val pb = new ProcessBuilder(python.get, f.toString)
    pb.environment().put("GRAFT_LAKE", s"http://127.0.0.1:$port")
    pb.environment().put("PYTHONPATH", "python/graft")
    pb.redirectErrorStream(true)
    val pr = pb.start()
    val out = new String(pr.getInputStream.readAllBytes(), "UTF-8")
    val code = pr.waitFor()
    assert(code == 0, s"python exited $code:\n$out")
    out
  }

  test("create_pool + load + query round-trip with typed decode") {
    assume(python.nonEmpty, "no python interpreter on PATH")
    val out = runPy(
      """import datetime, ipaddress, json
        |import graft
        |
        |c = graft.Client()
        |c.create_pool('py_pool', layout={'order': 'asc', 'keys': [['ts']]})
        |c.load('py_pool',
        |       '{ts:2026-01-02T03:04:05Z,src:10.0.0.1,n:7(uint32),'
        |       'd:1m30s,tags:|["a","b"]|,msg:"hello"}\n'
        |       '{ts:2026-01-02T03:04:06Z,src:10.0.0.2,n:8(uint32),'
        |       'd:2s,tags:|["c"]|,msg:"world"}',
        |       commit_author='py-test', commit_body='from python')
        |recs = list(c.query('from py_pool | sort n'))
        |assert len(recs) == 2, recs
        |r = recs[0]
        |assert r['n'] == 7 and r['msg'] == 'hello', r
        |assert r['src'] == ipaddress.ip_address('10.0.0.1'), r
        |assert r['d'] == datetime.timedelta(seconds=90), r
        |assert r['tags'] == {'a', 'b'}, r
        |assert r['ts'].year == 2026 and r['ts'].second == 5, r
        |agg = list(c.query('from py_pool | total:=sum(n)'))
        |assert agg[0]['total'] == 15, agg
        |print('PY_OK', json.dumps(sorted(r.keys())))
        |""".stripMargin)
    assert(out.contains("PY_OK"), out)
    assert(out.contains("""["d", "msg", "n", "src", "tags", "ts"]"""), out)
  }

  test("query errors raise QueryError; HTTP errors raise RequestError") {
    assume(python.nonEmpty, "no python interpreter on PATH")
    val out = runPy(
      """import graft
        |c = graft.Client()
        |try:
        |    list(c.query('from nosuchpool_xyz'))
        |    raise SystemExit('expected an error')
        |except (graft.QueryError, graft.RequestError) as e:
        |    print('ERR_OK', type(e).__name__)
        |""".stripMargin)
    assert(out.contains("ERR_OK"), out)
  }
}
