package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.client.GraftClient

/** The typed client library against the in-JVM REST service — the
  * reference's api/client + python/superdb user stories: query (raw,
  * parsed, multi-channel), lake CRUD, load/branch/merge, events.
  */
class ClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private var svc: Service = _
  private var c: GraftClient = _
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-client-lake").toString

  override def beforeAll(): Unit = {
    svc = new Service(spark, "/root/testdata/sf0.001", 0)
    val port = svc.start()
    c = new GraftClient(s"http://127.0.0.1:$port")
  }

  override def afterAll(): Unit = {
    if (svc != null) svc.stop()
    spark.stop()
  }

  test("status and raw query lines stream") {
    assert(c.status())
    val ls = c.query("from region | sort r_regionkey | cut r_name").toSeq
    assert(ls.length == 5 && ls.head.contains("r_name"))
  }

  test("queryValues parses each row into the value model") {
    import graft.sources.ZValue
    val vs = c.queryValues(
      "from region | sort r_regionkey | cut r_regionkey, r_name | head 1").toSeq
    assert(vs.length == 1)
    ZValue.unwrap(vs.head) match {
      case ZValue.VRec(fs) =>
        assert(fs.map(_._1) == Vector("r_regionkey", "r_name"))
        assert(ZValue.unwrap(fs(1)._2) == ZValue.VStr("AFRICA"))
      case other => fail(s"expected a record, got $other")
    }
    // a bare aggregate value parses too
    val n = c.queryValues("from region | count()").toSeq
    assert(n.length == 1 && n.head.toString.contains("5"))
  }

  test("limit and fmt=text pass through") {
    val ls = c.query("from nation | sort n_nationkey | cut n_name",
      fmt = "text", limit = 3).toSeq
    assert(ls.length == 3 && !ls.head.contains("\"")) // text writer: bare cells
  }

  test("multi-output graphs: named legs via output= and channels") {
    val q = """from region | fork ( => where r_regionkey < 2 | output small => where r_regionkey >= 2 | output big )"""
    val small = c.query(q, output = "small").toSeq
    val big = c.query(q, output = "big").toSeq
    assert(small.length == 2 && big.length == 3)
    val chans = c.queryChannels(q)
    assert(chans.map(_._1).sorted == Seq("big", "small"))
    assert(chans.collectFirst { case ("small", ls) => ls.length }.contains(2))
  }

  test("a bad query surfaces as ServiceError, not a broken stream") {
    val e = intercept[GraftClient#ServiceError](c.query("from nowhere |").toSeq)
    assert(e.status == 400)
  }

  test("lake lifecycle end-to-end: keyed pool, loads, branch, merge, " +
       "compact, vacuum, events") {
    c.createPool(root, "cl", key = "o_orderkey")
    assert(c.pools(root).exists(_.name == "cl"))
    val c1 = c.load(root, "cl", "from orders | where o_orderkey < 750")
    val c2 = c.load(root, "cl", "from orders | where o_orderkey >= 750")
    assert(c1.nonEmpty && c2.nonEmpty && c1 != c2)
    assert(c.pools(root).find(_.name == "cl").exists(_.commits == 2))
    // the keyed pool's range scan is visible through the lang surface
    spark.conf.set("graft.lake.root", root)
    try {
      val n = c.queryValues("from cl | where o_orderkey >= 10 and o_orderkey <= 50 | count()").toSeq
      val expect = GraftSession.table(spark, "/root/testdata/sf0.001", "orders")
        .filter("o_orderkey between 10 and 50").count()
      assert(n.head.toString.contains(expect.toString))
    } finally spark.conf.unset("graft.lake.root")
    // branch + merge
    c.createBranch(root, "cl", "dev", at = c1)
    assert(c.branches(root, "cl").contains("dev"))
    val merged = c.mergeBranch(root, "cl", "dev")
    assert(merged >= 0)
    // maintenance
    val compacted = c.compact(root, "cl")
    assert(compacted.nonEmpty)
    assert(c.vacuum(root, "cl") >= 0)
    // the activity log saw the commits
    val evs = c.events()
    assert(evs.exists(_._2.contains("pool-create")))
    assert(evs.exists(_._2.contains(c1)))
  }
}
