package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.lang.Graft

/** The missing/quiet error-value convention threaded through expressions
  * (reference complex.go:28-40; semantics table docs/language/expressions.md
  * "Comparisons" + operator docs). The engine maps error("missing") to SQL
  * NULL — each case here mirrors a documented reference behavior.
  */
class MissingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def one(q: String): org.apache.spark.sql.Row =
    Graft.query(spark, dir, q).limit(1).collect()(0)

  test("reference to a nonexistent field is a value, not a compile error") {
    val r = one("from nation | yield {k:n_nationkey, nope:no_such_field} | sort k | head 1")
    assert(r.isNullAt(1)) // missing → NULL
  }

  test("missing propagates through comparisons (1 > x → missing)") {
    // expressions.md: `1 > x` where x is absent yields error("missing");
    // here: NULL, which drops every row in a filter
    val n = Graft.query(spark, dir, "from nation | where n_nationkey > no_such_field | count()")
      .collect()(0).getLong(0)
    assert(n == 0)
  }

  test("missing propagates through arithmetic") {
    val r = one("from nation | yield {v: n_nationkey + no_such_field} | head 1")
    assert(r.isNullAt(0))
  }

  test("true AND missing = missing; false AND missing = false") {
    // three-valued logic matches zed's error propagation for AND/OR
    val t = Graft.query(spark, dir,
      "from nation | where true and n_nationkey > no_such_field | count()")
      .collect()(0).getLong(0)
    assert(t == 0) // true AND missing → missing → row dropped
    val f = Graft.query(spark, dir,
      "from nation | where not (false and n_nationkey > no_such_field) | count()")
      .collect()(0).getLong(0)
    assert(f == 25) // false AND missing → false; NOT false → true keeps all
  }

  test("OR short-circuits past missing (true OR missing = true)") {
    val n = Graft.query(spark, dir,
      "from nation | where n_nationkey >= 0 or n_nationkey > no_such_field | count()")
      .collect()(0).getLong(0)
    assert(n == 25)
  }

  test("cross-type comparison is false, not an error (1 > \"a\" → false)") {
    val r = one("""from nation | yield {a: n_nationkey > "a", b: n_name > 0, c: n_nationkey != "x"} | head 1""")
    assert(!r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
  }

  test("coalesce recovers from missing") {
    val r = one("from nation | yield {v: coalesce(no_such_field, n_nationkey)} | sort v | head 1")
    assert(r.getInt(0) == 0)
  }

  test("missing()/has() report schema membership") {
    val r = one("from nation | yield {m: missing(no_such_field), h: has(n_name)} | head 1")
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("cut drops quiet(missing) fields instead of erroring (cut.md)") {
    val df = Graft.query(spark, dir,
      "from nation | cut n_nationkey, gone:=quiet(no_such_field), n_name | head 1")
    assert(df.columns.toSeq == Seq("n_nationkey", "n_name"))
    // quiet() on a PRESENT field keeps it
    val df2 = Graft.query(spark, dir,
      "from nation | cut n_nationkey, name:=quiet(n_name) | head 1")
    assert(df2.columns.toSeq == Seq("n_nationkey", "name"))
  }

  test("conditional with missing condition yields the else branch semantics") {
    // zed: error condition propagates; NULL condition selects otherwise-null
    val r = one("""from nation | yield {v: no_such_field > 1 ? "yes" : "no"} | head 1""")
    assert(r.getString(0) == "no")
  }
}
