package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._

/** Decode of REFERENCE-WRITTEN ZNG files (the .zng files under
  * docs/tutorials — real
  * GitHub PR data serialized by the reference implementation, with
  * compressed frames, named types, nested records, arrays and typed
  * nulls). Self-roundtrips can't catch interop bugs — the r3 signed
  * varint fix proved that — so these pin decoded VALUES from files our
  * writer never touched.
  */
class ZngFixtureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private val dir = "/root/reference/docs/tutorials"

  override def afterAll(): Unit = spark.stop()

  test("github1.zng decodes exactly (100 PRs, nested user records)") {
    val df = graft.sources.ZngIO.read(spark, s"$dir/github1.zng")
    assert(df.count() == 100 && df.columns.count(_ != "__type") == 29)
    val stats = df.agg(
      sum(col("number")), min(col("number")), max(col("number")),
      sum(col("id")), countDistinct(col("user.login"))).collect()(0)
    assert(stats.getLong(0) == 5087L && stats.getLong(1) == 1L && stats.getLong(2) == 101L)
    assert(stats.getLong(3) == 34460757220L && stats.getLong(4) == 6L)
    val pr101 = df.filter(col("number") === 101)
      .select(col("title"), col("merge_commit_sha"), col("state"), col("draft"))
      .collect()(0)
    assert(pr101.getString(0) == "Add some unit tests of groupby")
    assert(pr101.getString(1) == "c5d74b61c4e2b8e40d603ea720b3e1072adf8960")
    assert(pr101.getString(2) == "closed" && !pr101.getBoolean(3))
  }

  test("github2.zng decodes exactly (1900 PRs, LZ4-framed)") {
    val df = graft.sources.ZngIO.read(spark, s"$dir/github2.zng")
    assert(df.count() == 1900 && df.columns.count(_ != "__type") == 29)
    val stats = df.agg(
      sum(col("number")), min(col("number")), max(col("number")), sum(col("id")))
      .collect()(0)
    assert(stats.getLong(0) == 2793301L && stats.getLong(1) == 102L)
    assert(stats.getLong(2) == 3098L && stats.getLong(3) == 960363710728L)
  }

  test("prs.zng decodes exactly (28 PRs, 33 columns incl. assignees array)") {
    val df = graft.sources.ZngIO.read(spark, s"$dir/prs.zng")
    assert(df.count() == 28 && df.columns.count(_ != "__type") == 33)
    val stats = df.agg(sum(col("number")), min(col("number")), max(col("number")),
      countDistinct(col("user.login"))).collect()(0)
    assert(stats.getLong(0) == 436L && stats.getLong(1) == 1L && stats.getLong(2) == 30L)
    assert(stats.getLong(3) == 5L)
  }
}
