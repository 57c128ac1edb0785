package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.VngIO

/** VNG columnar format: header layout, null-run encoding, and full
  * write→read round-trips (reference vng/ v4 architecture).
  */
class VngSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def tmp(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-$name")
    p.toFile.deleteOnExit()
    p.resolve("out").toString
  }

  test("header matches the v4 layout (magic, version, section sizes)") {
    val schema = StructType(Seq(StructField("a", LongType)))
    val bytes = VngIO.encodeObject(Iterator(Row(1L), Row(2L)), schema)
    assert(bytes(0) == 'V' && bytes(1) == 'N' && bytes(2) == 'G' && bytes(3) == 0)
    assert(bytes(4) == 4) // version 4, little-endian u32
    val lines = VngIO.decodeToZson(bytes).toSeq
    assert(lines == Seq("{a:1}", "{a:2}"))
  }

  test("null runs RLE-encode and round-trip") {
    val schema = StructType(Seq(StructField("a", LongType), StructField("s", StringType)))
    val rows = Iterator(Row(null, "x"), Row(2L, null), Row(null, null), Row(4L, "y"))
    val lines = VngIO.decodeToZson(VngIO.encodeObject(rows, schema)).toSeq
    assert(lines == Seq("""{a:null,s:"x"}""", "{a:2,s:null}", "{a:null,s:null}", """{a:4,s:"y"}"""))
  }

  test("round-trips real tables with nested structs and arrays") {
    val df = GraftSession.table(spark, dir, "orders").limit(300)
      .select(col("o_orderkey"),
        struct(col("o_orderstatus"), col("o_totalprice")).as("info"),
        array(col("o_custkey"), col("o_orderkey") * 2).as("ks"))
    val path = tmp("vng")
    VngIO.write(df, path)
    val back = VngIO.read(spark, path)
    assert(back.count() == 300)
    assert(back.select(sum("info.o_totalprice")).collect()(0).getDouble(0) ==
      df.select(sum("info.o_totalprice")).collect()(0).getDouble(0))
    assert(back.select(sum(element_at(col("ks"), 2))).collect()(0).getLong(0) ==
      df.select(sum(col("o_orderkey") * 2)).collect()(0).getLong(0))
  }

  test("columnar layout: per-column segments allow independent decode") {
    // documents at sf0.001: mixed types incl. long text — full fidelity
    val docs = GraftSession.table(spark, dir, "documents").limit(100)
    val path = tmp("vng-docs")
    VngIO.write(docs, path)
    val back = VngIO.read(spark, path)
    assert(back.count() == 100)
    val a = back.agg(sum(length(col("text"))), sum("n_chars")).collect()(0)
    val b = docs.agg(sum(length(col("text"))), sum("n_chars")).collect()(0)
    assert(a == b)
  }

  test("embeddings (float arrays) survive exactly") {
    val emb = GraftSession.table(spark, dir, "embeddings").limit(50)
    val path = tmp("vng-emb")
    VngIO.write(emb, path)
    val back = VngIO.read(spark, path)
    val s1 = back.select(sum(aggregate(col("embedding"), lit(0.0), (a, x) => a + x)))
      .collect()(0).getDouble(0)
    val s2 = emb.select(sum(aggregate(col("embedding").cast("array<double>"), lit(0.0), (a, x) => a + x)))
      .collect()(0).getDouble(0)
    assert(math.abs(s1 - s2) < 1e-6)
  }
}
