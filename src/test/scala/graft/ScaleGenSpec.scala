package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sf-scale generator: row counts multiply exactly, keys stay
  * collision-free across copies, and joins keep resolving (the property
  * the sf1 smoke relies on).
  */
class ScaleGenSpec extends AnyFunSuite {

  test("ScaleGen multiplies fact tables with collision-free keys") {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val out = java.nio.file.Files.createTempDirectory("scalegen").toString
      ScaleGen.generate(spark, "/root/testdata/sf0.001", 3, out)
      for (t <- ScaleGen.shiftCols.keys.toSeq.sorted) {
        val base = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        val scaled = spark.read.parquet(s"$out/$t.parquet")
        assert(scaled.count() == base.count() * 3, s"$t row count")
        val key = ScaleGen.shiftCols(t).head
        assert(scaled.select(key).distinct().count() ==
          base.select(key).distinct().count() * 3, s"$t key collisions")
      }
      for (t <- ScaleGen.fixedTables) {
        val base = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        val scaled = spark.read.parquet(s"$out/$t.parquet")
        assert(scaled.count() == base.count(), s"$t should stay fixed")
      }
      // joins still resolve: every scaled lineitem row finds its order
      val li = spark.read.parquet(s"$out/lineitem.parquet")
      val ord = spark.read.parquet(s"$out/orders.parquet")
      val dangling = li.join(ord,
        li("l_orderkey") === ord("o_orderkey"), "left_anti").count()
      assert(dangling == 0, s"$dangling lineitem rows lost their order")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out)): Unit
    } finally spark.stop()
  }
}
