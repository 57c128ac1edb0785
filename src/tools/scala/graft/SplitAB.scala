package graft

import org.apache.spark.sql.functions._

/** A/B the splitConsumeFuncByOperator conf over the bench classes that
  * regressed in r9. Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.SplitAB"
  */
object SplitAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ab").toString
    val (zeekDir, zngDir, vngDir) = Bench.ingestFixture(spark, sfDir, tmp)

    val classes: Seq[(String, () => Unit)] = Seq(
      "ingest_zng" -> (() =>
        graft.sources.ZngIO.write(graft.sources.ZngIO.read(spark, zngDir),
          s"$tmp/o-${System.nanoTime()}")),
      "ingest_zeek" -> (() =>
        graft.sources.ZngIO.write(graft.sources.ZeekIO.read(spark, zeekDir),
          s"$tmp/o-${System.nanoTime()}")),
      "cut_vng_noprune" -> { () =>
        spark.conf.set("graft.vng.prune", "false")
        try Bench.runOnce(graft.sources.VngIO.read(spark, vngDir)
          .agg(count(col("uid")).as("n")))
        finally spark.conf.unset("graft.vng.prune")
      },
      "het_variant_udf" -> (() => Bench.runOnce(Bench.hetQuery(spark, sfDir, udfPath = true))),
      "het_nested" -> (() => Bench.runOnce(Bench.nestedQuery(spark, sfDir, flat = false))),
      "het_nested_flat" -> (() => Bench.runOnce(Bench.nestedQuery(spark, sfDir, flat = true))),
      "q1_agg" -> (() => Bench.runOnce(SparkEntry.queries("q1_agg")(spark, sfDir)))
    )

    for (split <- Seq("true", "false", "true")) { // T,F,T to cancel drift
      spark.conf.set("spark.sql.codegen.splitConsumeFuncByOperator", split)
      val res = classes.map { case (name, run) =>
        run(); System.gc()
        val dt = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }.min
        System.gc()
        f"$name=$dt%.3f"
      }
      println(s"AB split=$split ${res.mkString(" ")}")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
