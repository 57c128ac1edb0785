package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Probe {
  private def timeN(n: Int)(run: () => Unit): Seq[Double] = {
    run(); System.gc()
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def report(name: String, ds: Seq[Double]): Unit =
      println(f"$name%-26s " + ds.map(x => f"$x%.3f").mkString(" "))
    val tmp = java.nio.file.Files.createTempDirectory("probe-ingest").toString
    val (zeekDir, zngDir, _) = Bench.ingestFixture(spark, dir, tmp)
    // stats pass only: read() without any action
    report("zeek_read_plan_only", timeN(5)(() =>
      graft.sources.ZeekIO.read(spark, zeekDir): Unit))
    report("zeek_read_noop", timeN(4)(() =>
      noop(graft.sources.ZeekIO.read(spark, zeekDir))))
    // zng write for comparison (ingest_zeek = zeek read + this)
    report("zng_write", timeN(3)(() =>
      graft.sources.ZngIO.write(graft.sources.ZeekIO.read(spark, zeekDir), s"$tmp/oz")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
