package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: dump `.explain("formatted")` for the bench classes and any
  * declared queries into a directory (plans/rNN/<name>_<suffix>.txt) so
  * plan-shape claims in OPTIMIZATION_rNN.md are checkable offline.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [name,name,…]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).
  */
object PlanDump {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r14")
    val suffix = if (args.length > 1) args(1) else "before"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(8)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def want(n: String): Boolean = only.forall(_.contains(n))
    def dump(name: String, mk: => DataFrame): Unit = if (want(name)) {
      try {
        val txt = formatted(mk)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] $name ok")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: $e")
      }
    }

    // bench headline classes (same shapes as graft.Bench)
    dump("scan_all", GraftSession.table(spark, sfDir, "lineitem"))
    dump("cut_field", GraftSession.table(spark, sfDir, "lineitem").select(col("l_shipdate")))
    dump("count_all", GraftSession.table(spark, sfDir, "lineitem").agg(count(lit(1)).as("count")))
    dump("count_by_key", GraftSession.table(spark, sfDir, "lineitem").groupBy(col("l_suppkey")).count())
    dump("filter_eq", GraftSession.table(spark, sfDir, "lineitem").filter(col("l_partkey") === 12345L))
    dump("het_variant", Bench.hetQuery(spark, sfDir, udfPath = false))
    dump("het_variant_udf", Bench.hetQuery(spark, sfDir, udfPath = true))
    dump("het_nested", Bench.nestedQuery(spark, sfDir, flat = false))
    dump("het_nested_flat", Bench.nestedQuery(spark, sfDir, flat = true))

    // zng/vng scan classes (same fixtures as graft.Bench)
    if (only.isDefined) {
      val tmp = java.nio.file.Files.createTempDirectory("plandump-ingest").toString
      lazy val fixture = Bench.ingestFixture(spark, sfDir, tmp)
      dump("scan_zng", graft.sources.ZngIO.read(spark, fixture._2))
      dump("cut_vng", graft.sources.VngIO.read(spark, fixture._3)
        .agg(count(col("uid")).as("n")))
      dump("cut_vng_het", {
        val dns = spark.range(1000).select(
          (lit(1.5E9) + col("id") * 0.02).as("ts"),
          concat(lit("host"), (col("id") % 50).cast("string")).as("query"),
          (col("id") % 17).as("rcode"))
        val conn = graft.sources.VngIO.read(spark, fixture._3)
          .drop(graft.operators.Het.typeTag)
        val d = s"$tmp/het.vng"
        graft.sources.VngIO.write(graft.operators.Het.fuseTagged(conn, dns), d)
        graft.sources.VngIO.read(spark, d).agg(count(col("ts")).as("n"))
      })
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }

    // every declared query
    SparkEntry.queries.foreach { case (name, q) =>
      dump(name, q(spark, sfDir))
    }
    spark.stop()
  }
}
