package graft

/** Scratch profiling main — not part of the engine. Loops the
  * het_variant_udf bench query so a JFR/jcmd profiler can be attached.
  */
object ProfHet {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.ready(GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]").appName("graft-prof-het"), cpus).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val iters = args.headOption.map(_.toInt).getOrElse(20)
    val udfPath = !args.contains("native")
    println(s"[prof-het] pid=${ProcessHandle.current().pid()} iters=$iters udf=$udfPath")
    var i = 0
    while (i < iters) {
      val t0 = System.nanoTime()
      Bench.runOnce(Bench.hetQuery(spark, sfDir, udfPath = udfPath))
      println(f"[prof-het] iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      i += 1
    }
    spark.stop()
  }
}
