package graft

/** Scratch profiling main — loops the het_variant_udf bench query. */
object ProfHetUdf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    println(s"[prof-hu] pid=${ProcessHandle.current().pid()}")
    val iters = args.headOption.map(_.toInt).getOrElse(20)
    var i = 0
    while (i < iters) {
      val t0 = System.nanoTime()
      Bench.hetQuery(spark, dir, udfPath = true)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof-hu] iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      i += 1
    }
    spark.stop()
  }
}
