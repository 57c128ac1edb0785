package graft

/** Scratch A/B: does the 100-col projection compile with the consume split
  * ENABLED (Spark default)? Run: sbt "Test/runMain graft.WideAB"
  */
object WideAB {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    for (split <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.splitConsumeFuncByOperator", split)
      val base = spark.range(1000).toDF("id")
      val wide = base.select((0 until 100).map { i =>
        val c = i % 3 match {
          case 0 => (col("id") * i).cast("double")
          case 1 => (col("id") * i).cast("string")
          case _ => (col("id") % 2 === 0)
        }
        c.as(s"c$i")
      }: _*)
      val proj = wide.filter(col("c1").isNotNull).select((0 until 100).map { i =>
        val c = col(s"c$i")
        (i % 3 match {
          case 0 => c.cast("double") + lit(1.0)
          case 1 => concat(c.cast("string"), lit("x"))
          case _ => !c.cast("boolean")
        }).as(s"d$i")
      }: _*)
      val wsc = proj.queryExecution.executedPlan.collectFirst {
        case w: WholeStageCodegenExec => w
      }
      println(s"split=$split wsc=${wsc.isDefined}")
      wsc.foreach { w =>
        val (_, source) = w.doCodeGen()
        try {
          org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
            .compile(source)
          println(s"split=$split COMPILED OK")
        } catch {
          case e: Exception =>
            println(s"split=$split COMPILE FAILED: ${e.getMessage.take(300)}")
        }
      }
    }
    spark.stop()
  }
}
