package graft

import org.apache.spark.sql.SparkSession

import graft.lang.Graft
import graft.sources.{Formats, ZsonIO}

/** CLI query entry (reference: cmd/super/query — the `zq` surface):
  *
  *   runMain graft.Cli [-dir <sfDir>] [-f zson|table|text|csv|json]
  *                     [-o <path>] [-n <maxRows>] '<zed query>'
  *
  * Compiles the query through the language frontend and writes the result
  * in the requested output format — to stdout (driver-collected, capped by
  * -n) or distributed to -o.
  */
object Cli {

  def main(args: Array[String]): Unit = {
    var dir = "/root/testdata/sf0.001"
    var format = "zson"
    var out: Option[String] = None
    var maxRows = 50
    var explain = false
    var outputLeg: Option[String] = None // named multi-output leg (op/mux.go)
    var query: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-dir" => dir = args(i + 1); i += 2
        case "-f" => format = args(i + 1); i += 2
        case "-o" => out = Some(args(i + 1)); i += 2
        case "-n" => maxRows = args(i + 1).toInt; i += 2
        case "-output" => outputLeg = Some(args(i + 1)); i += 2
        case "-explain" => explain = true; i += 1
        case q => query = Some(q); i += 1
      }
    }
    val q = query.getOrElse {
      System.err.println("usage: graft.Cli [-dir d] [-f fmt] [-o path] [-n rows] '<query>'")
      sys.exit(2)
    }

    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try {
      val df = outputLeg match {
        case Some(name) =>
          val outs = Graft.queryOutputs(spark, dir, q)
          outs.collectFirst { case (n, f) if n == name => f }.getOrElse {
            System.err.println(
              s"no such output: $name (have ${outs.map(_._1).mkString(", ")})")
            sys.exit(2)
          }
        case None => Graft.query(spark, dir, q)
      }
      if (explain) {
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        return
      }
      out match {
        case Some(path) => Formats.write(df, path, format)
        case None =>
          val lines = format match {
            case "zson" => ZsonIO.toZson(df).limit(maxRows).collect()
            case "text" => Formats.textLines(df).limit(maxRows).collect()
            case "table" => Formats.tableLines(df.limit(maxRows)).collect()
            case other =>
              throw new IllegalArgumentException(s"stdout format must be zson|text|table, got $other")
          }
          lines.foreach(println)
      }
      // `debug` operator output goes to stderr after the run (zq surface)
      graft.lang.Compiler.drainDebug().foreach(System.err.println)
    } finally spark.stop()
  }
}
