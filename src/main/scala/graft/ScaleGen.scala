package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the sf1 scale smoke: replicates a
  * base testdata directory `factor`× with consistent key offsets, so join
  * keys keep lining up (lineitem.l_orderkey ↔ orders.o_orderkey etc.) and
  * every run reproduces byte-identical inputs (no RNG, no clock).
  *
  *   sbt "runMain graft.ScaleGen /root/testdata/sf0.1 10 /tmp/graft_sf1"
  *
  * Dimension tables (region, nation) stay fixed; fact/entity tables scale
  * with their primary (and fact-side foreign) keys shifted by
  * `copy * KeyStride` so copies never collide. Everything else is copied
  * verbatim — distributions, skew, and value domains are preserved.
  */
object ScaleGen {

  /** Key columns shifted per copy, per table. Dims absent = fixed. */
  val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )
  val fixedTables: Seq[String] = Seq("region", "nation")
  val KeyStride = 100000000L

  def scaleTable(df: DataFrame, table: String, factor: Int): DataFrame =
    shiftCols.get(table) match {
      case None => df
      case Some(keys) =>
        val copies = (0 until factor).map { i =>
          keys.foldLeft(df)((acc, k) =>
            acc.withColumn(k, col(k) + lit(i * KeyStride)))
        }
        copies.reduce(_ unionAll _)
    }

  def generate(spark: SparkSession, src: String, factor: Int, out: String): Unit = {
    val tables = fixedTables ++ shiftCols.keys.toSeq.sorted
    for (t <- tables) {
      val in = spark.read.parquet(s"$src/$t.parquet")
      val scaled = scaleTable(in, t, factor)
      // one part per table, like the driver's testdata layout: keeps row
      // order deterministic (tail/head fixtures) and DuckDB-readable at
      // the bare path
      scaled.coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val out = args.lift(2).getOrElse("/tmp/graft_sf1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, factor, out)
    for (t <- fixedTables ++ shiftCols.keys.toSeq.sorted) {
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      println(s"[scalegen] $t rows=$n")
    }
    spark.stop()
  }
}
