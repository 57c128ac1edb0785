package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by SparkEntry / Verify / Bench / tests.
  *
  * Design notes (100 TB scale): all knobs are set for a real cluster first
  * — AQE on (runtime re-plan, skew-join splitting, partition coalescing),
  * shuffle partitions sized by the driver env, parquet vectorized reads.
  * Local tests just shrink the numbers; the plan shapes stay identical.
  */
object GraftSession {

  /** Shared config applied to every session the engine creates. */
  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // zed NEVER throws per-row — failed casts/arithmetic yield error
      // values (complex.go error("…")); non-ANSI evaluation maps them to
      // NULL, the engine's error-value convention (see MissingSpec)
      .config("spark.sql.ansi.enabled", "false")
      // zed map values normalize duplicate keys to the last occurrence
      // (|{"b":2,"a":1,"b":2}| is legal input — zson.md §2.5.3)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // zed is ns-native (nano.Ts — reference value.go:84); Spark timestamps
      // are µs. Read parquet TIMESTAMP(NANOS) as long ns and convert at the
      // edges — keeps scan pushdown on the raw column and loses nothing.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // wide (zeek-width, ~100-col) projections: the per-operator consume
      // split passes every column as a JVM method parameter — 94 cols ×
      // (value, isNull) with doubles exceeds the 255-slot JVM limit and
      // Janino fails, silently dropping the stage to interpreted
      // execution. Inlining the consume keeps whole-stage codegen on
      // wide scans (PlanSpec pins a 100-column projection compiling).
      .config("spark.sql.codegen.splitConsumeFuncByOperator", "false")
      .config("spark.ui.enabled", "false")

  /** Post-create setup shared by every entry point: the engine's own
    * optimizer rules (idempotent — getOrCreate may return a live session).
    */
  def ready(s: SparkSession): SparkSession = {
    val rule = graft.functions.CollapseVariantAccess
    if (!s.experimental.extraOptimizations.contains(rule))
      s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ rule
    s
  }

  def local(cores: Int = 32): SparkSession = {
    val s = ready(configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      cores.toString
    ).getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Load one of the driver-provided TPC-H-ish tables from an sf dir. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
