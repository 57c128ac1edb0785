package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format layer (reference: zio/anyio/lookup.go readers, writer.go writers).
  *
  * Reads auto-detect by file extension — parquet/csv/tsv/json/zson/line —
  * mirroring zio/anyio's reader auto-detection; Spark's built-in sources
  * handle parquet/csv/json with distributed schema inference, ZSON goes
  * through ZsonIO.
  *
  * Writers add zed's text output surface: `zson`, `text` (tab-separated
  * values), and `table` (aligned columns, header row). Table/text
  * formatting is expression-based (codegen) with a single width-computing
  * aggregation pass for `table` — no driver-side row formatting.
  */
object Formats {

  /** Read any supported file/directory, auto-detecting the format.
    * A .gz suffix is transparent (anyio/gzip.go): text sources
    * decompress via the Hadoop codecs, binary readers by magic.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lower0 = path.toLowerCase
    val lower = if (lower0.endsWith(".gz")) lower0.dropRight(3) else lower0
    if (lower.endsWith(".parquet") || lower.endsWith(".pq")) spark.read.parquet(path)
    else if (lower.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else if (lower.endsWith(".tsv"))
      spark.read.option("header", "true").option("inferSchema", "true")
        .option("sep", "\t").csv(path)
    else if (lower.endsWith(".json") || lower.endsWith(".jsonl") || lower.endsWith(".ndjson"))
      spark.read.json(path)
    else if (lower.endsWith(".zson")) ZsonIO.read(spark, path)
    else if (lower.endsWith(".zng")) ZngIO.read(spark, path)
    else if (lower.endsWith(".vng")) VngIO.read(spark, path)
    else if (lower.endsWith(".zeek")) ZeekIO.read(spark, path)
    else if (lower.endsWith(".zjson")) ZjsonIO.read(spark, path)
    else if (lower.endsWith(".arrow") || lower.endsWith(".arrows"))
      ArrowIO.read(spark, path)
    else if (lower.endsWith(".txt") || lower.endsWith(".line"))
      spark.read.text(path) // `line` format: one string value per line
    else spark.read.parquet(path) // default (the engine's native storage)
  }

  def write(df: DataFrame, path: String, format: String): Unit = format match {
    case "parquet" => df.write.mode("overwrite").parquet(path)
    case "csv" => df.write.mode("overwrite").option("header", "true").csv(path)
    case "tsv" => df.write.mode("overwrite").option("header", "true")
      .option("sep", "\t").csv(path)
    case "json" => df.write.mode("overwrite").json(path)
    case "zson" => ZsonIO.write(df, path)
    case "zng" => ZngIO.write(df, path)
    case "vng" => VngIO.write(df, path)
    case "zeek" => ZeekIO.write(df, path)
    case "zjson" => ZjsonIO.write(df, path)
    case "arrow" | "arrows" => ArrowIO.write(df, path)
    case "text" => textLines(df).write.mode("overwrite").text(path)
    case "table" => tableLines(df).write.mode("overwrite").text(path)
    case other => throw new IllegalArgumentException(s"unknown write format: $other")
  }

  /** `text` output (zio/textio/writer.go): flattened leaf columns joined by
    * tabs, zeek-formatted values, times as RFC3339Nano. Distributed.
    */
  def textLines(df: DataFrame): org.apache.spark.sql.Dataset[String] =
    ZFormat.textLines(df)

  /** `table` output (zio/tableio/writer.go): per-type headers + Go
    * tabwriter alignment (block-buffered like the reference).
    */
  def tableLines(df: DataFrame): org.apache.spark.sql.Dataset[String] =
    ZFormat.tableLines(df)
}
