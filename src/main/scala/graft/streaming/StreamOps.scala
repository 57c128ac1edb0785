package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Lake

/** Structured Streaming surface. The reference is batch + lake commits
  * (SURVEY.md §1.1 — no native streaming), so this module is the engine's
  * forward-looking analog: the same operators expressed over unbounded
  * input with watermarks, plus zed's `load` commit model as a
  * commit-per-micro-batch sink.
  *
  * Everything is standard Structured Streaming — incremental partial aggs,
  * state store, exactly-once file sinks — so the batch operators' scale
  * story carries over unchanged.
  */
object StreamOps {

  /** Streaming read of an events-shaped parquet directory (file source —
    * new files appear, rows stream). Schema comes from a batch peek, like
    * any production file-stream deployment would pin it.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** ns-long event time → watermarked timestamp column. */
  def withEventTime(df: DataFrame, tsCol: String = "ts", watermark: String = "10 minutes"): DataFrame =
    df.withColumn("event_time", timestamp_micros(
        graft.functions.Bridge.intDiv(col(tsCol), lit(1000L))))
      .withWatermark("event_time", watermark)

  /** `summarize count(),sum(v) by every(d)` over a stream: tumbling-window
    * aggregation under a watermark — the streaming form of the batch
    * time-bucket group-by (ZedOps.timeBucketNs).
    */
  def everyCounts(events: DataFrame, duration: String, valueCol: String = "value"): DataFrame =
    events
      .groupBy(window(col("event_time"), duration).as("w"))
      .agg(count(lit(1)).as("count"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("bucket"), col("count"), col("sum_value"))

  /** Streaming exact dedup (the LLM-pipeline dedup in stream form):
    * state-store-backed dropDuplicates bounded by the watermark.
    */
  def dedupStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicates("event_time" +: keys)

  /** Per-key running stats with explicit state (mapGroupsWithState) — the
    * streaming analog of `summarize ... by user_id` that emits the running
    * aggregate on every update.
    */
  final case class UserStat(userId: Long, n: Long, total: Double)

  def runningUserStats(events: DataFrame): Dataset[UserStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(user, 0L, 0.0))
          val (n, total) = rows.foldLeft((prev.n, prev.total)) {
            case ((c, t), (_, v)) => (c + 1, t + v)
          }
          val next = UserStat(user, n, total)
          state.update(next)
          next
      }
  }

  /** zed's `load` in streaming form: every micro-batch becomes one lake
    * commit (load.go's commit-on-load, continuously). Exactly the commit
    * journal model the reference uses for continuous ingest.
    */
  def loadStream(events: DataFrame, root: String, pool: String,
                 checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          Lake.load(batch.toDF(), root, pool, author = "stream", message = s"batch $id")
        ()
      }
      .start()

  /** Streaming `mirror` / output mux (runtime/sam/op/mirror/mirror.go,
    * mux.go): each micro-batch fans out to EVERY named sink exactly once —
    * the batch is persisted so the shared upstream computes once per
    * trigger, not once per leg.
    */
  def mirrorStream(events: DataFrame, checkpoint: String,
                   sinks: Seq[(String, DataFrame => Unit)])
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          batch.persist()
          try sinks.foreach { case (_, sink) => sink(batch.toDF()) }
          finally { batch.unpersist(); () }
        }
        ()
      }
      .start()
}
