package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Structured Streaming surface: windowed every-bucket aggregation,
  * streaming dedup, stateful running aggregates, commit-per-batch load.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  private def ns(minutes: Int): Long = minutes.toLong * 60L * 1000000000L

  test("everyCounts: tumbling-window aggregation with watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val events = StreamOps.withEventTime(
      in.toDF().toDF("ts", "user_id", "value"))
    val q = StreamOps.everyCounts(events, "1 hour")
      .writeStream.format("memory").queryName("every_out")
      .outputMode("update").start()
    try {
      in.addData((ns(5), 1L, 10.0), (ns(20), 2L, 5.0), (ns(70), 1L, 2.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from every_out order by bucket").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(1) == 2 && rows(0).getDouble(2) == 15.0) // hour 0
      assert(rows(1).getLong(1) == 1 && rows(1).getDouble(2) == 2.0)  // hour 1
    } finally q.stop()
  }

  test("ZngIO.readStream tails a growing zng directory") {
    import graft.sources.ZngIO
    val dir = java.nio.file.Files.createTempDirectory("graft-zngstream").toString + "/logs"
    // initial file set: locks the frame schema
    val a = spark.range(0, 100).selectExpr("id", "concat('u', id) as s").coalesce(1)
    ZngIO.write(a, dir)
    val q = ZngIO.readStream(spark, dir)
      .writeStream.format("memory").queryName("zng_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from zng_tail").count() == 100)
      // a NEW part file lands (another writer's output) — the tail picks
      // it up without restart
      val stream2 = ZngIO.encodeTypedStream(
        (100 until 150).map(i => graft.sources.ZsonParser.parseAll(
          s"""{id:$i,s:"u$i"}""").head))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "late-part.zng"), stream2)
      q.processAllAvailable()
      val rows = spark.sql("select * from zng_tail").count()
      assert(rows == 150, s"got $rows")
      assert(spark.sql("select max(id) from zng_tail").collect()(0).getLong(0) == 149)
    } finally q.stop()
  }

  test("ZeekIO.readStream tails a growing zeek log directory") {
    import graft.sources.ZeekIO
    val dir = java.nio.file.Files.createTempDirectory("graft-zeekstream").toString + "/logs"
    val a = spark.range(0, 50).selectExpr("id", "concat('h', id) as host").coalesce(1)
    ZeekIO.write(a, dir)
    val q = ZeekIO.readStream(spark, dir)
      .writeStream.format("memory").queryName("zeek_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from zeek_tail").count() == 50)
      // zeek rotates in a new log file with its own directive header
      val late = new StringBuilder()
      late ++= "#separator \\x09\n#set_separator\t,\n#empty_field\t(empty)\n"
      late ++= "#unset_field\t-\n#fields\tid\thost\n#types\tint\tstring\n"
      (50 until 80).foreach(i => late ++= s"$i\th$i\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "late.log"),
        late.toString.getBytes("UTF-8"))
      q.processAllAvailable()
      assert(spark.sql("select * from zeek_tail").count() == 80)
      assert(spark.sql("select max(id) from zeek_tail").collect()(0).getLong(0) == 79)
    } finally q.stop()
  }

  test("VngIO.readStream tails a growing vng directory") {
    import graft.sources.VngIO
    val dir = java.nio.file.Files.createTempDirectory("graft-vngstream").toString + "/objs"
    val a = spark.range(0, 60).selectExpr("id", "concat('u', id) as s").coalesce(1)
    VngIO.write(a, dir)
    val q = VngIO.readStream(spark, dir)
      .writeStream.format("memory").queryName("vng_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from vng_tail").count() == 60)
      val late = VngIO.encodeObject(
        (60 until 90).map(i => graft.sources.ZsonParser.parseAll(
          s"""{id:$i,s:"u$i"}""").head).iterator)
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "late.vng"), late)
      q.processAllAvailable()
      assert(spark.sql("select * from vng_tail").count() == 90)
      assert(spark.sql("select max(id) from vng_tail").collect()(0).getLong(0) == 89)
    } finally q.stop()
  }

  test("scale smoke: 10x events through windowed counts keeps per-batch " +
      "time flat and the state store bounded (watermark expiry works)") {
    import org.apache.spark.sql.functions._
    // 10x the sf0.1 events fixture (1M rows), event time advancing ~6 min
    // per file chunk across 10 chunks >> the 10-minute watermark, so old
    // window state must expire as batches progress
    val n = 1000000L
    val chunks = 10
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-scale").toString
    val base = spark.range(n).select(
      // event time: i-th row at (i / n * 60) minutes — chunk k spans
      // ~6 minutes, well past the watermark after two chunks
      (col("id") * (60L * 60L * 1000000L / n)).as("ts_us"),
      (col("id") % 50000).as("user_id"),
      (col("id") % 17).cast("double").as("value"))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    (0 until chunks).foreach { k =>
      base.filter(col("id") >= k * n / chunks && col("id") < (k + 1) * n / chunks)
        .coalesce(1).write.parquet(s"$dir/chunk=$k")
    }
    val schema = spark.read.parquet(s"$dir/chunk=0").schema
    val ev = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunk=*")
      .withWatermark("event_time", "10 minutes")
    val agg = StreamOps.everyCounts(ev, "5 minutes")
    val q = agg.writeStream.format("memory").queryName("scale_smoke_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.length >= 5, s"expected several micro-batches, got ${progress.length}")
    // state store must be BOUNDED: the watermark expires closed windows,
    // so total state rows never approach the all-windows total (144
    // five-minute windows over the hour; live state is the open tail)
    val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.max <= 60,
      s"state store grew unboundedly: per-batch numRowsTotal=${stateRows.mkString(",")}")
    // per-batch time flat: the LAST batches (most accumulated state) must
    // not blow up vs the early ones — generous 5x bound over the median
    // absorbs CI noise while still catching linear state-scan growth
    val durs = progress.map(_.durationMs.get("triggerExecution").toLong)
    val median = durs.sorted.apply(durs.length / 2).max(1L)
    assert(durs.takeRight(2).max <= 5L * median,
      s"late batches slowed down: durations=${durs.mkString(",")} median=$median")
  }

  test("dedupStream drops exact duplicates within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val events = StreamOps.withEventTime(in.toDF().toDF("ts", "user_id", "value"))
    val q = StreamOps.dedupStream(events, Seq("user_id", "value"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData((ns(1), 1L, 10.0), (ns(1), 1L, 10.0), (ns(1), 2L, 3.0))
      q.processAllAvailable()
      assert(spark.sql("select * from dedup_out").count() == 2)
    } finally q.stop()
  }

  test("runningUserStats maintains per-user state across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val events = in.toDF().toDF("ts", "user_id", "value")
    val q = StreamOps.runningUserStats(events)
      .writeStream.format("memory").queryName("stats_out")
      .outputMode("update").start()
    try {
      in.addData((1L, 7L, 10.0))
      q.processAllAvailable()
      in.addData((2L, 7L, 5.0))
      q.processAllAvailable()
      val last = spark.sql("select * from stats_out where userId = 7 order by n desc limit 1")
        .collect()(0)
      assert(last.getLong(1) == 2 && last.getDouble(2) == 15.0)
    } finally q.stop()
  }

  test("loadStream commits each micro-batch into a lake pool") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-streamlake").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val in = MemoryStream[(Long, Double)]
    val q = StreamOps.loadStream(in.toDF().toDF("k", "v"), root, "live", ckpt)
    try {
      in.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      in.addData((3L, 3.0))
      q.processAllAvailable()
      val commits = graft.sources.Lake.commits(root, "live")
      assert(commits.length == 2 && commits.forall(_.author == "stream"))
      assert(graft.sources.Lake.scan(spark, root, "live").count() == 3)
    } finally q.stop()
  }

  test("mirrorStream fans each micro-batch out to every named sink (mirror.go/mux.go)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-mux").toString
    val in = MemoryStream[(Long, Double)]
    val seen = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val q = StreamOps.mirrorStream(in.toDF().toDF("k", "v"), ckpt, Seq(
      "all" -> ((b: org.apache.spark.sql.DataFrame) =>
        seen.synchronized { seen("all") += b.count() }),
      "high" -> ((b: org.apache.spark.sql.DataFrame) =>
        seen.synchronized { seen("high") += b.filter($"v" > 1.5).count() })))
    try {
      in.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      in.addData((3L, 3.0))
      q.processAllAvailable()
      assert(seen("all") == 3 && seen("high") == 2)
    } finally q.stop()
  }
}
