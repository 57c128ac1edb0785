package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.ZngIO

/** ZNG binary format: spec-level encoding checks (uvarint, zigzag, frame
  * structure, EOS) plus full write→read round-trips through Spark.
  */
class ZngSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def tmp(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-$name")
    p.toFile.deleteOnExit()
    p.resolve("out").toString
  }

  test("signed counted varint matches the reference (magnitude<<1 | sign)") {
    // zcode/counted.go:59 EncodeCountedVarint — NOT zigzag: -1 → 0x03
    assert(ZngIO.signedBytes(0L).isEmpty)            // minimal: no bytes
    assert(ZngIO.signedBytes(1L).toSeq == Seq(2.toByte))
    assert(ZngIO.signedBytes(-1L).toSeq == Seq(3.toByte))
    assert(ZngIO.signedBytes(-2L).toSeq == Seq(5.toByte))
    assert(ZngIO.signedBytes(64L).toSeq == Seq(0x80.toByte))
    assert(ZngIO.signedBytes(Long.MinValue).toSeq == Seq(1.toByte)) // reserved
    assert(ZngIO.signedOf(Array(1.toByte)) == Long.MinValue)
    assert(ZngIO.signedOf(Array(3.toByte)) == -1L)
  }

  test("stream structure: types frame, values frame, end-of-stream") {
    val schema = StructType(Seq(StructField("a", LongType), StructField("s", StringType)))
    val rows = Iterator(Row(7L, "x"))
    val bytes = ZngIO.encodeStream(rows, schema)
    assert((bytes(0) >> 4) == 0)            // first frame: types (T=00, V=0, C=0)
    assert(bytes.last == 0xff.toByte)       // end of stream
    val lines = ZngIO.decodeToZson(bytes).toSeq
    assert(lines == Seq("""{a:7,s:"x"}"""))
  }

  test("round-trips every primitive kind") {
    val df = Seq(
      (1L, 42, "héllo \"q\"", 2.5, 1.0f, true, Array[Byte](1, 2, 0xff.toByte)),
      (2L, -7, "", -0.0, -3.5f, false, Array.empty[Byte])
    ).toDF("l", "i", "s", "d", "f", "b", "bin")
    val path = tmp("zng-prims")
    ZngIO.write(df, path)
    val back = ZngIO.read(spark, path).orderBy("l")
    val rows = back.select("l", "i", "s", "d", "f", "b", "bin").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(1) == 42L)
    assert(rows(0).getString(2) == "héllo \"q\"")
    assert(rows(0).getDouble(3) == 2.5)
    assert(rows(0).getBoolean(5))
    // typed read: bytes decode to a real binary column (not 0x-hex text)
    assert(rows(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 0xff.toByte))
    assert(rows(1).getLong(1) == -7L && rows(1).getString(2) == "")
  }

  test("round-trips nested records and arrays") {
    val df = GraftSession.table(spark, dir, "orders")
      .limit(200)
      .select(col("o_orderkey"),
        struct(col("o_orderstatus"), col("o_totalprice")).as("info"),
        array(col("o_custkey"), col("o_orderkey")).as("keys"))
    val path = tmp("zng-nested")
    ZngIO.write(df, path)
    val back = ZngIO.read(spark, path)
    assert(back.count() == 200)
    assert(back.select(sum("info.o_totalprice")).collect()(0).getDouble(0) ==
      df.select(sum("info.o_totalprice")).collect()(0).getDouble(0))
    assert(back.select(sum(element_at(col("keys"), 2))).collect()(0).getLong(0) ==
      df.select(sum("o_orderkey")).collect()(0).getLong(0))
  }

  test("round-trips timestamps in the ns domain") {
    val df = GraftSession.table(spark, dir, "orders").limit(50)
      .select(col("o_orderkey"), col("o_orderdate"))
    val path = tmp("zng-time")
    ZngIO.write(df, path)
    val back = ZngIO.read(spark, path).orderBy("o_orderkey")
    // typed read: time decodes to a real timestamp column
    val a = back.limit(1)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
      .collect()(0).getString(0)
    val b = df.orderBy("o_orderkey").limit(1)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
      .collect()(0).getString(0)
    assert(a == b)
  }

  test("multi-partition writes produce concatenable independent streams") {
    val df = GraftSession.table(spark, dir, "nation").repartition(4)
    val path = tmp("zng-parts")
    ZngIO.write(df, path)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".zng"))
    assert(files.length == 4)
    // concatenation of streams is a valid ZNG sequence (spec §2.4)
    val all = files.sortBy(_.getName).flatMap(f => java.nio.file.Files.readAllBytes(f.toPath))
    assert(ZngIO.decodeToZson(all).size == 25)
    assert(ZngIO.read(spark, path).count() == 25)
  }

  test("decodes ip and net primitives to address text") {
    import java.io.ByteArrayOutputStream
    val vals = new ByteArrayOutputStream()
    def uvv(v: Long) = ZngIO.uvarint(vals, v)
    // ip 192.168.1.1 (id 26): 4 addr bytes
    uvv(26); uvv(5); vals.write(192); vals.write(168); vals.write(1); vals.write(1)
    // net 10.0.0.0/8 (id 27): 4 addr bytes + 4 mask bytes
    uvv(27); uvv(9)
    vals.write(10); vals.write(0); vals.write(0); vals.write(0)
    vals.write(0xff); vals.write(0); vals.write(0); vals.write(0)
    // ip6 fe80::1
    uvv(26); uvv(17)
    vals.write(0xfe); vals.write(0x80)
    (0 until 13).foreach(_ => vals.write(0))
    vals.write(1)
    val out = new ByteArrayOutputStream()
    val p = vals.toByteArray
    out.write((1 << 4) | (p.length & 0xf))
    ZngIO.uvarint(out, (p.length >> 4).toLong)
    out.write(p, 0, p.length)
    out.write(0xff)
    val lines = ZngIO.decodeToZson(out.toByteArray).toSeq
    assert(lines == Seq("192.168.1.1", "10.0.0.0/8", "fe80::1"))
  }

  test("decoder handles maps, sets, unions, enums, named and error types") {
    // hand-encode a types frame exercising decoder paths the writer doesn't emit
    import java.io.ByteArrayOutputStream
    val defs = new ByteArrayOutputStream()
    def uv(v: Long) = ZngIO.uvarint(defs, v)
    // 30: set<int64>; 31: union(int64,string); 32: enum{lo,hi}; 33: named "port" int64
    defs.write(0x02); uv(9)
    defs.write(0x04); uv(2); uv(9); uv(25)
    defs.write(0x05); uv(2); uv(2); defs.write('l'); defs.write('o'); uv(2); defs.write('h'); defs.write('i')
    defs.write(0x07); uv(4); defs.write('p'); defs.write('o'); defs.write('r'); defs.write('t'); uv(9)
    val vals = new ByteArrayOutputStream()
    def uvv(v: Long) = ZngIO.uvarint(vals, v)
    // set value {1,2}: two tagged signed varints
    uvv(30); uvv(5); uvv(2); vals.write(2); uvv(2); vals.write(4)
    // union value: selector 1 (string, signed varint → 0x02) + "ok"
    uvv(31); uvv(6); uvv(2); vals.write(2); uvv(3); vals.write('o'); vals.write('k')
    // enum value: index 1 → "hi"
    uvv(32); uvv(2); vals.write(1)
    // named value: port 80
    uvv(33); uvv(2); vals.write(((80 << 1) & 0xff))
    val out = new ByteArrayOutputStream()
    def frame(t: Int, p: Array[Byte]): Unit = {
      out.write((t << 4) | (p.length & 0xf))
      ZngIO.uvarint(out, (p.length >> 4).toLong)
      out.write(p, 0, p.length)
    }
    frame(0, defs.toByteArray); frame(1, vals.toByteArray); out.write(0xff)
    val lines = ZngIO.decodeToZson(out.toByteArray).toSeq
    assert(lines == Seq("|[1,2]|", "\"ok\"", "\"hi\"", "80"))
  }

  test("internal-row encoder emits identical wire bytes to the external encoder") {
    val schema = StructType(Seq(
      StructField("b", ByteType), StructField("sh", ShortType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType), StructField("d", DoubleType),
      StructField("bo", BooleanType), StructField("st", StringType), StructField("bin", BinaryType),
      StructField("ts", TimestampType), StructField("dt", DateType),
      StructField("dur", DayTimeIntervalType()),
      StructField("u64", DecimalType(20, 0)),
      StructField("rec", StructType(Seq(StructField("x", LongType), StructField("y", StringType)))),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType))))
    val ts = java.sql.Timestamp.valueOf("2020-03-04 05:06:07.123456")
    val rows = Seq(
      Row(1.toByte, 2.toShort, 3, -4L, 1.5f, -2.5, true, "héllo", Array[Byte](1, 2),
        ts, java.sql.Date.valueOf("2021-01-02"),
        java.time.Duration.ofSeconds(3, 123456000),
        new java.math.BigDecimal("18446744073709551615"),
        Row(7L, "in"), Seq(1L, null, 3L), Map("k1" -> 1L, "a" -> 2L)),
      Row(null, null, null, null, null, null, null, null, null, null, null, null,
        null, null, null, null))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema).coalesce(1)
    val external = ZngIO.encodeStream(df.collect().iterator, schema)
    val out = new java.io.ByteArrayOutputStream()
    ZngIO.encodeInternalStreamTo(out, df.queryExecution.toRdd.collect().iterator, schema)
    assert(out.toByteArray.toSeq == external.toSeq)
  }

  test("frame prefilter skips frames that can't match a pushed string " +
       "predicate, with identical results (ref bufferfilter.go)") {
    val path = tmp("prefilter")
    // many frames: small frame bound comes from partitioning — 8 parts,
    // each its own stream; the needle lives in exactly one part
    val df = spark.range(0, 80000).repartition(8)
      .selectExpr("id", "concat('msg_', id % 997) as s", "cast(id % 7 as double) as d")
    ZngIO.write(df, path)
    val needle = "msg_123"
    def q(enabled: Boolean) = {
      spark.conf.set("graft.zng.prefilter", enabled.toString)
      try ZngIO.read(spark, path).filter(col("s") === needle)
        .orderBy("id").collect().toSeq
      finally spark.conf.unset("graft.zng.prefilter")
    }
    val off = q(false)
    ZngIO.totalFramesSkipped.reset(); ZngIO.totalFramesRead.reset()
    val on = q(true)
    assert(on == off && on.nonEmpty)
    // "msg_123" appears in every frame here (dense id space), so also
    // check a truly absent needle prunes everything
    ZngIO.totalFramesSkipped.reset(); ZngIO.totalFramesRead.reset()
    spark.conf.set("graft.zng.prefilter", "true")
    try {
      assert(ZngIO.read(spark, path).filter(col("s") === "no_such_value_xyz").count() == 0)
      assert(ZngIO.totalFramesSkipped.sum() > 0, "prefilter should skip frames")
      assert(ZngIO.totalFramesRead.sum() == 0, "no frame can contain the needle")
    } finally spark.conf.unset("graft.zng.prefilter")
  }

  test("vectorized zng scan matches the row reader, including het streams") {
    val path = tmp("zng-vec")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    // two shapes + a top-level null record in ONE stream
    val vals = (0 until 500).map { i =>
      if (i % 5 == 0) s"""{a:$i,s:"x$i"}"""
      else if (i % 5 == 1) s"""{a:$i(int32),d:${i % 7}.5,flag:${i % 2 == 0}}"""
      else if (i % 17 == 0) "null({a:int64,s:string})"
      else s"""{a:$i,s:null(string)}"""
    }.map(l => graft.sources.ZsonParser.parseAll(l).head)
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "part.zng"),
      ZngIO.encodeTypedStream(vals))
    val vec = ZngIO.read(spark, path)
    assert(vec.queryExecution.executedPlan.toString.contains("vectorized"),
      vec.queryExecution.executedPlan.toString.take(600))
    spark.conf.set("graft.zng.vectorized", "false")
    val (rowPlan, rowData) =
      try {
        val row = ZngIO.read(spark, path)
        (row.queryExecution.executedPlan.toString,
          row.orderBy("a", "s", "d").collect().toSeq)
      } finally spark.conf.unset("graft.zng.vectorized")
    assert(!rowPlan.contains("vectorized"))
    assert(vec.orderBy("a", "s", "d").collect().toSeq == rowData)
    // tag column semantics survive vectorization (incl. null-record tags)
    val tags = vec.groupBy("__type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tags.keys.exists(_.startsWith("null(")), tags.keys.mkString(","))
    assert(tags.values.sum == 500)
  }

  test("vectorized zng scan appends struct nulls without misaligning " +
       "children (null records + shape-absent struct fields)") {
    val path = tmp("zng-vec-structnull")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    // three shapes in ONE stream: full, conn-absent, and top-level null —
    // the latter two exercise appendNullFor on a StructType vector, where
    // a plain appendNull() would skew every later nested value
    val lines = (0 until 300).map { i =>
      if (i % 7 == 0) "null({id:int64,conn:{x:int64,y:string}})"
      else if (i % 3 == 0) s"{id:$i}"
      else s"""{id:$i,conn:{x:${i * 2},y:"h$i"}}"""
    }
    val vals = lines.map(l => graft.sources.ZsonParser.parseAll(l).head)
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "p.zng"),
      ZngIO.encodeTypedStream(vals))
    val back = ZngIO.read(spark, path)
    assert(back.queryExecution.executedPlan.toString.contains("vectorized"),
      back.queryExecution.executedPlan.toString.take(600))
    // every non-null conn must carry ITS OWN row's values — any child
    // misalignment shows up as x != 2*id or a shifted y
    val rows = back.filter(col("conn").isNotNull)
      .select("id", "conn.x", "conn.y").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) * 2, s"misaligned x at id=${r.getLong(0)}")
      assert(r.getString(2) == s"h${r.getLong(0)}", s"misaligned y at id=${r.getLong(0)}")
    }
    val nullRecs = lines.count(_.startsWith("null("))
    assert(back.filter(col("id").isNull).count() == nullRecs)
    assert(back.count() == 300)
  }

  test("cross-shape type conflicts (time/string, enum/int) route through " +
       "variant boxing in the direct builder") {
    val path = tmp("zng-het-conflict")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    // v: time in one shape, string in the other; e: enum vs int64 —
    // both merged columns become variant structs, where a raw boxed
    // Long/UTF8String in the InternalRow slot would corrupt rows
    val lines = (0 until 60).map { i =>
      if (i % 2 == 0)
        f"""{id:$i%d,v:2024-01-01T00:00:$i%02dZ,e:"red"(enum(red,green))}"""
      else s"""{id:$i,v:"s$i",e:$i}"""
    }
    val vals = lines.map(l => graft.sources.ZsonParser.parseAll(l).head)
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "p.zng"),
      ZngIO.encodeTypedStream(vals))
    val back = ZngIO.read(spark, path)
    val got = graft.sources.ZsonIO.toZson(back.orderBy("id")).collect().toSeq
    // enum values decorate on output — an enum type is never implied and
    // "must appear in a context where the enum type is known"
    // (reference docs/formats/zson.md §2.6, zson/zson.go Implied)
    val expected = (0 until 60).map { i =>
      if (i % 2 == 0)
        f"{id:$i%d,v:2024-01-01T00:00:$i%02dZ,e:%%red(enum(red,green))}"
      else s"""{id:$i,v:"s$i",e:$i}"""
    }
    assert(got == expected, got.take(4).mkString("\n"))
  }

  test("empty zng directory reads as an empty frame") {
    val path = tmp("zng-empty")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    assert(ZngIO.read(spark, path).count() == 0)
  }

  test("vectorized zng scan handles array columns (zeek vector shape)") {
    val path = tmp("zng-vec-arr")
    val df = spark.range(0, 2000).selectExpr(
      "id",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE array(id, id * 2, id * 3) END AS vs",
      "concat('h', id) AS s")
    ZngIO.write(df, path)
    val back = ZngIO.read(spark, path)
    assert(back.queryExecution.executedPlan.toString.contains("vectorized"),
      back.queryExecution.executedPlan.toString.take(600))
    assert(back.filter(col("vs").isNull).count() == 400)
    assert(back.agg(sum(element_at(col("vs"), 3))).collect()(0).getLong(0) ==
      df.agg(sum(element_at(col("vs"), 3))).collect()(0).getLong(0))
  }

  test("vectorized zng scan handles nested records (zeek id record shape)") {
    val path = tmp("zng-vec-struct")
    val df = spark.range(0, 2000).selectExpr(
      "id",
      "CASE WHEN id % 4 = 0 THEN NULL ELSE " +
        "named_struct('orig_h', concat('10.0.0.', id % 250), 'orig_p', id % 65536, " +
        "'deep', named_struct('x', id * 2)) END AS conn",
      "concat('u', id) AS s")
    ZngIO.write(df, path)
    val back = ZngIO.read(spark, path)
    assert(back.queryExecution.executedPlan.toString.contains("vectorized"),
      back.queryExecution.executedPlan.toString.take(600))
    assert(back.filter(col("conn").isNull).count() == 500)
    assert(back.agg(sum("conn.deep.x")).collect()(0).getLong(0) ==
      df.agg(sum("conn.deep.x")).collect()(0).getLong(0))
    assert(back.filter(col("conn.orig_h") === "10.0.0.7").count() ==
      df.filter(col("conn.orig_h") === "10.0.0.7").count())
  }

  test("vectorized zng scan handles sub-microsecond times (ns carrier)") {
    val path = tmp("zng-vec-ns")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    val vals = Seq(
      "{ts:2024-01-01T00:00:00.000000001Z,v:1}",
      "{ts:2024-01-01T00:00:00.5Z,v:2}")
      .map(l => graft.sources.ZsonParser.parseAll(l).head)
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "p.zng"),
      ZngIO.encodeTypedStream(vals))
    val back = ZngIO.read(spark, path)
    assert(back.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    val tss = back.orderBy("v").select("ts").collect().map(_.getLong(0)).toSeq
    assert(tss.head % 1000L == 1L)
  }

  test("a huge multi-stream file splits at EOS boundaries across tasks") {
    val path = tmp("split")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    // one FILE holding 6 independent concatenated streams (cat a.zng
    // b.zng … — also the shape a long-running writer produces)
    val out = new java.io.ByteArrayOutputStream()
    for (k <- 0 until 6) {
      val vals = (k * 1000 until (k + 1) * 1000).map(i =>
        graft.sources.ZsonParser.parseAll(s"""{id:$i,s:"v$i"}""").head)
      out.write(ZngIO.encodeTypedStream(vals))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "big.zng"), out.toByteArray)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8k")
    try {
      val back = ZngIO.read(spark, path)
      assert(back.rdd.getNumPartitions > 1,
        s"expected >1 split, got ${back.rdd.getNumPartitions}")
      assert(back.count() == 6000)
      assert(back.agg(sum("id")).collect()(0).getLong(0) == (0L until 6000L).sum)
      assert(back.filter(col("s") === "v4321").count() == 1)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("zng scans report statistics so small dims broadcast in joins") {
    val path = tmp("stats")
    val dim = spark.range(0, 100).selectExpr("id as k", "concat('n', id) as name")
    ZngIO.write(dim, path)
    val fact = spark.range(0, 200000).selectExpr("id", "id % 100 as k")
    val joined = fact.join(ZngIO.read(spark, path).drop("__type"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(1000))
  }

  test("count(*) pushes down to discovery metadata (no data re-read)") {
    val path = tmp("countpush")
    val df = spark.range(0, 12345).repartition(4)
      .selectExpr("id", "concat('v', id) as s")
    ZngIO.write(df, path)
    val back = ZngIO.read(spark, path)
    val agg = back.agg(count(lit(1)).as("n"))
    assert(agg.queryExecution.executedPlan.toString.contains("count pushdown"),
      agg.queryExecution.executedPlan.toString.take(600))
    assert(agg.collect()(0).getLong(0) == 12345L)
    assert(back.count() == 12345L)
    // a residual filter blocks the pushdown and still counts correctly
    val filtered = back.filter(col("s") =!= "v1").agg(count(lit(1)).as("n"))
    assert(!filtered.queryExecution.executedPlan.toString.contains("count pushdown"))
    assert(filtered.collect()(0).getLong(0) == 12344L)
  }

  test("frame prefilter is NOT derived from enum, ip, or tag columns " +
       "(their bytes aren't raw in the values frame)") {
    val path = tmp("prefilter-enum")
    val vals = Seq(
      "{s:\"keepme\",e:\"red\"(enum(red,green)),a:1.2.3.4}",
      "{s:\"other\",e:\"green\"(enum(red,green)),a:5.6.7.8}")
      .map(l => new graft.sources.ZsonParser(l).parseOne())
    val df0 = graft.sources.ZsonReader.fromValues(spark, vals, tag = false)
    ZngIO.write(df0, path)
    spark.conf.set("graft.zng.prefilter", "true")
    try {
      // enum symbol + ip text never appear in the values frame — these
      // MUST still return their rows (excluded from pattern derivation)
      assert(ZngIO.read(spark, path).filter(col("e") === "red").count() == 1)
      assert(ZngIO.read(spark, path).filter(col("a") === "1.2.3.4").count() == 1)
      // and a genuine string predicate still both prunes and matches
      assert(ZngIO.read(spark, path).filter(col("s") === "keepme").count() == 1)
    } finally spark.conf.unset("graft.zng.prefilter")
  }

  test("tagged fast writer emits UNSIGNED minimal-LE bytes for uintN and " +
       "IEEE half bits for float16 (zcode EncodeUint — no zigzag)") {
    import graft.sources.ZType
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    def bytesOf(zt: ZType, dt: DataType, v: Any): Seq[Byte] = {
      val enc = ZngIO.shapeFieldEncoder(zt, dt)
        .getOrElse(fail(s"no fast encoder for ($zt, $dt)"))
      val buf = new ZngIO.ByteBuf(16)
      enc(buf, new GenericInternalRow(Array[Any](v)), 0)
      buf.toByteArray.toSeq
    }
    // uint 1 → counted tag 2, byte 0x01 (zigzag would write 0x02)
    assert(bytesOf(ZType.Prim("uint64"), LongType, 1L) == Seq[Byte](2, 1))
    assert(bytesOf(ZType.Prim("uint32"), LongType, 1L) == Seq[Byte](2, 1))
    assert(bytesOf(ZType.Prim("uint16"), IntegerType, 300) == Seq[Byte](3, 0x2c, 1))
    assert(bytesOf(ZType.Prim("uint8"), ShortType, 200.toShort) ==
      Seq[Byte](2, 200.toByte))
    assert(bytesOf(ZType.Prim("uint64"), LongType, 0L) == Seq[Byte](1)) // minimal
    // float16 1.5 → half bits 0x3e00, 2-byte LE
    assert(bytesOf(ZType.Prim("float16"), FloatType, 1.5f) ==
      Seq[Byte](3, 0x00, 0x3e))
    assert(bytesOf(ZType.Prim("float16"), DoubleType, 1.5d) ==
      Seq[Byte](3, 0x00, 0x3e))
    // e2e: tagged frame with uint shapes round-trips values exactly
    val vals = Seq("{a:200(uint8),b:70000(uint32),c:5(uint64)}",
                   "{a:17(uint8),b:1(uint32),c:18446744073709551615(uint64)}")
      .map(l => new graft.sources.ZsonParser(l).parseOne())
    val df = graft.sources.ZsonReader.fromValues(spark, vals, tag = true)
    val path = tmp("tagged-uint")
    ZngIO.write(df, s"$path/u.zng")
    val back = graft.sources.ZsonIO.toZson(ZngIO.read(spark, s"$path/u.zng"))
      .collect().toSeq.sorted
    assert(back == Seq(
      "{a:17(uint8),b:1(uint32),c:18446744073709551615(uint64)}",
      "{a:200(uint8),b:70000(uint32),c:5(uint64)}"))
  }

  test("uint64 above 2^63-1 keeps its exact value through the Decimal " +
       "carrier: zson render, zng round-trip, and sums (value.go uint64)") {
    val spark = GraftSession.local(4)
    try {
      val vals = Seq("18446744073709551615(uint64)", "18446744073709551614(uint64)")
        .map(l => new graft.sources.ZsonParser(l).parseOne())
      val df = graft.sources.ZsonReader.fromValues(spark, vals, tag = true)
      assert(df.schema("this").dataType ==
        org.apache.spark.sql.types.DecimalType(20, 0))
      assert(graft.sources.ZsonIO.toZson(df).collect().toSeq ==
        Seq("18446744073709551615(uint64)", "18446744073709551614(uint64)"))
      // exact arithmetic in the decimal domain (no double rounding)
      val sum = graft.lang.Graft.queryOn(df, "sum(this)")
      assert(graft.sources.ZsonIO.toZson(sum).collect().head.startsWith("36893488147419103229"))
      // zng writer emits real uint64 (type id 3) as BARE values (the
      // this-only frame is the bare-value carrier, zq.md hexdump pin)
      val tmp = java.nio.file.Files.createTempDirectory("graft-u64").toString
      ZngIO.write(df.drop(graft.operators.Het.typeTag), s"$tmp/u.zng")
      val back = ZngIO.read(spark, s"$tmp/u.zng")
      assert(graft.sources.ZsonIO.toZson(back).collect().toSeq.sorted ==
        Seq("18446744073709551614(uint64)", "18446744073709551615(uint64)"))
    } finally spark.stop()
  }
}
