package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{ListVector, StructVector}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}

import scala.jdk.CollectionConverters._

/** Arrow IPC stream format (reference: zio/arrowio/reader.go, writer.go —
  * zed's first-line interchange format). Spark-first shape: each part
  * file decodes WHERE IT SITS (binaryFile → mapPartitions over the
  * executor-local bytes, one ArrowStreamReader per file, no driver
  * funnel); writes stream one IPC file per partition through the Hadoop
  * FileSystem API, so the cluster path is identical to the local one.
  * The arrow-vector jars are Spark's own (pyspark interchange).
  */
object ArrowIO {

  // ---- schema mapping --------------------------------------------------------

  private def arrowField(name: String, dt: DataType): Field = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      new Field(name, FieldType.nullable(new ArrowType.Int(64, true)), null)
    case DoubleType | FloatType =>
      new Field(name,
        FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)
    case BooleanType =>
      new Field(name, FieldType.nullable(ArrowType.Bool.INSTANCE), null)
    case StringType =>
      new Field(name, FieldType.nullable(ArrowType.Utf8.INSTANCE), null)
    case BinaryType =>
      new Field(name, FieldType.nullable(ArrowType.Binary.INSTANCE), null)
    case TimestampType | TimestampNTZType =>
      new Field(name,
        FieldType.nullable(new ArrowType.Timestamp(ATimeUnit.MICROSECOND, "UTC")), null)
    case _: DecimalType =>
      new Field(name,
        FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)
    case ArrayType(et, _) =>
      new Field(name, FieldType.nullable(ArrowType.List.INSTANCE),
        Seq(arrowField("item", et)).asJava)
    case StructType(fs) =>
      new Field(name, FieldType.nullable(ArrowType.Struct.INSTANCE),
        fs.toSeq.map(f => arrowField(f.name, f.dataType)).asJava)
    case other =>
      new Field(name, FieldType.nullable(ArrowType.Utf8.INSTANCE), null)
  }

  private def sparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.Int => LongType
    case _: ArrowType.FloatingPoint => DoubleType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
    case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
    case _: ArrowType.Timestamp => TimestampType
    case _: ArrowType.Date => DateType
    case _: ArrowType.List =>
      ArrayType(sparkType(f.getChildren.asScala.head))
    case _: ArrowType.Struct =>
      StructType(f.getChildren.asScala.toSeq.map(c => StructField(c.getName, sparkType(c))))
    case _ => StringType
  }

  // ---- read ------------------------------------------------------------------

  private def vectorValue(v: FieldVector, i: Int): Any = {
    if (v.isNull(i)) return null
    v match {
      case x: BigIntVector => x.get(i)
      case x: IntVector => x.get(i).toLong
      case x: SmallIntVector => x.get(i).toLong
      case x: TinyIntVector => x.get(i).toLong
      case x: Float8Vector => x.get(i)
      case x: Float4Vector => x.get(i).toDouble
      case x: BitVector => x.get(i) == 1
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: LargeVarCharVector => new String(x.get(i), "UTF-8")
      case x: VarBinaryVector => x.get(i)
      case x: TimeStampVector =>
        // stored µs (our writer) or ns/ms depending on producer unit
        val unit = x.getField.getType.asInstanceOf[ArrowType.Timestamp].getUnit
        val micros = unit match {
          case ATimeUnit.SECOND => x.get(i) * 1000000L
          case ATimeUnit.MILLISECOND => x.get(i) * 1000L
          case ATimeUnit.MICROSECOND => x.get(i)
          case ATimeUnit.NANOSECOND => x.get(i) / 1000L
        }
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
      case x: ListVector =>
        val start = x.getOffsetBuffer.getInt(i * 4L)
        val end = x.getOffsetBuffer.getInt((i + 1) * 4L)
        (start until end).map(j => vectorValue(x.getDataVector.asInstanceOf[FieldVector], j))
      case x: StructVector =>
        Row.fromSeq(x.getChildrenFromFields.asScala.toSeq.map(c => vectorValue(c, i)))
      case other => Option(other.getObject(i)).map(_.toString).orNull
    }
  }

  def decode(bytes: Array[Byte]): (StructType, Seq[Row]) = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val reader = new ArrowStreamReader(
        new java.io.ByteArrayInputStream(Gzip.maybeGunzip(bytes)), alloc)
      try {
        val root = reader.getVectorSchemaRoot
        val schema = StructType(root.getSchema.getFields.asScala.toSeq.map(f =>
          StructField(f.getName, sparkType(f))))
        val rows = Vector.newBuilder[Row]
        while (reader.loadNextBatch()) {
          val vectors = root.getFieldVectors.asScala.toSeq
          for (i <- 0 until root.getRowCount)
            rows += Row.fromSeq(vectors.map(v => vectorValue(v, i)))
        }
        (schema, rows.result())
      } finally reader.close()
    } finally alloc.close()
  }

  /** Decode only a stream's SCHEMA header (no batches — cheap pass 1). */
  private def schemaOf(bytes: Array[Byte]): StructType = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val reader = new ArrowStreamReader(
        new java.io.ByteArrayInputStream(Gzip.maybeGunzip(bytes)), alloc)
      try StructType(reader.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
        .map(f => StructField(f.getName, sparkType(f))))
      finally reader.close()
    } finally alloc.close()
  }

  /** A decoded Arrow row as a typed value (for the multi-schema fuse:
    * heterogeneous files route through the same shape-discovery/variant
    * machinery as every other typed source — zio/arrowio/reader.go fuses
    * per-file types the same way).
    */
  private def rowValue(r: Row, st: StructType): ZValue = {
    import ZValue._
    def zedOf(dt: DataType): ZType = dt match {
      case LongType => ZType.Prim("int64")
      case DoubleType => ZType.Prim("float64")
      case BooleanType => ZType.Prim("bool")
      case StringType => ZType.Prim("string")
      case BinaryType => ZType.Prim("bytes")
      case TimestampType | DateType => ZType.Prim("time")
      case ArrayType(et, _) => ZType.Arr(zedOf(et))
      case StructType(fs) => ZType.Rec(fs.toVector.map(f => f.name -> zedOf(f.dataType)))
      case _ => ZType.Prim("string")
    }
    def valueOf(x: Any, dt: DataType): ZValue = x match {
      case null => VNull(zedOf(dt))
      case n: Long => VInt(n, "int64")
      case d: Double => VFloat(d, "float64")
      case b: Boolean => VBool(b)
      case s: String => VStr(s)
      case b: Array[Byte] => VBytes(b)
      case t: java.sql.Timestamp =>
        VTime(Math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos.toLong)
      case xs: scala.collection.Seq[_] =>
        val et = dt match { case ArrayType(e, _) => e; case _ => StringType }
        VArr(xs.toVector.map(v => valueOf(v, et)), isSet = false)
      case row: Row =>
        val fs = dt match { case s: StructType => s.fields.toVector; case _ => Vector.empty }
        VRec(fs.zipWithIndex.map { case (f, i) => f.name -> valueOf(row.get(i), f.dataType) })
      case other => VStr(other.toString)
    }
    valueOf(r, st).asInstanceOf[ZValue]
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = HadoopFs.binaryFiles(spark, path)
    val contents = files.select("content").as[Array[Byte]]
    // pass 1: per-file SCHEMAS only (headers — no batch decode)
    val schemas = contents.rdd.map(schemaOf).distinct().collect()
    require(schemas.nonEmpty, s"arrow: no files at $path")
    if (schemas.length == 1) {
      // homogeneous directory: decode distributed straight to the schema
      val schema = schemas.head
      val rows = contents.rdd.flatMap(b => decode(b)._2)
      spark.createDataFrame(rows, schema)
    } else {
      // mixed schemas: per-file typed decode → the shared shape-discovery/
      // variant fuse (same route as zson/zng/zeek)
      val rdd = contents.rdd.flatMap { b =>
        val (st, rows) = decode(b)
        rows.iterator.map(r => rowValue(r, st))
      }
      ZsonReader.fromRDD(spark, rdd)
    }
  }

  // ---- write -----------------------------------------------------------------

  private def setValue(v: FieldVector, i: Int, value: Any): Unit = value match {
    case null => v.asInstanceOf[BaseValueVector] match { case _ => v.setNull(i) }
    case x => v match {
      case vec: BigIntVector => x match {
        case n: Long => vec.setSafe(i, n)
        case n: Int => vec.setSafe(i, n.toLong)
        case n: Short => vec.setSafe(i, n.toLong)
        case n: Byte => vec.setSafe(i, n.toLong)
        case n: java.math.BigDecimal => vec.setSafe(i, n.longValue())
      }
      case vec: Float8Vector => x match {
        case n: Double => vec.setSafe(i, n)
        case n: Float => vec.setSafe(i, n.toDouble)
        case n: java.math.BigDecimal => vec.setSafe(i, n.doubleValue())
      }
      case vec: BitVector => vec.setSafe(i, if (x.asInstanceOf[Boolean]) 1 else 0)
      case vec: VarCharVector => vec.setSafe(i, x.toString.getBytes("UTF-8"))
      case vec: VarBinaryVector => vec.setSafe(i, x.asInstanceOf[Array[Byte]])
      case vec: TimeStampMicroTZVector =>
        val inst = x match {
          case t: java.sql.Timestamp => t.toInstant
          case t: java.time.Instant => t
        }
        vec.setSafe(i, inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
      case vec: ListVector =>
        val writerIdx = vec.startNewValue(i)
        val items = x.asInstanceOf[scala.collection.Seq[Any]]
        val child = vec.getDataVector.asInstanceOf[FieldVector]
        var j = 0
        for (it <- items) {
          setValue(child, writerIdx + j, it)
          j += 1
        }
        vec.endValue(i, items.length)
      case vec: StructVector =>
        val r = x.asInstanceOf[Row]
        vec.setIndexDefined(i)
        val children = vec.getChildrenFromFields.asScala.toSeq
        children.zipWithIndex.foreach { case (c, ci) => setValue(c, i, r.get(ci)) }
      case other => other.setNull(i)
    }
  }

  /** Stream rows as IPC batches DIRECTLY to the sink — memory is one
    * 4096-row batch, never the whole partition (no 2 GiB array ceiling).
    */
  def encodeTo(schema: StructType, rows: Iterator[Row], out: java.io.OutputStream): Unit = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val aschema = new ASchema(schema.fields.toSeq.map(f => arrowField(f.name, f.dataType)).asJava)
      val root = VectorSchemaRoot.create(aschema, alloc)
      val writer = new ArrowStreamWriter(root, null, out)
      try {
        writer.start()
        val batch = rows.grouped(4096)
        for (group <- batch) {
          root.allocateNew()
          val vectors = root.getFieldVectors.asScala.toSeq
          group.zipWithIndex.foreach { case (r, i) =>
            vectors.zipWithIndex.foreach { case (v, ci) => setValue(v, i, r.get(ci)) }
          }
          root.setRowCount(group.length)
          writer.writeBatch()
        }
        writer.end()
      } finally { writer.close(); root.close() }
    } finally alloc.close()
  }

  def encode(schema: StructType, rows: Iterator[Row]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    encodeTo(schema, rows, out)
    out.toByteArray
  }

  /** Distributed write: one IPC stream per partition via the Hadoop FS
    * API (same path local and on a cluster).
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val conf = HadoopFs.confMap(df.sparkSession)
    HadoopFs.prepareDir(df.sparkSession, path)
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) {
        val out = HadoopFs.create(conf, path, f"part-$pid%05d.arrows")
        try encodeTo(schema, it, out) finally out.close()
      }
      Iterator.empty[Int]
    }.count()
    ()
  }
}
