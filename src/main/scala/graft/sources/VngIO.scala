package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import scala.collection.immutable.ListMap

/** VNG columnar format (reference: vng/ — header.go v4 layout, metadata.go
  * vector metadata, nulls.go RLE null runs, docs/formats/vng.md).
  *
  * Architecture per the reference: a 24-byte header ("VNG\0", version,
  * meta size, data size), a ZNG-encoded metadata section describing the
  * recursive vector layout, and a data section of per-column segments.
  * Columns stack by type structure: records decompose into per-field
  * columns with run-length-encoded null runs; arrays into a lengths column
  * plus a flattened values column; primitives into a segment of
  * tag-encoded ZNG values.
  *
  * Divergence (documented): the reference serializes metadata as
  * zson-marshaled Go structs with named union types (vng/metadata.go); here
  * the same tree is encoded as a flat pre-order sequence of one ZNG record
  * type — identical information, simpler framing. Primitive type names use
  * zed syntax.
  */
object VngIO {

  private val Version = 4

  // zed primitive name ↔ ZNG id (zng.md §3), for the metadata `ptype` field
  private val primIdByName = Map(
    "uint8" -> 0, "uint16" -> 1, "uint32" -> 2, "uint64" -> 3,
    "int8" -> 6, "int16" -> 7, "int32" -> 8, "int64" -> 9,
    "duration" -> 12, "time" -> 13, "float16" -> 14, "float32" -> 15,
    "float64" -> 16, "bool" -> 23, "bytes" -> 24, "string" -> 25, "null" -> 29)

  private def zedPrimName(dt: DataType): String = dt match {
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case BooleanType => "bool"
    case BinaryType => "bytes"
    case StringType => "string"
    case TimestampType | TimestampNTZType | DateType => "time"
    case NullType => "null"
    case other => throw new IllegalArgumentException(s"vng: unsupported leaf $other")
  }

  // ---- writer: column builders ----------------------------------------------

  /** Flat metadata row: (kind, name, ptype, offset, length, count, n). */
  private val metaSchema = StructType(Seq(
    StructField("kind", StringType), StructField("name", StringType),
    StructField("ptype", StringType), StructField("offset", LongType),
    StructField("length", LongType), StructField("count", LongType),
    StructField("n", LongType)))

  private sealed trait Builder {
    def write(v: Any): Unit
    /** Append stream bytes to `data`, emit pre-order metadata rows. */
    def finish(data: ByteArrayOutputStream): Seq[Row]
  }

  private final class PrimBuilder(dt: DataType) extends Builder {
    private val buf = new ByteArrayOutputStream()
    private var count = 0L
    def write(v: Any): Unit = { ZngIO.encodeValue(buf, v, dt); count += 1 }
    def finish(data: ByteArrayOutputStream): Seq[Row] = {
      val off = data.size().toLong
      buf.writeTo(data)
      Seq(Row("prim", null, zedPrimName(dt), off, buf.size().toLong, count, 0L))
    }
  }

  /** RLE null runs (vng/nulls.go): alternating present/absent counts,
    * starting with the present count (vng.md presence columns).
    */
  private final class NullsBuilder(child: Builder) extends Builder {
    private val runs = scala.collection.mutable.ArrayBuffer.empty[Long]
    private var present = true // current run parity; runs start "present"
    private var run = 0L
    private var nulls = 0L
    private def flip(): Unit = { runs += run; run = 0L; present = !present }
    def write(v: Any): Unit = {
      val isNull = v == null
      if (isNull == present) flip()
      run += 1
      if (isNull) nulls += 1 else child.write(v)
    }
    def finish(data: ByteArrayOutputStream): Seq[Row] = {
      if (run > 0) runs += run
      val childRows = child.finish(data)
      if (nulls == 0) childRows
      else {
        val buf = new ByteArrayOutputStream()
        runs.foreach(r => ZngIO.encodeValue(buf, r, LongType))
        val off = data.size().toLong
        buf.writeTo(data)
        Row("nulls", null, null, off, buf.size().toLong, nulls, 0L) +: childRows
      }
    }
  }

  private final class RecordBuilder(st: StructType) extends Builder {
    private val fields = st.fields.map(f => (f, new NullsBuilder(builderOf(f.dataType))))
    private var count = 0L
    def write(v: Any): Unit = {
      val r = v.asInstanceOf[Row]
      count += 1
      fields.zipWithIndex.foreach { case ((_, b), i) =>
        b.write(if (r.isNullAt(i)) null else r.get(i))
      }
    }
    def finish(data: ByteArrayOutputStream): Seq[Row] =
      Row("record", null, null, 0L, 0L, count, fields.length.toLong) +:
        fields.toIndexedSeq.flatMap { case (f, b) =>
          Row("field", f.name, null, 0L, 0L, 0L, 0L) +: b.finish(data)
        }
  }

  private final class ArrayBuilder(et: DataType) extends Builder {
    private val lengths = new PrimBuilder(IntegerType)
    private val values = new NullsBuilder(builderOf(et))
    def write(v: Any): Unit = {
      val s = v.asInstanceOf[scala.collection.Seq[Any]]
      lengths.write(s.length)
      s.foreach(values.write)
    }
    def finish(data: ByteArrayOutputStream): Seq[Row] =
      (Row("array", null, null, 0L, 0L, 0L, 0L) +: lengths.finish(data)) ++
        values.finish(data)
  }

  private def builderOf(dt: DataType): Builder = dt match {
    case st: StructType => new RecordBuilder(st)
    case ArrayType(et, _) => new ArrayBuilder(et)
    case other => new PrimBuilder(other)
  }

  /** Encode one VNG object for rows of one schema. */
  def encodeObject(rows: Iterator[Row], schema: StructType): Array[Byte] = {
    val root = new RecordBuilder(schema)
    rows.foreach(root.write)
    val data = new ByteArrayOutputStream()
    val metaRows = root.finish(data)
    val mw = new ZngIO.StreamWriter
    metaRows.foreach(r => mw.write(metaSchema, r))
    val meta = mw.finish()
    val out = new ByteArrayOutputStream()
    // header.go: 'V','N','G',0, version u32 LE, metaSize u64 LE, dataSize u64 LE
    out.write('V'); out.write('N'); out.write('G'); out.write(0)
    out.write(ZngIO.leBytes(Version.toLong, 4), 0, 4)
    out.write(ZngIO.leBytes(meta.length.toLong, 8), 0, 8)
    out.write(ZngIO.leBytes(data.size().toLong, 8), 0, 8)
    out.write(meta, 0, meta.length)
    data.writeTo(out)
    out.toByteArray
  }

  /** Distributed write: one VNG object file per partition, through the
    * Hadoop FileSystem API (shared filesystem on a cluster). The columnar
    * layout requires buffering one partition's columns before the header
    * can be written — same memory profile as the reference's writer.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    HadoopFs.prepareDir(df.sparkSession, path)
    val confMap = HadoopFs.confMap(df.sparkSession)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val bytes = encodeObject(rows, schema)
      val out = HadoopFs.create(confMap, path, f"part-$pid%05d.vng")
      try out.write(bytes) finally out.close()
      Iterator.empty
    }.count(): Unit
  }

  // ---- reader ----------------------------------------------------------------

  private sealed trait Reader { def next(): String } // ZSON token per value

  private final class PrimReader(ptype: String, seg: Array[Byte]) extends Reader {
    private val cursor = new ZngIO.Cursor(seg, 0)
    private val zt = ZngIO.ZPrim(primIdByName(ptype))
    def next(): String = ZngIO.decodeValue(cursor, zt)
  }

  private final class NullsReader(runs: Seq[Long], child: Reader) extends Reader {
    private var idx = 0
    private var left = if (runs.nonEmpty) runs.head else Long.MaxValue
    private var present = true
    private def advance(): Unit = {
      while (left == 0 && idx + 1 < runs.length) {
        idx += 1; left = runs(idx); present = !present
      }
      if (left == 0) { present = true; left = Long.MaxValue } // tail: all present
    }
    def next(): String = {
      advance()
      left -= 1
      if (present) child.next() else "null"
    }
  }

  private final class RecordReader(fields: Seq[(String, Reader)]) extends Reader {
    def next(): String =
      fields.map { case (n, r) =>
        val quoted = if (n.matches("[A-Za-z_][A-Za-z0-9_]*")) n
                     else "\"" + n.replace("\"", "\\\"") + "\""
        s"$quoted:${r.next()}"
      }.mkString("{", ",", "}")
  }

  private final class ArrayReader(lengths: Reader, child: Reader) extends Reader {
    def next(): String = {
      val n = lengths.next().toInt
      (0 until n).map(_ => child.next()).mkString("[", ",", "]")
    }
  }

  /** Decode one VNG object to (rowCount, root reader). */
  def decodeToZson(bytes: Array[Byte]): Iterator[String] = {
    require(bytes.length >= 24 && bytes(0) == 'V' && bytes(1) == 'N' &&
      bytes(2) == 'G' && bytes(3) == 0, "not a VNG file")
    def leLong(off: Int, n: Int): Long =
      (0 until n).map(i => (bytes(off + i) & 0xffL) << (8 * i)).sum
    val metaSize = leLong(8, 8).toInt
    val meta = java.util.Arrays.copyOfRange(bytes, 24, 24 + metaSize)
    val data = java.util.Arrays.copyOfRange(bytes, 24 + metaSize, bytes.length)

    val metaValues = ZngIO.decodeToValues(meta)
    val metaRows = metaValues.map(_._2).collect { case m: ListMap[_, _] =>
      m.asInstanceOf[ListMap[String, Any]]
    }
    // Loud divergence check: reference-written VNG carries zson-marshaled
    // Metadata unions (vng/metadata.go), not this writer's flat records.
    // Without this, the matching magic/version makes reference files look
    // like corruption instead of an unsupported layout.
    if (metaRows.isEmpty || !metaRows.head.keySet.equals(metaSchema.fieldNames.toSet))
      throw new IllegalArgumentException(
        "vng: unsupported metadata layout (likely a reference-written VNG file; " +
          "this reader supports graft's flat metadata encoding only — " +
          "see VngIO scaladoc for the documented divergence)")
    var pos = 0
    def nextMeta(): ListMap[String, Any] = { val m = metaRows(pos); pos += 1; m }
    def seg(m: ListMap[String, Any]): Array[Byte] = {
      val off = m("offset").asInstanceOf[Long].toInt
      val len = m("length").asInstanceOf[Long].toInt
      java.util.Arrays.copyOfRange(data, off, off + len)
    }
    var rowCount = 0L
    def build(): Reader = {
      val m = nextMeta()
      m("kind") match {
        case "record" =>
          val n = m("n").asInstanceOf[Long].toInt
          if (pos == 1) rowCount = m("count").asInstanceOf[Long]
          val fields = (0 until n).map { _ =>
            val fm = nextMeta()
            require(fm("kind") == "field", "vng: expected field metadata")
            fm("name").asInstanceOf[String] -> build()
          }
          new RecordReader(fields)
        case "nulls" =>
          val runsBytes = seg(m)
          val c = new ZngIO.Cursor(runsBytes, 0)
          val runs = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (!c.done) runs += ZngIO.decodeValue(c, ZngIO.ZPrim(9)).toLong
          new NullsReader(runs.toSeq, build())
        case "array" =>
          val lm = nextMeta()
          require(lm("kind") == "prim", "vng: array lengths must be primitive")
          val lengths = new PrimReader(lm("ptype").asInstanceOf[String], seg(lm))
          new ArrayReader(lengths, build())
        case "prim" =>
          new PrimReader(m("ptype").asInstanceOf[String], seg(m))
        case other =>
          throw new IllegalArgumentException(s"vng: unknown metadata kind $other")
      }
    }
    val root = build()
    Iterator.range(0L, rowCount).map(_ => root.next())
  }

  /** Read a VNG file or directory of part files into a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(
      if (HadoopFs.isDirectory(spark, path)) s"$path/*" else path)
    val zsonLines = files.select("content").as[Array[Byte]]
      .flatMap(bytes => decodeToZson(bytes))
    val json = zsonLines.map(ZsonIO.zsonLineToJson _)
    spark.read.json(json)
  }
}
