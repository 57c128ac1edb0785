package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** ZJSON — the JSON encoding of the full data model for browsers
  * (reference: docs/formats/zjson.md, zio/zjsonio/).
  *
  * Each NDJSON line is `{"type":<type>,"value":<nested string arrays>}`;
  * the first value in a stream carries the full type tree (ids from 30),
  * subsequent values use `{"kind":"ref","id":N}`. Record/array values are
  * JSON arrays; primitives are strings in their ZSON form.
  *
  * Writer: the per-row value encoding is a Catalyst string expression
  * (codegen, distributed); only the first-line type swap runs in
  * mapPartitions. Reader: per-line Jackson decode (same row-wise cost
  * class as the reference's zjsonio) into ZSON text, then per-partition
  * typed parse into the shared tagged/variant frame (ZsonReader.fromRDD)
  * — fully distributed, no driver materialization.
  */
object ZjsonIO extends Serializable {

  // ---- type encoding ---------------------------------------------------------

  private def primName(dt: DataType): String = dt match {
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
    case other => throw new IllegalArgumentException(s"zjson: unsupported $other")
  }

  /** Full type-tree JSON with record ids assigned depth-first from 30. */
  private def typeJson(dt: DataType, nextId: () => Int): String = dt match {
    case st: StructType =>
      val fields = st.fields.map { f =>
        s"""{"name":${quote(f.name)},"type":${typeJson(f.dataType, nextId)}}"""
      }.mkString(",")
      // ids are assigned after children in the reference's depth-first walk;
      // we assign before for simplicity — readers key on the id value only
      s"""{"kind":"record","id":${nextId()},"fields":[$fields]}"""
    case ArrayType(et, _) =>
      s"""{"kind":"array","type":${typeJson(et, nextId)}}"""
    case MapType(kt, vt, _) =>
      s"""{"kind":"map","key_type":${typeJson(kt, nextId)},"val_type":${typeJson(vt, nextId)}}"""
    case other => s"""{"kind":"primitive","name":"${primName(other)}"}"""
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  // ---- value encoding (Catalyst expressions) ---------------------------------

  private def jsonEscape(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")

  /** One value as a ZJSON fragment (JSON string or nested array text). */
  private def valueOf(c: Column, dt: DataType): Column = {
    val encoded: Column = dt match {
      case st: StructType =>
        concat(lit("["),
          concat_ws(",", st.fields.toIndexedSeq.map(f =>
            valueOf(c.getField(f.name), f.dataType)): _*),
          lit("]"))
      case ArrayType(et, _) =>
        concat(lit("["), array_join(transform(c, x => valueOf(x, et)), ","), lit("]"))
      case MapType(kt, vt, _) =>
        concat(lit("["),
          array_join(transform(map_entries(c), e =>
            concat(lit("["), valueOf(e.getField("key"), kt), lit(","),
              valueOf(e.getField("value"), vt), lit("]"))), ","),
          lit("]"))
      case TimestampType | TimestampNTZType =>
        concat(lit("\""), date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"), lit("\""))
      case BinaryType => concat(lit("\"0x"), lower(hex(c)), lit("\""))
      case StringType => concat(lit("\""), jsonEscape(c), lit("\""))
      case _ => concat(lit("\""), c.cast(StringType), lit("\""))
    }
    when(c.isNull, lit("null")).otherwise(encoded)
  }

  def toZjson(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    val st = df.schema
    var id = 29
    val fullType = typeJson(st, () => { id += 1; id })
    val rootId = id // children assign first (depth-first), root id is last
    val valueExpr = concat(lit("["),
      concat_ws(",", st.fields.toIndexedSeq.map(f => valueOf(col(f.name), f.dataType)): _*),
      lit("]"))
    val refLine = concat(
      lit(s"""{"type":{"kind":"ref","id":$rootId},"value":"""),
      valueExpr, lit("}"))
    val lines = df.select(refLine.as("value")).as[String]
    // first line of each partition carries the full typedef (each written
    // file is an independent, self-describing ZJSON stream)
    lines.mapPartitions { it =>
      var first = true
      it.map { l =>
        if (first) {
          first = false
          l.replaceFirst(
            java.util.regex.Pattern.quote(s"""{"kind":"ref","id":$rootId}"""),
            java.util.regex.Matcher.quoteReplacement(fullType))
        } else l
      }
    }
  }

  def write(df: DataFrame, path: String): Unit =
    toZjson(df).write.mode("overwrite").text(path)

  // ---- reader ----------------------------------------------------------------

  /** Convert one decoded (typeNode, valueNode) pair to ZSON text. */
  private def toZson(t: JsonNode, v: JsonNode): String = {
    if (v == null || v.isNull) return "null"
    t.get("kind").asText() match {
      case "record" =>
        val fields = t.get("fields")
        val parts = (0 until fields.size()).map { i =>
          val f = fields.get(i)
          s"${f.get("name").asText()}:${toZson(f.get("type"), v.get(i))}"
        }
        parts.mkString("{", ",", "}")
      case "array" | "set" =>
        (0 until v.size()).map(i => toZson(t.get("type"), v.get(i)))
          .mkString("[", ",", "]")
      case "map" =>
        (0 until v.size()).map { i =>
          val kv = v.get(i)
          s"${toZson(t.get("key_type"), kv.get(0))}:${toZson(t.get("val_type"), kv.get(1))}"
        }.mkString("|{", ",", "}|")
      case "primitive" =>
        val s = v.asText()
        t.get("name").asText() match {
          case "string" => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          case _ => s // numbers, bools, times are already ZSON-formed
        }
      case "union" =>
        // value is ["<member index>", <member value>] (zjson.md unions)
        val sel = v.get(0).asText().toInt
        val member = t.get("types").get(sel)
        s"${toZson(member, v.get(1))}(${typeText(t)})"
      case "named" => toZson(t.get("type"), v)
      case "error" => s"error(${toZson(t.get("type"), v)})"
      case "enum" => "%" + v.asText()
      case other => throw new IllegalArgumentException(s"zjson: kind $other")
    }
  }

  /** zed type text of a zjson type node (for union decorators). */
  private def typeText(t: JsonNode): String = t.get("kind").asText() match {
    case "primitive" => t.get("name").asText()
    case "record" =>
      val fs = t.get("fields")
      (0 until fs.size()).map { i =>
        val f = fs.get(i)
        s"${f.get("name").asText()}:${typeText(f.get("type"))}"
      }.mkString("{", ",", "}")
    case "array" => s"[${typeText(t.get("type"))}]"
    case "set" => s"|[${typeText(t.get("type"))}]|"
    case "map" => s"|{${typeText(t.get("key_type"))}:${typeText(t.get("val_type"))}}|"
    case "union" =>
      val ts = t.get("types")
      (0 until ts.size()).map(i => typeText(ts.get(i))).mkString("(", ",", ")")
    case "named" => s"${t.get("name").asText()}=${typeText(t.get("type"))}"
    case "error" => s"error(${typeText(t.get("type"))})"
    case "enum" =>
      val ss = t.get("symbols")
      (0 until ss.size()).map(i => ss.get(i).asText()).mkString("enum(", ",", ")")
    case _ => "string"
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).filter(_.trim.nonEmpty)
    val zson = lines.mapPartitions { it =>
      val mapper = new ObjectMapper()
      val typesById = scala.collection.mutable.Map.empty[Int, JsonNode]
      def register(t: JsonNode): Unit = {
        if (t.has("id")) typesById(t.get("id").asInt()) = t
        if (t.has("fields")) {
          val fs = t.get("fields")
          (0 until fs.size()).foreach(i => register(fs.get(i).get("type")))
        }
        if (t.has("types")) { // union members
          val ts = t.get("types")
          (0 until ts.size()).foreach(i => register(ts.get(i)))
        }
        if (t.has("key_type")) register(t.get("key_type"))
        if (t.has("val_type")) register(t.get("val_type"))
        if (t.has("type")) register(t.get("type"))
      }
      it.map { line =>
        val node = mapper.readTree(line)
        var t = node.get("type")
        if (t.get("kind").asText() == "ref") t = typesById(t.get("id").asInt())
        else register(t)
        toZson(t, node.get("value"))
      }
    }
    // typed decode (unions → variants, shape tags), fully distributed:
    // each line is one complete value, parsed per-partition on the
    // executors — no driver materialization
    ZsonReader.fromRDD(spark, zson.rdd.mapPartitions(ZsonIO.parseLineIter))
  }
}
