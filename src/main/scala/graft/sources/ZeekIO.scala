package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zeek TSV log format (reference: zio/zeekio/ — parser.go header
  * directives, format.go value syntax; the reference performance baseline
  * runs over exactly this data).
  *
  * Reader: the directive header (#separator/#fields/#types/#path/…) is
  * parsed once from the file head on the driver; data lines decode
  * DISTRIBUTED with plain split/cast expressions — `-` (unset) → null,
  * `(empty)` → empty, `time` as epoch seconds with µs fraction, sets and
  * vectors split on the set_separator. `_path` materializes as the leading
  * column like the reference.
  *
  * Writer: emits a single header block from the schema then tab-separated
  * rows (flat schemas; nested data should be flattened first, matching
  * zeekio's own restriction).
  */
object ZeekIO {

  private final case class Header(
      separator: String,
      setSeparator: String,
      unset: String,
      empty: String,
      path: Option[String],
      fields: Seq[String],
      types: Seq[String])

  private def unescapeSep(s: String): String =
    if (s.startsWith("\\x")) Integer.parseInt(s.drop(2), 16).toChar.toString else s

  private def parseHeader(lines: Seq[String]): Header = {
    var sep = "\t"; var setSep = ","; var unset = "-"; var empty = "(empty)"
    var path: Option[String] = None
    var fields = Seq.empty[String]; var types = Seq.empty[String]
    lines.takeWhile(_.startsWith("#")).foreach { l =>
      // the #separator directive itself is space-separated; all later
      // directives use the declared separator (zeekio parser.go:146-150)
      if (l.startsWith("#separator")) { sep = unescapeSep(l.drop(10).trim) }
      else {
      val t = l.drop(1).split(java.util.regex.Pattern.quote(sep))
      t.head match {
        case "set_separator" => setSep = t(1)
        case "unset_field" => unset = t(1)
        case "empty_field" => empty = t(1)
        case "path" => path = Some(t(1))
        case "fields" => fields = t.tail.toSeq
        case "types" => types = t.tail.toSeq
        case _ => // open/close dates etc.
      }
      }
    }
    require(fields.nonEmpty && fields.length == types.length,
      "zeek: missing or mismatched #fields/#types")
    Header(sep, setSep, unset, empty, path, fields, types)
  }

  private def decodeCol(raw: Column, zeekType: String, h: Header): Column = {
    val cleaned = when(raw === h.unset, lit(null)).otherwise(raw)
    zeekType match {
      case "time" => // epoch seconds with fractional µs → µs timestamp
        timestamp_micros((cleaned.cast(DoubleType) * 1e6).cast(LongType))
      case "interval" => cleaned.cast(DoubleType) // seconds (zed duration)
      case "count" | "int" | "port" => cleaned.cast(LongType)
      case "double" => cleaned.cast(DoubleType)
      case "bool" => when(cleaned === "T", true).when(cleaned === "F", false)
        .otherwise(lit(null).cast(BooleanType))
      case t if t.startsWith("set[") || t.startsWith("vector[") =>
        when(cleaned === h.empty, array().cast(ArrayType(StringType)))
          .otherwise(split(cleaned, java.util.regex.Pattern.quote(h.setSeparator)))
      case _ => when(cleaned === h.empty, lit("")).otherwise(cleaned) // string/addr/enum…
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val h = parseHeader(lines.filter(_.startsWith("#")).take(64).toSeq)
    val data = lines.filter(l => !l.startsWith("#") && l.nonEmpty)
    val sepLit = java.util.regex.Pattern.quote(h.separator)
    val parts = split(col("value"), sepLit)
    val cols = h.fields.zip(h.types).zipWithIndex.map { case ((f, t), i) =>
      decodeCol(element_at(parts, i + 1), t, h).as(f)
    }
    val pathCol = h.path.map(p => lit(p).as("_path")).toSeq
    data.toDF().select(pathCol ++ cols: _*)
  }

  // ---- writer ----------------------------------------------------------------

  private def zeekTypeOf(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "int"
    case DoubleType | FloatType => "double"
    case BooleanType => "bool"
    case TimestampType | TimestampNTZType => "time"
    case ArrayType(_, _) => "vector[string]"
    case _ => "string"
  }

  private def encodeCol(c: Column, dt: DataType): Column = {
    val enc = dt match {
      case TimestampType | TimestampNTZType =>
        format_string("%.6f", unix_micros(c).cast(DoubleType) / 1e6)
      case BooleanType => when(c, "T").otherwise("F")
      case ArrayType(_, _) =>
        when(size(c) === 0, lit("(empty)")).otherwise(array_join(c.cast(ArrayType(StringType)), ","))
      case _ => c.cast(StringType)
    }
    coalesce(enc, lit("-"))
  }

  def write(df: DataFrame, path: String): Unit = {
    import df.sparkSession.implicits._
    val fields = df.schema.fields.toIndexedSeq
    val header = Seq(
      "#separator \\x09",
      "#set_separator\t,",
      "#empty_field\t(empty)",
      "#unset_field\t-",
      "#fields\t" + fields.map(_.name).mkString("\t"),
      "#types\t" + fields.map(f => zeekTypeOf(f.dataType)).mkString("\t"))
    val body = df.select(concat_ws("\t",
      fields.map(f => encodeCol(col(f.name), f.dataType)): _*).as("value")).as[String]
    val withHeader = df.sparkSession.createDataset(header).union(body)
    withHeader.coalesce(1).write.mode("overwrite").text(path)
  }
}
