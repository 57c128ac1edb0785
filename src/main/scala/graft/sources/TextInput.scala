package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build a frame from raw text plus reference-style input flags — the
  * CLI's stdin/any-text ingestion path (zio/anyio detection + the per-
  * format readers: csvio/reader.go cell typing, zeekio, zjsonio, zson).
  */
object TextInput {

  /** Go's encoding/json returns "unexpected end of JSON input" for any
    * value truncated at EOF (zio/jsonio unexpected-input-end ztest) —
    * detect it with a streaming parse before the lenient readers run.
    */
  private def validateJsonComplete(input: String): Unit = {
    val t = input.trim
    if (t.isEmpty) return
    val p = new com.fasterxml.jackson.core.JsonFactory().createParser(t)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    try {
      while (p.nextToken() != null)
        m.readTree[com.fasterxml.jackson.databind.JsonNode](p): Unit
    } catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        val msg = String.valueOf(e.getOriginalMessage)
        // a bare prefix of true/false/null is truncation too (Go json)
        val truncLit = "Unrecognized token '([A-Za-z]+)'".r
          .findFirstMatchIn(msg).exists(m =>
            Seq("true", "false", "null").exists(l =>
              l.startsWith(m.group(1)) && m.group(1).length < l.length))
        if (msg.startsWith("Unexpected end-of-input") || truncLit)
          throw new RuntimeException("stdio:stdin: unexpected end of JSON input")
    } finally p.close()
  }

  private def writeTemp(text: String, name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-textin")
    val p = d.resolve(name)
    java.nio.file.Files.write(p, text.getBytes("UTF-8"))
    p.toString
  }

  /** @param flags reference input flags text (`-i csv`, `-i zeek`, …);
    *              empty → detect from the content
    * @param source name used in detection-error messages
    */
  def build(spark: SparkSession, input: String, flags: String,
            source: String = "<stdin>"): DataFrame = {
    import spark.implicits._
    val fl = flags
    if (fl.contains("-i csv") || fl.contains("-i tsv")) {
      val delim = if (fl.contains("-i tsv")) "\t"
        else if (fl.contains("-csv.delim")) fl.split("-csv.delim").last.trim.take(1) else ","
      import org.apache.spark.sql.functions._
      val het = graft.operators.Het
      // the reference's quote preprocess (csvio/preprocess.go): quotes
      // not spanning a whole field strip, the field re-wraps trimmed
      val cleaned = Formats.csvCleanLine(input, delim.charAt(0))
      val df = spark.read
        .option("header", "true")
        .option("delimiter", delim)
        .option("multiLine", "true") // quoted cells may span lines (read-big)
        .option("escape", "\"") // RFC 4180 doubled-quote escaping
        .option("ignoreLeadingWhiteSpace", "true").option("ignoreTrailingWhiteSpace", "true")
        .csv(writeTemp(cleaned, "in.csv")) // all strings; typed per CELL below
      val numRe = """-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?"""
      val boolRe = """true|false"""
      // zed's CSV reader types each cell independently: numbers are
      // float64, true/false bools, the rest strings (zio/csvio/reader.go)
      // — a column with several kinds becomes a union
      val typed = df.select(df.schema.fields.toIndexedSeq.map { f =>
        val cRaw = col(s"`${f.name}`")
        val kinds = df.select(
          count(when(cRaw.rlike(s"^$numRe$$"), 1)).as("n"),
          count(when(cRaw.rlike(s"^$boolRe$$"), 1)).as("b"),
          count(when(cRaw.isNotNull && !cRaw.rlike(s"^($numRe|$boolRe)$$"), 1)).as("s")).collect()(0)
        val (nNum, nBool, nStr) = (kinds.getLong(0), kinds.getLong(1), kinds.getLong(2))
        if (nStr == 0 && nBool == 0 && nNum > 0) cRaw.cast("double").as(f.name)
        else if (nStr == 0 && nNum == 0 && nBool > 0) cRaw.cast("boolean").as(f.name)
        else if (nNum == 0 && nBool == 0) cRaw.as(f.name)
        else when(cRaw.rlike(s"^$numRe$$"), het.variant(cRaw.cast("double"),
            org.apache.spark.sql.types.DoubleType))
          .when(cRaw.rlike(s"^$boolRe$$"), het.variant(cRaw.cast("boolean"),
            org.apache.spark.sql.types.BooleanType))
          .otherwise(het.variant(cRaw, org.apache.spark.sql.types.StringType))
          .as(f.name)
      }: _*)
      typed
    } else if (fl.contains("-i json")) {
      validateJsonComplete(input)
      try graft.sources.JsonIO.fromText(spark, input)
      catch { case _: Exception =>
        spark.read.json(spark.createDataset(input.linesIterator.toSeq)) }
    } else if (fl.contains("-i line")) {
      spark.createDataset(input.linesIterator.toSeq).toDF("this")
    } else if (input.startsWith("#separator") || input.startsWith("#fields") ||
               input.startsWith("#path") || fl.contains("-i zeek")) {
      ZeekIO.read(spark, writeTemp(input, "in.log"))
    } else if (input.startsWith("{\"type\":")) {
      graft.sources.ZjsonIO.read(spark, writeTemp(input, "in.zjson"))
    } else {
      // default: typed ZSON (tagged heterogeneous frame); a JSON-ish
      // fallback keeps inputs our parser can't handle running
      try ZsonReader.fromText(spark, input)
      catch {
        case e: Exception if Option(e.getMessage).exists(m =>
            m.contains("no such type name") ||
            m.contains("not a member of type") ||
            m.contains("record decorator fields")) =>
          // typed parse errors are REAL errors (ztests pin the message),
          // not candidates for the JSON fallback
          throw e
        case _: Exception =>
          val json = input.linesIterator.map(_.trim).filter(_.nonEmpty)
            .map(ZsonIO.zsonLineToJson)
            .map(j => if (j.startsWith("{")) j else s"""{"this":$j}""")
            .toSeq
          val df = spark.read.json(spark.createDataset(json))
          // the fallback parsing GARBAGE means no format matched at all
          if (df.columns.isEmpty ||
              df.columns.forall(_.startsWith("_corrupt")))
            throw new IllegalArgumentException(
              s"$source: format detection error")
          df
      }
    }
  }
}
