package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed JSON ingestion (reference: zio/jsonio/reader.go + builder.go).
  *
  * Parses a STREAM of JSON values — objects, arrays, or bare primitives,
  * pretty-printed or not — into the typed value model, then hands off to
  * the same shape-merging frame builder as ZSON:
  *   - numbers become int64 when they parse exactly as one, else float64
  *     (reader.go:58-64)
  *   - object keys keep first-seen order; a duplicated key keeps its LAST
  *     value at the FIRST position (builder.go removeDuplicateItems, the
  *     ECMAScript 2015 / jq rule)
  *   - strings are NFC-normalized (reader.go norm.NFC)
  *   - mixed-type arrays become union-element arrays via the frame
  *     builder's type unification
  *
  * This is the semantics-faithful driver-side path used for interchange
  * inputs; bulk relational JSON at scale stays on spark.read.json (which
  * is distributed but JSON-typed, not zed-typed).
  */
object JsonIO {
  import ZValue._

  def parse(text: String): Vector[ZValue] = {
    val f = new com.fasterxml.jackson.core.JsonFactory()
    val p = f.createParser(text)
    val out = Vector.newBuilder[ZValue]
    var t = p.nextToken()
    while (t != null) {
      out += value(p, t)
      t = p.nextToken()
    }
    p.close()
    out.result()
  }

  private def nfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  private def value(p: com.fasterxml.jackson.core.JsonParser,
                    t: com.fasterxml.jackson.core.JsonToken): ZValue = {
    import com.fasterxml.jackson.core.JsonToken._
    t match {
      case START_OBJECT =>
        // first-seen key order, last duplicate value wins at first position
        val order = Vector.newBuilder[String]
        val seen = scala.collection.mutable.LinkedHashMap.empty[String, ZValue]
        var tok = p.nextToken()
        while (tok != END_OBJECT) {
          val name = nfc(p.currentName())
          val v = value(p, p.nextToken())
          if (!seen.contains(name)) order += name
          seen(name) = v
          tok = p.nextToken()
        }
        VRec(order.result().map(n => n -> seen(n)))
      case START_ARRAY =>
        val items = Vector.newBuilder[ZValue]
        var tok = p.nextToken()
        while (tok != END_ARRAY) {
          items += value(p, tok)
          tok = p.nextToken()
        }
        VArr(items.result(), isSet = false)
      case VALUE_STRING => VStr(nfc(p.getText))
      case VALUE_NUMBER_INT =>
        val s = p.getText
        try VInt(java.lang.Long.parseLong(s), "int64")
        catch { case _: NumberFormatException => VFloat(s.toDouble, "float64") }
      case VALUE_NUMBER_FLOAT => VFloat(p.getDoubleValue, "float64")
      case VALUE_TRUE => VBool(true)
      case VALUE_FALSE => VBool(false)
      case VALUE_NULL => VNull(ZType.nullT)
      case other => throw new IllegalArgumentException(s"json: unexpected token $other")
    }
  }

  def fromText(spark: SparkSession, text: String): DataFrame =
    ZsonReader.fromValues(spark, parse(text), tag = true)

  /** Distributed zed-typed JSON read: each file parses executor-side
    * (files are self-contained JSON streams, so they distribute one task
    * each — same parallelism model as the zng reader), then the values
    * fuse into the typed frame. Preserves the reference's json semantics:
    * field order kept, a top-level array is ONE array value, numbers are
    * float64 (zio/jsonio/reader.go).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rdd = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]].rdd
      .flatMap(b => parse(new String(Gzip.maybeGunzip(b),
        java.nio.charset.StandardCharsets.UTF_8)))
    ZsonReader.fromRDD(spark, rdd)
  }
}
