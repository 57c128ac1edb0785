package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch source for single-shape ZNG streams — the scan
  * half of the typed ingest fast path (ZngIO.read routes homogeneous
  * streams here after pass-1 shape discovery). Emits Catalyst
  * InternalRows straight from the wire (strings stay UTF-8 bytes, no
  * external-Row conversion) and supports column pruning into the
  * decoder: a pruned-away field is skipped via its length tag, so
  * `count()`-class queries cost I/O plus tag arithmetic, like pass 1.
  *
  * Options (set by ZngIO.read): `files` (newline-separated part list),
  * `shape` (the stream's one shape text), `ns` (sub-µs time carrier).
  * The reference's zngio reader is the semantic model
  * (zio/zngio/reader.go); the Spark surface is a standard TableProvider
  * so `spark.read.format(...).schema(...).load()` composes with
  * Catalyst's pruning and whole-stage codegen.
  */
class ZngDataSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  // ZngIO.read always supplies the schema (its pass 1 is distributed);
  // direct format() users without .schema() get a serial driver-side
  // inference over the same scanMeta pass
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val files = ZngDataSource.filesOf(options)
    val conf = HadoopFs.confMap(spark)
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var ns = false
    var i = 0L
    files.foreach { f =>
      val (shapes, count, fileNs) =
        ZngIO.scanMeta(Gzip.maybeGunzip(HadoopFs.readAll(conf, f)), i)
      shapes.foreach { case (t, idx) => if (!seen.contains(t)) seen(t) = idx }
      ns ||= fileNs
      i += count
    }
    require(seen.size == 1,
      s"zng data source handles single-shape streams (found ${seen.size}); use ZngIO.read")
    ZsonReader.frameSchema(seen.keys.toSeq, tag = true, ns)._2
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ZngTable(schema, new CaseInsensitiveStringMap(properties))
}

private object ZngDataSource {
  def filesOf(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("files")) match {
      case Some(fs) => fs.split('\n').toIndexedSeq.filter(_.nonEmpty)
      case None =>
        val path = Option(options.get("path")).getOrElse(
          throw new IllegalArgumentException("zng data source: no files/path option"))
        HadoopFs.listDataFiles(SparkSession.active, path)
    }
}

private class ZngTable(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "zng"
  override def schema(): StructType = fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new ZngScanBuilder(fullSchema, new CaseInsensitiveStringMap(merged))
  }
}

private class ZngScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new ZngScan(
    files = ZngDataSource.filesOf(options),
    shape = options.get("shape"),
    nsTime = options.getBoolean("ns", false),
    cleaned = StructType(full.fields.filterNot(_.name == graft.operators.Het.typeTag)),
    required = required,
    confMap = HadoopFs.confMap(SparkSession.active))
}

private case class ZngPartition(file: String) extends InputPartition

private class ZngScan(files: Seq[String], shape: String, nsTime: Boolean,
    cleaned: StructType, required: StructType, confMap: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft zng (${files.length} files, ${required.fields.length} of " +
      s"${cleaned.fields.length + 1} columns)"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => ZngPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ZngReaderFactory(shape, nsTime, cleaned, required, confMap)
}

private class ZngReaderFactory(shape: String, nsTime: Boolean, cleaned: StructType,
    required: StructType, confMap: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val bytes = Gzip.maybeGunzip(
      HadoopFs.readAll(confMap, partition.asInstanceOf[ZngPartition].file))
    val it = ZngIO.decodeToInternalRows(bytes, shape, cleaned, required, nsTime)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) row = it.next(); h }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
