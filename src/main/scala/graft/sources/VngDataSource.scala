package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch source for single-record-shape VNG streams — the
  * pruned-columnar half of VngIO.read. VNG is the reference's columnar
  * format (vng/, one metadata tree + per-vector data segments); this
  * scan turns Catalyst's column pruning into SEGMENT-LEVEL I/O: a
  * pruned-away field's segments are never read (positioned reads skip
  * them entirely), never LZ4-decoded, never value-decoded. A count()-
  * class query reads only each file's metadata section.
  *
  * Options (set by VngIO.read): `files` (newline-separated part list),
  * `shape` (the stream's record shape text). Filters are not consumed
  * here — parquet-grade stats pruning would need per-segment min/max the
  * format doesn't carry; Spark evaluates every predicate above the scan.
  */
class VngDataSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VngIO.inferSingleShape(SparkSession.active, VngDataSource.filesOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new VngTable(schema, new CaseInsensitiveStringMap(properties))
}

private object VngDataSource {
  def filesOf(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("files")) match {
      case Some(fs) => fs.split('\n').toIndexedSeq.filter(_.nonEmpty)
      case None =>
        val path = Option(options.get("path")).getOrElse(
          throw new IllegalArgumentException("vng data source: no files/path option"))
        HadoopFs.listDataFiles(SparkSession.active, path)
    }
}

private class VngTable(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "vng"
  override def schema(): StructType = fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options)
    merged.putAll(caseInsensitiveOptions)
    new VngScanBuilder(fullSchema, new CaseInsensitiveStringMap(merged))
  }
}

private class VngScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new VngScan(
    files = VngDataSource.filesOf(options),
    shape = options.get("shape"),
    required = required,
    confMap = HadoopFs.confMap(SparkSession.active))
}

private case class VngPartition(file: String) extends InputPartition

private class VngScan(files: Seq[String], shape: String, required: StructType,
    confMap: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"vng files=${files.length} columns=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(VngPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new VngReaderFactory(shape, required, confMap)
}

private class VngReaderFactory(shape: String, required: StructType,
    confMap: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[VngPartition].file
    val (it, closeFn) = VngIO.prunedRows(confMap, file, required, shape)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) row = it.next(); h }
      override def get(): InternalRow = row
      override def close(): Unit = closeFn()
    }
  }
}
