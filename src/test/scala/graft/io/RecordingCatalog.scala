package graft.io

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Mock V2 catalog for the Iceberg-contract spec: records every call an
  * Iceberg catalog would receive from [[IcebergTableIO]] — identifiers,
  * schemas, partition transforms, table properties (`provider=iceberg`),
  * and per-commit row counts — without any Iceberg jar. Writes discard
  * rows (counts ride the commit messages); reads produce zero partitions.
  * State lives in the companion (one JVM, shared with the test). */
class RecordingCatalog extends TableCatalog {
  import RecordingCatalog._

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    record(s"initialize($name, ${options.asScala.toSeq.sorted.mkString(",")})")
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tables.keys.filter(_.namespace().sameElements(namespace)).toArray

  override def loadTable(ident: Identifier): Table =
    tables.getOrElse(ident, throw new NoSuchTableException(ident))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val t = new RecTable(ident.toString, schema, partitions, properties)
    tables.put(ident, t)
    record(s"createTable($ident, schema=[${schema.fieldNames.mkString(",")}], " +
      s"partitioning=[${partitions.mkString(",")}], " +
      s"provider=${properties.get(TableCatalog.PROP_PROVIDER)})")
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    loadTable(ident)

  override def dropTable(ident: Identifier): Boolean = {
    record(s"dropTable($ident)")
    tables.remove(ident).isDefined
  }

  override def renameTable(from: Identifier, to: Identifier): Unit =
    tables.remove(from).foreach(tables.put(to, _))
}

object RecordingCatalog {
  val tables: mutable.Map[Identifier, RecTable] = mutable.Map.empty
  val log: mutable.Buffer[String] = mutable.Buffer.empty

  def record(s: String): Unit = synchronized { log += s }

  def reset(): Unit = synchronized { tables.clear(); log.clear() }
}

final class RecTable(ident: String, tschema: StructType,
                     partitions: Array[Transform],
                     props: util.Map[String, String])
    extends Table with SupportsWrite with SupportsRead {

  override def name(): String = ident
  override def schema(): StructType = tschema
  override def partitioning(): Array[Transform] = partitions
  override def properties(): util.Map[String, String] = props
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.OVERWRITE_DYNAMIC, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tschema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = Array.empty
          override def createReaderFactory(): PartitionReaderFactory =
            new NeverCalledReaderFactory
        }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new RecWriteBuilder(ident, "append")
}

final class NeverCalledReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    throw new IllegalStateException("zero partitions planned")
}

final class RecWriteBuilder(ident: String, var mode: String)
    extends WriteBuilder with SupportsDynamicOverwrite with SupportsTruncate {

  override def overwriteDynamicPartitions(): WriteBuilder = { mode = "dynOverwrite"; this }
  override def truncate(): WriteBuilder = { mode = "truncate"; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new CountingWriterFactory
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val rows = messages.collect { case CountMessage(n) => n }.sum
        RecordingCatalog.record(s"commit($ident, mode=$mode, rows=$rows)")
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        RecordingCatalog.record(s"abort($ident)")
    }
  }
}

final case class CountMessage(n: Long) extends WriterCommitMessage

final class CountingWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = n += 1
      override def commit(): WriterCommitMessage = CountMessage(n)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
