package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory v2 catalog whose tables support SQL `MERGE INTO` / `UPDATE` /
  * `DELETE` via Spark's GROUP-BASED (copy-on-write) row-level-operation
  * framework — the declarative lakehouse verbs the engine otherwise only
  * offered programmatically (q101's full-outer CDC apply, StreamingUpsert;
  * round-9 verdict #8).
  *
  * The interesting part is NOT the storage (a driver-held row buffer — a
  * stand-in for parquet file groups, sized for dimension/state tables) but
  * the PLAN: a table that implements [[SupportsRowLevelOperations]] without
  * `SupportsDelta` routes `MERGE INTO` through Catalyst's
  * `RewriteMergeIntoTable` into `ReplaceData` — target scanned once, joined
  * to the source, and the affected GROUP rewritten whole. That is exactly
  * the copy-on-write plan an Iceberg/Delta table produces at 100 TB; here
  * the whole table is one group (`requiredMetadataAttributes` is empty and
  * the scan reports no per-file splits), so the rewrite copies the full
  * table — the correct semantics for the compact dimension/state tables
  * this backing targets, while the SQL surface and the Catalyst rewrite
  * are the real thing.
  *
  * Registered as `graft_cat` by [[graft.Graft]]'s conf set
  * (`spark.sql.catalog.graft_cat`), so `MERGE INTO graft_cat.t USING …`
  * works on any configured session. Tables are session-shared: q276 uses a
  * per-invocation unique name so concurrent queries never collide.
  */
class MemoryRowCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    MemoryRowCatalog.tables.keySet().asScala
      .filter(_.namespace().sameElements(namespace)).toArray

  override def loadTable(ident: Identifier): Table = {
    val t = MemoryRowCatalog.tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    t
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val t = new MemoryRowTable(ident.toString, schema)
    if (MemoryRowCatalog.tables.putIfAbsent(ident, t) != null)
      throw new TableAlreadyExistsException(Seq(ident.toString))
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE on graft_cat")

  override def dropTable(ident: Identifier): Boolean =
    MemoryRowCatalog.tables.remove(ident) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = MemoryRowCatalog.tables.remove(oldIdent)
    if (t == null) throw new NoSuchTableException(oldIdent)
    MemoryRowCatalog.tables.put(newIdent, t)
  }
}

object MemoryRowCatalog {
  /** JVM-wide so every catalog instance (one per session) sees one store —
    * the same visibility a shared metastore gives concurrent sessions. */
  private val tables = new ConcurrentHashMap[Identifier, MemoryRowTable]()
}

/** One table: schema + a versioned row buffer. Reads snapshot the buffer
  * (readers never see a half-committed write); writes replace or append
  * atomically under the table lock at commit. */
class MemoryRowTable(tableName: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  @volatile private var rows: Array[InternalRow] = Array.empty

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** The copy-on-write GROUP id (always 0: whole table is one group).
    * Declaring it is not cosmetic: Spark's ReplaceDataExec applies the
    * write-schema row projection only through the metadata-carrying task
    * (DataAndMetadataWritingSparkTask) — a row-level table with NO
    * metadata columns gets the RAW MergeRows output, leading
    * __row_operation included, handed to its writer (ReplaceDataExec
    * .writingTask falls back to the unprojecting DataWritingSparkTask).
    * Every production COW connector declares one (Iceberg's _file), and
    * so do we. */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(MemoryRowTable.GroupColumn)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MemoryRowScan(tableSchema, rows, withGroup = false)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemoryWriteBuilder(this, replace = false)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new MemoryRowLevelOperation(this, info.command())

  private[sources] def snapshot(): Array[InternalRow] = rows
  private[sources] def append(batch: Array[InternalRow]): Unit = synchronized {
    rows = rows ++ batch
  }
  private[sources] def replaceAll(batch: Array[InternalRow]): Unit =
    synchronized { rows = batch }
}

object MemoryRowTable {
  val GroupCol = "_group"
  object GroupColumn extends MetadataColumn {
    override def name(): String = GroupCol
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override def isNullable: Boolean = false
    override def comment(): String = "copy-on-write group id (single group)"
  }
}

/** Whole-table copy-on-write: the operation's scan reads every row (one
  * group), and its write replaces the table with the rewritten rows that
  * Catalyst's ReplaceData query produces (kept + updated + inserted). */
class MemoryRowLevelOperation(table: MemoryRowTable,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MemoryRowScan(table.schema(), table.snapshot(), withGroup = true)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemoryWriteBuilder(table, replace = true)
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(MemoryRowTable.GroupCol))
}

class MemoryRowScan(schema: StructType, snapshot: Array[InternalRow],
    withGroup: Boolean) extends Scan with Batch {
  override def readSchema(): StructType =
    if (withGroup) schema.add(MemoryRowTable.GroupCol,
      org.apache.spark.sql.types.IntegerType, nullable = false)
    else schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // split the snapshot so the scan parallelizes (and the merge join
    // above it gets > 1 task), without creating empty partitions
    val n = math.min(4, math.max(1, snapshot.length))
    val step = (snapshot.length + n - 1) / math.max(n, 1)
    if (snapshot.isEmpty) Array(MemoryRowPartition(Array.empty, withGroup))
    else snapshot.grouped(math.max(step, 1))
      .map(g => MemoryRowPartition(g, withGroup): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MemoryReaderFactory
}

/** Rows ride inside the partition descriptor to the task (UnsafeRow copies
  * are Externalizable) — the in-memory analogue of a file split. */
case class MemoryRowPartition(rows: Array[InternalRow], withGroup: Boolean)
    extends InputPartition

class MemoryReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[MemoryRowPartition]
      private val rows = part.rows
      private val groupRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](0))
      private val joined = new org.apache.spark.sql.catalyst.expressions
        .JoinedRow
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        if (part.withGroup) joined(rows(i), groupRow) else rows(i)
      override def close(): Unit = ()
    }
}

class MemoryWriteBuilder(table: MemoryRowTable, replace: Boolean)
    extends WriteBuilder with SupportsTruncate {
  private var truncateAll = false
  override def truncate(): WriteBuilder = { truncateAll = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemoryBatchWrite(
      table, replace = replace || truncateAll)
  }
}

class MemoryBatchWrite(table: MemoryRowTable, replace: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = new MemoryWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val batch = messages.iterator
      .flatMap(_.asInstanceOf[MemoryCommit].rows).toArray
    if (replace) table.replaceAll(batch) else table.append(batch)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class MemoryCommit(rows: Array[InternalRow]) extends WriterCommitMessage

class MemoryWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer.empty[InternalRow]
      override def write(row: InternalRow): Unit = buf += row.copy()
      override def commit(): WriterCommitMessage = MemoryCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
