package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.StreamingIngest

/** SQL-level time travel for the manifest-versioned stage zone (round-10
  * verdict #5): a read-only V2 [[TableCatalog]] that makes every
  * [[graft.streaming.StreamingIngest.StageManifest]] snapshot reachable
  * from SQL —
  *
  * {{{
  *   SELECT … FROM graft_stage.mystage                  -- current version
  *   SELECT … FROM graft_stage.mystage VERSION AS OF 2  -- any snapshot
  * }}}
  *
  * Catalyst's time-travel resolution calls the `loadTable(ident, version)`
  * overload; this catalog resolves the version through the SAME manifest +
  * retention logic as the programmatic `stageTableAt` (one shared
  * `stageFilesAt` listing), then hands the snapshot's exact leaf-file list
  * to Spark's own [[ParquetTable]] — so the SQL path keeps every scan
  * capability of a native parquet read (column pruning, filter pushdown,
  * partition-column extraction via `basePath`) instead of going through a
  * custom scan.
  *
  * Failure contract is inherited, loud, and test-pinned: an unknown
  * version raises (no silent empty frame), and travel beyond retention —
  * a snapshot whose leaves a later compaction already deleted — raises
  * the same "beyond retention" error as the programmatic API.
  *
  * Stage roots are registered programmatically (`register(name, paths)`)
  * because a stage table is created by an ingest pipeline, not by DDL —
  * mirroring how Delta/Iceberg tables enter a catalog by writer commit,
  * not CREATE TABLE from the reader. The registry is JVM-wide for the
  * same reason MemoryRowCatalog's is: one metastore per process.
  */
class StageTimeTravelCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    StageTimeTravelCatalog.stages.keySet().asScala
      .map(n => Identifier.of(Array.empty, n)).toArray

  override def loadTable(ident: Identifier): Table = tableAt(ident, None)

  /** SQL `VERSION AS OF <v>` lands here. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft_stage versions are manifest numbers; got '$version'")
      }
    tableAt(ident, Some(v))
  }

  /** SQL `TIMESTAMP AS OF` — the manifest records versions, not commit
    * wall-clocks, so this is explicitly unsupported rather than silently
    * approximated. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "graft_stage supports VERSION AS OF (manifest versions), not TIMESTAMP AS OF")

  private def tableAt(ident: Identifier, asOf: Option[Long]): Table = {
    val paths = Option(StageTimeTravelCatalog.stages.get(ident.name))
      .getOrElse(throw new NoSuchTableException(ident))
    val spark = SparkSession.active
    val files = StreamingIngest.stageFilesAt(spark, paths, asOf)
    val opts = new CaseInsensitiveStringMap(
      util.Map.of("basePath", paths.stage))
    ParquetTable(ident.name + asOf.map(v => s"@v$v").getOrElse(""),
      spark, opts, files.toList, Some(StreamingIngest.stageReadSchema),
      classOf[ParquetFileFormat])
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft_stage tables are created by ingest pipelines (register), not DDL")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE on graft_stage")

  override def dropTable(ident: Identifier): Boolean =
    StageTimeTravelCatalog.stages.remove(ident.name) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE on graft_stage")
}

object StageTimeTravelCatalog {
  private val stages =
    new ConcurrentHashMap[String, StreamingIngest.Paths]()

  /** Expose an ingest pipeline's stage zone as `graft_stage.<name>`. */
  def register(name: String, paths: StreamingIngest.Paths): Unit = {
    stages.put(name, paths); ()
  }
}
