package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory `TableCatalog` whose tables support GROUP-BASED ROW-LEVEL
  * OPERATIONS (`SupportsRowLevelOperations`) — the DSv2 face behind
  * real SQL `MERGE INTO` / `UPDATE` / `DELETE` (b75): Spark's
  * `RewriteMergeIntoTable` rewrites the command into a `ReplaceData`
  * plan that (1) SCANS the affected groups through the operation's own
  * scan builder, (2) computes the surviving row set (copied + updated +
  * inserted) as an ordinary distributed query, and (3) hands it to the
  * operation's write builder, whose commit REPLACES those groups
  * atomically — the copy-on-write lakehouse shape (Iceberg/Delta
  * group-based MERGE) at the connector extension point. b45 computes
  * the same CDC semantics with explicit joins; b75 lets the ENGINE
  * derive that plan from declarative SQL against this catalog.
  *
  * Scale notes, and what is demo-sized here: the table body lives
  * in a JVM-global map and each scan ships the full row set inside
  * ONE InputPartition, so this catalog is a row-level-operation
  * DEMONSTRATION, not a storage engine — the extension-point
  * mechanics (rewrite, scan, replace-commit, capability wiring) are
  * exactly what a real connector implements, with groups = files and
  * the commit an atomic manifest swap. An unpartitioned table has a
  * single group, so every MERGE is a full rewrite — production
  * connectors partition so `requiredMetadataAttributes` (the group id
  * column) lets Spark rewrite ONLY touched groups; that narrowing is
  * the entire scale story of copy-on-write and is documented rather
  * than simulated here.
  *
  * Registration: `spark.sql.catalog.graftmem = graft.sources
  * .GraftMemCatalog` (set lazily per session; the backing store is
  * JVM-global so every session sees the same tables).
  */
class GraftMemCatalog extends TableCatalog with FunctionCatalog {
  import GraftMemCatalog._
  private var catalogName: String = "graftmem"
  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = namespace.mkString(".")
    tables.keySet().toArray(Array.empty[String])
      .filter(_.startsWith(ns + "."))
      .map(k => Identifier.of(namespace, k.substring(ns.length + 1)))
  }
  override def loadTable(ident: Identifier): Table = {
    val t = tables.get(key(ident))
    if (t == null)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    t
  }
  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graftmem is unpartitioned (single rewrite group) by design")
    val t = new GraftMemTable(key(ident), schema)
    val prev = tables.putIfAbsent(key(ident), t)
    if (prev != null)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          (ident.namespace() :+ ident.name()).toSeq)
    t
  }
  override def alterTable(
      ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graftmem: ALTER unsupported")
  override def dropTable(ident: Identifier): Boolean =
    tables.remove(key(ident)) != null
  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("graftmem: RENAME unsupported")

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  /** FUNCTION CATALOG face (b76): catalog-resolved functions — one
    * definition every session sees, vs the per-session function
    * registry. `cosine_sim` here IS the native Expression's kernel
    * ([[graft.functions.CosineSimV2]] shares
    * `graft.functions.CosineSim.compute`), so the two surfaces are
    * bit-identical by construction.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "cosine_sim"))
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "cosine_sim") graft.functions.CosineSimV2Unbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}

object GraftMemCatalog {
  /** JVM-global store: catalog instances are created per session/name,
    * but a demo query registers, writes and reads within one JVM.
    */
  private val tables = new ConcurrentHashMap[String, GraftMemTable]()

  /** Test/dev reset — drops every table (the catalog equivalent of a
    * fresh warehouse dir).
    */
  def clearAll(): Unit = tables.clear()
}

/** Row payload shipped between driver and executors: externalized
  * values (Long / String), avoiding InternalRow serialization rules.
  * Only the types the demo schema uses are supported; unsupported
  * types fail loudly at write time.
  */
private[sources] class GraftMemTable(val fullName: String, tblSchema: StructType)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {
  require(tblSchema.fields.forall(_.dataType == LongType),
    s"graftmem demo table supports LONG columns only, got $tblSchema")

  /** Current committed content. Replaced atomically on commit. */
  @volatile private[sources] var rows: Vector[Array[Long]] = Vector.empty

  override def name(): String = fullName
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  /** Streaming exactly-once bookkeeping: (queryId, epoch) pairs whose
    * commit already landed. A retried/replayed epoch (engine restart
    * re-commits the last batch; commit() may also be re-entered
    * after a driver failure) is detected here and SKIPPED — idempotent
    * re-commit is the sink half of Structured Streaming's exactly-once
    * contract (the source half being replayable offsets, d12). Keyed
    * by queryId so a DIFFERENT query appending to the table starts its
    * own epoch sequence without colliding.
    */
  private[sources] val committedEpochs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()

  /** `_group` — the rewrite-group id metadata column (constant 0: one
    * group per unpartitioned table). Its role is CONTRACTUAL, not
    * informational: Spark's ReplaceData write only routes rows through
    * the data/metadata PROJECTING write task when the row-level
    * operation requires metadata attributes — without one, the raw
    * MergeRows output (incl. `__row_operation`) reaches the writer.
    * A real connector puts its file/partition id here, which is also
    * what lets Spark rewrite only TOUCHED groups.
    */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = "_group"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
    })

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftMemScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftMemWriteBuilder(this, info, replace = false)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String =
        s"GraftMemRowLevel(${info.command()})"
      // the operation reads the (single) group being rewritten…
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder =
        new GraftMemScanBuilder(GraftMemTable.this)
      // …and its write REPLACES that group on commit
      override def newWriteBuilder(wi: LogicalWriteInfo): WriteBuilder =
        new GraftMemWriteBuilder(GraftMemTable.this, wi, replace = true)
      override def requiredMetadataAttributes()
          : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .column("_group"))
    }
}

private[sources] class GraftMemScanBuilder(table: GraftMemTable)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = table.schema()
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan with Batch {
    private val snapshot = table.rows // pin the commit we started from
    // map each requested field to its position in the stored row;
    // the `_group` metadata column synthesizes constant 0
    private val srcIdx: Array[Int] = required.fieldNames.map {
      case "_group" => -1
      case n        => table.schema().fieldIndex(n)
    }
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"GraftMemScan(${table.fullName}, rows=${snapshot.length})"
    override def planInputPartitions(): Array[InputPartition] =
      Array(GraftMemPartition(snapshot))
    override def createReaderFactory(): PartitionReaderFactory = {
      val idx = srcIdx
      new PartitionReaderFactory {
        override def createReader(
            p: InputPartition): PartitionReader[InternalRow] = {
          val data = p.asInstanceOf[GraftMemPartition].data
          new PartitionReader[InternalRow] {
            private var i = -1
            override def next(): Boolean = { i += 1; i < data.length }
            override def get(): InternalRow =
              InternalRow.fromSeq(
                scala.collection.immutable.ArraySeq.unsafeWrapArray(
                  idx.map(j => java.lang.Long.valueOf(
                    if (j < 0) 0L else data(i)(j)): Any)))
            override def close(): Unit = ()
          }
        }
      }
    }
  }
}

private[sources] case class GraftMemPartition(data: Vector[Array[Long]])
    extends InputPartition

/** `replace = false`: INSERT INTO (append; TRUNCATE overwrite empties
  * first). `replace = true`: the row-level-operation write — commit
  * swaps the table body for exactly the written rows (the group
  * rewrite; with one group that is the whole table).
  */
private[sources] class GraftMemWriteBuilder(
    table: GraftMemTable, writeInfo: LogicalWriteInfo, replace: Boolean)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  // A row-level-operation write may receive a WIDER schema than
  // the table (rewrite bookkeeping columns); project the table's
  // columns out BY NAME, never by position.
  private def proj: Array[Int] = table.schema().fieldNames
    .map(writeInfo.schema().fieldIndex)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      private val p = proj
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        new GraftMemWriterFactory(p)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val written = messages.iterator.flatMap {
          case m: GraftMemCommit => m.data
        }.toVector
        // single swap on the driver = the atomic manifest/commit step
        table.synchronized {
          table.rows =
            if (replace || doTruncate) written else table.rows ++ written
        }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }

    /** d23: the custom EXACTLY-ONCE streaming sink — per microbatch
      * the engine calls `commit(epochId, messages)`; an epoch that
      * already committed is skipped, so a replayed batch (restart
      * recovery, commit retry) cannot double rows. Appends only —
      * the streaming path never truncates.
      */
    override def toStreaming: org.apache.spark.sql.connector.write
        .streaming.StreamingWrite =
      new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
        private val p = proj
        override def createStreamingWriterFactory(
            info: PhysicalWriteInfo): org.apache.spark.sql.connector
              .write.streaming.StreamingDataWriterFactory =
          new GraftMemStreamingWriterFactory(p)
        override def commit(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit = {
          if (table.committedEpochs.add((writeInfo.queryId(), epochId))) {
            val written = messages.iterator.flatMap {
              case m: GraftMemCommit => m.data
            }.toVector
            table.synchronized { table.rows = table.rows ++ written }
          }
        }
        override def abort(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit = ()
      }
  }
}

private[sources] class GraftMemStreamingWriterFactory(proj: Array[Int])
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftMemWriterFactory(proj).createWriter(partitionId, taskId)
}

private[sources] case class GraftMemCommit(data: Vector[Array[Long]])
    extends WriterCommitMessage

private[sources] class GraftMemWriterFactory(proj: Array[Int])
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[Array[Long]]
      override def write(record: InternalRow): Unit = {
        val a = new Array[Long](proj.length)
        var i = 0
        while (i < proj.length) { a(i) = record.getLong(proj(i)); i += 1 }
        buf += a
      }
      override def commit(): WriterCommitMessage = GraftMemCommit(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
