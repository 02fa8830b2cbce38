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
  * in a JVM-global map and each scan ships a group's rows inside one
  * InputPartition, so this catalog is a row-level-operation
  * DEMONSTRATION, not a storage engine — but the extension-point
  * mechanics (rewrite, scan, replace-commit, capability wiring,
  * runtime group filtering) are exactly what a real connector
  * implements, with groups = files and the commit an atomic manifest
  * swap. An unpartitioned table has a single group (every MERGE is a
  * full rewrite, b75); a `PARTITIONED BY (col)` table has one rewrite
  * group per value, and Spark's runtime row-level group filter + this
  * scan's `SupportsRuntimeV2Filtering` on `_group` narrow the rewrite
  * to TOUCHED groups only — b77 proves the narrowing by object
  * identity. That narrowing is the entire scale story of
  * copy-on-write.
  *
  * Registration: `spark.sql.catalog.graftmem = graft.sources
  * .GraftMemCatalog` (set lazily per session; the backing store is
  * JVM-global so every session sees the same tables).
  *
  * Concurrency contract (demo-honest): reads snapshot the committed
  * row vector and each commit swaps it atomically, but there is NO
  * writer-vs-writer conflict detection — two concurrent MERGEs into
  * one table serialize on the swap lock and the later commit wins on
  * any overlapping group (lost update), where a real lakehouse
  * catalog re-validates scanned files/groups at commit and retries.
  * The demo queries are single-writer by construction (corpus-keyed
  * table names, one writer per JVM), same class of documented
  * limitation as b25's bucketed-table singleton. d23's streaming
  * epoch ledger grows with total committed batches per table — the
  * demo bound is the table's lifetime; a production sink stores the
  * last epoch per query in its transaction log instead.
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
    // unpartitioned (one rewrite group) or PARTITIONED BY (col) — one
    // identity transform on a LONG column, one rewrite group per value
    val partCol = partitions match {
      case Array() => None
      case Array(t) if t.name() == "identity" &&
          t.references().length == 1 =>
        val col = t.references()(0).fieldNames().mkString(".")
        require(schema.fieldNames.contains(col),
          s"partition column $col not in schema")
        Some(col)
      case other => throw new UnsupportedOperationException(
        s"graftmem supports at most one identity partition, got " +
          other.mkString(", "))
    }
    val t = new GraftMemTable(key(ident), schema, partCol)
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
    Array(Identifier.of(namespace, "cosine_sim"),
      Identifier.of(namespace, "kmv_distinct"))
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name() match {
      case "cosine_sim"   => graft.functions.CosineSimV2Unbound
      case "kmv_distinct" => graft.functions.KmvDistinctV2Unbound
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }
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
private[sources] class GraftMemTable(val fullName: String,
    tblSchema: StructType, val partitionCol: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {
  require(tblSchema.fields.forall(_.dataType == LongType),
    s"graftmem demo table supports LONG columns only, got $tblSchema")

  /** Current committed content. Replaced atomically on commit. */
  @volatile private[sources] var rows: Vector[Array[Long]] = Vector.empty

  /** Rewrite-group id of a stored row: the identity-partition value,
    * or 0 when unpartitioned (single group).
    */
  private[sources] val groupIdx: Int =
    partitionCol.map(tblSchema.fieldIndex).getOrElse(-1)
  private[sources] def groupOf(r: Array[Long]): Long =
    if (groupIdx < 0) 0L else r(groupIdx)

  override def partitioning(): Array[Transform] =
    partitionCol.toArray.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(c))

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

  /** `_group` — the rewrite-group id metadata column (the identity-
    * partition value; constant 0 when unpartitioned). Its role is
    * CONTRACTUAL as well as informational: Spark's ReplaceData write
    * only routes rows through the data/metadata PROJECTING write task
    * when the row-level operation requires metadata attributes —
    * without one, the raw MergeRows output (incl. `__row_operation`)
    * reaches the writer. It is also the key the runtime GROUP FILTER
    * prunes on (partitioned tables rewrite only TOUCHED groups —
    * b77's partial-rewrite proof).
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
      /** Which groups this operation's scan actually read — set by the
        * runtime group filter (None = all groups were scanned). The
        * WRITE's commit replaces exactly these groups, which is the
        * whole point of group-based copy-on-write: untouched groups
        * are never read, never rewritten, never moved. Shared driver-
        * side state between the op's scan and its write — the same
        * role Iceberg's scanned-file set plays.
        */
      private val scannedGroups =
        new java.util.concurrent.atomic.AtomicReference[Option[Set[Long]]](
          None)
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String =
        s"GraftMemRowLevel(${info.command()})"
      // the operation reads the groups being rewritten…
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder =
        new GraftMemScanBuilder(GraftMemTable.this, Some(scannedGroups))
      // …and its write REPLACES exactly those groups on commit
      override def newWriteBuilder(wi: LogicalWriteInfo): WriteBuilder =
        new GraftMemWriteBuilder(GraftMemTable.this, wi, replace = true,
          replacedGroups = Some(scannedGroups))
      override def requiredMetadataAttributes()
          : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .column("_group"))
    }
}

private[sources] class GraftMemScanBuilder(table: GraftMemTable,
    groupsOut: Option[java.util.concurrent.atomic
      .AtomicReference[Option[Set[Long]]]] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = table.schema()
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan with Batch
      with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
    private val snapshot = table.rows // pin the commit we started from
    private val gIdx = table.groupIdx
    // runtime-prunable group set (None = all); the op's holder (when
    // present) learns what was scanned so its commit replaces exactly
    // that
    private var allowed: Option[Set[Long]] = None
    // map each requested field to its position in the stored row;
    // the `_group` metadata column reads the partition value (0 when
    // unpartitioned)
    private val srcIdx: Array[Int] = required.fieldNames.map {
      case "_group" => -1
      case n        => table.schema().fieldIndex(n)
    }
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"GraftMemScan(${table.fullName}, rows=${snapshot.length})"

    override def filterAttributes()
        : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column("_group"))
    override def filter(predicates: Array[
        org.apache.spark.sql.connector.expressions.filter.Predicate])
        : Unit =
      predicates.foreach { pr =>
        if (pr.name() == "IN" && pr.children().nonEmpty) {
          val onGroup = pr.children()(0) match {
            case f: org.apache.spark.sql.connector.expressions
              .NamedReference =>
              f.fieldNames.sameElements(Array("_group"))
            case _ => false
          }
          if (onGroup) {
            val vals = pr.children().drop(1).collect {
              case l: org.apache.spark.sql.connector.expressions
                .Literal[_] if l.value() != null =>
                l.value() match { case n: java.lang.Number => n.longValue() }
            }.toSet
            if (vals.nonEmpty) {
              allowed = Some(allowed.fold(vals)(_ intersect vals))
              groupsOut.foreach(_.set(allowed))
            }
          }
        }
      }

    // one InputPartition per rewrite GROUP, so the runtime filter can
    // skip whole groups before a row is shipped
    override def planInputPartitions(): Array[InputPartition] = {
      val byGroup = snapshot.groupBy(r => table.groupOf(r))
      byGroup.toSeq.sortBy(_._1)
        .filter { case (g, _) => allowed.forall(_.contains(g)) }
        .map { case (_, rs) => GraftMemPartition(rs): InputPartition }
        .toArray match {
          case Array() => Array(GraftMemPartition(Vector.empty))
          case parts   => parts
        }
    }
    override def createReaderFactory(): PartitionReaderFactory = {
      val idx = srcIdx
      val g = gIdx
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
                    if (j >= 0) data(i)(j)
                    else if (g >= 0) data(i)(g)
                    else 0L): Any)))
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
    table: GraftMemTable, writeInfo: LogicalWriteInfo, replace: Boolean,
    replacedGroups: Option[java.util.concurrent.atomic
      .AtomicReference[Option[Set[Long]]]] = None)
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
        // single swap on the driver = the atomic manifest/commit step.
        // A row-level replace swaps ONLY the groups the operation's
        // scan read (runtime group filter): untouched groups keep
        // their existing row objects — the copy-on-write narrowing.
        // No filter fired (or unpartitioned) ⇒ all groups were
        // scanned ⇒ full swap.
        table.synchronized {
          table.rows =
            if (replace)
              replacedGroups.flatMap(_.get()) match {
                case Some(gs) =>
                  table.rows.filterNot(r => gs.contains(table.groupOf(r))) ++
                    written
                case None => written
              }
            else if (doTruncate) written
            else table.rows ++ written
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
