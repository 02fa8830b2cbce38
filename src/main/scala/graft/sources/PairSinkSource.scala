package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path — the sink-side extension point
  * completing the matrix next to the pairgen read source (SURVEY §7.3):
  * the reference's `TextWriter` (`key<TAB>value` lines)
  * [mrs: mrs/fileformats.py] as a first-class Spark V2 table with a real
  * two-phase commit.
  *
  * Scale surface demonstrated:
  *  - one writer per input partition (`DataWriterFactory`) — the write
  *    parallelizes like any file sink;
  *  - task→driver commit protocol: each task attempt writes a UNIQUE
  *    temp file and reports it in its `WriterCommitMessage`; only the
  *    driver-side `commit` renames winners into place, so speculative /
  *    retried attempts can never tear output (`abort` deletes losers);
  *  - `SupportsTruncate` backs `mode("overwrite")`.
  *
  * Files land on the writer-local filesystem (the demo environment); on
  * a real cluster the same protocol targets a shared store via the
  * Hadoop committer.
  *
  * Usage: `df.write.format("pairsink").mode("overwrite")
  * .option("path", p).save()`; read back with Mrs TextReader
  * ([[PairFiles.readText]]).
  */
class PairSinkSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pairsink"
  // write-only table: the schema is whatever the input DataFrame has
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PairSinkTable(properties.get("path"), schema)
}

private[sources] class PairSinkTable(path: String, schema0: StructType)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "pairsink requires option 'path'")
  override def name(): String = s"pairsink($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new PairSinkWriteBuilder(path, info.schema())
}

private[sources] class PairSinkWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new PairSinkBatchWrite(path, schema, doTruncate)
  }
}

private[sources] case class PairSinkCommit(tmp: String, fin: String)
    extends WriterCommitMessage

private[sources] class PairSinkBatchWrite(
    path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new PairSinkWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    if (truncate) {
      val old = dir.listFiles()
      if (old != null)
        old.filter(_.getName.startsWith("part-")).foreach(_.delete())
    }
    messages.foreach { case PairSinkCommit(tmp, fin) =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(fin),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case PairSinkCommit(tmp, _) => new java.io.File(tmp).delete(): Unit
      case _ => ()
    }
}

private[sources] class PairSinkWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val fin = f"$path/part-$partitionId%05d.pairs"
      // unique per task ATTEMPT: retries never collide
      private val tmp = s"$path/.tmp-$partitionId-$taskId"
      new java.io.File(path).mkdirs()
      private val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(
          new java.io.FileOutputStream(tmp), "UTF-8"))
      override def write(row: InternalRow): Unit = {
        var i = 0
        val n = schema.fields.length
        while (i < n) {
          if (i > 0) out.write('\t')
          if (!row.isNullAt(i))
            out.write(row.get(i, schema.fields(i).dataType).toString)
          i += 1
        }
        out.write('\n')
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        PairSinkCommit(tmp, fin)
      }
      override def abort(): Unit = {
        out.close()
        new java.io.File(tmp).delete(): Unit
      }
      override def close(): Unit = ()
    }
}
