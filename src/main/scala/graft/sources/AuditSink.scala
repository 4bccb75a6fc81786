package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Validating audit SINK as a DataSource V2 write path — the missing half
  * of the custom-source tier ([[GenSource]] covers scan + filter/column/
  * aggregate pushdown; this covers TableProvider → WriteBuilder →
  * BatchWrite → DataWriterFactory → DataWriter with the task-commit
  * protocol). The reference has NO write surface at all — it reads a Mongo
  * snapshot and scores it (`app_test.py:36-57`) — so this rung is part of
  * the beyond-reference pipeline tier: any engine that curates 100 TB must
  * also PUBLISH, and a publish needs a transactional commit: per-task partial
  * digests travel as [[WriterCommitMessage]]s, ONLY positively-committed
  * tasks reach `commit()` (Spark's output-commit coordinator discards
  * speculative/retried attempts, so the aggregated digest is exactly-once
  * by construction), and any task failure routes the job to `abort()`,
  * which publishes nothing.
  *
  * Contract: rows must carry a non-null BIGINT `digest` column — the same
  * 60-bit md5-prefix row digest `q_table_checksum` established as the
  * cross-engine reconciliation format. The sink accumulates (count,
  * BIT-XOR of digests) per task — O(1) writer state, partition-order and
  * task-placement invariant — and `commit()` publishes the table-level
  * (rows, xor) to [[AuditRegistry]] under the `runId` option. That is the
  * "validate before you publish" gate of a production pipeline: two
  * engines compare one (count, digest) row instead of re-reading the
  * output.
  */
object AuditSink {
  val ShortName = "graft-audit"

  case class Stats(rows: Long, xorDigest: Long, tasks: Int)
}

/** Driver-side registry of committed audit results, keyed by runId.
  * JVM-global on purpose: `commit()` runs on the driver, and the declared
  * query reads the stats back in the same session (the
  * model-registry/staging-memo pattern). Aborted runIds are recorded so a
  * spec can pin the no-partial-publish contract. */
object AuditRegistry {
  private val committed = new java.util.concurrent.ConcurrentHashMap[String, AuditSink.Stats]()
  private val abortedRuns = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def get(runId: String): Option[AuditSink.Stats] = Option(committed.get(runId))
  def aborted(runId: String): Boolean = abortedRuns.contains(runId)
  private[sources] def put(runId: String, s: AuditSink.Stats): Unit = committed.put(runId, s)
  private[sources] def recordAbort(runId: String): Unit = { abortedRuns.add(runId); committed.remove(runId) }
}

class AuditDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = AuditSink.ShortName
  // Write-only: the schema always comes from the frame being written.
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(s"${AuditSink.ShortName} is write-only")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema)
}

class AuditTable(writeSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = AuditSink.ShortName
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new AuditWrite(info)
  }
}

class AuditWrite(info: LogicalWriteInfo) extends Write with BatchWrite {
  private val runId = info.options.getOrDefault("runId", info.queryId)
  private val digestIdx = {
    val i = info.schema.fieldNames.indexOf("digest")
    require(i >= 0 && info.schema.fields(i).dataType == LongType,
      s"${AuditSink.ShortName} requires a BIGINT `digest` column, got ${info.schema.simpleString}")
    i
  }
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(physical: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(digestIdx)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val parts = messages.map(_.asInstanceOf[AuditTaskResult])
    AuditRegistry.put(runId,
      AuditSink.Stats(parts.map(_.rows).sum, parts.foldLeft(0L)(_ ^ _.xorDigest), parts.length))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    AuditRegistry.recordAbort(runId)
}

case class AuditTaskResult(rows: Long, xorDigest: Long) extends WriterCommitMessage

class AuditWriterFactory(digestIdx: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var xor = 0L
      override def write(row: InternalRow): Unit = {
        // a NULL digest means the upstream format contract broke — fail the
        // task, which fails the job, which routes to abort(): nothing
        // half-published
        if (row.isNullAt(digestIdx))
          throw new IllegalStateException("audit sink: NULL digest")
        rows += 1
        xor ^= row.getLong(digestIdx)
      }
      override def commit(): WriterCommitMessage = AuditTaskResult(rows, xor)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
