package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Executor-side parquet writing for DSv2 `BatchWrite`s (the row-level
  * operation write path, where Spark's V1 write fallback does not
  * exist). Bridges to the SAME `ParquetUtils.prepareWrite` /
  * `ParquetOutputWriter` machinery every `df.write.parquet` uses — no
  * bespoke parquet encoding — configured exactly like the snapshot
  * layer's driver-side writes (snappy, TIMESTAMP_MICROS so every
  * timestamp column keeps footer statistics for the stats pruner).
  *
  * Files land under the caller-chosen immutable directory with
  * task-unique names; nothing is visible to readers until the caller's
  * commit publishes a manifest referencing them (crash debris is
  * unreferenced and vacuumable — the snapshot layer's standing model).
  */
object ParquetWriteBridge {

  /** The files one task wrote (several when the task rolls per cluster
    * key), with its total row count.
    */
  case class WrittenFiles(names: Seq[String], rows: Long) extends WriterCommitMessage

  /** A serializable factory writing rows of `schema` into `dirUri`.
    * `rollOn = cols` starts a NEW file whenever any of the columns'
    * values change between consecutive rows — with a clustered
    * distribution and an ordering on the same columns (the
    * [[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]]
    * contract), every written file comes out single-valued for the key
    * tuple, which is what lets a row-level rewrite preserve a
    * key-clustered layout.
    */
  def writerFactory(spark: SparkSession, schema: StructType,
      dirUri: String, rollOn: Seq[String] = Nil): DataWriterFactory = {
    val sqlConf = spark.sessionState.conf.clone()
    sqlConf.setConfString("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = ParquetUtils.prepareWrite(sqlConf, job, schema,
      new ParquetOptions(CaseInsensitiveMap(Map("compression" -> "snappy")), sqlConf))
    new GraftParquetWriterFactory(owf,
      new SerializableConfiguration(job.getConfiguration), schema, dirUri,
      rollOn.map(schema.fieldIndex))
  }
}

private[graftbridge] class GraftParquetWriterFactory(
    owf: OutputWriterFactory,
    conf: SerializableConfiguration,
    schema: StructType,
    dirUri: String,
    rollIdx: Seq[Int] = Nil) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var fileName: String = _
      private val names = scala.collection.mutable.ListBuffer.empty[String]
      private var rows = 0L
      private val rollType = rollIdx.map(schema(_).dataType)
      private var lastKey: Seq[Any] = null
      // ReplaceData rows arrive with the rewrite's `__row_operation`
      // marker PREPENDED, and Spark's row projection only strips it for
      // sources declaring metadata attributes (the writingTask None
      // branch hands raw rows through) — so strip it here with a
      // zero-copy ordinal view. Any other arity mismatch fails loudly.
      private var adapter: org.apache.spark.sql.catalyst.ProjectingInternalRow = _

      // lazily opened on the first row: an empty task leaves no file
      private def open(): Unit = if (writer == null) {
        val ctx = new TaskAttemptContextImpl(conf.value,
          new TaskAttemptID(new TaskID("graft-rlo", partitionId, TaskType.MAP,
            partitionId), taskId.toInt & Int.MaxValue))
        fileName = f"part-$partitionId%05d-$taskId" +
          s"-${java.util.UUID.randomUUID().toString.take(8)}${owf.getFileExtension(ctx)}"
        writer = owf.newInstance(s"$dirUri/$fileName", schema, ctx)
      }

      // group-based rewrites hand copied rows as (metadata, data) pairs
      // when the operation declares metadata attributes — the data row
      // is already projection-clean, the metadata (file lineage) is not
      // part of the written bytes
      override def write(metadata: InternalRow, record: InternalRow): Unit =
        write(record)

      override def write(record: InternalRow): Unit = {
        val out: InternalRow =
          if (record.numFields == schema.length) record
          else {
            if (adapter == null) {
              require(record.numFields == schema.length + 1,
                s"row arity ${record.numFields} matches neither the write schema " +
                  s"(${schema.length}) nor schema+operation (${schema.length + 1})")
              adapter = org.apache.spark.sql.catalyst.ProjectingInternalRow(schema,
                (1 to schema.length).toIndexedSeq)
            }
            adapter.project(record)
            adapter
          }
        if (rollIdx.nonEmpty) {
          val k = rollIdx.indices.map(j => out.get(rollIdx(j), rollType(j)))
          if (lastKey != null && k != lastKey && writer != null) {
            writer.close()
            names += fileName
            writer = null
          }
          // buffers behind string values are reused across rows: keep copies
          lastKey = k.map {
            case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
            case x => x
          }
        }
        open()
        writer.write(out)
        rows += 1
      }

      override def commit(): WriterCommitMessage = {
        if (writer != null) { writer.close(); names += fileName }
        ParquetWriteBridge.WrittenFiles(names.toList, rows)
      }

      override def abort(): Unit = {
        if (writer != null) { writer.close(); names += fileName }
        val fs = new Path(dirUri).getFileSystem(conf.value)
        names.foreach(n => fs.delete(new Path(s"$dirUri/$n"), false))
      }

      override def close(): Unit = ()
    }
}
